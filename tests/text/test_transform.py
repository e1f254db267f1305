import numpy as np
import pytest

from thunder_tpu.text import BatchTextTransformer


@pytest.fixture()
def char_transform():
    return BatchTextTransformer(tokens=list("abcdefghijklmnopqrstuvwxyz '"))


def test_encode_shapes_and_padding(char_transform):
    ids, lengths = char_transform.encode(["abc", "a"])
    assert ids.shape == (2, 3)
    np.testing.assert_array_equal(lengths, [3, 1])
    pad = char_transform.vocab.pad_idx
    assert (ids[1, 1:] == pad).all()


def test_encode_pad_to_static_width(char_transform):
    ids, lengths = char_transform.encode(["abc"], pad_to=10)
    assert ids.shape == (1, 10)


def test_decode_prediction_collapses_repeats(char_transform):
    v = char_transform.vocab
    seq = [v.stoi["a"], v.stoi["a"], v.blank_idx, v.stoi["b"], v.stoi["b"]]
    out = char_transform.decode_prediction(np.array([seq]))
    assert out == ["ab"]


def test_decode_prediction_no_collapse(char_transform):
    v = char_transform.vocab
    seq = [v.stoi["a"], v.stoi["a"], v.stoi["b"]]
    out = char_transform.decode_prediction(np.array([seq]), remove_repeated=False)
    assert out == ["aab"]


def test_encode_decode_roundtrip(char_transform):
    texts = ["hello world", "it's a test"]
    ids, lengths = char_transform.encode(texts)
    decoded = char_transform.decode_prediction(ids, remove_repeated=False)
    # 'll' collapses only with remove_repeated=True; without it we round trip
    assert decoded == texts


def test_sentencepiece_marker_to_space():
    tt = BatchTextTransformer(tokens=["▁the", "▁cat", "s"])
    ids = np.array([[0, 1, 2]])
    assert tt.decode_prediction(ids, remove_repeated=False) == [" the cats"]


def test_hf_pipe_marker_to_space():
    tt = BatchTextTransformer(tokens=["T", "H", "E", "|"])
    ids = np.array([[0, 1, 2, 3, 0]])
    assert tt.decode_prediction(ids, remove_repeated=False) == ["THE T"]


def test_custom_tokenizer_function():
    tt = BatchTextTransformer(tokens=["hello", "world"], custom_tokenizer_function=str.split)
    ids, lengths = tt.encode(["hello world"])
    assert lengths[0] == 2


def test_num_tokens(char_transform):
    assert char_transform.num_tokens == len(char_transform.vocab.itos)
