import os

import pytest

from thunder_tpu.text import (
    BPETokenizer,
    BatchTextTransformer,
    char_tokenizer,
    get_most_frequent_tokens,
    train_sentencepiece_model,
    word_tokenizer,
)
from thunder_tpu.text.sentencepiece_model import SentencePieceModel

REAL_SP_MODEL = "/root/reference/tests/nemo_config_samples/example_tokenizer.model"


def test_word_and_char_tokenizers():
    assert word_tokenizer("hello world") == ["hello", "world"]
    assert char_tokenizer("abc") == ["a", "b", "c"]


def test_get_most_frequent_tokens():
    corpus = "a a a b b c"
    toks = get_most_frequent_tokens(corpus, word_tokenizer, minimum_frequency=2)
    assert toks == ["a", "b"]
    toks = get_most_frequent_tokens(corpus, word_tokenizer, max_number_of_tokens=1)
    assert toks == ["a"]


@pytest.mark.skipif(not os.path.exists(REAL_SP_MODEL), reason="reference fixture unavailable")
def test_load_real_nemo_sentencepiece_model():
    tok = BPETokenizer(REAL_SP_MODEL)
    assert len(tok.model.pieces) == 1024
    pieces = tok("the world needs opportunities")
    assert pieces[0] == "▁the"
    # reversible: pieces joined and unmarked give the input back
    text = "".join(pieces).replace("▁", " ").strip()
    assert text == "the world needs opportunities"


@pytest.mark.skipif(not os.path.exists(REAL_SP_MODEL), reason="reference fixture unavailable")
def test_real_model_roundtrip_serialization(tmp_path):
    m = SentencePieceModel.load(REAL_SP_MODEL)
    m.save(str(tmp_path / "copy.model"))
    m2 = SentencePieceModel.load(str(tmp_path / "copy.model"))
    assert m2.pieces == m.pieces
    assert m2.model_type == m.model_type
    assert m2.encode_as_pieces("testing roundtrip") == m.encode_as_pieces("testing roundtrip")


@pytest.fixture()
def corpus_file(tmp_path):
    text = "\n".join(
        [
            "the quick brown fox jumps over the lazy dog",
            "the world needs opportunities for new leaders and new ideas",
            "speech recognition converts audio into text",
            "the quick dog barks at the lazy fox",
        ]
        * 5
    )
    p = tmp_path / "corpus.txt"
    p.write_text(text)
    return str(p)


@pytest.mark.parametrize("tokenizer_type", ["unigram", "bpe"])
def test_train_sentencepiece_model(tmp_path, corpus_file, tokenizer_type):
    out = train_sentencepiece_model(
        corpus_file, vocab_size=64, output_dir=str(tmp_path / tokenizer_type), tokenizer_type=tokenizer_type
    )
    tok = BPETokenizer(f"{out}/tokenizer.model")
    pieces = tok("the quick brown fox")
    assert len(pieces) > 0
    # reversibility
    assert "".join(pieces).replace("▁", " ").strip() == "the quick brown fox"
    # vocab file written with piece\tscore lines
    lines = open(f"{out}/tokenizer.vocab", encoding="utf-8").read().splitlines()
    assert lines[0].split("\t")[0] == "<unk>"


def test_train_skips_existing(tmp_path, corpus_file):
    out_dir = str(tmp_path / "sp")
    train_sentencepiece_model(corpus_file, 64, out_dir)
    with pytest.warns(UserWarning):
        train_sentencepiece_model(corpus_file, 64, out_dir)


def test_train_raises_on_missing_file(tmp_path):
    with pytest.raises(ValueError):
        train_sentencepiece_model(str(tmp_path / "nope.txt"), 64, str(tmp_path))


def test_from_sentencepiece_classmethod(tmp_path, corpus_file):
    out = train_sentencepiece_model(corpus_file, 64, str(tmp_path / "sp"))
    tt = BatchTextTransformer.from_sentencepiece(out)
    ids, lengths = tt.encode(["the quick brown fox"])
    assert ids.shape[0] == 1
    decoded = tt.decode_prediction(ids, remove_repeated=False)
    assert decoded[0].strip() == "the quick brown fox"


def test_native_unigram_encode_matches_python_dp(tmp_path, corpus_file):
    """The C++ Viterbi (tn_spm_encode) must segment exactly like the Python
    DP — same pieces, same unknown-char surfaces — across unicode inputs."""
    out = train_sentencepiece_model(corpus_file, 64, str(tmp_path / "sp"))
    tok = BPETokenizer(f"{out}/tokenizer.model")
    model = tok.model
    if model._native_encoder() is None:
        pytest.skip("native library unavailable")
    texts = [
        "the quick brown fox",
        "héllo wörld ünïcode",
        "zzz qqq unknown chars 123",
        "a",
        "ação coração",
        "the the the fox fox",
    ]
    for text in texts:
        s = model.normalize(text)
        assert model._encode_unigram(s) == model._encode_unigram_py(s), text


def test_native_unigram_encode_hypothesis_parity():
    """Property fuzz: random piece vocabularies and unicode-ish texts must
    segment identically on the C++ and Python Viterbi paths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from thunder_tpu.text.sentencepiece_model import NORMAL, SentencePieceModel

    alphabet = "abcdeé▁ç漢 "

    @settings(max_examples=60, deadline=None)
    @given(
        pieces=st.lists(
            st.text(alphabet=alphabet.replace(" ", ""), min_size=1, max_size=4),
            min_size=2,
            max_size=24,
            unique=True,
        ),
        scores=st.lists(st.floats(-12.0, -0.1), min_size=24, max_size=24),
        text=st.text(alphabet=alphabet, max_size=40),
    )
    def check(pieces, scores, text):
        model = SentencePieceModel(
            pieces=list(pieces),
            scores=scores[: len(pieces)],
            types=[NORMAL] * len(pieces),
        )
        if model._native_encoder() is None:
            pytest.skip("native library unavailable")
        s = model.normalize(text)
        if not s:
            return
        assert model._encode_unigram(s) == model._encode_unigram_py(s)

    check()
