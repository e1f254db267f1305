import numpy as np
import pytest

from thunder_tpu.text import Vocabulary


def test_special_tokens_appended_only_if_absent():
    v = Vocabulary(["a", "b", "<blank>"])
    assert v.itos.count("<blank>") == 1
    v2 = Vocabulary(["a", "b"])
    assert v2.itos == ["a", "b", "<blank>"]
    assert v2.blank_idx == 2


def test_nemo_compat_mode_blank_at_end():
    tokens = list("abc")
    v = Vocabulary(tokens)
    assert v.blank_idx == len(tokens)
    assert v.pad_idx == v.blank_idx


def test_numericalize_drops_oov_without_unk():
    v = Vocabulary(list("abc"))
    ids = v.numericalize(list("abxc"))
    np.testing.assert_array_equal(ids, [0, 1, 2])


def test_numericalize_maps_oov_to_unk():
    v = Vocabulary(list("abc"), unknown_token="<unk>")
    ids = v.numericalize(list("abx"))
    assert ids[-1] == v.stoi["<unk>"]


def test_decode_roundtrip():
    v = Vocabulary(list("abc"))
    ids = v.numericalize(list("cab"))
    assert v.decode_into_text(ids) == ["c", "a", "b"]


def test_add_remove_special_tokens():
    v = Vocabulary(list("ab"), start_token="<s>", end_token="</s>")
    toks = v.add_special_tokens(["a", "b"])
    assert toks == ["<s>", "a", "b", "</s>"]
    assert v.remove_special_tokens("<s>ab</s><blank>") == "ab"


def test_pad_token_defaults_to_blank():
    v = Vocabulary(list("ab"), blank_token="%")
    assert v.pad_token == "%"
    assert v.pad_idx == v.blank_idx
