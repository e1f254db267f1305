import pytest
from hypothesis import given
from hypothesis import strategies as st

from thunder_tpu.text import expand_numbers, lower_text, normalize_text
from thunder_tpu.text.numbers import num2words


def test_lower_text():
    assert lower_text("HeLLo") == "hello"


def test_normalize_text_strips_accents():
    assert normalize_text("café São João") == "cafe Sao Joao"


@given(st.text())
def test_normalize_text_always_ascii(text):
    out = normalize_text(text)
    out.encode("ascii")  # must not raise


def test_num2words_en_cardinal():
    assert num2words(0) == "zero"
    assert num2words(42) == "forty-two"
    assert num2words(115) == "one hundred fifteen"
    assert num2words(1000) == "one thousand"
    assert num2words(1234567) == "one million two hundred thirty-four thousand five hundred sixty-seven"


def test_num2words_en_ordinal():
    assert num2words(1, to="ordinal") == "first"
    assert num2words(2, to="ordinal") == "second"
    assert num2words(3, to="ordinal") == "third"
    assert num2words(12, to="ordinal") == "twelfth"
    assert num2words(20, to="ordinal") == "twentieth"
    assert num2words(42, to="ordinal") == "forty-second"
    assert num2words(100, to="ordinal") == "one hundredth"


def test_num2words_pt():
    assert num2words(42, lang="pt") == "quarenta e dois"
    assert num2words(100, lang="pt") == "cem"
    assert num2words(101, lang="pt") == "cento e um"
    assert num2words(42, lang="pt", to="ordinal") == "quadragésimo segundo"


def test_num2words_unsupported_language():
    with pytest.raises(NotImplementedError):
        num2words(1, lang="zz")


def test_expand_numbers_cardinal():
    assert expand_numbers("i have 2 dogs") == "i have two dogs"


def test_expand_numbers_ordinal():
    assert expand_numbers("chegou em 42º lugar", language="pt") == "chegou em quadragésimo segundo lugar"


def test_expand_numbers_multiple():
    out = expand_numbers("10 plus 5")
    assert out == "ten plus five"
