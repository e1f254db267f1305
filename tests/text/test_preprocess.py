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


def test_num2words_de_cardinal():
    assert num2words(0, lang="de") == "null"
    assert num2words(1, lang="de") == "eins"
    assert num2words(21, lang="de") == "einundzwanzig"
    assert num2words(101, lang="de") == "einhunderteins"
    assert num2words(121, lang="de") == "einhunderteinundzwanzig"
    assert num2words(1000, lang="de") == "eintausend"
    assert num2words(2345, lang="de") == "zweitausenddreihundertfünfundvierzig"
    assert num2words(1000000, lang="de") == "eine Million"
    assert num2words(2000030, lang="de") == "zwei Millionen dreißig"
    assert num2words(-7, lang="de") == "minus sieben"


def test_num2words_fr_cardinal():
    assert num2words(0, lang="fr") == "zéro"
    assert num2words(21, lang="fr") == "vingt et un"
    assert num2words(32, lang="fr") == "trente-deux"
    assert num2words(71, lang="fr") == "soixante et onze"
    assert num2words(75, lang="fr") == "soixante-quinze"
    assert num2words(80, lang="fr") == "quatre-vingts"
    assert num2words(81, lang="fr") == "quatre-vingt-un"
    assert num2words(95, lang="fr") == "quatre-vingt-quinze"
    assert num2words(100, lang="fr") == "cent"
    assert num2words(200, lang="fr") == "deux cents"
    assert num2words(201, lang="fr") == "deux cent un"
    assert num2words(280, lang="fr") == "deux cent quatre-vingts"
    assert num2words(1000, lang="fr") == "mille"
    assert num2words(1980, lang="fr") == "mille neuf cent quatre-vingts"
    assert num2words(2000000, lang="fr") == "deux millions"
    # vingt/cent keep their plural "s" before the nouns million/milliard
    assert num2words(80000000, lang="fr") == "quatre-vingts millions"
    assert num2words(200000000, lang="fr") == "deux cents millions"
    assert num2words(81000000, lang="fr") == "quatre-vingt-un millions"
    assert num2words(200000, lang="fr") == "deux cent mille"
    assert num2words(2500000000, lang="fr") == "deux milliards cinq cents millions"


def test_num2words_es_cardinal():
    assert num2words(16, lang="es") == "dieciséis"
    assert num2words(21, lang="es") == "veintiuno"
    assert num2words(31, lang="es") == "treinta y uno"
    assert num2words(100, lang="es") == "cien"
    assert num2words(101, lang="es") == "ciento uno"
    assert num2words(500, lang="es") == "quinientos"
    assert num2words(777, lang="es") == "setecientos setenta y siete"
    assert num2words(1000, lang="es") == "mil"
    assert num2words(21000, lang="es") == "veintiún mil"
    assert num2words(1000000, lang="es") == "un millón"
    assert num2words(2000000, lang="es") == "dos millones"
    # billions group by 10^6: the millions count is one cardinal
    assert num2words(1000000000, lang="es") == "mil millones"
    assert num2words(1500000000, lang="es") == "mil quinientos millones"
    assert num2words(2000000000, lang="es") == "dos mil millones"
    assert num2words(21000000, lang="es") == "veintiún millones"


def test_num2words_it_cardinal():
    assert num2words(21, lang="it") == "ventuno"
    assert num2words(23, lang="it") == "ventitré"
    assert num2words(28, lang="it") == "ventotto"
    assert num2words(100, lang="it") == "cento"
    assert num2words(180, lang="it") == "centottanta"
    assert num2words(365, lang="it") == "trecentosessantacinque"
    assert num2words(1000, lang="it") == "mille"
    assert num2words(2000, lang="it") == "duemila"
    assert num2words(1000000, lang="it") == "un milione"
    assert num2words(3000000, lang="it") == "tre milioni"


def test_num2words_ca_cardinal():
    assert num2words(18, lang="ca") == "divuit"
    assert num2words(21, lang="ca") == "vint-i-un"
    assert num2words(34, lang="ca") == "trenta-quatre"
    assert num2words(100, lang="ca") == "cent"
    assert num2words(200, lang="ca") == "dos-cents"
    assert num2words(245, lang="ca") == "dos-cents quaranta-cinc"
    assert num2words(1000, lang="ca") == "mil"
    assert num2words(1000000, lang="ca") == "un milió"
    assert num2words(2000000, lang="ca") == "dos milions"
    assert num2words(1000000000, lang="ca") == "mil milions"
    assert num2words(2500000000, lang="ca") == "dos mil cinc-cents milions"


def test_num2words_pl_cardinal():
    assert num2words(5, lang="pl") == "pięć"
    assert num2words(15, lang="pl") == "piętnaście"
    assert num2words(21, lang="pl") == "dwadzieścia jeden"
    assert num2words(100, lang="pl") == "sto"
    assert num2words(234, lang="pl") == "dwieście trzydzieści cztery"
    assert num2words(1000, lang="pl") == "tysiąc"
    assert num2words(2000, lang="pl") == "dwa tysiące"
    assert num2words(5000, lang="pl") == "pięć tysięcy"
    assert num2words(12000, lang="pl") == "dwanaście tysięcy"
    assert num2words(22000, lang="pl") == "dwadzieścia dwa tysiące"
    assert num2words(1000000, lang="pl") == "jeden milion"
    assert num2words(5000000, lang="pl") == "pięć milionów"


def test_num2words_ru_cardinal():
    assert num2words(0, lang="ru") == "ноль"
    assert num2words(21, lang="ru") == "двадцать один"
    assert num2words(40, lang="ru") == "сорок"
    assert num2words(90, lang="ru") == "девяносто"
    assert num2words(100, lang="ru") == "сто"
    assert num2words(555, lang="ru") == "пятьсот пятьдесят пять"
    assert num2words(1000, lang="ru") == "одна тысяча"
    assert num2words(2000, lang="ru") == "две тысячи"
    assert num2words(5000, lang="ru") == "пять тысяч"
    assert num2words(11000, lang="ru") == "одиннадцать тысяч"
    assert num2words(1000000, lang="ru") == "один миллион"
    assert num2words(2000000, lang="ru") == "два миллиона"
    assert num2words(5000000, lang="ru") == "пять миллионов"


def test_num2words_lang_codes_and_errors():
    import pytest

    assert num2words(3, lang="de_DE") == "drei"
    assert num2words(3, lang="fr-FR") == "trois"
    with pytest.raises(NotImplementedError):
        num2words(3, lang="xx")
    with pytest.raises(NotImplementedError):
        num2words(3, lang="de", to="ordinal")


def test_expand_numbers_new_languages():
    from thunder_tpu.text.preprocess import expand_numbers

    assert expand_numbers("hab 42 katzen", language="de") == "hab zweiundvierzig katzen"
    assert expand_numbers("j'ai 80 ans", language="fr") == "j'ai quatre-vingts ans"
    assert expand_numbers("tengo 21 gatos", language="es") == "tengo veintiuno gatos"


def test_num2words_it_tre_accent():
    # final 'tre' takes the accent in compounds; drops it before fused 'mila'
    assert num2words(3, lang="it") == "tre"
    assert num2words(103, lang="it") == "centotré"
    assert num2words(1003, lang="it") == "milletré"
    assert num2words(3000, lang="it") == "tremila"
    assert num2words(33033, lang="it") == "trentatremilatrentatré"
    assert num2words(23000000, lang="it") == "ventitré milioni"


def test_num2words_large_ranges():
    # billion-count composition above 10^12 (fr/de/it) and short-scale pt/en
    assert num2words(1_500_000_000_000, lang="fr") == "mille cinq cents milliards"
    assert num2words(1_500_000_000_000, lang="de") == "eintausendfünfhundert Milliarden"
    assert num2words(1_500_000_000_000, lang="it") == "millecinquecento miliardi"
    assert num2words(2_000_000_000_000, lang="en") == "two trillion"
    assert num2words(1_500_000_000, lang="pt") == "um bilhão e quinhentos milhões"
    # every language refuses beyond its correct range instead of emitting junk
    for lang, cap in (
        ("es", 10**12), ("ca", 10**12), ("pl", 10**12), ("ru", 10**12),
        ("pt", 10**12), ("fr", 10**15), ("de", 10**15), ("it", 10**15),
    ):
        with pytest.raises(ValueError, match="too large"):
            num2words(cap, lang=lang)
