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
        num2words(3, lang="xx", to="ordinal")


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


def test_num2words_de_ordinal():
    # reference expands ordinals in every num2words language
    # (/root/reference/src/thunder/text_processing/preprocess.py:48-68)
    assert num2words(1, lang="de", to="ordinal") == "erste"
    assert num2words(2, lang="de", to="ordinal") == "zweite"
    assert num2words(3, lang="de", to="ordinal") == "dritte"
    assert num2words(7, lang="de", to="ordinal") == "siebte"
    assert num2words(8, lang="de", to="ordinal") == "achte"
    assert num2words(11, lang="de", to="ordinal") == "elfte"
    assert num2words(20, lang="de", to="ordinal") == "zwanzigste"
    assert num2words(21, lang="de", to="ordinal") == "einundzwanzigste"
    assert num2words(42, lang="de", to="ordinal") == "zweiundvierzigste"
    assert num2words(100, lang="de", to="ordinal") == "einhundertste"
    assert num2words(101, lang="de", to="ordinal") == "einhunderterste"
    assert num2words(103, lang="de", to="ordinal") == "einhundertdritte"
    assert num2words(1000, lang="de", to="ordinal") == "eintausendste"
    assert num2words(1000000, lang="de", to="ordinal") == "einmillionste"


def test_num2words_fr_ordinal():
    assert num2words(1, lang="fr", to="ordinal") == "premier"
    assert num2words(2, lang="fr", to="ordinal") == "deuxième"
    assert num2words(3, lang="fr", to="ordinal") == "troisième"
    assert num2words(4, lang="fr", to="ordinal") == "quatrième"
    assert num2words(5, lang="fr", to="ordinal") == "cinquième"
    assert num2words(9, lang="fr", to="ordinal") == "neuvième"
    assert num2words(10, lang="fr", to="ordinal") == "dixième"
    assert num2words(17, lang="fr", to="ordinal") == "dix-septième"
    assert num2words(21, lang="fr", to="ordinal") == "vingt et unième"
    assert num2words(42, lang="fr", to="ordinal") == "quarante-deuxième"
    assert num2words(71, lang="fr", to="ordinal") == "soixante et onzième"
    assert num2words(80, lang="fr", to="ordinal") == "quatre-vingtième"
    assert num2words(100, lang="fr", to="ordinal") == "centième"
    assert num2words(1000, lang="fr", to="ordinal") == "millième"


def test_num2words_es_ordinal():
    assert num2words(1, lang="es", to="ordinal") == "primero"
    assert num2words(3, lang="es", to="ordinal") == "tercero"
    assert num2words(10, lang="es", to="ordinal") == "décimo"
    assert num2words(11, lang="es", to="ordinal") == "undécimo"
    assert num2words(12, lang="es", to="ordinal") == "duodécimo"
    assert num2words(13, lang="es", to="ordinal") == "decimotercero"
    assert num2words(17, lang="es", to="ordinal") == "decimoséptimo"
    assert num2words(18, lang="es", to="ordinal") == "decimoctavo"
    assert num2words(21, lang="es", to="ordinal") == "vigésimo primero"
    assert num2words(42, lang="es", to="ordinal") == "cuadragésimo segundo"
    assert num2words(100, lang="es", to="ordinal") == "centésimo"
    assert num2words(500, lang="es", to="ordinal") == "quingentésimo"
    assert num2words(1000, lang="es", to="ordinal") == "milésimo"
    assert num2words(2000, lang="es", to="ordinal") == "dosmilésimo"


def test_num2words_it_ordinal():
    assert num2words(1, lang="it", to="ordinal") == "primo"
    assert num2words(3, lang="it", to="ordinal") == "terzo"
    assert num2words(8, lang="it", to="ordinal") == "ottavo"
    assert num2words(10, lang="it", to="ordinal") == "decimo"
    assert num2words(11, lang="it", to="ordinal") == "undicesimo"
    assert num2words(20, lang="it", to="ordinal") == "ventesimo"
    assert num2words(21, lang="it", to="ordinal") == "ventunesimo"
    assert num2words(23, lang="it", to="ordinal") == "ventitreesimo"
    assert num2words(26, lang="it", to="ordinal") == "ventiseiesimo"
    assert num2words(28, lang="it", to="ordinal") == "ventottesimo"
    assert num2words(42, lang="it", to="ordinal") == "quarantaduesimo"
    assert num2words(100, lang="it", to="ordinal") == "centesimo"
    assert num2words(1000, lang="it", to="ordinal") == "millesimo"
    assert num2words(2000, lang="it", to="ordinal") == "duemilesimo"
    assert num2words(1000000, lang="it", to="ordinal") == "milionesimo"


def test_num2words_ca_ordinal():
    assert num2words(1, lang="ca", to="ordinal") == "primer"
    assert num2words(2, lang="ca", to="ordinal") == "segon"
    assert num2words(3, lang="ca", to="ordinal") == "tercer"
    assert num2words(4, lang="ca", to="ordinal") == "quart"
    assert num2words(5, lang="ca", to="ordinal") == "cinquè"
    assert num2words(10, lang="ca", to="ordinal") == "desè"
    assert num2words(11, lang="ca", to="ordinal") == "onzè"
    assert num2words(19, lang="ca", to="ordinal") == "dinovè"
    assert num2words(20, lang="ca", to="ordinal") == "vintè"
    assert num2words(21, lang="ca", to="ordinal") == "vint-i-unè"
    assert num2words(25, lang="ca", to="ordinal") == "vint-i-cinquè"
    assert num2words(30, lang="ca", to="ordinal") == "trentè"
    assert num2words(42, lang="ca", to="ordinal") == "quaranta-dosè"
    assert num2words(100, lang="ca", to="ordinal") == "centè"
    assert num2words(200, lang="ca", to="ordinal") == "dos-centè"
    assert num2words(1000, lang="ca", to="ordinal") == "milè"


def test_num2words_pl_ordinal():
    assert num2words(1, lang="pl", to="ordinal") == "pierwszy"
    assert num2words(3, lang="pl", to="ordinal") == "trzeci"
    assert num2words(11, lang="pl", to="ordinal") == "jedenasty"
    assert num2words(20, lang="pl", to="ordinal") == "dwudziesty"
    assert num2words(21, lang="pl", to="ordinal") == "dwudziesty pierwszy"
    assert num2words(42, lang="pl", to="ordinal") == "czterdziesty drugi"
    assert num2words(100, lang="pl", to="ordinal") == "setny"
    assert num2words(121, lang="pl", to="ordinal") == "sto dwudziesty pierwszy"
    assert num2words(200, lang="pl", to="ordinal") == "dwusetny"
    assert num2words(1000, lang="pl", to="ordinal") == "tysięczny"
    assert num2words(2000, lang="pl", to="ordinal") == "dwutysięczny"
    assert num2words(1200, lang="pl", to="ordinal") == "tysiąc dwusetny"
    assert num2words(1000000, lang="pl", to="ordinal") == "milionowy"


def test_num2words_ru_ordinal():
    assert num2words(1, lang="ru", to="ordinal") == "первый"
    assert num2words(3, lang="ru", to="ordinal") == "третий"
    assert num2words(4, lang="ru", to="ordinal") == "четвёртый"
    assert num2words(11, lang="ru", to="ordinal") == "одиннадцатый"
    assert num2words(20, lang="ru", to="ordinal") == "двадцатый"
    assert num2words(21, lang="ru", to="ordinal") == "двадцать первый"
    assert num2words(40, lang="ru", to="ordinal") == "сороковой"
    assert num2words(42, lang="ru", to="ordinal") == "сорок второй"
    assert num2words(100, lang="ru", to="ordinal") == "сотый"
    assert num2words(121, lang="ru", to="ordinal") == "сто двадцать первый"
    assert num2words(200, lang="ru", to="ordinal") == "двухсотый"
    assert num2words(1000, lang="ru", to="ordinal") == "тысячный"
    assert num2words(2000, lang="ru", to="ordinal") == "двухтысячный"
    assert num2words(1000000, lang="ru", to="ordinal") == "миллионный"
    assert num2words(2000000, lang="ru", to="ordinal") == "двухмиллионный"


def test_expand_numbers_ordinal_all_languages():
    # the "42º" form from the reference's docs, per registered-checkpoint
    # language
    for lang, want in [
        ("en", "forty-second"),
        ("pt", "quadragésimo segundo"),
        ("de", "zweiundvierzigste"),
        ("fr", "quarante-deuxième"),
        ("es", "cuadragésimo segundo"),
        ("it", "quarantaduesimo"),
        ("ca", "quaranta-dosè"),
        ("pl", "czterdziesty drugi"),
        ("ru", "сорок второй"),
    ]:
        assert expand_numbers("42º", language=lang) == want


def test_ordinal_rejects_nonpositive():
    for lang in ("de", "fr", "es", "it", "ca", "pl", "ru"):
        with pytest.raises(ValueError):
            num2words(0, lang=lang, to="ordinal")
