"""Number-to-words expansion (in-repo replacement for the num2words dep).

The reference uses the ``num2words`` package
(`/root/reference/src/thunder/text_processing/preprocess.py:44-68`); that
package is not in this image, so cardinal and ordinal spell-out are
implemented here for English and Portuguese (the languages exercised by the
reference's docs/tests, e.g. the "42º" ordinal example).
"""

from __future__ import annotations

__all__ = ["num2words"]

_EN_UNITS = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_EN_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy", "eighty", "ninety"]
_EN_SCALE = [(10**9, "billion"), (10**6, "million"), (10**3, "thousand")]
_EN_ORD_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _en_cardinal(n: int) -> str:
    if n < 0:
        return "minus " + _en_cardinal(-n)
    if n < 20:
        return _EN_UNITS[n]
    if n < 100:
        tens, unit = divmod(n, 10)
        return _EN_TENS[tens] + ("-" + _EN_UNITS[unit] if unit else "")
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        out = _EN_UNITS[hundreds] + " hundred"
        return out + (" " + _en_cardinal(rest) if rest else "")
    for scale, name in _EN_SCALE:
        if n >= scale:
            major, rest = divmod(n, scale)
            out = _en_cardinal(major) + " " + name
            return out + (" " + _en_cardinal(rest) if rest else "")
    raise ValueError(f"number too large: {n}")


def _en_ordinal(n: int) -> str:
    words = _en_cardinal(n)
    # only the final word changes
    head, sep, last = words.rpartition(" ")
    h2, s2, l2 = last.rpartition("-")
    prefix = head + sep + h2 + s2
    word = l2
    if word in _EN_ORD_IRREGULAR:
        word = _EN_ORD_IRREGULAR[word]
    elif word.endswith("y"):
        word = word[:-1] + "ieth"
    else:
        word = word + "th"
    return prefix + word


_PT_UNITS = [
    "zero", "um", "dois", "três", "quatro", "cinco", "seis", "sete", "oito",
    "nove", "dez", "onze", "doze", "treze", "quatorze", "quinze", "dezesseis",
    "dezessete", "dezoito", "dezenove",
]
_PT_TENS = ["", "", "vinte", "trinta", "quarenta", "cinquenta", "sessenta", "setenta", "oitenta", "noventa"]
_PT_HUNDREDS = [
    "", "cento", "duzentos", "trezentos", "quatrocentos", "quinhentos",
    "seiscentos", "setecentos", "oitocentos", "novecentos",
]
_PT_ORD_UNITS = [
    "", "primeiro", "segundo", "terceiro", "quarto", "quinto", "sexto",
    "sétimo", "oitavo", "nono",
]
_PT_ORD_TENS = [
    "", "décimo", "vigésimo", "trigésimo", "quadragésimo", "quinquagésimo",
    "sexagésimo", "septuagésimo", "octogésimo", "nonagésimo",
]
_PT_ORD_HUNDREDS = [
    "", "centésimo", "ducentésimo", "trecentésimo", "quadringentésimo",
    "quingentésimo", "sexcentésimo", "septingentésimo", "octingentésimo",
    "nongentésimo",
]


def _pt_cardinal(n: int) -> str:
    if n < 0:
        return "menos " + _pt_cardinal(-n)
    if n < 20:
        return _PT_UNITS[n]
    if n < 100:
        tens, unit = divmod(n, 10)
        return _PT_TENS[tens] + (" e " + _PT_UNITS[unit] if unit else "")
    if n == 100:
        return "cem"
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        return _PT_HUNDREDS[hundreds] + (" e " + _pt_cardinal(rest) if rest else "")
    if n < 10**6:
        thousands, rest = divmod(n, 1000)
        head = "mil" if thousands == 1 else _pt_cardinal(thousands) + " mil"
        if not rest:
            return head
        sep = " e " if (rest < 100 or rest % 100 == 0) else " "
        return head + sep + _pt_cardinal(rest)
    if n < 10**9:
        millions, rest = divmod(n, 10**6)
        head = "um milhão" if millions == 1 else _pt_cardinal(millions) + " milhões"
        return head + (" e " + _pt_cardinal(rest) if rest else "")
    raise ValueError(f"number too large: {n}")


def _pt_ordinal(n: int) -> str:
    if n <= 0:
        raise ValueError("ordinal must be positive")
    parts = []
    if n >= 1000:
        thousands, n = divmod(n, 1000)
        parts.append(("milésimo" if thousands == 1 else _pt_cardinal(thousands) + " milésimo"))
    if n >= 100:
        hundreds, n = divmod(n, 100)
        parts.append(_PT_ORD_HUNDREDS[hundreds])
    if n >= 10:
        tens, n = divmod(n, 10)
        parts.append(_PT_ORD_TENS[tens])
    if n > 0:
        parts.append(_PT_ORD_UNITS[n])
    return " ".join(p for p in parts if p)


def num2words(number: int, lang: str = "en", to: str = "cardinal") -> str:
    """Spell out ``number`` in ``lang`` ("en" or "pt"), cardinal or ordinal."""
    number = int(number)
    if lang.startswith("en"):
        return _en_ordinal(number) if to == "ordinal" else _en_cardinal(number)
    if lang.startswith("pt"):
        return _pt_ordinal(number) if to == "ordinal" else _pt_cardinal(number)
    raise NotImplementedError(f"language not supported: {lang} (supported: en, pt)")
