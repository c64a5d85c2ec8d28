"""Simple-font encodings for the PDF text layer (PDF 32000-1 §9.6.6
and Annex D): /WinAnsiEncoding, /MacRomanEncoding, /StandardEncoding
base tables plus /Differences arrays of glyph NAMES, resolved to
Unicode the way poppler's GlobalParams/NameToUnicode path does
(internal/extractor/poppler.go shells out to pdftotext, which applies
exactly these tables before emitting UTF-8).

Coverage posture, mirroring the other kernels' documented-subset
style:

- WinAnsiEncoding IS windows-1252 over the defined range — built
  from Python's cp1252 codec, with the five undefined codes
  (0x81 0x8D 0x8F 0x90 0x9D) left unmapped (identity fallback).
- MacRomanEncoding follows Python's mac_roman codec.  Divergence:
  Adobe's table names 0xCA 'space' where the Mac OS charset (and the
  codec) has U+00A0 NO-BREAK SPACE; the codec's reading is kept —
  both render as a space and cleanText treats them alike.
- StandardEncoding is typed in from Annex D (the defined range is
  sparse; codes outside it fall back to identity).
- Glyph names resolve via, in order: the AGL uniXXXX / uXXXXXX
  algorithmic forms, a generated Latin table (letter + accent-suffix
  names looked up through unicodedata, so 'aacute'/'Edieresis'/
  'zcaron' and friends never need hand-typing), and an explicit
  punctuation/symbol table for the names unicodedata cannot derive.
  Unknown names map to nothing (identity fallback), never to a
  wrong character.
"""

from __future__ import annotations

import unicodedata

_ASCII_NAMES = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22,
    "numbersign": 0x23, "dollar": 0x24, "percent": 0x25,
    "ampersand": 0x26, "quotesingle": 0x27, "parenleft": 0x28,
    "parenright": 0x29, "asterisk": 0x2A, "plus": 0x2B,
    "comma": 0x2C, "hyphen": 0x2D, "period": 0x2E, "slash": 0x2F,
    "zero": 0x30, "one": 0x31, "two": 0x32, "three": 0x33,
    "four": 0x34, "five": 0x35, "six": 0x36, "seven": 0x37,
    "eight": 0x38, "nine": 0x39, "colon": 0x3A, "semicolon": 0x3B,
    "less": 0x3C, "equal": 0x3D, "greater": 0x3E, "question": 0x3F,
    "at": 0x40, "bracketleft": 0x5B, "backslash": 0x5C,
    "bracketright": 0x5D, "asciicircum": 0x5E, "underscore": 0x5F,
    "grave": 0x60, "braceleft": 0x7B, "bar": 0x7C,
    "braceright": 0x7D, "asciitilde": 0x7E,
}

# Names whose characters unicodedata cannot derive from the glyph
# name itself (AGL punctuation, ligatures, currency, symbols).
_SYMBOL_NAMES = {
    "quoteleft": 0x2018, "quoteright": 0x2019,
    "quotesinglbase": 0x201A, "quotedblleft": 0x201C,
    "quotedblright": 0x201D, "quotedblbase": 0x201E,
    "endash": 0x2013, "emdash": 0x2014, "bullet": 0x2022,
    "ellipsis": 0x2026, "dagger": 0x2020, "daggerdbl": 0x2021,
    "perthousand": 0x2030, "guilsinglleft": 0x2039,
    "guilsinglright": 0x203A, "guillemotleft": 0x00AB,
    "guillemotright": 0x00BB, "florin": 0x0192, "fraction": 0x2044,
    "trademark": 0x2122, "copyright": 0x00A9, "registered": 0x00AE,
    "degree": 0x00B0, "plusminus": 0x00B1, "multiply": 0x00D7,
    "divide": 0x00F7, "logicalnot": 0x00AC, "mu": 0x00B5,
    "paragraph": 0x00B6, "section": 0x00A7,
    "periodcentered": 0x00B7, "cent": 0x00A2, "sterling": 0x00A3,
    "yen": 0x00A5, "currency": 0x00A4, "exclamdown": 0x00A1,
    "questiondown": 0x00BF, "brokenbar": 0x00A6,
    "ordfeminine": 0x00AA, "ordmasculine": 0x00BA,
    "onequarter": 0x00BC, "onehalf": 0x00BD,
    "threequarters": 0x00BE, "onesuperior": 0x00B9,
    "twosuperior": 0x00B2, "threesuperior": 0x00B3,
    "acute": 0x00B4, "dieresis": 0x00A8, "cedilla": 0x00B8,
    "macron": 0x00AF, "Euro": 0x20AC, "fi": 0xFB01, "fl": 0xFB02,
    "germandbls": 0x00DF, "AE": 0x00C6, "ae": 0x00E6,
    "OE": 0x0152, "oe": 0x0153, "Oslash": 0x00D8, "oslash": 0x00F8,
    "Thorn": 0x00DE, "thorn": 0x00FE, "Eth": 0x00D0, "eth": 0x00F0,
    "Lslash": 0x0141, "lslash": 0x0142, "dotlessi": 0x0131,
    "minus": 0x2212, "breve": 0x02D8, "dotaccent": 0x02D9,
    "ring": 0x02DA, "ogonek": 0x02DB, "tilde": 0x02DC,
    "hungarumlaut": 0x02DD, "caron": 0x02C7, "circumflex": 0x02C6,
    "nbspace": 0x00A0, "sfthyphen": 0x00AD,
}

_ACCENT_SUFFIXES = {
    "acute": "ACUTE", "grave": "GRAVE", "circumflex": "CIRCUMFLEX",
    "dieresis": "DIAERESIS", "tilde": "TILDE", "ring": "RING ABOVE",
    "cedilla": "CEDILLA", "macron": "MACRON", "breve": "BREVE",
    "caron": "CARON", "ogonek": "OGONEK",
    "hungarumlaut": "DOUBLE ACUTE", "slash": "STROKE",
    "dotaccent": "DOT ABOVE",
}


def _build_glyph_table() -> dict[str, str]:
    table: dict[str, str] = {}
    for name, cp in _ASCII_NAMES.items():
        table[name] = chr(cp)
    for c in "abcdefghijklmnopqrstuvwxyz":
        table[c] = c
        table[c.upper()] = c.upper()
    # 'aacute' / 'Edieresis' / 'zcaron' ... via unicodedata — never
    # hand-typed, so the accent table cannot drift from Unicode
    for base in "abcdefghijklmnopqrstuvwxyz":
        for case_name, letter in (("SMALL", base), ("CAPITAL",
                                                    base.upper())):
            for suffix, uname in _ACCENT_SUFFIXES.items():
                try:
                    ch = unicodedata.lookup(
                        f"LATIN {case_name} LETTER "
                        f"{base.upper()} WITH {uname}")
                except KeyError:
                    continue
                table[letter + suffix] = ch
    for name, cp in _SYMBOL_NAMES.items():
        table[name] = chr(cp)
    return table


_GLYPH_TABLE = _build_glyph_table()


def glyph_to_char(name: str) -> str | None:
    """AGL-style glyph name -> character, or None when unknown."""
    if not name:
        return None
    hit = _GLYPH_TABLE.get(name)
    if hit is not None:
        return hit
    if name.startswith("uni") and len(name) >= 7 \
            and (len(name) - 3) % 4 == 0:
        # uniXXXX or a uniXXXXYYYY... sequence (AGL §3)
        chars = []
        for i in range(3, len(name), 4):
            try:
                cp = int(name[i:i + 4], 16)
            except ValueError:
                return None
            if 0xD800 <= cp <= 0xDFFF:
                return None
            chars.append(chr(cp))
        return "".join(chars)
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            cp = int(name[1:], 16)
        except ValueError:
            return None
        if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            return None
        return chr(cp)
    return None


def _codec_table(codec: str, undefined: tuple[int, ...]) -> dict[int, str]:
    out: dict[int, str] = {}
    for code in range(0x20, 0x100):
        if code in undefined:
            continue
        try:
            out[code] = bytes([code]).decode(codec)
        except UnicodeDecodeError:
            continue
    return out


WIN_ANSI = _codec_table("cp1252", undefined=(0x81, 0x8D, 0x8F, 0x90,
                                             0x9D, 0x7F))
MAC_ROMAN = _codec_table("mac_roman", undefined=(0x7F,))

# Annex D StandardEncoding: ASCII with the quote deviations, then the
# sparse 0xA1-0xFB punctuation/ligature/accent range.  Codes absent
# here are undefined in the table and fall back to identity.
STANDARD: dict[int, str] = {
    **{c: chr(c) for c in range(0x20, 0x7F)},
    0x27: "’",   # quoteright
    0x60: "‘",   # quoteleft
    0xA1: "¡", 0xA2: "¢", 0xA3: "£", 0xA4: "⁄",
    0xA5: "¥", 0xA6: "ƒ", 0xA7: "§", 0xA8: "¤",
    0xA9: "'", 0xAA: "“", 0xAB: "«", 0xAC: "‹",
    0xAD: "›", 0xAE: "ﬁ", 0xAF: "ﬂ",
    0xB1: "–", 0xB2: "†", 0xB3: "‡", 0xB4: "·",
    0xB6: "¶", 0xB7: "•", 0xB8: "‚", 0xB9: "„",
    0xBA: "”", 0xBB: "»", 0xBC: "…", 0xBD: "‰",
    0xBF: "¿", 0xC1: "`", 0xC2: "´", 0xC3: "ˆ",
    0xC4: "˜", 0xC5: "¯", 0xC6: "˘", 0xC7: "˙",
    0xC8: "¨", 0xCA: "˚", 0xCB: "¸", 0xCD: "˝",
    0xCE: "˛", 0xCF: "ˇ", 0xD0: "—",
    0xE1: "Æ", 0xE3: "ª", 0xE8: "Ł", 0xE9: "Ø",
    0xEA: "Œ", 0xEB: "º", 0xF1: "æ", 0xF5: "ı",
    0xF8: "ł", 0xF9: "ø", 0xFA: "œ", 0xFB: "ß",
}

_BASE_ENCODINGS = {
    "WinAnsiEncoding": WIN_ANSI,
    "MacRomanEncoding": MAC_ROMAN,
    "StandardEncoding": STANDARD,
}


def base_encoding(name: str) -> dict[int, str] | None:
    """Base-encoding name (no slash) -> code->char table, or None for
    names this subset does not carry (MacExpertEncoding)."""
    return _BASE_ENCODINGS.get(name)


def apply_differences(base: dict[int, str] | None,
                      differences: list[int | str]) -> dict[int, str]:
    """/Differences array (ints and glyph names, PDF §9.6.6.1) over a
    copy of the base table.  Unknown glyph names REMOVE the code's
    mapping (identity fallback) rather than guessing."""
    table = dict(base) if base else {}
    code = 0
    for item in differences:
        if isinstance(item, int):
            code = item
            continue
        ch = glyph_to_char(item)
        if ch is not None:
            table[code] = ch
        else:
            table.pop(code, None)
        code += 1
    return table
