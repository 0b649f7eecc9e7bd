"""Character-code -> glyph-name -> Unicode tables.

Re-implements the reference's encodingmap.py (4.6k lines of octal tables)
from public sources: the PDF 1.7 spec Appendix D encodings and the Adobe
Glyph List naming convention.  Construction is programmatic:

- StandardEncoding is derived from the Adobe Core-14 AFM character codes
  (data/std14_widths.json carries C values from the Helvetica AFM, whose
  EncodingScheme is AdobeStandardEncoding).
- WinAnsiEncoding is cp1252 (that is its definition) mapped through the
  reverse glyph list; MacRomanEncoding likewise via the mac-roman codec;
  PDFDocEncoding approximated by cp1252 (identical over the printable set).
- glyph-name -> unicode covers the AGL core: letters/digits/punctuation by
  explicit table, Latin-1..Latin-Extended accented names generated from
  Unicode decomposition names (the AGL convention is '<base><accent>', e.g.
  'aacute', 'Udieresis').
"""

from __future__ import annotations

import unicodedata

# --- explicit AGL core (public Adobe Glyph List data) -----------------------

_PUNCT = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22, "numbersign": 0x23,
    "dollar": 0x24, "percent": 0x25, "ampersand": 0x26, "quotesingle": 0x27,
    "parenleft": 0x28, "parenright": 0x29, "asterisk": 0x2A, "plus": 0x2B,
    "comma": 0x2C, "hyphen": 0x2D, "period": 0x2E, "slash": 0x2F,
    "colon": 0x3A, "semicolon": 0x3B, "less": 0x3C, "equal": 0x3D,
    "greater": 0x3E, "question": 0x3F, "at": 0x40, "bracketleft": 0x5B,
    "backslash": 0x5C, "bracketright": 0x5D, "asciicircum": 0x5E,
    "underscore": 0x5F, "grave": 0x60, "braceleft": 0x7B, "bar": 0x7C,
    "braceright": 0x7D, "asciitilde": 0x7E,
    # typographic set (cp1252 high block and friends)
    "quoteright": 0x2019, "quoteleft": 0x2018, "quotedblleft": 0x201C,
    "quotedblright": 0x201D, "quotesinglbase": 0x201A, "quotedblbase": 0x201E,
    "guilsinglleft": 0x2039, "guilsinglright": 0x203A, "guillemotleft": 0xAB,
    "guillemotright": 0xBB, "endash": 0x2013, "emdash": 0x2014,
    "bullet": 0x2022, "dagger": 0x2020, "daggerdbl": 0x2021,
    "ellipsis": 0x2026, "perthousand": 0x2030, "trademark": 0x2122,
    "florin": 0x192, "fraction": 0x2044, "Euro": 0x20AC,
    "cent": 0xA2, "sterling": 0xA3, "currency": 0xA4, "yen": 0xA5,
    "brokenbar": 0xA6, "section": 0xA7, "dieresis": 0xA8, "copyright": 0xA9,
    "ordfeminine": 0xAA, "logicalnot": 0xAC, "registered": 0xAE,
    "macron": 0xAF, "degree": 0xB0, "plusminus": 0xB1, "acute": 0xB4,
    "mu": 0xB5, "paragraph": 0xB6, "periodcentered": 0xB7, "cedilla": 0xB8,
    "ordmasculine": 0xBA, "onequarter": 0xBC, "onehalf": 0xBD,
    "threequarters": 0xBE, "questiondown": 0xBF, "exclamdown": 0xA1,
    "multiply": 0xD7, "divide": 0xF7, "onesuperior": 0xB9,
    "twosuperior": 0xB2, "threesuperior": 0xB3,
    "germandbls": 0xDF, "eth": 0xF0, "Eth": 0xD0, "thorn": 0xFE,
    "Thorn": 0xDE, "ae": 0xE6, "AE": 0xC6, "oe": 0x153, "OE": 0x152,
    "oslash": 0xF8, "Oslash": 0xD8, "dotlessi": 0x131,
    "lslash": 0x142, "Lslash": 0x141,
    "fi": 0xFB01, "fl": 0xFB02, "ff": 0xFB00, "ffi": 0xFB03, "ffl": 0xFB04,
    "circumflex": 0x2C6, "caron": 0x2C7, "breve": 0x2D8, "dotaccent": 0x2D9,
    "ring": 0x2DA, "ogonek": 0x2DB, "tilde": 0x2DC, "hungarumlaut": 0x2DD,
    "Scaron": 0x160, "scaron": 0x161, "Zcaron": 0x17D, "zcaron": 0x17E,
    "Ydieresis": 0x178,
    "minus": 0x2212, "nbspace": 0xA0, "softhyphen": 0xAD,
}

_ACCENTS = {
    "ACUTE": "acute", "GRAVE": "grave", "CIRCUMFLEX": "circumflex",
    "DIAERESIS": "dieresis", "TILDE": "tilde", "RING ABOVE": "ring",
    "CEDILLA": "cedilla", "CARON": "caron", "BREVE": "breve",
    "MACRON": "macron", "OGONEK": "ogonek", "DOT ABOVE": "dotaccent",
    "DOUBLE ACUTE": "hungarumlaut",
}


def _build_glyph2uni() -> dict[str, str]:
    g2u: dict[str, str] = {}
    for name, cp in _PUNCT.items():
        g2u[name] = chr(cp)
    for c in range(ord("A"), ord("Z") + 1):
        g2u[chr(c)] = chr(c)
        g2u[chr(c + 32)] = chr(c + 32)
    digits = ["zero", "one", "two", "three", "four", "five", "six", "seven",
              "eight", "nine"]
    for i, dn in enumerate(digits):
        g2u[dn] = chr(ord("0") + i)
    # AGL accented-letter names from Unicode character names
    for cp in list(range(0xC0, 0x180)):
        ch = chr(cp)
        try:
            uname = unicodedata.name(ch)
        except ValueError:
            continue
        if not uname.startswith("LATIN "):
            continue
        parts = uname.split(" WITH ")
        if len(parts) != 2 or parts[1] not in _ACCENTS:
            continue
        base_words = parts[0].split()
        base = base_words[-1]  # letter
        if len(base) != 1:
            continue
        if "SMALL" in base_words:
            base = base.lower()
        gname = base + _ACCENTS[parts[1]]
        g2u.setdefault(gname, ch)
    return g2u


GLYPH2UNI: dict[str, str] = _build_glyph2uni()
UNI2GLYPH: dict[str, str] = {}
for _n, _u in GLYPH2UNI.items():
    UNI2GLYPH.setdefault(_u, _n)


def glyph_to_unicode(name: str):
    """AGL lookup; returns None when unknown (reference:
    encodingmap.py:4672-4687 MapGlyphNameToUnicode)."""
    u = GLYPH2UNI.get(name)
    if u is not None:
        return u
    # uniXXXX / uXXXX[XX] AGL conventions
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    return None


# --- encoding maps (code -> glyph name) --------------------------------------


def _std_encoding() -> dict[int, str]:
    """AdobeStandardEncoding derived from the Helvetica AFM char codes."""
    from .afm import get_font_metrics

    fm = get_font_metrics("Helvetica")
    out = {}
    for gname, (code, _w) in fm.items():
        if code >= 0:
            out[code] = gname
    return out


def _codec_encoding(codec: str) -> dict[int, str]:
    out = {}
    for code in range(32, 256):
        try:
            ch = bytes([code]).decode(codec)
        except UnicodeDecodeError:
            continue
        g = UNI2GLYPH.get(ch)
        if g is not None:
            out[code] = g
    return out


def _win_encoding() -> dict[int, str]:
    out = _codec_encoding("cp1252")
    # Appendix D: 0xA0 is a duplicate of space; 0xAD a duplicate of hyphen.
    out[0xA0] = "space"
    out[0xAD] = "hyphen"
    return out


def _mac_encoding() -> dict[int, str]:
    out = _codec_encoding("mac_roman")
    out[0xCA] = "space"  # Appendix D: nbsp duplicate
    return out


_ENCODING_CACHE: dict[str, dict[int, str]] = {}

_NAMES = {
    "StandardEncoding": "Std", "MacRomanEncoding": "Mac",
    "WinAnsiEncoding": "Win", "PDFDocEncoding": "PDF",
    "Std": "Std", "Mac": "Mac", "Win": "Win", "PDF": "PDF",
}


def encoding_map(name: str) -> dict[int, str]:
    """code -> glyphname for a named base encoding (reference:
    encodingmap.py:4649-4670 MapCIDToGlyphName)."""
    short = _NAMES.get(name)
    if short is None:
        raise KeyError("unrecognized encoding map name: %r" % name)
    m = _ENCODING_CACHE.get(short)
    if m is None:
        if short == "Std":
            m = _std_encoding()
        elif short == "Win":
            m = _win_encoding()
        elif short == "Mac":
            m = _mac_encoding()
        else:  # PDFDocEncoding: printable set identical to cp1252 for our use
            m = _win_encoding()
        _ENCODING_CACHE[short] = m
    return m
