"""Standard-14 font metrics (Adobe Core AFM data, public).

The reference lexes the full AFM files from StandardFonts_AFM.zip at runtime
(parser/fontmetrics.py:17-346, fontmetrics.py:18-292).  The new engine ships
only the fields extraction needs — per-glyph character code and horizontal
width — as a compact JSON (data/std14_widths.json), loaded once per executor
at module import (the reference's lazy _StandardFonts singleton,
__init__.py:54-62, made explicit).

JSON shape: {fontname: {glyphname: [C, WX]}} in AFM file order (order matters
for float-sum parity of the average-width heuristic, __init__.py:574-581).
"""

from __future__ import annotations

import json
import os

_DATA_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "std14_widths.json",
)

_FONTS: dict[str, dict[str, list]] | None = None

# Aliases commonly seen for the base-14 (public base-14 alias list)
_ALIASES = {
    "Arial": "Helvetica",
    "Arial-Bold": "Helvetica-Bold",
    "Arial-BoldItalic": "Helvetica-BoldOblique",
    "Arial-Italic": "Helvetica-Oblique",
    "ArialMT": "Helvetica",
    "Arial-BoldMT": "Helvetica-Bold",
    "CourierNew": "Courier",
    "TimesNewRoman": "Times-Roman",
    "TimesNewRomanPSMT": "Times-Roman",
    "Times": "Times-Roman",
}


def _load() -> dict:
    global _FONTS
    if _FONTS is None:
        with open(_DATA_PATH) as fh:
            _FONTS = json.load(fh)
    return _FONTS


class UnknownFontError(KeyError):
    pass


def get_font_metrics(basefont: str) -> dict[str, list]:
    """glyphname -> [C, WX] for a standard-14 BaseFont.

    Subset-tagged names ("ABCDEF+Helvetica") are untagged first; unknown
    fonts raise (reference: FontMetricsManager.__getitem__ KeyError path)."""
    fonts = _load()
    name = basefont
    if "+" in name:
        name = name.split("+", 1)[1]
    name = _ALIASES.get(name, name)
    fm = fonts.get(name)
    if fm is None:
        raise UnknownFontError(basefont)
    return fm


def synthesized_widths(fm: dict[str, list], first_char, last_char):
    """Build the contiguous per-cid widths list exactly as the reference's
    GetFontWidths does for AFM-backed fonts (__init__.py:160-213):
    min/max cid over encoded glyphs, FirstChar/LastChar defaults, zeros for
    holes, entries filtered to [FirstChar, LastChar].

    Returns (widths_list, first_char, last_char).
    """
    mincid, maxcid = 256, 0
    by_cid_all = {}
    for gname, (c, w) in fm.items():
        if c == -1:
            continue
        if c < mincid:
            mincid = c
        if c > maxcid:
            maxcid = c
        by_cid_all[c] = w
    if first_char is None:
        first_char = mincid
    if last_char is None:
        last_char = maxcid
    by_cid = {
        c: w for c, w in by_cid_all.items() if first_char <= c <= last_char
    }
    for i in range(mincid, maxcid + 1):
        if i not in by_cid:
            by_cid[i] = 0
    return [by_cid[c] for c in sorted(by_cid)], first_char, last_char
