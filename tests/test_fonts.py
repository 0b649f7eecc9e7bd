"""Font/encoding/CMap layer tests (SURVEY.md §2.6 quirks)."""

import pytest

from pypdfproc_spark.core import afm
from pypdfproc_spark.core.encodings import encoding_map, glyph_to_unicode
from pypdfproc_spark.core.fonts import (
    FontError,
    cid_width_array_to_map,
    compile_cmap,
    differences_array_to_map,
    identity_mapper,
)


def test_cid_width_start_array_form():
    m = cid_width_array_to_map([72, [600, 610, 620]])
    assert m == {72: 600, 73: 610, 74: 620}


def test_cid_width_range_form():
    m = cid_width_array_to_map([101, 103, 550])
    assert m == {101: 550, 102: 550, 103: 550}


def test_cid_width_mixed():
    m = cid_width_array_to_map([1, [10], 5, 6, 20])
    assert m == {1: 10, 5: 20, 6: 20}


def test_differences_map():
    m = differences_array_to_map([65, "A", "B", 97, "ga", "gb"])
    assert m == {65: "A", 66: "B", 97: "ga", 98: "gb"}


def test_cmap_bfchar_and_bfrange():
    cmap = (b"begincmap\n"
            b"2 beginbfchar\n<61> <0041>\n<62> <0042>\nendbfchar\n"
            b"1 beginbfrange\n<70> <72> <0050>\nendbfrange\n"
            b"endcmap")
    mapper = compile_cmap(cmap)
    assert mapper(0x61) == "A"
    assert mapper(0x62) == "B"
    assert mapper(0x70) == "P" and mapper(0x72) == "R"
    with pytest.raises(KeyError):
        mapper(0x99)


def test_cmap_cidrange():
    cmap = b"1 begincidrange\n<00> <ff> 0\nendcidrange\n"
    mapper = compile_cmap(cmap)
    assert mapper(0x41) == "A"


def test_cmap_bfrange_array_form_unsupported():
    cmap = b"1 beginbfrange\n<61> <62> [<0041> <0042>]\nendbfrange\n"
    with pytest.raises(FontError):
        compile_cmap(cmap)


def test_identity_mapper():
    assert identity_mapper(0x48) == "H"
    assert identity_mapper(0xFFFF) == "￿"
    with pytest.raises(KeyError):
        identity_mapper(0x10000)


def test_standard_encoding_ascii():
    m = encoding_map("StandardEncoding")
    assert m[65] == "A"
    assert m[32] == "space"
    assert m[97] == "a"
    # StandardEncoding quotes: 39 is quoteright, 96 is quoteleft
    assert m[39] == "quoteright"
    assert m[96] == "quoteleft"


def test_winansi_encoding():
    m = encoding_map("WinAnsiEncoding")
    assert m[65] == "A"
    assert m[39] == "quotesingle"
    assert m[0x92] == "quoteright"  # cp1252 high block
    assert m[0xE9] == "eacute"


def test_glyph_to_unicode():
    assert glyph_to_unicode("A") == "A"
    assert glyph_to_unicode("space") == " "
    assert glyph_to_unicode("eacute") == "é"
    assert glyph_to_unicode("fi") == "ﬁ"
    assert glyph_to_unicode("uni20AC") == "€"
    assert glyph_to_unicode("nosuchglyphname") is None


def test_afm_helvetica():
    fm = afm.get_font_metrics("Helvetica")
    assert fm["space"][0] == 32
    assert fm["A"][1] > 0
    # STRICT verbatim lookup by default (reference parity, fixture f40);
    # tag/alias normalization only on explicit opt-in
    with pytest.raises(afm.UnknownFontError):
        afm.get_font_metrics("ABCDEF+Helvetica")
    with pytest.raises(afm.UnknownFontError):
        afm.get_font_metrics("Arial")
    assert afm.get_font_metrics("ABCDEF+Helvetica", normalize=True) is fm
    assert afm.get_font_metrics("Arial", normalize=True) is fm
    with pytest.raises(afm.UnknownFontError):
        afm.get_font_metrics("NoSuchFont")


def test_synthesized_widths_contiguous():
    fm = afm.get_font_metrics("Helvetica")
    widths, first, last = afm.synthesized_widths(fm, None, None)
    assert first == 32
    assert len(widths) == (max(c for c, _ in fm.values()) - 32 + 1)
    assert widths[0] == fm["space"][1]
    assert all(w >= 0 for w in widths)
