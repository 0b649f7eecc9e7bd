"""Extended AFM accessor layer (reference fontmetrics.py:119-292): widths,
char records, ligatures, kerning — incl. the reference's parse quirks
(drop-last-record, off-by-one ligature base), which tools/gen_afm_ext.py
verified differentially against the actual reference parser at freeze time."""

import pytest

from pypdfproc_spark.core.afm import (
    UnknownFontError,
    get_character,
    get_kerning_pairs_for_char,
    get_ligatures_backward,
    get_ligatures_forward,
    get_width,
    get_width_x,
    get_width_y,
    get_widths,
)


def test_get_character_by_name():
    c = get_character("Times-Roman", "f")
    assert c == {"C": 102, "N": "f", "W": (333, 0), "B": [20, 0, 383, 683]}


def test_get_character_unknown_returns_none():
    assert get_character("Times-Roman", "nosuchglyph") is None


def test_get_character_last_record_dropped_quirk():
    # the reference's commit-on-next-C loop never commits the final record
    # (always the unencoded Euro); mirrored
    assert get_character("Times-Roman", "Euro") is None
    assert get_character("Courier", "Euro") is None


def test_get_character_int_is_broken_by_bug_parity():
    with pytest.raises(ValueError):
        get_character("Times-Roman", 102)


def test_get_character_bad_type():
    with pytest.raises(TypeError):
        get_character("Times-Roman", 1.5)


def test_widths_accessors():
    ws = get_widths("Courier")
    assert ws["space"] == (600, 0)  # Courier is fixed-pitch
    assert get_width("Times-Roman", "f") == (333, 0)
    assert get_width_x("Times-Roman", "f") == 333
    assert get_width_y("Times-Roman", "f") == 0
    assert get_width("Times-Roman", "nosuchglyph") is None
    assert get_width_x("Times-Roman", "nosuchglyph") is None


def test_ligatures_off_by_one_base_quirk():
    # Times-Roman's "f" line carries "L i fi ; L l fl", but the reference
    # attributes both to the PREVIOUSLY committed record ("e"); mirrored
    assert get_ligatures_forward("Times-Roman", "e") == [
        {"base": "e", "successor": "i", "ligature": "fi"},
        {"base": "e", "successor": "l", "ligature": "fl"},
    ]
    assert get_ligatures_forward("Times-Roman", "f") == []


def test_ligatures_backward():
    assert get_ligatures_backward("Times-Roman", "fl") == [
        {"base": "e", "successor": "l", "ligature": "fl"}
    ]
    assert get_ligatures_backward("Times-Roman", "ae") == []


def test_kerning_pairs():
    k = get_kerning_pairs_for_char("Times-Roman", "A")
    # values are (dx, 0) tuples, as the reference stores KPX
    assert k["C"] == (-40, 0)
    assert k["G"] == (-40, 0)
    assert all(v[1] == 0 for v in k.values())


def test_kerning_no_pairs_for_fixed_pitch():
    assert get_kerning_pairs_for_char("Courier", "A") == {}


def test_strict_lookup_mirrors_reference():
    """The reference looks BaseFont up VERBATIM — subset tags and aliases
    KeyError (page drop, fixture f40); normalization is an explicit
    beyond-parity opt-in."""
    from pypdfproc_spark.core.afm import get_font_metrics, normalize_basefont

    with pytest.raises(UnknownFontError):
        get_font_metrics("ABCDEF+Helvetica")
    with pytest.raises(UnknownFontError):
        get_font_metrics("Arial")
    assert normalize_basefont("ABCDEF+Times") == "Times-Roman"
    assert get_font_metrics("Arial", normalize=True) is get_font_metrics(
        "Helvetica"
    )


def test_unknown_font_raises():
    with pytest.raises(UnknownFontError):
        get_widths("NoSuchFont-Bold")
