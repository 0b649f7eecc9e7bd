"""CFF unpacker tests (SURVEY.md §2.3 L10 / §2.6 F7)."""

import pytest

from pypdfproc_spark.core.cff import CffError, build_cff, parse_cff


def test_roundtrip_custom_glyphs():
    cff = build_cff("TestFont", [("ga", 0x61), ("gb", 0x62), ("gc", 0x33)])
    parsed = parse_cff(cff)
    assert parsed["name"] == "TestFont"
    gs = parsed["glyphs"]
    assert [(g["gid"], g["cid"], g["cname"]) for g in gs] == [
        (1, 0x61, "ga"), (2, 0x62, "gb"), (3, 0x33, "gc"),
    ]


def test_bad_header_raises():
    with pytest.raises(CffError):
        parse_cff(b"\x02\x00\x04\x04" + b"\x00" * 32)


def test_truncated_raises():
    cff = build_cff("T", [("g", 65)])
    with pytest.raises(Exception):
        parse_cff(cff[:20])


def test_standard_sid_names():
    # charset SIDs 1..95 resolve to StandardEncoding names; build a CFF
    # whose charset points at SID 2 ('exclam') by hand-patching
    import struct

    from pypdfproc_spark.core import cff as cffmod

    if cffmod._STD_STRINGS is None:
        cffmod._STD_STRINGS = cffmod._standard_strings()
    assert cffmod._STD_STRINGS[1] == "space"
    assert cffmod._STD_STRINGS[2] == "exclam"
    assert cffmod._STD_STRINGS[34] == "A"
