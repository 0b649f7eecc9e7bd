"""Filter tests incl. the PNG-Up worked example from the reference docstring
(decoder/flate.py:44-66)."""

import zlib

import pytest

from pypdfproc_spark.core import filters


def test_flate_plain():
    raw = b"BT (hello) Tj ET" * 10
    assert filters.flate_decode(zlib.compress(raw), None) == raw
    assert filters.flate_decode(zlib.compress(raw), {"Predictor": 0}) == raw
    assert filters.flate_decode(zlib.compress(raw), {"Predictor": 1}) == raw


def test_png_up_worked_example():
    # the reference's own worked example: rows [2 3 4], [5 0 1] with tag
    # column -> output [2 3 4], [7 3 5]
    data = bytes([2, 2, 3, 4, 2, 5, 0, 1])
    comp = zlib.compress(data)
    out = filters.flate_decode(comp, {"Predictor": 12, "Columns": 3})
    assert out == bytes([2, 3, 4, 7, 3, 5])


def test_png_up_wraparound():
    data = bytes([2, 200, 2, 200])  # 200 + 200 = 400 % 256 = 144
    out = filters.flate_decode(zlib.compress(data), {"Predictor": 12, "Columns": 1})
    assert out == bytes([200, 144])


def test_png_mixed_row_filters():
    # None row then Sub row: [10 20], sub row deltas [1 1] -> [11 12]? no:
    # sub adds left neighbor: row = [1, 1] -> [1, 2] ... construct carefully
    data = bytes([0, 10, 20, 1, 1, 1])
    out = filters.flate_decode(zlib.compress(data), {"Predictor": 12, "Columns": 2})
    assert out == bytes([10, 20, 1, 2])


def test_tiff_predictor():
    # cumulative along the row
    data = bytes([10, 1, 1, 1])
    out = filters.flate_decode(zlib.compress(data), {"Predictor": 2, "Columns": 4})
    assert out == bytes([10, 11, 12, 13])


def test_ascii_hex():
    assert filters.decode_stream({"Filter": "ASCIIHexDecode"}, b"48656C6C6F>", extended=True) == b"Hello"
    # odd count pads trailing zero
    assert filters.decode_stream({"Filter": "ASCIIHexDecode"}, b"487>", extended=True) == b"Hp"


def test_run_length():
    # literal run of 3, then repeat 'z' 4 times, then EOD
    data = bytes([2]) + b"abc" + bytes([253]) + b"z" + bytes([128])
    assert filters.decode_stream({"Filter": "RunLengthDecode"}, data, extended=True) == b"abczzzz"


def test_filter_chain():
    raw = b"payload"
    enc = zlib.compress(raw).hex().upper().encode() + b">"
    d = {"Filter": ["ASCIIHexDecode", "FlateDecode"]}
    assert filters.decode_stream(d, enc, extended=True) == raw


def test_unsupported_filters_raise_typed():
    for ext in (False, True):
        with pytest.raises(filters.UnsupportedFilterError):
            filters.decode_stream({"Filter": "DCTDecode"}, b"\xff\xd8",
                                  extended=ext)
        with pytest.raises(filters.UnsupportedFilterError):
            filters.decode_stream({"Filter": "Crypt"}, b"x", extended=ext)
        with pytest.raises(filters.UnsupportedFilterError):
            filters.decode_stream({"Filter": "NoSuchFilter"}, b"x",
                                  extended=ext)


def test_strict_parity_default():
    """Reference parity (f57/f58): only the exact name 'FlateDecode'
    decodes by default — arrays (even [FlateDecode]), the 'Fl'
    abbreviation, and every non-Flate filter raise."""
    raw = b"strict body"
    enc = zlib.compress(raw)
    assert filters.decode_stream({"Filter": "FlateDecode"}, enc) == raw
    for filt in (["FlateDecode"], "Fl", "LZWDecode", "ASCIIHexDecode",
                 "ASCII85Decode", "RunLengthDecode"):
        with pytest.raises(filters.UnsupportedFilterError):
            filters.decode_stream({"Filter": filt}, enc)


def test_corrupt_zlib_raises_decode_error():
    with pytest.raises(filters.DecodeError):
        filters.flate_decode(b"not zlib data", None)


# --- round 4: strict reference Flate surface (decoder/flate.py verbatim,
# --- probed via tools/probe_r3.py, pinned by fixtures f74-f80, f85-f86)

def _strict(d, raw):
    return filters.decode_stream(d, raw, extended=False)


def test_strict_no_parms_is_predictor0():
    raw = b"plain strict body"
    assert _strict({"Filter": "FlateDecode"}, zlib.compress(raw)) == raw


def test_strict_parms_requires_predictor_key():
    raw = zlib.compress(b"x")
    with pytest.raises(filters.DecodeError):
        _strict({"Filter": "FlateDecode", "DecodeParms": {"Columns": 5}}, raw)


def test_strict_only_predictor_0_and_12():
    raw = zlib.compress(b"x" * 8)
    for pred in (1, 2, 10, 11, 13, 14, 15, 99):
        with pytest.raises(filters.DecodeError):
            _strict({"Filter": "FlateDecode",
                     "DecodeParms": {"Predictor": pred, "Columns": 4}}, raw)


def test_strict_nondict_parms_drop():
    raw = zlib.compress(b"x")
    for parms in ([{"Predictor": 0}], "nope", 7, object()):
        with pytest.raises(filters.DecodeError):
            _strict({"Filter": "FlateDecode", "DecodeParms": parms}, raw)


def test_strict_png_up_pads_nrows_nuls():
    # reference PNG_Up allocates len(data) output bytes but writes only
    # nrows*col -> worked example gains 2 trailing NULs
    data = bytes([2, 2, 3, 4, 2, 5, 0, 1])
    out = _strict({"Filter": "FlateDecode",
                   "DecodeParms": {"Predictor": 12, "Columns": 3}},
                  zlib.compress(data))
    assert out == bytes([2, 3, 4, 7, 3, 5]) + b"\x00\x00"


def test_strict_png_up_row0_tag_ignored():
    # row 0's tag byte is never checked (flate.py:105 'if r > 0')
    data = bytes([7, 2, 3, 4, 2, 5, 0, 1])
    out = _strict({"Filter": "FlateDecode",
                   "DecodeParms": {"Predictor": 12, "Columns": 3}},
                  zlib.compress(data))
    assert out == bytes([2, 3, 4, 7, 3, 5]) + b"\x00\x00"


def test_strict_png_up_tag_change_raises():
    data = bytes([2, 2, 3, 4, 0, 5, 0, 1])
    with pytest.raises(filters.DecodeError):
        _strict({"Filter": "FlateDecode",
                 "DecodeParms": {"Predictor": 12, "Columns": 3}},
                zlib.compress(data))


def test_strict_png_up_requires_columns_and_row_multiple():
    data = bytes([2, 2, 3, 4])
    with pytest.raises(filters.DecodeError):
        _strict({"Filter": "FlateDecode",
                 "DecodeParms": {"Predictor": 12}}, zlib.compress(data))
    with pytest.raises(filters.DecodeError):
        _strict({"Filter": "FlateDecode",
                 "DecodeParms": {"Predictor": 12, "Columns": 4}},
                zlib.compress(data))  # 4 bytes, stride 5


def test_strict_png_up_colors_ignored():
    # Columns is the RAW byte width; Colors/BitsPerComponent unread
    data = bytes([2, 2, 3, 4, 2, 5, 0, 1])
    out = _strict({"Filter": "FlateDecode",
                   "DecodeParms": {"Predictor": 12, "Columns": 3,
                                   "Colors": 3, "BitsPerComponent": 16}},
                  zlib.compress(data))
    assert out == bytes([2, 3, 4, 7, 3, 5]) + b"\x00\x00"
