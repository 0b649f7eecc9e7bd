"""Content tokenizer + string-splitting tests (arity classes of
parser/text.py:343-621; escapes of __init__.py:659-740)."""

import pytest

from pypdfproc_spark.core.content import (
    ContentError,
    split_hex,
    split_literal,
    tokenize_content,
)
from pypdfproc_spark.core.cos import LitStr


def ops(data):
    return [(o.name, o.operands) for o in tokenize_content(data)]


def test_zero_arity():
    assert ops(b"BT ET q Q T*") == [
        ("BT", []), ("ET", []), ("q", []), ("Q", []), ("Tstar", []),
    ]


def test_one_and_two_arity():
    got = ops(b"/F1 12 Tf 0.5 w /Fx Do 10 20 Td")
    assert got[0] == ("Tf", ["F1", 12])
    assert got[1] == ("w", [0.5])
    assert got[2] == ("Do", ["Fx"])
    assert got[3] == ("Td", [10, 20])


def test_six_arity_and_star_ops():
    got = ops(b"1 0 0 1 72 720 cm 1 0 0 1 0 0 Tm f* W*")
    assert got[0][0] == "cm" and got[0][1] == [1, 0, 0, 1, 72, 720]
    assert [g[0] for g in got[1:]] == ["Tm", "fstar", "Wstar"]


@pytest.mark.parametrize("op", [b"B*", b"b*"])
def test_bstar_regrouper_bug_parity(op):
    """The reference's regrouper lists 'B*'/'b*' literally but its lexer
    emits token TYPES 'Bstar'/'bstar', so these two ops always raise and
    drop the page (parser/text.py:351,619); mirrored as ContentError and
    pinned differentially by fixture f24_graphics_soup."""
    with pytest.raises(ContentError):
        tokenize_content(op)


def test_tj_array():
    got = ops(b"[(Hello) -400 (World)] TJ")
    assert got[0][0] == "TJ"
    arr = got[0][1]
    assert arr[0] == LitStr(b"Hello") and arr[1] == -400


def test_dash_array():
    got = ops(b"[2 4] 0 d")
    assert got == [("d", [[2, 4], 0])]


def test_variadic_sc():
    assert ops(b"0.1 0.2 0.3 sc")[0] == ("sc", [0.1, 0.2, 0.3])
    assert ops(b"0.5 SC")[0] == ("SC", [0.5])


def test_bdc_with_inline_dict():
    got = ops(b"/Span << /ActualText (x) >> BDC EMC")
    assert got[0][0] == "BDC"
    assert got[0][1][0] == "Span"
    assert got[1][0] == "EMC"


def test_unknown_operator_raises():
    with pytest.raises(ContentError):
        tokenize_content(b"1 0 0 1 0 0 sh")  # 'sh' not in the vocabulary


def test_arity_mismatch_raises():
    with pytest.raises(ContentError):
        tokenize_content(b"1 2 3 Td")  # Td takes exactly 2


# --- split_literal ------------------------------------------------------------


def test_split_literal_basic():
    assert split_literal(b"abc") == ["a", "b", "c"]


def test_split_literal_named_escapes():
    assert split_literal(rb"a\nb\tc\rd\be\ff") == [
        "a", "\n", "b", "\t", "c", "\r", "d", "\b", "e", "\f", "f"
    ]


def test_split_literal_octal():
    assert split_literal(rb"\101") == ["A"]        # 3-digit
    assert split_literal(rb"\40x") == [" ", "x"]   # 2-digit
    assert split_literal(rb"\7x") == ["\x07", "x"]  # 1-digit


def test_split_literal_double_backslash():
    assert split_literal(rb"a\\b") == ["a", "\\", "b"]


def test_split_literal_bad_escape_raises():
    with pytest.raises(ContentError):
        split_literal(rb"\q")


# --- split_hex ----------------------------------------------------------------


def test_split_hex_single_byte():
    assert split_hex("48656C", 1) == ["H", "e", "l"]


def test_split_hex_two_byte():
    assert split_hex("00480069", 2) == ["H", "i"]


def test_split_hex_odd_padded():
    # trailing zero implied per spec (reference: __init__.py:729-732)
    assert split_hex("487", 1) == ["H", "p"]


def test_split_hex_unalignable_raises():
    with pytest.raises(ContentError):
        split_hex("480069", 2)  # 6 digits not a multiple of 4


def test_truncated_inline_dict_array_raises():
    # regression: the array loop inside the inline-dict parser must detect
    # eof (Scanner returns ('eof', None) forever) instead of spinning
    with pytest.raises(ContentError):
        tokenize_content(b"/MC << /K [ 1 2 ")


def test_truncated_inline_dict_raises():
    with pytest.raises(ContentError):
        tokenize_content(b"/MC << /K 1 ")


def test_scn_name_operand_raises_parity():
    """scn with a pattern-name operand trips the reference's skipped-token
    check (its scan collects only INT/FLOAT/LIT); SC/sc collect only
    INT/FLOAT, so even a literal string raises there."""
    with pytest.raises(ContentError):
        tokenize_content(b"0.2 0.4 /P1 scn")
    with pytest.raises(ContentError):
        tokenize_content(b"(lit) 0.5 SC")
    # LIT is collected for SCN/scn (mirroring the reference's scan)
    got = tokenize_content(b"0.2 (x) SCN")
    assert got[0].name == "SCN"
