"""Unit tests for the COS scanner/parser (SURVEY.md §5.1)."""

import pytest

from pypdfproc_spark.core.cos import (
    HexStr,
    LitStr,
    Parser,
    PdfError,
    Ref,
    Scanner,
)


def parse(b: bytes):
    return Parser(b).parse_value()


def test_numbers():
    assert parse(b"42") == 42
    assert parse(b"-17") == -17
    assert parse(b"+5") == 5
    assert parse(b"3.14") == 3.14
    assert parse(b"-.5") == -0.5
    assert parse(b"13.") == 13.0


def test_names():
    assert parse(b"/Type") == "Type"
    assert parse(b"/A;B_C$") == "A;B_C$"
    assert parse(b"/Name(x)") == "Name"  # delimiter terminates name


def test_booleans_null():
    assert parse(b"true") is True
    assert parse(b"false") is False
    assert parse(b"null") is None


def test_literal_strings():
    assert parse(b"(hello)") == LitStr(b"hello")
    assert parse(b"(nested (paren) pairs)") == LitStr(b"nested (paren) pairs")
    # escaped parens are unescaped at lex time (like the reference lexer)
    assert parse(rb"(a\(b\)c)") == LitStr(b"a(b)c")
    # backslash-run parity: \\) closes the string
    assert parse(rb"(x\\)") == LitStr(rb"x\\")


def test_hex_strings():
    assert parse(b"<48656C6C6F>") == HexStr("48656C6C6F")
    # reference parity (r03): every reference lexer requires
    # <[0-9A-Fa-f]+> — embedded whitespace, empty, or non-hex bodies are
    # lexer errors (parser/pdf.py:95, text.py:221, cmap.py:111; pinned by
    # fixture f49_hex_whitespace)
    for bad in (b"<48 65 6C>", b"<>", b"<4z>"):
        with pytest.raises(PdfError):
            parse(bad)


def test_arrays_and_dicts():
    assert parse(b"[1 2 [3 /X] (s)]") == [1, 2, [3, "X"], LitStr(b"s")]
    d = parse(b"<< /A 1 /B [2 3] /C << /D true >> >>")
    assert d == {"A": 1, "B": [2, 3], "C": {"D": True}}


def test_odd_dict_padded_with_null():
    # reference pads odd dictionaries with NULL (parser/pdf.py:373-379)
    assert parse(b"<< /A 1 /B >>") == {"A": 1, "B": None}


def test_indirect_refs():
    assert parse(b"5 0 R") == Ref(5, 0)
    assert parse(b"[1 0 R 2 1 R 7]") == [Ref(1, 0), Ref(2, 1), 7]
    # INT INT not followed by R stays two ints
    assert parse(b"[5 0 7]") == [5, 0, 7]


def test_comments_skipped():
    assert parse(b"% comment\n42") == 42


def test_indirect_object_with_stream():
    data = b"7 0 obj\n<< /Length 5 >>\nstream\nabcde\nendstream\nendobj\n"
    objid, gen, val = Parser(data).parse_indirect_object()
    assert (objid, gen) == (7, 0)
    assert val.raw == b"abcde"


def test_stream_length_strict():
    """Reference parity (r03, f65-f67): /Length is trusted verbatim — a
    wrong or missing value raises instead of scanning for endstream
    (parser/pdf.py:147-170; parser/__init__.py:401 KeyError)."""
    ok = b"7 0 obj\n<< /Length 5 >>\nstream\nabcde\nendstream\nendobj\n"
    _, _, val = Parser(ok).parse_indirect_object()
    assert val.raw == b"abcde"
    for bad in (
        b"7 0 obj\n<< /Length 999 >>\nstream\nabcde\nendstream\nendobj\n",
        b"7 0 obj\n<< /Length 2 >>\nstream\nabcde\nendstream\nendobj\n",
        b"7 0 obj\n<< /X 1 >>\nstream\nabcde\nendstream\nendobj\n",
    ):
        with pytest.raises(PdfError):
            Parser(bad).parse_indirect_object()


def test_unterminated_raises():
    with pytest.raises(PdfError):
        parse(b"(never closed")
    with pytest.raises(PdfError):
        parse(b"<< /A 1")
    with pytest.raises(PdfError):
        parse(b"[1 2")


def test_scanner_keywords():
    sc = Scanner(b"xref trailer startxref obj endobj R n f")
    kws = []
    while True:
        k, v = sc.next_token()
        if k == "eof":
            break
        kws.append(v)
    assert kws == ["xref", "trailer", "startxref", "obj", "endobj", "R", "n", "f"]
