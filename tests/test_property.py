"""Property/randomized tests (hypothesis) for the parsing hot paths."""

from hypothesis import given, settings, strategies as st

from pypdfproc_spark.core.content import ContentError, split_hex, split_literal
from pypdfproc_spark.core.cos import HexStr, LitStr, Parser, PdfError, Scanner


@given(st.binary(max_size=300))
@settings(max_examples=200, deadline=None)
def test_scanner_terminates_or_raises(data):
    """The scanner must never hang or crash with a non-PdfError."""
    sc = Scanner(data)
    try:
        for _ in range(2000):
            if sc.next_token()[0] == "eof":
                break
        else:
            raise AssertionError("scanner did not terminate")
    except PdfError:
        pass


_safe_lit = st.text(
    alphabet=st.characters(
        codec="latin-1", exclude_characters="\\()"
    ),
    max_size=50,
)


@given(_safe_lit)
@settings(max_examples=200, deadline=None)
def test_literal_roundtrip(s):
    """Escape-free literals split to exactly their characters."""
    raw = s.encode("latin-1")
    parsed = Parser(b"(" + raw + b")").parse_value()
    assert isinstance(parsed, LitStr)
    assert "".join(split_literal(parsed.raw)) == s


@given(st.integers(0, 255), st.integers(0, 255))
@settings(max_examples=100, deadline=None)
def test_octal_escape_roundtrip(a, b):
    raw = ("\\%03o\\%03o" % (a, b)).encode()
    assert split_literal(raw) == [chr(a), chr(b)]


@given(st.lists(st.integers(0, 0xFFFF), max_size=20))
@settings(max_examples=100, deadline=None)
def test_split_hex_two_byte_roundtrip(cids):
    hx = "".join("%04X" % c for c in cids)
    assert split_hex(hx, 2) == [chr(c) for c in cids]


@given(st.binary(min_size=1, max_size=40))  # <> is a lexer error (r03 parity)
@settings(max_examples=200, deadline=None)
def test_hex_string_parse(data):
    hx = data.hex().upper().encode()
    v = Parser(b"<" + hx + b">").parse_value()
    assert isinstance(v, HexStr)
    assert v.hexdigits == data.hex().upper()


@given(
    st.recursive(
        st.one_of(
            st.integers(-10**6, 10**6),
            st.booleans(),
            st.none(),
            st.text(alphabet=st.characters(codec="ascii", categories=("Lu", "Ll", "Nd")), min_size=1, max_size=8),
        ),
        lambda children: st.lists(children, max_size=4),
        max_leaves=12,
    )
)
@settings(max_examples=150, deadline=None)
def test_value_roundtrip_through_serialization(value):
    """Serialize a python value as COS syntax and re-parse it."""

    def ser(v):
        if v is True:
            return b"true"
        if v is False:
            return b"false"
        if v is None:
            return b"null"
        if isinstance(v, int):
            return str(v).encode()
        if isinstance(v, str):
            return b"/" + v.encode()
        if isinstance(v, list):
            return b"[ " + b" ".join(ser(x) for x in v) + b" ]"
        raise AssertionError(v)

    assert Parser(ser(value)).parse_value() == value
