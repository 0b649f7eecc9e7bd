"""Round-3 differential probes: run the REFERENCE on candidate fixtures
FIRST (the round-2 method) and print what it actually does.

Usage: python tools/probe_r3.py [name ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools", "ply_shim"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, REPO)

from fixtures.pdfgen import PdfFile, simple_doc, HELV  # noqa: E402


def p_inline_image() -> bytes:
    """BI/ID/EI inline image between two text runs."""
    c = (b"BT /F1 12 Tf 72 720 Td (Before image) Tj ET\n"
         b"BI /W 2 /H 2 /CS /G /BPC 8 ID \x00\x41\x42\xff EI\n"
         b"BT /F1 12 Tf 72 700 Td (After image) Tj ET")
    return simple_doc(c, HELV)


def p_inline_image_page2() -> bytes:
    """Page 1 has the inline image, page 2 is clean (leak check)."""
    c1 = (b"BT /F1 12 Tf 72 720 Td (Partial one) Tj ET\n"
          b"BI /W 1 /H 1 /CS /G /BPC 8 ID \x41 EI")
    c2 = b"BT /F1 12 Tf 72 720 Td (Clean page) Tj ET"
    return simple_doc(None, HELV, n_pages=2, contents_per_page=[c1, c2])


def _type0_doc(cmap_payload: bytes, text_hex: bytes = b"<0041>") -> bytes:
    """Type0/Identity-H font with a ToUnicode CMap built from payload."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, b"<< /Type /Font /Subtype /Type0 /BaseFont /Test-H "
             b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
             b"/ToUnicode 7 0 R >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add(5, _stream_body(b"BT /F1 12 Tf 72 720 Td " + text_hex + b" Tj ET"))
    f.add(6, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Test "
             b"/CIDSystemInfo << /Registry (T) /Ordering (T) /Supplement 0 >> "
             b"/W [ 0 255 500 ] >>")
    f.add_stream(7, b"", cmap_payload)
    return f.build(1)


def _stream_body(data: bytes) -> bytes:
    return (b"<< /Length %d >>\nstream\n" % len(data)) + data + b"\nendstream"


# NB: _stream_body used via add() needs the obj wrapper; use add_stream-like
def _fix_stream(f: PdfFile, oid: int, data: bytes) -> None:
    f.add_stream(oid, b"", data)


CMAP_TWO_BFCHAR = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
1 beginbfchar <0041> <0058> endbfchar
1 beginbfchar <0042> <0059> endbfchar
endcmap CMapName currentdict /CMap defineresource pop end end"""

CMAP_UNTERMINATED = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
1 beginbfchar <0041> <0058>
endcmap CMapName currentdict /CMap defineresource pop end end"""

CMAP_ODD_BFCHAR = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
2 beginbfchar <0041> <0058> <0042> endbfchar
endcmap CMapName currentdict /CMap defineresource pop end end"""

CMAP_MULTI_CODESPACE = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
2 begincodespacerange <00> <80> <8140> <9FFC> endcodespacerange
1 begincodespacerange <A0> <DF> endcodespacerange
1 beginbfchar <0041> <0058> endbfchar
endcmap CMapName currentdict /CMap defineresource pop end end"""


def p_cmap_two_bfchar() -> bytes:
    # <0041> Tj then <0042> Tj: first bfchar section maps 0x41 -> X;
    # does the second section (0x42 -> Y) apply, or Identity fallback?
    return _type0_doc(CMAP_TWO_BFCHAR, b"<00410042>")


def p_cmap_unterminated() -> bytes:
    return _type0_doc(CMAP_UNTERMINATED, b"<0041>")


def p_cmap_odd_bfchar() -> bytes:
    return _type0_doc(CMAP_ODD_BFCHAR, b"<00410042>")


def p_cmap_multi_codespace() -> bytes:
    return _type0_doc(CMAP_MULTI_CODESPACE, b"<0041>")


def p_type3() -> bytes:
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, b"<< /Type /Font /Subtype /Type3 /Name /T3 "
             b"/FontBBox [0 0 10 10] /FontMatrix [0.001 0 0 0.001 0 0] "
             b"/CharProcs << /a65 6 0 R >> "
             b"/Encoding << /Type /Encoding /Differences [65 /a65] >> "
             b"/FirstChar 65 /LastChar 65 /Widths [500] >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (A) Tj ET "
                         b"BT /F1 12 Tf 72 700 Td (AA) Tj ET")
    f.add_stream(6, b"", b"500 0 d0 0 0 10 10 re f")
    return f.build(1)


def p_type3_page2() -> bytes:
    """Type3 on page 1 only; clean Helvetica page 2 (leak/drop scope)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R 8 0 R] /Count 2 >>")
    f.add(3, b"<< /Type /Font /Subtype /Type3 /Name /T3 "
             b"/FontBBox [0 0 10 10] /FontMatrix [0.001 0 0 0.001 0 0] "
             b"/CharProcs << /a65 6 0 R >> "
             b"/Encoding << /Type /Encoding /Differences [65 /a65] >> "
             b"/FirstChar 65 /LastChar 65 /Widths [500] >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (Type3 text) Tj ET")
    f.add_stream(6, b"", b"500 0 d0")
    f.add(7, HELV)
    f.add(8, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F2 7 0 R >> >> /Contents 9 0 R >>")
    f.add_stream(9, b"", b"BT /F2 12 Tf 72 720 Td (Clean two) Tj ET")
    return f.build(1)


PROBES = {
    "inline_image": p_inline_image,
    "inline_image_page2": p_inline_image_page2,
    "cmap_two_bfchar": p_cmap_two_bfchar,
    "cmap_unterminated": p_cmap_unterminated,
    "cmap_odd_bfchar": p_cmap_odd_bfchar,
    "cmap_multi_codespace": p_cmap_multi_codespace,
    "type3": p_type3,
    "type3_page2": p_type3_page2,
}


def main() -> None:
    import pypdfproc  # reference via shim

    names = sys.argv[1:] or list(PROBES)
    tmp = tempfile.mkdtemp(prefix="probe_r3_")
    for name in names:
        data = PROBES[name]()
        p = os.path.join(tmp, name + ".pdf")
        with open(p, "wb") as fh:
            fh.write(data)
        print("=== %s" % name)
        try:
            doc = pypdfproc.PDF(p)
            out = doc.GetFullText()
            print("    OK pages=%r" % (out,))
        except Exception as e:
            print("    DOC-RAISE %s: %s" % (type(e).__name__, e))
            tb = traceback.format_exc().strip().splitlines()
            print("    " + "\n    ".join(tb[-4:]))




def p_hex_ws() -> bytes:
    """Whitespace inside a hex string (spec-legal) — does the lexer cope?"""
    return _type0_doc(CMAP_TWO_BFCHAR, b"<00 41>")


def p_hex_odd3() -> bytes:
    """3 hex digits: spec pads one trailing zero -> cid 0x0040."""
    return _type0_doc(CMAP_TWO_BFCHAR, b"<004>")


def p_hex_odd5() -> bytes:
    """5 hex digits: pads to 6, not divisible into 2-byte cids."""
    return _type0_doc(CMAP_TWO_BFCHAR, b"<00410>")


PROBES["hex_ws"] = p_hex_ws
PROBES["hex_odd3"] = p_hex_odd3
PROBES["hex_odd5"] = p_hex_odd5




def p_tj_name() -> bytes:
    """A NAME operand inside a TJ array: [(A) /Oops (B)] TJ."""
    c = b"BT /F1 12 Tf 72 720 Td [(A) /Oops (B)] TJ ET"
    return simple_doc(c, HELV)


PROBES["tj_name"] = p_tj_name




def p_bt_no_et() -> bytes:
    """Text block never closed: BT ... Tj with no ET at stream end."""
    c = b"BT /F1 12 Tf 72 720 Td (NoET) Tj"
    return simple_doc(c, HELV)


def p_contents_nonstream() -> bytes:
    """/Contents pointing at a dict (not a stream)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add(5, b"<< /NotA /Stream >>")
    return f.build(1)


PROBES["bt_no_et"] = p_bt_no_et
PROBES["contents_nonstream"] = p_contents_nonstream




def p_widths_indirect_elems() -> bytes:
    """Widths array whose ELEMENTS are indirect references."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
             b"/FirstChar 65 /LastChar 66 /Widths [6 0 R 7 0 R] "
             b"/Encoding /WinAnsiEncoding >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (AB) Tj "
                         b"[(A) -600 (B)] TJ ET")
    f.add(6, b"556")
    f.add(7, b"556")
    return f.build(1)


def p_widths_indirect_array() -> bytes:
    """The /Widths VALUE itself is an indirect ref to an array."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
             b"/FirstChar 65 /LastChar 66 /Widths 6 0 R "
             b"/Encoding /WinAnsiEncoding >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (AB) Tj "
                         b"[(A) -600 (B)] TJ ET")
    f.add(6, b"[556 556]")
    return f.build(1)


PROBES["widths_indirect_elems"] = p_widths_indirect_elems
PROBES["widths_indirect_array"] = p_widths_indirect_array




def p_lzw_content() -> bytes:
    import sys as _s
    _s.path.insert(0, REPO)
    from tests.test_lzw import lzw_encode
    content = b"BT /F1 12 Tf 72 720 Td (LZW page) Tj ET"
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R 6 0 R] /Count 2 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"/Filter /LZWDecode", lzw_encode(content))
    f.add(6, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 7 0 R >>")
    f.add_stream(7, b"", b"BT /F1 12 Tf 72 700 Td (Plain page) Tj ET")
    return f.build(1)


def p_filter_array_flate() -> bytes:
    import zlib
    content = b"BT /F1 12 Tf 72 720 Td (Array filter) Tj ET"
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"/Filter [/FlateDecode]", zlib.compress(content))
    return f.build(1)


PROBES["lzw_content"] = p_lzw_content
PROBES["filter_array_flate"] = p_filter_array_flate




def p_bare_dot() -> bytes:
    """A bare '.' operand: reference FLOAT regex matches it, float('.')
    raises in t_FLOAT."""
    c = b"BT /F1 12 Tf 72 . Td (Dot) Tj ET"
    return simple_doc(c, HELV)


def p_trailing_dot() -> bytes:
    """'72.' and '-.5' are valid FLOAT lexemes."""
    c = b"BT /F1 12 Tf 72. -.5 Td (TrailDot) Tj ET"
    return simple_doc(c, HELV)


PROBES["bare_dot"] = p_bare_dot
PROBES["trailing_dot"] = p_trailing_dot




def p_xref_w0() -> bytes:
    """xref stream with W=[0 2 1]: the type field is absent, so every row
    is implicitly type 1 (spec 7.5.8.3)."""
    from fixtures.pdfgen import _stream_obj, flate
    header = b"%PDF-1.5\n"
    out = bytearray(header)
    offsets = {}
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: HELV,
        4: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
    }
    for oid in (1, 2, 3, 4):
        offsets[oid] = len(out)
        out += b"%d 0 obj\n" % oid + bodies[oid] + b"\nendobj\n"
    offsets[5] = len(out)
    out += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (W zero type) Tj ET")
    xref_off = len(out)
    rows = b""
    for oid in range(7):
        f2 = offsets.get(oid, 0) if oid else 0
        if oid == 6:
            f2 = xref_off
        rows += bytes([(f2 >> 8) & 0xFF, f2 & 0xFF, 0])
    xdict = (b"/Type /XRef /Size 7 /W [0 2 1] /Root 1 0 R "
             b"/Filter /FlateDecode")
    out += _stream_obj(6, xdict, flate(rows))
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


PROBES["xref_w0"] = p_xref_w0




def p_no_eof_marker() -> bytes:
    """Document whose %%EOF marker is missing entirely."""
    data = simple_doc(b"BT /F1 12 Tf 72 720 Td (No EOF) Tj ET", HELV)
    assert data.endswith(b"%%EOF\n")
    return data[: -len(b"%%EOF\n")]


PROBES["no_eof_marker"] = p_no_eof_marker




def p_xref_two_subsections() -> bytes:
    """Plaintext xref with TWO subsections (0 3 and 4 2)."""
    from fixtures.pdfgen import _obj, _stream_obj
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        4: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 6 0 R >> >> /Contents 5 0 R >>"),
        6: HELV,
    }
    for oid in (1, 2):
        offsets[oid] = len(out)
        out += _obj(oid, bodies[oid])
    for oid in (4, 6):
        offsets[oid] = len(out)
        out += _obj(oid, bodies[oid])
    offsets[5] = len(out)
    out += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Two subsections) Tj ET")
    xref_off = len(out)
    out += b"xref\n0 3\n"
    out += b"0000000000 65535 f \n"
    out += b"%010d 00000 n \n" % offsets[1]
    out += b"%010d 00000 n \n" % offsets[2]
    out += b"4 3\n"
    out += b"%010d 00000 n \n" % offsets[4]
    out += b"%010d 00000 n \n" % offsets[5]
    out += b"%010d 00000 n \n" % offsets[6]
    out += (b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % xref_off)
    return bytes(out)


PROBES["xref_two_subsections"] = p_xref_two_subsections




def p_xref_multi_index() -> bytes:
    """xref STREAM with multi-part /Index [0 3 4 3]."""
    from fixtures.pdfgen import _stream_obj, flate, _obj
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        4: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 6 0 R >> >> /Contents 5 0 R >>"),
        6: HELV,
    }
    for oid in (1, 2, 4, 6):
        offsets[oid] = len(out)
        out += _obj(oid, bodies[oid])
    offsets[5] = len(out)
    out += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Multi index) Tj ET")
    xref_off = len(out)

    def row(t, f2, f3):
        return bytes([t, (f2 >> 8) & 0xFF, f2 & 0xFF, f3])

    rows = (row(0, 0, 255) + row(1, offsets[1], 0) + row(1, offsets[2], 0)
            + row(1, offsets[4], 0) + row(1, offsets[5], 0)
            + row(1, offsets[6], 0))
    xdict = (b"/Type /XRef /Size 8 /W [1 2 1] /Index [0 3 4 3] /Root 1 0 R "
             b"/Filter /FlateDecode")
    out += _stream_obj(7, xdict, flate(rows))
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


PROBES["xref_multi_index"] = p_xref_multi_index




def _length_doc(length_field: bytes) -> bytes:
    content = b"BT /F1 12 Tf 72 720 Td (Length case) Tj ET"
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    d = b"<< " + length_field + b" >>"
    f.add_raw(5, b"5 0 obj\n" + d + b"\nstream\n" + content
                 + b"\nendstream\nendobj\n")
    return f.build(1)


def p_length_short() -> bytes:
    return _length_doc(b"/Length 10")


def p_length_long() -> bytes:
    return _length_doc(b"/Length 200")


def p_length_missing() -> bytes:
    return _length_doc(b"/X 1")


PROBES["length_short"] = p_length_short
PROBES["length_long"] = p_length_long
PROBES["length_missing"] = p_length_missing




def p_no_endobj() -> bytes:
    """Content stream object missing its endobj keyword."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    content = b"BT /F1 12 Tf 72 720 Td (No endobj) Tj ET"
    f.add_raw(5, b"5 0 obj\n<< /Length %d >>\nstream\n" % len(content)
                 + content + b"\nendstream\n")  # no endobj
    return f.build(1)


def p_double_backslash_paren() -> bytes:
    r"""Literal (AB\\(CD) EF): run-counting says '(' after \\ is REAL
    (depth+1, literal ends after EF); single-char lookback says it is
    escaped (literal ends at the ')' after CD)."""
    c = b"BT /F1 12 Tf 72 720 Td (AB\\\\(CD) EF) Tj ET"
    return simple_doc(c, HELV)


PROBES["no_endobj"] = p_no_endobj
PROBES["double_backslash_paren"] = p_double_backslash_paren




def p_dbp_leak() -> bytes:
    """Draws 'Good' BEFORE the bad double-backslash literal; clean page 2:
    does 'Good' leak into page 2 (draw-time failure) or not (lex-time)?"""
    c1 = (b"BT /F1 12 Tf 72 720 Td (Good) Tj ET\n"
          b"BT /F1 12 Tf 72 700 Td (AB\\\\(CD) EF) Tj ET")
    c2 = b"BT /F1 12 Tf 72 720 Td (Clean) Tj ET"
    return simple_doc(None, HELV, n_pages=2, contents_per_page=[c1, c2])


PROBES["dbp_leak"] = p_dbp_leak




def p_differences_float() -> bytes:
    """/Differences [65.0 /A]: a FLOAT start code — int-typed check only?"""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, b"<< /Type /Font /Subtype /TrueType /BaseFont /Helvetica "
             b"/FirstChar 65 /LastChar 65 /Widths [556] "
             b"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
             b"/Differences [65.0 /B] >> >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (A) Tj ET")
    return f.build(1)


PROBES["differences_float"] = p_differences_float




def _enc_doc(enc_inline: bytes | None, enc_obj: bytes | None) -> bytes:
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    encref = enc_inline if enc_inline else b"6 0 R"
    f.add(3, b"<< /Type /Font /Subtype /TrueType /BaseFont /Helvetica "
             b"/FirstChar 65 /LastChar 66 /Widths [556 556] "
             b"/Encoding " + encref + b" >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (AB) Tj ET")
    if enc_obj:
        f.add(6, enc_obj)
    return f.build(1)


def p_enc_inline_dict() -> bytes:
    return _enc_doc(b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
                    b"/Differences [66 /C] >>", None)


def p_enc_indirect_float_diff() -> bytes:
    return _enc_doc(None, b"<< /Type /Encoding /BaseEncoding "
                          b"/WinAnsiEncoding /Differences [66.0 /C] >>")


def p_enc_indirect_no_type() -> bytes:
    return _enc_doc(None, b"<< /BaseEncoding /WinAnsiEncoding "
                          b"/Differences [66 /C] >>")


PROBES["enc_inline_dict"] = p_enc_inline_dict
PROBES["enc_indirect_float_diff"] = p_enc_indirect_float_diff
PROBES["enc_indirect_no_type"] = p_enc_indirect_no_type


# --- round 4: Flate DecodeParms / predictor surface (decoder/flate.py) ----

def _flate_doc(dict_extra: bytes, data: bytes,
               extra_objs: list | None = None) -> bytes:
    """One-page doc whose content stream has the given filter dict."""
    from fixtures.pdfgen import PdfFile, HELV
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, dict_extra, data)
    for oid, body in (extra_objs or []):
        f.add(oid, body)
    return f.build(1)


_CONTENT = b"BT /F1 12 Tf 72 720 Td (Pred text) Tj ET"


def _pred12_payload(content: bytes, col: int, row0_tag: int = 2,
                    bad_row: int | None = None) -> bytes:
    """PNG-Up(2)-encode content into rows of `col` bytes (space-padded)."""
    import zlib
    pad = (-len(content)) % col
    body = content + b" " * pad
    rows = [body[i:i + col] for i in range(0, len(body), col)]
    out = bytearray()
    prev = bytes(col)
    for i, r in enumerate(rows):
        tag = row0_tag if i == 0 else 2
        if bad_row is not None and i == bad_row:
            tag = 0
        out.append(tag)
        out.extend((b - p) % 256 for b, p in zip(r, prev))
        prev = r
    return zlib.compress(bytes(out))


def p_parms_no_pred() -> bytes:
    """DecodeParms present but no /Predictor key -> ref KeyError?"""
    from fixtures.pdfgen import flate
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms << /Columns 5 >>",
                      flate(_CONTENT))


def p_parms_pred1() -> bytes:
    """Predictor 1 (spec 'no predictor') -> ref NotImplementedError?"""
    from fixtures.pdfgen import flate
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms << /Predictor 1 >>",
                      flate(_CONTENT))


def p_parms_pred0() -> bytes:
    """Predictor 0 control -> should extract."""
    from fixtures.pdfgen import flate
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms << /Predictor 0 >>",
                      flate(_CONTENT))


def p_pred2_tiff() -> bytes:
    from fixtures.pdfgen import flate
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms "
                      b"<< /Predictor 2 /Columns 8 >>", flate(_CONTENT))


def p_pred12_content() -> bytes:
    """Predictor-12 content stream; ref output gains nrows trailing NULs."""
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms "
                      b"<< /Predictor 12 /Columns 8 >>",
                      _pred12_payload(_CONTENT, 8))


def p_pred12_row0tag() -> bytes:
    """Row 0 predictor tag 7 (ref ignores row 0's tag entirely)."""
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms "
                      b"<< /Predictor 12 /Columns 8 >>",
                      _pred12_payload(_CONTENT, 8, row0_tag=7))


def p_pred12_badtag() -> bytes:
    """Row 2 tag 0 -> ref ValueError (predictor change)."""
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms "
                      b"<< /Predictor 12 /Columns 8 >>",
                      _pred12_payload(_CONTENT, 8, bad_row=2))


def p_pred12_no_columns() -> bytes:
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms "
                      b"<< /Predictor 12 >>", _pred12_payload(_CONTENT, 8))


def p_pred12_colors() -> bytes:
    """Colors 3 present: ref ignores it (Columns = raw byte count)."""
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms "
                      b"<< /Predictor 12 /Columns 8 /Colors 3 >>",
                      _pred12_payload(_CONTENT, 8))


def p_pred12_badlen() -> bytes:
    """Payload not a multiple of Columns+1 -> ref ValueError."""
    import zlib
    raw = zlib.decompress(_pred12_payload(_CONTENT, 8))
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms "
                      b"<< /Predictor 12 /Columns 8 >>",
                      zlib.compress(raw + b"\x00"))


def p_parms_array() -> bytes:
    """DecodeParms is an ARRAY -> 'Predictor' not in Array -> KeyError?"""
    from fixtures.pdfgen import flate
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms "
                      b"[ << /Predictor 0 >> ]", flate(_CONTENT))


def p_parms_indirect() -> bytes:
    """DecodeParms indirect ref -> 'in' on IndirectObject -> TypeError?"""
    from fixtures.pdfgen import flate
    return _flate_doc(b"/Filter /FlateDecode /DecodeParms 9 0 R",
                      flate(_CONTENT),
                      extra_objs=[(9, b"<< /Predictor 0 >>")])


PROBES["parms_no_pred"] = p_parms_no_pred
PROBES["parms_pred1"] = p_parms_pred1
PROBES["parms_pred0"] = p_parms_pred0
PROBES["pred2_tiff"] = p_pred2_tiff
PROBES["pred12_content"] = p_pred12_content
PROBES["pred12_row0tag"] = p_pred12_row0tag
PROBES["pred12_badtag"] = p_pred12_badtag
PROBES["pred12_no_columns"] = p_pred12_no_columns
PROBES["pred12_colors"] = p_pred12_colors
PROBES["pred12_badlen"] = p_pred12_badlen
PROBES["parms_array"] = p_parms_array
PROBES["parms_indirect"] = p_parms_indirect


# --- round 4: content text-lexer character classes (parser/text.py) ------

def _content_doc(content: bytes) -> bytes:
    from fixtures.pdfgen import simple_doc, HELV
    return simple_doc(content, HELV)


def p_run_unspaced() -> bytes:
    """Operators glued to numbers/operators: PLY lexes 'q1' as q + INT."""
    return _content_doc(b"q1 0 0 1 0 0cm BT /F1 12 Tf 72 720 Td "
                        b"(Unspaced ops) Tj ETq Q")


def p_run_float_chain() -> bytes:
    """'12.5.6' lexes as FLOAT 12.5 + FLOAT .6 in the reference."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (Chain) Tj "
                        b"12.5.6 0 Td (After) Tj ET")


def p_run_comment() -> bytes:
    """'%' has no rule in the text lexer -> t_error -> page drop."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (Commented) Tj ET "
                        b"% trailing comment")


def p_run_nul() -> bytes:
    """Standalone NUL between operators -> t_error -> page drop."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (NulByte) Tj ET \x00")


def p_run_formfeed() -> bytes:
    """\\x0c is NOT whitespace in the text lexer -> t_error -> drop."""
    return _content_doc(b"BT /F1 12 Tf \x0c 72 720 Td (FormFeed) Tj ET")


def p_run_brace() -> bytes:
    """'{' has no rule -> t_error -> drop."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (Brace) Tj ET { }")


_INF = b"9" * 320 + b".0"          # float('9'*320 + '.0') == inf
_NEARMAX = b"17" + b"9" * 306 + b".0"  # ~1.79e308, finite


def p_tf_inf() -> bytes:
    """Tf = inf: every advance is inf/NaN; later strings in the SAME text
    object then draw with NaN coords (newline per glyph in the slow path).
    Page 2 is clean (state reset check)."""
    return _content_doc(b"BT /F1 " + _INF + b" Tf 72 720 Td (AB) Tj "
                        b"0 0 Td (CD) Tj /F1 12 Tf 10 10 Td (EF) Tj ET")


def p_tf_nearmax() -> bytes:
    """Tf huge-but-finite: te overflows to inf mid-string by ACCUMULATION
    (finite tx), a different corner than tx-itself-inf."""
    return _content_doc(b"BT /F1 " + _NEARMAX + b" Tf 72 720 Td (ABCDE) Tj "
                        b"/F1 12 Tf 5 5 Td (After) Tj ET")


def p_td_after_draw() -> bytes:
    """Td AFTER a show: the reference's Tm property setter aliases Tlm on
    every advance (state.py:364), so Td translates from the END of the
    previous string.  With b != 0 the advance moves y, so the aliasing is
    text-visible (newline pattern)."""
    return _content_doc(b"BT /F1 12 Tf 1 1 0 1 100 300 Tm (A) Tj "
                        b"0 0 Td (B) Tj 0 0 Td (C) Tj ET")


PROBES["td_after_draw"] = p_td_after_draw
PROBES["tf_inf"] = p_tf_inf
PROBES["tf_nearmax"] = p_tf_nearmax

PROBES["run_unspaced"] = p_run_unspaced
PROBES["run_float_chain"] = p_run_float_chain
PROBES["run_comment"] = p_run_comment
PROBES["run_nul"] = p_run_nul
PROBES["run_formfeed"] = p_run_formfeed
PROBES["run_brace"] = p_run_brace


# --------------------------------------------------------------------------
# Round-4 dark corner: ObjectStream /Extends + N/First mismatches
# (reference parser/__init__.py:1065-1127: index = first N*2 TOKENS, object
# i's tokens selected by lexpos in [off_i+First, off_{i+1}-1+First], object
# id in the index IGNORED — the xref row's position wins)

from fixtures.pdfgen import flate, png_up_encode, _stream_obj, _obj  # noqa: E402
from fixtures.pdfgen import _CMAP_SCAFFOLD_TOP, _CMAP_SCAFFOLD_END  # noqa: E402


def _objstm_doc(n=None, first=None, index_override=None, extends=False,
                xref_idx=(0, 1, 2, 3), pad=b""):
    """f05-shaped doc with tweakable /N, /First, index pairs, /Extends and
    inter-object padding.  Objects 1..4 (catalog/pages/font/page) live in
    objstm 6; content stream 5 is plain."""
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    offsets[5] = len(out)
    out += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Objstm probe) Tj ET")
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (3, HELV),
        (4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
    ]
    bodies = b""
    offs = []
    for oid, body in inner:
        offs.append((oid, len(bodies)))
        bodies += body + pad + b" "
    pairs = index_override if index_override is not None else offs
    index = b" ".join(b"%d %d" % (o, off) for o, off in pairs) + b" "
    objstm_data = index + bodies
    n_val = len(inner) if n is None else n
    first_val = len(index) if first is None else first
    extra = b"/Type /ObjStm /N %d /First %d" % (n_val, first_val)
    if extends:
        extra += b" /Extends 8 0 R"
    offsets[6] = len(out)
    out += _stream_obj(6, extra, objstm_data)
    if extends:
        # a second object stream holding nothing reachable
        offsets[8] = len(out)
        out += _stream_obj(8, b"/Type /ObjStm /N 1 /First 4",
                           b"9 0 << /X 1 >> ")
    xref_off = len(out)

    def row(t, f2, f3):
        return bytes([t, (f2 >> 8) & 0xFF, f2 & 0xFF, f3])

    rows = [
        row(0, 0, 255),
        row(2, 6, xref_idx[0]), row(2, 6, xref_idx[1]),
        row(2, 6, xref_idx[2]), row(2, 6, xref_idx[3]),
        row(1, offsets[5], 0), row(1, offsets[6], 0),
        row(1, xref_off, 0),
    ]
    size = 8
    if extends:
        rows.append(row(1, offsets[8], 0))
        size = 9
    xdata = flate(png_up_encode(rows))
    xdict = (
        b"/Type /XRef /Size %d /W [1 2 1] /Root 1 0 R "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>"
        % size
    )
    out += _stream_obj(7 if not extends else 7, xdict, xdata)
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def p_objstm_baseline() -> bytes:
    return _objstm_doc()


def p_objstm_extends() -> bytes:
    """/Extends present: the reference has no /Extends code at all."""
    return _objstm_doc(extends=True)


def p_objstm_wrong_end() -> bytes:
    """Object 2's (pages) declared end cuts into its body: index offset of
    object 3 points 10 bytes before the font really starts.  The reference
    slices tokens by lexpos -> pages dict tokens truncated."""
    inner_offs = []
    bodies = b""
    for oid, body in [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (3, HELV),
        (4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
    ]:
        inner_offs.append((oid, len(bodies)))
        bodies += body + b" "
    # shift object 3's declared start 10 bytes EARLIER (into object 2)
    tweaked = [
        inner_offs[0], inner_offs[1],
        (3, inner_offs[2][1] - 10), inner_offs[3],
    ]
    return _objstm_doc(index_override=tweaked)


def p_objstm_n_short() -> bytes:
    """N=3 but the xref row for oid 4 says index 3 -> reference KeyError."""
    return _objstm_doc(n=3)


def p_objstm_n_long() -> bytes:
    """N=5 with only 4 index pairs: the reference slurps the first body
    token ('<<') into the index."""
    return _objstm_doc(n=5)


def _first_delta(delta: int) -> bytes:
    """/First shifted by delta bytes: every token window moves."""
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (3, HELV),
        (4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
    ]
    bodies = b""
    offs = []
    for oid, body in inner:
        offs.append((oid, len(bodies)))
        bodies += body + b" "
    index = b" ".join(b"%d %d" % (o, off) for o, off in offs) + b" "
    return _objstm_doc(first=len(index) + delta)


def p_objstm_first_minus4() -> bytes:
    return _first_delta(-4)


def p_objstm_first_plus4() -> bytes:
    return _first_delta(+4)


def p_objstm_id_mismatch() -> bytes:
    """Index claims bogus object ids (all 99) at the right offsets: the
    reference ignores the ids and selects by position."""
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (3, HELV),
        (4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
    ]
    bodies = b""
    offs = []
    for oid, body in inner:
        offs.append((99, len(bodies)))
        bodies += body + b" "
    return _objstm_doc(index_override=offs)


def p_objstm_swapped_rows() -> bytes:
    """xref rows point at PERMUTED positions (catalog row -> index 1):
    position wins in the reference, so the graph comes out scrambled."""
    return _objstm_doc(xref_idx=(1, 0, 2, 3))


def _objstm_phantom(cut: int) -> bytes:
    """Font LAST in the stream, plus a phantom 5th index entry whose offset
    points ``cut`` bytes before the font's true end.  The reference's
    lexpos-window truncates the font dict (phantom never loaded via xref);
    our positional parser eagerly parses all indexed entries."""
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    offsets[5] = len(out)
    out += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Objstm probe) Tj ET")
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
        (3, HELV),
    ]
    bodies = b""
    offs = []
    for oid, body in inner:
        offs.append((oid, len(bodies)))
        bodies += body + b" "
    font_off = offs[3][1]
    phantom = (9, font_off + len(HELV) - cut)
    pairs = offs + [phantom]
    index = b" ".join(b"%d %d" % (o, off) for o, off in pairs) + b" "
    objstm_data = index + bodies
    offsets[6] = len(out)
    out += _stream_obj(
        6, b"/Type /ObjStm /N %d /First %d" % (len(pairs), len(index)),
        objstm_data)
    xref_off = len(out)

    def row(t, f2, f3):
        return bytes([t, (f2 >> 8) & 0xFF, f2 & 0xFF, f3])

    rows = [
        row(0, 0, 255),
        row(2, 6, 0), row(2, 6, 1), row(2, 6, 3),  # 1,2 then 3 -> idx 3
        row(2, 6, 2),                              # 4 -> idx 2
        row(1, offsets[5], 0), row(1, offsets[6], 0),
        row(1, xref_off, 0),
    ]
    xdata = flate(png_up_encode(rows))
    xdict = (
        b"/Type /XRef /Size 8 /W [1 2 1] /Root 1 0 R "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>"
    )
    out += _stream_obj(7, xdict, xdata)
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def p_objstm_phantom_cut10() -> bytes:
    return _objstm_phantom(10)


def p_objstm_phantom_cut2() -> bytes:
    """Cut only the final '>>': font window loses its DICT_END."""
    return _objstm_phantom(2)


# --------------------------------------------------------------------------
# Round-4 dark corner: xref-chain edges (parser/__init__.py:95-160: no
# /XRefStm hybrid handling anywhere; chain keyed (objid, generation))


def p_hybrid_xrefstm() -> bytes:
    """Hybrid file: plaintext xref covers only the content stream; the
    trailer's /XRefStm points at an xref stream that indexes the graph
    objects.  A reader honoring /XRefStm extracts; one ignoring it cannot
    find the catalog."""
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    bodies = {
        1: _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        2: _obj(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        3: _obj(3, HELV),
        4: _obj(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                   b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
        5: _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Hybrid) Tj ET"),
    }
    for oid in sorted(bodies):
        offsets[oid] = len(out)
        out += bodies[oid]
    # xref stream (object 6) indexing objects 1..5 as type-1 rows
    xstm_off = len(out)

    def row(t, f2, f3):
        return bytes([t, (f2 >> 16) & 0xFF, (f2 >> 8) & 0xFF, f2 & 0xFF, f3])

    rows = [row(0, 0, 255)] + [row(1, offsets[o], 0) for o in range(1, 6)]
    rows.append(row(1, xstm_off, 0))
    xdata = flate(b"".join(rows))
    out += _stream_obj(
        6, b"/Type /XRef /Size 7 /W [1 3 1] /Root 1 0 R /Filter /FlateDecode",
        xdata)
    # plaintext xref: single subsection covering ONLY object 0 (free)
    xref_off = len(out)
    out += (b"xref\n0 1\n0000000000 65535 f \n"
            b"trailer\n<< /Size 7 /Root 1 0 R /XRefStm %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (xstm_off, xref_off))
    return bytes(out)


def p_gen_mismatch_ref() -> bytes:
    """Content ref '5 7 R' but object 5 is gen 0 in the xref: the load is
    keyed (objid, generation) -> not found."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 7 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (Gen) Tj ET")
    return f.build(1)


def p_gen_nonzero_row() -> bytes:
    """xref row for object 5 carries gen 00007 and the ref says '5 7 R':
    both sides agree on the nonzero generation -> loads?"""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 7 R >>")
    data = b"BT /F1 12 Tf 72 720 Td (GenRow) Tj ET"
    f.bodies[5] = (b"5 7 obj\n<< /Length %d >>\nstream\n" % len(data)
                   + data + b"\nendstream\nendobj\n")
    doc = f.build(1)
    # patch the xref row for oid 5: replace 'NNNNNNNNNN 00000 n' gen field
    lines = doc.split(b"\n")
    # xref rows come after 'xref'; object 5 is the 6th row (0-based idx 5)
    xi = lines.index(b"xref")
    rowline = lines[xi + 2 + 5]
    lines[xi + 2 + 5] = rowline.replace(b" 00000 n", b" 00007 n")
    return b"\n".join(lines)


def p_startxref_mid_file() -> bytes:
    """startxref points into the middle of an object body."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (Mid) Tj ET", HELV)
    i = doc.rindex(b"startxref\n")
    j = doc.index(b"\n", i + 10)
    return doc[:i] + b"startxref\n42" + doc[j:]


def p_prev_self_loop() -> bytes:
    """Trailer /Prev pointing at its own xref offset: chain cycle."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (Loop) Tj ET", HELV)
    xref_off = doc.rindex(b"xref\n")
    return doc.replace(b"trailer\n<< /Size",
                       b"trailer\n<< /Prev %d /Size" % xref_off)


def p_no_contents() -> bytes:
    """Page without /Contents: reference reads .Stream off None?"""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> >>")
    return f.build(1)


def p_contents_split_bt() -> bytes:
    """BT..ET split across a two-stream /Contents array (legal after the
    ' '-join)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> "
             b"/Contents [5 0 R 6 0 R] >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (Sp")
    f.add_stream(6, b"", b"lit) Tj ET")
    return f.build(1)


def p_do_self_cycle() -> bytes:
    """Form XObject whose content Do-invokes itself: recursion."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> "
             b"/XObject << /X1 6 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (Before) Tj ET /X1 Do")
    f.add_stream(6, b"/Type /XObject /Subtype /Form "
                    b"/Resources << /XObject << /X1 6 0 R >> >>",
                 b"/X1 Do")
    return f.build(1)


def p_lit_backslash_eol() -> bytes:
    """Literal with backslash-newline: spec says line continuation (drop
    both); SplitLiteral KEEPS the raw newline char -> glyph ord 10."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (AB\\\nCD) Tj ET")


def p_lit_raw_newline() -> bytes:
    """Raw (unescaped) newline inside a literal."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (AB\nCD) Tj ET")


def p_lit_octal3() -> bytes:
    """3-digit octal \\101 -> 'A'."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (\\101\\102) Tj ET")


def p_lit_octal_end() -> bytes:
    """Octal escape truncated at string end '(A\\4)': the 2-digit
    lookahead lit[i+2] IndexErrors."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (A\\4) Tj ET")


def p_lit_octal_8() -> bytes:
    """\\8: '8' passes isdigit but int('008', 8) ValueErrors."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (A\\8B) Tj ET")


def p_lit_octal2_mid() -> bytes:
    """2-digit octal mid-string '(A\\41B)': int('041',8)=33 '!'... or is
    it consumed as 3-digit with the 'B'? '4','1' digits, 'B' not ->
    2-digit branch -> '!'."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (A\\41B) Tj ET")


def p_lit_octal2_end() -> bytes:
    """'(A\\40)': two octal digits AT string end — the 3-digit branch's
    lit[i+3] lookahead IndexErrors before the 2-digit branch runs."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (A\\40) Tj ET")


def p_cmap_astral_dst() -> bytes:
    """bfchar dst <D835DC63> (UTF-16BE surrogate pair for an astral
    char): BuildMapper does chr(0xD835DC63) -> ValueError."""
    cm = (_CMAP_SCAFFOLD_TOP
          + b"1 beginbfchar <0041> <D835DC63> endbfchar"
          + _CMAP_SCAFFOLD_END)
    return _type0_doc(cm, b"<0041>")


def p_cmap_lone_surrogate() -> bytes:
    """bfchar dst <D835>: chr(0xD835) is a LONE SURROGATE in Python —
    extracted text carries it."""
    cm = (_CMAP_SCAFFOLD_TOP
          + b"1 beginbfchar <0041> <D835> endbfchar"
          + _CMAP_SCAFFOLD_END)
    return _type0_doc(cm, b"<0041>")


def p_cmap_cidrange() -> bytes:
    """begincidrange <0040> <0060> 97: mapper hits rangedat ->
    chr(97 + cid - 0x40)."""
    cm = (_CMAP_SCAFFOLD_TOP
          + b"1 begincidrange <0040> <0060> 97 endcidrange"
          + _CMAP_SCAFFOLD_END)
    return _type0_doc(cm, b"<00410042>")


def p_tj_positive_kern() -> bytes:
    """TJ with POSITIVE kerns: the space rule is abs(w) > 0.5*avg, so
    +400 draws a space too (text moves LEFT but a space appears)."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td "
                        b"[(Hello) 400 (World) 20 (!)] TJ ET")


def p_gs_font_ref() -> bytes:
    """ExtGState /Font [3 0 R 14]: gs sets Tf to the indirect REF, and
    the next show's GetFont(page, ref) cannot resolve a name."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> "
             b"/ExtGState << /GS1 6 0 R >> >> /Contents 5 0 R >>")
    f.add(6, b"<< /Type /ExtGState /Font [3 0 R 14] >>")
    f.add_stream(5, b"", b"/GS1 gs BT 72 720 Td (ViaGs) Tj ET")
    return f.build(1)


def p_encrypted_doc() -> bytes:
    """Trailer carries /Encrypt: the reference has no decryption at all —
    what does it do with RC4-'encrypted' (here: garbage) streams?"""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", bytes(range(48, 90)) * 2)  # 'ciphertext'
    f.add(6, b"<< /Filter /Standard /V 1 /R 2 /O (x) /U (y) /P -44 >>")
    return f.build(1, extra_trailer=b"/Encrypt 6 0 R ")


def p_no_root() -> bytes:
    """Trailer without /Root."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (NoRoot) Tj ET", HELV)
    return doc.replace(b"/Root 1 0 R ", b"")


def p_tj_empty_array() -> bytes:
    """[] TJ: zero-element show."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td [] TJ (After) Tj ET")


def p_tj_outside_bt() -> bytes:
    """Tj with no BT: text matrix is None at draw time."""
    return _content_doc(b"/F1 12 Tf (Loose) Tj BT /F1 12 Tf "
                        b"72 720 Td (Inside) Tj ET")


def p_encrypt_plaintext() -> bytes:
    """/Encrypt present but the streams are PLAINTEXT (broken producer):
    with no decryption code, the reference just parses them."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (NotReallyEncrypted) Tj ET")
    f.add(6, b"<< /Filter /Standard /V 1 /R 2 /O (x) /U (y) /P -44 >>")
    return f.build(1, extra_trailer=b"/Encrypt 6 0 R ")


def p_symbol_font() -> bytes:
    """Standard-14 Symbol font, no /Encoding: the AFM path maps via
    glyph names (alpha, beta...)."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (Aab) Tj ET",
                      b"<< /Type /Font /Subtype /Type1 /BaseFont /Symbol >>")


def p_zapf_font() -> bytes:
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (abc) Tj ET",
                      b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /ZapfDingbats >>")


def p_times_bold() -> bytes:
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (Bold text) Tj ET",
                      b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Times-Bold >>")


PROBES["symbol_font"] = p_symbol_font
PROBES["zapf_font"] = p_zapf_font
PROBES["times_bold"] = p_times_bold

PROBES["encrypt_plaintext"] = p_encrypt_plaintext
PROBES["encrypted_doc"] = p_encrypted_doc
PROBES["no_root"] = p_no_root
PROBES["tj_empty_array"] = p_tj_empty_array
PROBES["tj_outside_bt"] = p_tj_outside_bt

PROBES["tj_positive_kern"] = p_tj_positive_kern
PROBES["gs_font_ref"] = p_gs_font_ref

PROBES["cmap_astral_dst"] = p_cmap_astral_dst
PROBES["cmap_lone_surrogate"] = p_cmap_lone_surrogate
PROBES["cmap_cidrange"] = p_cmap_cidrange

PROBES["lit_octal2_end"] = p_lit_octal2_end
PROBES["lit_backslash_eol"] = p_lit_backslash_eol
PROBES["lit_raw_newline"] = p_lit_raw_newline
PROBES["lit_octal3"] = p_lit_octal3
PROBES["lit_octal_end"] = p_lit_octal_end
PROBES["lit_octal_8"] = p_lit_octal_8
PROBES["lit_octal2_mid"] = p_lit_octal2_mid

PROBES["no_contents"] = p_no_contents
PROBES["contents_split_bt"] = p_contents_split_bt
PROBES["do_self_cycle"] = p_do_self_cycle

PROBES["hybrid_xrefstm"] = p_hybrid_xrefstm
PROBES["gen_mismatch_ref"] = p_gen_mismatch_ref
PROBES["gen_nonzero_row"] = p_gen_nonzero_row
PROBES["startxref_mid_file"] = p_startxref_mid_file
PROBES["prev_self_loop"] = p_prev_self_loop


# --------------------------------------------------------------------------
# Round-4 dark corner: ToUnicode on SIMPLE fonts (fontcache.py:140-229:
# named-encoding path never reads ToUnicode; indirect-Encoding path builds
# the CMapper EAGERLY but consults it only via MissingGlyphName)

_TU_AX = (b"/CIDInit /ProcSet findresource begin\n"
          b"12 dict begin begincmap\n"
          b"1 begincodespacerange <00> <FF> endcodespacerange\n"
          b"1 beginbfchar <41> <0058> endbfchar\n"
          b"endcmap CMapName currentdict /CMap defineresource pop end end")

_TU_BROKEN = (b"/CIDInit /ProcSet findresource begin\n"
              b"12 dict begin begincmap\n"
              b"1 begincodespacerange <00> <FF> endcodespacerange\n"
              b"1 beginbfchar <41> <0058>\n"
              b"endcmap CMapName currentdict /CMap defineresource pop end end")


def _simple_tu_doc(enc: bytes, cmap: bytes | None,
                   enc_obj: bytes | None = None) -> bytes:
    """TrueType font, /Encoding `enc` (or indirect object 6), optional
    /ToUnicode stream 7, drawing (AB)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    widths = b" ".join(b"450" for _ in range(10))  # 65..74
    extra = b""
    if cmap is not None:
        f.add_stream(7, b"", cmap)
        extra += b"/ToUnicode 7 0 R "
    if enc_obj is not None:
        f.add(6, enc_obj)
        enc = b"6 0 R"
    if enc:
        extra += b"/Encoding " + enc + b" "
    f.add(3, b"<< /Type /Font /Subtype /TrueType /BaseFont /TU "
             b"/FirstChar 65 /LastChar 74 /Widths [%s] %s>>" % (widths, extra))
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (AB) Tj ET")
    return f.build(1)


def p_tu_named_enc() -> bytes:
    """WinAnsi + ToUnicode 'A'->'X': does the named path read the CMap?"""
    return _simple_tu_doc(b"/WinAnsiEncoding", _TU_AX)


def p_tu_named_enc_broken() -> bytes:
    """WinAnsi + UNPARSEABLE ToUnicode: reached at all?"""
    return _simple_tu_doc(b"/WinAnsiEncoding", _TU_BROKEN)


def p_tu_encdict_resolvable() -> bytes:
    """Indirect Encoding dict, glyphs resolvable via base encoding, plus
    ToUnicode 'A'->'X': is the CMap consulted when nothing is missing?"""
    return _simple_tu_doc(b"", _TU_AX,
                          enc_obj=b"<< /Type /Encoding /BaseEncoding "
                                  b"/WinAnsiEncoding /Differences [] >>")


def p_tu_encdict_broken() -> bytes:
    """Indirect Encoding dict + BROKEN ToUnicode, glyphs resolvable: the
    reference builds the CMapper eagerly (fontcache.py:204-205) — does the
    build failure kill the page even though the CMap is never needed?"""
    return _simple_tu_doc(b"", _TU_BROKEN,
                          enc_obj=b"<< /Type /Encoding /BaseEncoding "
                                  b"/WinAnsiEncoding /Differences [] >>")


def p_tu_no_encoding() -> bytes:
    """Simple font with NO /Encoding but a ToUnicode: which path?"""
    return _simple_tu_doc(b"", _TU_AX)


PROBES["tu_named_enc"] = p_tu_named_enc
PROBES["tu_named_enc_broken"] = p_tu_named_enc_broken
PROBES["tu_encdict_resolvable"] = p_tu_encdict_resolvable
PROBES["tu_encdict_broken"] = p_tu_encdict_broken
PROBES["tu_no_encoding"] = p_tu_no_encoding


# --------------------------------------------------------------------------
# Round-4 dark corner: Type0 DescendantFonts edges (fontcache.py:370-452:
# widthmaps of ALL descendants merged last-wins; CIDWidthArrayToMap allows
# floats; missing-cid width raises at draw)


def _t0_doc(desc_bodies: list[bytes], text_hex: bytes = b"<0041>",
            font_extra: bytes = b"") -> bytes:
    """Type0/Identity-H font with custom DescendantFonts objects 6..6+n."""
    f = PdfFile()
    n = len(desc_bodies)
    refs = b" ".join(b"%d 0 R" % (6 + i) for i in range(n))
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, b"<< /Type /Font /Subtype /Type0 /BaseFont /Test-H "
             b"/Encoding /Identity-H /DescendantFonts [" + refs + b"] " +
          font_extra + b">>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td " + text_hex + b" Tj ET")
    for i, body in enumerate(desc_bodies):
        f.add(6 + i, body)
    return f.build(1)


def _cidfont(w: bytes) -> bytes:
    return (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Test "
            b"/CIDSystemInfo << /Registry (T) /Ordering (T) /Supplement 0 >> "
            + w + b" >>")


def p_t0_two_descendants() -> bytes:
    """Two descendant fonts, overlapping W: LAST should win per-CID."""
    return _t0_doc([_cidfont(b"/W [ 0 255 500 ]"),
                    _cidfont(b"/W [ 65 [900] ]")])


def p_t0_empty_descendants() -> bytes:
    """DescendantFonts []: width lookup must fail at draw."""
    return _t0_doc([], text_hex=b"<0041>")


def p_t0_no_w() -> bytes:
    """Descendant without /W: CIDWidthArrayToMap(None)."""
    return _t0_doc([_cidfont(b"")])


def p_t0_w_float_start() -> bytes:
    """W [ 65.5 [500] ]: float base code -> cid 65 not in map at draw."""
    return _t0_doc([_cidfont(b"/W [ 65.5 [500] ]")])


def p_t0_w_float_range() -> bytes:
    """W [ 0.5 255 500 ]: range() on a float start."""
    return _t0_doc([_cidfont(b"/W [ 0.5 255 500 ]")])


def p_t0_w_truncated() -> bytes:
    """W [ 0 ]: lone int, arr[i+1] is out of range."""
    return _t0_doc([_cidfont(b"/W [ 0 ]")])


def p_t0_w_missing_cid() -> bytes:
    """W covers 0..64 only; drawing cid 65 ('A') must fail at draw."""
    return _t0_doc([_cidfont(b"/W [ 0 64 500 ]")])


def p_t0_w_reverse_range() -> bytes:
    """W [ 200 100 500 ]: empty range -> no widths -> draw fails."""
    return _t0_doc([_cidfont(b"/W [ 200 100 500 ]")])


def p_t0_w_nested_empty() -> bytes:
    """W [ 65 [] 65 [600] ]: empty inner array is a no-op segment."""
    return _t0_doc([_cidfont(b"/W [ 65 [] 65 [600] ]")])


PROBES["t0_two_descendants"] = p_t0_two_descendants
PROBES["t0_empty_descendants"] = p_t0_empty_descendants
PROBES["t0_no_w"] = p_t0_no_w
PROBES["t0_w_float_start"] = p_t0_w_float_start
PROBES["t0_w_float_range"] = p_t0_w_float_range
PROBES["t0_w_truncated"] = p_t0_w_truncated
PROBES["t0_w_missing_cid"] = p_t0_w_missing_cid
PROBES["t0_w_reverse_range"] = p_t0_w_reverse_range
PROBES["t0_w_nested_empty"] = p_t0_w_nested_empty


# --------------------------------------------------------------------------
# Round-4 dark corner: q/Q vs text state (reference state.py:96-105 pushes
# a deepcopy of the FULL State incl. .text — so Q restores Tm/Tlm/Tf/TL/...
# even though the spec keeps the text matrix outside the graphics state)


def p_qq_td_inside() -> bytes:
    """Td+show inside q..Q: does Q rewind the text position for (C)?"""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (A) Tj "
                        b"q 0 -50 Td (B) Tj Q (C) Tj ET")


def p_qq_tf_inside() -> bytes:
    """Tf size change inside q..Q: reverted for (Small)?"""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td q /F1 24 Tf (Big) Tj Q "
                        b"(Small) Tj ET")


def p_qq_spanning_bt() -> bytes:
    """q BT ... Tj Q (B) Tj ET: Q rewinds to PRE-BT text state (text
    possibly None) — what happens to (B)?"""
    return _content_doc(b"q BT /F1 12 Tf 72 720 Td (A) Tj Q (B) Tj ET")


def p_qq_tf_before_bt() -> bytes:
    """Tf set inside q..Q BEFORE BT; after Q the font should be gone —
    does the later BT-show raise?"""
    return _content_doc(b"q /F1 12 Tf Q BT 72 720 Td (NoFont) Tj ET")


def p_qq_tl_inside() -> bytes:
    """TL set inside q..Q; T* after Q uses which leading?"""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td q 50 TL Q T* (X) Tj ET")


def p_qq_unbalanced_pop() -> bytes:
    """Bare Q with nothing pushed: 'Cannot pop initial values'."""
    return _content_doc(b"BT /F1 12 Tf 72 720 Td (A) Tj ET Q")


def p_qq_unclosed_push() -> bytes:
    """q never closed: does the page end cleanly?"""
    return _content_doc(b"q BT /F1 12 Tf 72 720 Td (Open q) Tj ET")


PROBES["qq_td_inside"] = p_qq_td_inside
PROBES["qq_tf_inside"] = p_qq_tf_inside
PROBES["qq_spanning_bt"] = p_qq_spanning_bt
PROBES["qq_tf_before_bt"] = p_qq_tf_before_bt
PROBES["qq_tl_inside"] = p_qq_tl_inside
PROBES["qq_unbalanced_pop"] = p_qq_unbalanced_pop
PROBES["qq_unclosed_push"] = p_qq_unclosed_push

PROBES["objstm_phantom_cut10"] = p_objstm_phantom_cut10
PROBES["objstm_phantom_cut2"] = p_objstm_phantom_cut2
PROBES["objstm_baseline"] = p_objstm_baseline
PROBES["objstm_extends"] = p_objstm_extends
PROBES["objstm_wrong_end"] = p_objstm_wrong_end
PROBES["objstm_n_short"] = p_objstm_n_short
PROBES["objstm_n_long"] = p_objstm_n_long
PROBES["objstm_first_minus4"] = p_objstm_first_minus4
PROBES["objstm_first_plus4"] = p_objstm_first_plus4
PROBES["objstm_id_mismatch"] = p_objstm_id_mismatch
PROBES["objstm_swapped_rows"] = p_objstm_swapped_rows


# ---------------------------------------------------------------------------
# Round 5: chain-walk via trailer startxref (ADVICE r05 item 1), unicode
# strip in the xref sniff (item 2), and COMMENT-token positional effects
# (the reference lexer RETURNS comment tokens, parser/pdf.py:69-73, and
# neither consolidation nor Convert filters them -> positional shifts and
# 'Unknown token type' deaths that our comment-folding scanner would skip).


def p_chain_sxr_fork() -> bytes:
    """No-/Prev trailer A whose own startxref points at an UNVISITED
    section B that alone indexes the content object.  Reference follows
    t.startxref.offset (parser/__init__.py:149) -> finds obj 5."""
    from fixtures.pdfgen import _obj, _stream_obj
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    bodies = {
        1: _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        2: _obj(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        3: _obj(3, HELV),
        4: _obj(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                   b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
        5: _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (ForkText) Tj ET"),
    }
    for oid in sorted(bodies):
        offsets[oid] = len(out)
        out += bodies[oid]
    xb = len(out)  # section B: only obj 5; terminates chain (startxref 0)
    out += b"xref\n5 1\n%010d 00000 n \n" % offsets[5]
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    xa = len(out)  # section A: objs 0-4 only; startxref -> XB
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for oid in range(1, 5):
        out += b"%010d 00000 n \n" % offsets[oid]
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xb
    out += b"startxref\n%d\n%%%%EOF\n" % xa  # file tail: entry -> XA
    return bytes(out)


def p_chain_sxr_zero() -> bytes:
    """Same layout but trailer A's startxref is 0: chain stops, obj 5
    unfindable -> what does extraction look like?"""
    doc = p_chain_sxr_fork()
    # trailer A's startxref is the second-to-last startxref value
    k = doc.rindex(b"startxref\n", 0, doc.rindex(b"startxref\n"))
    j = doc.index(b"\n", k + 10)
    return doc[:k] + b"startxref\n0" + doc[j:]


def _upd_section(base: bytes, trailer_tail: bytes) -> bytes:
    """Append an incremental update overriding obj 5, with a custom
    trailer tail (caller supplies everything after the rows)."""
    from fixtures.pdfgen import _stream_obj
    tail = base.rsplit(b"startxref\n", 1)[1]
    orig_xref = int(tail.split(b"\n", 1)[0])
    upd = bytearray(base)
    newoff = len(upd)
    upd += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Updated text) Tj ET")
    xref_off = len(upd)
    upd += b"xref\n5 1\n%010d 00000 n \n" % newoff
    upd += trailer_tail.replace(b"{PREV}", b"%d" % orig_xref)
    upd += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(upd)


def p_chain_prev_no_sxr() -> bytes:
    """Trailer WITH /Prev but NO startxref before its %%EOF: Convert_
    StartXRef(value[1:3]) indexes toks[1] -> IndexError?  (Convert_Trailer
    runs for EVERY plaintext trailer, __init__.py:1281-1287.)"""
    base = simple_doc(b"BT /F1 12 Tf 72 720 Td (Original text) Tj ET", HELV)
    return _upd_section(
        base, b"trailer\n<< /Size 6 /Root 1 0 R /Prev {PREV} >>\n%%EOF\n")


def p_chain_no_prev_no_sxr() -> bytes:
    """Neither /Prev nor startxref in the newest trailer."""
    base = simple_doc(b"BT /F1 12 Tf 72 720 Td (Original text) Tj ET", HELV)
    return _upd_section(base, b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")


def p_chain_comment_before_sxr() -> bytes:
    """Comment line between trailer dict and startxref: COMMENT is a real
    token, so value[1:3]=[COMMENT, xref_start] -> offset='startxref'."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (CmtSxr) Tj ET", HELV)
    return doc.replace(b">>\nstartxref\n", b">>\n% note\nstartxref\n")


def p_chain_bare_ints_zero() -> bytes:
    """Bare '999 0' between dict and startxref: positional Convert takes
    value[2]=0 as the next offset -> chain just terminates?"""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (BareZero) Tj ET", HELV)
    return doc.replace(b">>\nstartxref\n", b">>\n999 0\nstartxref\n")


def p_chain_bare_ints_junk() -> bytes:
    """Bare '0 999' between dict and startxref: value[2]=999 -> jumps to
    byte 999 as an xref offset -> garbage."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (BareJunk) Tj ET", HELV)
    return doc.replace(b">>\nstartxref\n", b">>\n0 999\nstartxref\n")


def p_chain_negative_sxr() -> bytes:
    """Tail startxref is negative: file.seek(-5) -> OSError?"""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (NegSxr) Tj ET", HELV)
    i = doc.rindex(b"startxref\n")
    j = doc.index(b"\n", i + 10)
    return doc[:i] + b"startxref\n-5" + doc[j:]


def p_sniff_nbsp_xref() -> bytes:
    """NBSP glued to the 'xref' section-header line: the sniff decodes
    latin-1 and str.strip()s (unicode, both ends, __init__.py:221) so the
    reference sees 'xref'; raw-bytes tokenization dies on \\xa0."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (NbspXref) Tj ET", HELV)
    i = doc.rindex(b"xref\n0 ")
    return doc[:i] + b"xref\xa0\n" + doc[i + 5:]


def p_sniff_nel_xref() -> bytes:
    """Same with \\x85 (NEL) — also stripped by unicode str.strip()."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (NelXref) Tj ET", HELV)
    i = doc.rindex(b"xref\n0 ")
    return doc[:i] + b"xref\x85\n" + doc[i + 5:]


def p_sniff_comment_objline() -> bytes:
    """Comment glued onto the xref-stream header line: sniff tokens are
    [INT,INT,obj,COMMENT] -> len 4 -> NOT a stream -> plaintext scan for
    a 'trailer' line that doesn't exist."""
    from fixtures.pdfgen import FIXTURES
    doc = FIXTURES["f05_xrefstream"]()
    return doc.replace(b"7 0 obj\n", b"7 0 obj % c\n")


def p_comment_in_catalog() -> bytes:
    """Comment inside the catalog dict: COMMENT lands in a key/value slot
    of Convert_Dictionary -> Convert raises 'Unknown token type'."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog % c\n/Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (CmtCat) Tj ET")
    return f.build(1)


def p_comment_in_content_dict() -> bytes:
    """Comment inside the content STREAM dict (hits the NeedStreamLength
    replay path): page-level or doc-level?"""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    data = b"BT /F1 12 Tf 72 720 Td (CmtStream) Tj ET"
    f.add_raw(5, b"5 0 obj\n<< %% c\n/Length %d >>\nstream\n" % len(data)
                 + data + b"\nendstream\nendobj\n")
    return f.build(1)


def p_comment_before_obj_dict() -> bytes:
    """Comment between 'INT INT obj' and the dict."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    data = b"BT /F1 12 Tf 72 720 Td (CmtObj) Tj ET"
    f.add_raw(5, b"5 0 obj %% c\n<< /Length %d >>\nstream\n" % len(data)
                 + data + b"\nendstream\nendobj\n")
    return f.build(1)


def p_comment_in_kids_array() -> bytes:
    """Comment inside the /Kids array."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [% c\n4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (CmtKids) Tj ET")
    return f.build(1)


def p_comment_in_xref_rows() -> bytes:
    """Comment line between the subsection header and the first row:
    Convert_XRef's 3-stride sees COMMENT where INT is required."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (CmtRows) Tj ET", HELV)
    i = doc.rindex(b"xref\n0 ")
    eol = doc.index(b"\n", i + 5)  # end of the '0 N' subsection line
    return doc[:eol + 1] + b"% c\n" + doc[eol + 1:]


def p_comment_in_trailer_dict() -> bytes:
    """Comment inside the trailer dictionary."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (CmtTrailer) Tj ET", HELV)
    return doc.replace(b"trailer\n<< /Size", b"trailer\n<< % c\n/Size")


PROBES["chain_sxr_fork"] = p_chain_sxr_fork
PROBES["chain_sxr_zero"] = p_chain_sxr_zero
PROBES["chain_prev_no_sxr"] = p_chain_prev_no_sxr
PROBES["chain_no_prev_no_sxr"] = p_chain_no_prev_no_sxr
PROBES["chain_comment_before_sxr"] = p_chain_comment_before_sxr
PROBES["chain_bare_ints_zero"] = p_chain_bare_ints_zero
PROBES["chain_bare_ints_junk"] = p_chain_bare_ints_junk
PROBES["chain_negative_sxr"] = p_chain_negative_sxr
PROBES["sniff_nbsp_xref"] = p_sniff_nbsp_xref
PROBES["sniff_nel_xref"] = p_sniff_nel_xref
PROBES["sniff_comment_objline"] = p_sniff_comment_objline
PROBES["comment_in_catalog"] = p_comment_in_catalog
PROBES["comment_in_content_dict"] = p_comment_in_content_dict
PROBES["comment_before_obj_dict"] = p_comment_before_obj_dict
PROBES["comment_in_kids_array"] = p_comment_in_kids_array
PROBES["comment_in_xref_rows"] = p_comment_in_xref_rows
PROBES["comment_in_trailer_dict"] = p_comment_in_trailer_dict


def _five_obj_doc(bodies5: dict) -> "object":
    """Standard 5-object graph with per-oid raw override via bodies5."""
    from fixtures.pdfgen import _obj, _stream_obj
    f = PdfFile()
    defaults = {
        1: _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        2: _obj(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        3: _obj(3, HELV),
        4: _obj(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                   b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
        5: _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (TrailCmt) Tj ET"),
    }
    defaults.update(bodies5)
    for oid in sorted(defaults):
        f.bodies[oid] = defaults[oid]
    return f


def p_tcmt_catalog() -> bytes:
    """Trailing comment after the catalog dict (before endobj):
    _StupidObjectParser indexes value[2][0] -> tolerated?"""
    f = _five_obj_doc({1: b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >> "
                          b"% c\nendobj\n"})
    return f.build(1)


def p_tcmt_page() -> bytes:
    f = _five_obj_doc({4: b"4 0 obj\n<< /Type /Page /Parent 2 0 R "
                          b"/MediaBox [0 0 612 792] /Resources << /Font "
                          b"<< /F1 3 0 R >> >> /Contents 5 0 R >> % c\nendobj\n"})
    return f.build(1)


def p_tcmt_font() -> bytes:
    f = _five_obj_doc({3: b"3 0 obj\n" + HELV + b" % c\nendobj\n"})
    return f.build(1)


def p_tcmt_content() -> bytes:
    """Comment between endstream and endobj of the content stream."""
    data = b"BT /F1 12 Tf 72 720 Td (TcmtStream) Tj ET"
    f = _five_obj_doc({5: b"5 0 obj\n<< /Length %d >>\nstream\n" % len(data)
                          + data + b"\nendstream % c\nendobj\n"})
    return f.build(1)


def p_tcmt_length() -> bytes:
    """Indirect /Length whose int object has a trailing comment:
    _ParseInt indexes value[2][0] -> tolerated?"""
    data = b"BT /F1 12 Tf 72 720 Td (TcmtLen) Tj ET"
    f = _five_obj_doc({5: b"5 0 obj\n<< /Length 6 0 R >>\nstream\n"
                          + data + b"\nendstream\nendobj\n"})
    f.bodies[6] = b"6 0 obj\n%d %% c\nendobj\n" % len(data)
    return f.build(1)


def p_tcmt_resource_dict() -> bytes:
    """Indirect font RESOURCE dict with trailing comment: the Resource
    attr loader uses GetDictionary -> _ParseDictionary Converts the WHOLE
    inner token list -> COMMENT dies?"""
    f = _five_obj_doc({4: b"4 0 obj\n<< /Type /Page /Parent 2 0 R "
                          b"/MediaBox [0 0 612 792] /Resources << /Font "
                          b"7 0 R >> /Contents 5 0 R >>\nendobj\n"})
    f.bodies[7] = b"7 0 obj\n<< /F1 3 0 R >> % c\nendobj\n"
    return f.build(1)


def p_cmt_before_header() -> bytes:
    """xref offset points at a comment line preceding 'INT INT obj'."""
    data = b"BT /F1 12 Tf 72 720 Td (CmtHdr) Tj ET"
    f = _five_obj_doc({5: b"%% c\n5 0 obj\n<< /Length %d >>\nstream\n" % len(data)
                          + data + b"\nendstream\nendobj\n"})
    return f.build(1)


def p_objstm_cmt() -> bytes:
    """Comment inside an object-stream inner object (the catalog) —
    rebuilt from scratch (offsets recomputed)."""
    from fixtures.pdfgen import _stream_obj, flate, png_up_encode
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    offsets[5] = len(out)
    out += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (ObjstmCmt) Tj ET")
    inner = [
        (1, b"<< /Type /Catalog % c\n/Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (3, HELV),
        (4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
    ]
    bodies = b""
    offs = []
    for oid, body in inner:
        offs.append((oid, len(bodies)))
        bodies += body + b" "
    index = b" ".join(b"%d %d" % (o, off) for o, off in offs) + b" "
    objstm_data = index + bodies
    offsets[6] = len(out)
    out += _stream_obj(
        6, b"/Type /ObjStm /N %d /First %d" % (len(inner), len(index)),
        objstm_data)
    xref_off = len(out)

    def row(t, f2, f3):
        return bytes([t, (f2 >> 8) & 0xFF, f2 & 0xFF, f3])

    rows = [row(0, 0, 255)] + [row(2, 6, k) for k in range(4)]
    rows += [row(1, offsets[5], 0), row(1, offsets[6], 0),
             row(1, xref_off, 0)]
    xdata = flate(png_up_encode(rows))
    xdict = (b"/Type /XRef /Size 8 /W [1 2 1] /Root 1 0 R "
             b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>")
    out += _stream_obj(7, xdict, xdata)
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def p_tail_glued_comment() -> bytes:
    """Appended tail whose startxref line has glued junk: the reference's
    reverse scan needs a line EXACTLY 'startxref' -> walks further back
    to the trailer's own startxref -> still extracts via XA."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (GluedTail) Tj ET", HELV)
    return doc + b"startxref % c\n123\n%%EOF\n"


def p_tail_comment_between() -> bytes:
    """Appended clean tail with a comment line between startxref and the
    INT: toks[1] is COMMENT, not INT -> dies?"""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (TailCmt) Tj ET", HELV)
    tail = doc.rsplit(b"startxref\n", 1)[1]
    xa = int(tail.split(b"\n", 1)[0])
    return doc + b"startxref\n%% c\n%d\n%%%%EOF\n" % xa


PROBES["tcmt_catalog"] = p_tcmt_catalog
PROBES["tcmt_page"] = p_tcmt_page
PROBES["tcmt_font"] = p_tcmt_font
PROBES["tcmt_content"] = p_tcmt_content
PROBES["tcmt_length"] = p_tcmt_length
PROBES["tcmt_resource_dict"] = p_tcmt_resource_dict
PROBES["cmt_before_header"] = p_cmt_before_header
PROBES["objstm_cmt"] = p_objstm_cmt
PROBES["tail_glued_comment"] = p_tail_glued_comment
PROBES["tail_comment_between"] = p_tail_comment_between


def _cmap_probe(cmap_body: bytes) -> bytes:
    return _type0_doc(cmap_body, b"<0041>")


CMAP_CMT_OUTSIDE = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
% a comment between sections
1 beginbfchar <0041> <0058> endbfchar
endcmap CMapName currentdict /CMap defineresource pop end end"""

CMAP_CMT_IN_BFCHAR = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
1 beginbfchar <0041>
% comment inside the section
<0058> endbfchar
endcmap CMapName currentdict /CMap defineresource pop end end"""

CMAP_CMT_IN_BFRANGE = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
1 beginbfrange <0041> <0043>
% comment inside range
<0058> endbfrange
endcmap CMapName currentdict /CMap defineresource pop end end"""

CMAP_CMT_IN_CODESPACE = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange % cmt
<0000> <FFFF> endcodespacerange
1 beginbfchar <0041> <0058> endbfchar
endcmap CMapName currentdict /CMap defineresource pop end end"""


def p_cmap_cmt_outside() -> bytes:
    return _cmap_probe(CMAP_CMT_OUTSIDE)


def p_cmap_cmt_in_bfchar() -> bytes:
    return _cmap_probe(CMAP_CMT_IN_BFCHAR)


def p_cmap_cmt_in_bfrange() -> bytes:
    return _cmap_probe(CMAP_CMT_IN_BFRANGE)


def p_cmap_cmt_in_codespace() -> bytes:
    return _cmap_probe(CMAP_CMT_IN_CODESPACE)


def p_cr_tail() -> bytes:
    """CR-only line endings in the startxref tail: the reference's
    REVERSE reader splits on bare \\r too (betterfile.py:94-130), so the
    'startxref' line is found; forward readers split on \\n only."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (CrTail) Tj ET", HELV)
    i = doc.rindex(b"startxref\n")
    tail = doc[i:]
    return doc[:i] + tail.replace(b"\n", b"\r")


def p_cr_xref_region() -> bytes:
    """CR-only endings through the whole xref+trailer region."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (CrXref) Tj ET", HELV)
    i = doc.rindex(b"xref\n0 ")
    region = doc[i:]
    return doc[:i] + region.replace(b"\n", b"\r")


PROBES["cmap_cmt_outside"] = p_cmap_cmt_outside
PROBES["cmap_cmt_in_bfchar"] = p_cmap_cmt_in_bfchar
PROBES["cmap_cmt_in_bfrange"] = p_cmap_cmt_in_bfrange
PROBES["cmap_cmt_in_codespace"] = p_cmap_cmt_in_codespace
PROBES["cr_tail"] = p_cr_tail
PROBES["cr_xref_region"] = p_cr_xref_region


if __name__ == "__main__":
    main()
