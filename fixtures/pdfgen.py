"""Deterministic PDF fixture synthesizer.

Generates small, byte-offset-exact PDFs that exercise the reference
extraction surface (cmlburnett/pypdfproc) one feature at a time — see
FIXTURES.md §2 for the feature matrix.  The reference ships no test PDFs of
its own (SURVEY.md §5), so these are the corpus for the byte-identical
differential test: ``pypdfproc.PDF(f).GetFullText()`` output is frozen as the
golden, and the new engine must match it byte-for-byte.

Everything is seed-free and wall-clock-free: identical output on every run.

No code is copied from the reference; PDFs are assembled from the public PDF
1.7 specification (ISO 32000-1) object/xref/stream syntax.
"""

from __future__ import annotations

import zlib


def _obj(oid: int, body: bytes) -> bytes:
    return b"%d 0 obj\n" % oid + body + b"\nendobj\n"


def _stream_obj(oid: int, dict_extra: bytes, data: bytes) -> bytes:
    """A stream object; dict_extra is everything except /Length."""
    d = b"<< " + dict_extra + b" /Length %d >>" % len(data)
    return (
        b"%d 0 obj\n" % oid + d + b"\nstream\n" + data + b"\nendstream\nendobj\n"
    )


def flate(data: bytes) -> bytes:
    return zlib.compress(data)


def png_up_encode(rows: list[bytes]) -> bytes:
    """Encode fixed-width rows with PNG Up predictor (type 2), the only
    predictor the reference implements (decoder/flate.py:38-121)."""
    out = bytearray()
    prev = bytes(len(rows[0]))
    for r in rows:
        assert len(r) == len(prev)
        out.append(2)
        out.extend((b - p) % 256 for b, p in zip(r, prev))
        prev = r
    return bytes(out)


class PdfFile:
    """Assembles a PDF with a plaintext xref table (single 0-based subsection)."""

    def __init__(self, version: b"1.4" = b"1.4"):
        self.header = b"%PDF-" + version + b"\n"
        self.bodies: dict[int, bytes] = {}

    def add(self, oid: int, body: bytes) -> int:
        self.bodies[oid] = _obj(oid, body)
        return oid

    def add_stream(self, oid: int, dict_extra: bytes, data: bytes) -> int:
        self.bodies[oid] = _stream_obj(oid, dict_extra, data)
        return oid

    def add_raw(self, oid: int, raw: bytes) -> int:
        self.bodies[oid] = raw
        return oid

    def build(self, root_oid: int, extra_trailer: bytes = b"") -> bytes:
        out = bytearray(self.header)
        offsets = {}
        for oid in sorted(self.bodies):
            offsets[oid] = len(out)
            out += self.bodies[oid]
        xref_off = len(out)
        maxoid = max(self.bodies)
        out += b"xref\n0 %d\n" % (maxoid + 1)
        out += b"0000000000 65535 f \n"
        for oid in range(1, maxoid + 1):
            if oid in offsets:
                out += b"%010d 00000 n \n" % offsets[oid]
            else:
                out += b"0000000000 65535 f \n"
        out += (
            b"trailer\n<< /Size %d /Root %d 0 R %s>>\nstartxref\n%d\n%%%%EOF\n"
            % (maxoid + 1, root_oid, extra_trailer, xref_off)
        )
        return bytes(out)


def simple_doc(content: bytes, font_body: bytes, n_pages: int = 1,
               contents_per_page: list[bytes] | None = None,
               page_extra: bytes = b"") -> bytes:
    """1..n page document: catalog(1) pages(2) font(3) page(4..) content(4+n..)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    page_oids = [4 + i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % o for o in page_oids)
    f.add(2, b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages))
    f.add(3, font_body)
    for i, po in enumerate(page_oids):
        co = 4 + n_pages + i
        f.add(po, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                  b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R %s>>"
              % (co, page_extra))
        data = contents_per_page[i] if contents_per_page else content
        f.add_stream(co, b"", data)
    return f.build(1)


HELV = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"


def f01_hello() -> bytes:
    """1 page, Type1 standard font (AFM widths), literal-string Tj."""
    c = b"BT /F1 12 Tf 72 720 Td (Hello World) Tj ET"
    return simple_doc(c, HELV)


def f02_multipage() -> bytes:
    """Nested page tree Pages -> (Page, Pages -> (Page, Page), Page, Page) = 5 leaves."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    # 2 = root Pages with kids [4, 3, 7, 8]; 3 = inner Pages with kids [5, 6]
    f.add(2, b"<< /Type /Pages /Kids [4 0 R 3 0 R 7 0 R 8 0 R] /Count 5 >>")
    f.add(3, b"<< /Type /Pages /Parent 2 0 R /Kids [5 0 R 6 0 R] /Count 2 >>")
    f.add(9, HELV)
    for i, (po, parent) in enumerate([(4, 2), (5, 3), (6, 3), (7, 2), (8, 2)]):
        co = 10 + i
        f.add(po, b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                  b"/Resources << /Font << /F1 9 0 R >> >> /Contents %d 0 R >>"
              % (parent, co))
        f.add_stream(co, b"", b"BT /F1 12 Tf 72 720 Td (Page %d) Tj ET" % (i + 1))
    return f.build(1)


def f03_kerning() -> bytes:
    """TJ array with kerns above and below the 50%-of-avg-width threshold."""
    # Helvetica avg nonzero AFM width is ~500-600; -400 > 0.5*avg -> space,
    # -20 stays below the threshold -> no space.
    c = b"BT /F1 12 Tf 72 720 Td [(Hello) -400 (World) -20 (!)] TJ ET"
    return simple_doc(c, HELV)


def f04_flate() -> bytes:
    """FlateDecode content stream, no predictor."""
    raw = b"BT /F1 12 Tf 72 720 Td (Deflated text) Tj ET"
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"/Filter /FlateDecode", flate(raw))
    return f.build(1)


def f05_xrefstream() -> bytes:
    """xref stream (PNG-Up predictor 12) + object stream holding the graph."""
    header = b"%PDF-1.5\n"
    out = bytearray(header)
    offsets = {}

    # Object 5: content stream (plain object; streams cannot live in objstm)
    offsets[5] = len(out)
    out += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Compressed objects) Tj ET")

    # Objects 1..4 (catalog, pages, font, page) inside object stream 6
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (3, HELV),
        (4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
    ]
    bodies = b""
    index = b""
    offs = []
    for oid, body in inner:
        offs.append((oid, len(bodies)))
        bodies += body + b" "
    index = b" ".join(b"%d %d" % (o, off) for o, off in offs) + b" "
    objstm_data = index + bodies
    offsets[6] = len(out)
    out += _stream_obj(
        6,
        b"/Type /ObjStm /N %d /First %d" % (len(inner), len(index)),
        objstm_data,
    )

    # Object 7: the xref stream.  W = [1 2 1]; rows for oids 0..7.
    xref_off = len(out)

    def row(t, f2, f3):
        return bytes([t, (f2 >> 8) & 0xFF, f2 & 0xFF, f3])

    rows = [
        row(0, 0, 255),          # 0: free
        row(2, 6, 0),            # 1: in objstm 6, index 0
        row(2, 6, 1),            # 2: in objstm 6, index 1
        row(2, 6, 2),            # 3: in objstm 6, index 2
        row(2, 6, 3),            # 4: in objstm 6, index 3
        row(1, offsets[5], 0),   # 5: regular
        row(1, offsets[6], 0),   # 6: regular
        row(1, xref_off, 0),     # 7: the xref stream itself
    ]
    xdata = flate(png_up_encode(rows))
    xdict = (
        b"/Type /XRef /Size 8 /W [1 2 1] /Root 1 0 R "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>"
    )
    out += _stream_obj(7, xdict, xdata)
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def f06_widths() -> bytes:
    """TrueType with explicit /Widths + WinAnsiEncoding; Td/TD/T* multi-line."""
    font = (
        b"<< /Type /Font /Subtype /TrueType /BaseFont /FixtureSans "
        b"/FirstChar 32 /LastChar 126 /Widths [%s] "
        b"/Encoding /WinAnsiEncoding >>"
        % b" ".join(b"500" for _ in range(95))
    )
    c = (b"BT /F1 10 Tf 72 700 Td (Line one) Tj "
         b"0 -14 TD (Line two) Tj T* (Line three) Tj ET")
    return simple_doc(c, font)


def f07_differences() -> bytes:
    """Encoding dict with /Differences + ToUnicode CMap (bfchar + bfrange)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    # Differences: code 65 -> glyph A (standard), codes 97.. -> custom g-names
    # resolved only through the ToUnicode CMap (MissingGlyphName path).
    f.add(6, b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
             b"/Differences [65 /A /B 97 /gx01 /gx02 /gx03] >>")
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin\nbegincmap\n"
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"2 beginbfchar\n<61> <0061>\n<62> <0062>\nendbfchar\n"
        b"1 beginbfrange\n<63> <63> <0063>\nendbfrange\n"
        b"endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
    )
    f.add_stream(7, b"", cmap)
    widths = b" ".join(b"450" for _ in range(40))  # covers 65..104
    f.add(3, b"<< /Type /Font /Subtype /TrueType /BaseFont /FixtureDiff "
             b"/FirstChar 65 /LastChar 104 /Widths [%s] "
             b"/Encoding 6 0 R /ToUnicode 7 0 R >>" % widths)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    # Draw: A B (Differences->std glyphs), then a b c via CMap fallback names
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (AB) Tj 0 -20 Td (abc) Tj ET")
    return f.build(1)


def f08_type0() -> bytes:
    """Type0 / Identity-H with 2-byte hexstring Tj and both /W forms."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    # Descendant CIDFontType2 with W in both forms:
    #   [72 [600 610 620]]  (start + array)   covers cids 72..74 (H, I, J)
    #   [101 108 550]       (lo hi same-width) covers cids 101..108 (e..l)
    f.add(6, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FixtureCID "
             b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
             b"/Supplement 0 >> /W [72 [600 610 620] 101 108 550] >>")
    f.add(3, b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCID "
             b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    # <00480069> = cids 72, 105 -> "Hi"; and cids 101,108,108 -> "ell"
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td <00480065006C006C> Tj ET")
    return f.build(1)


def f09_xobject() -> bytes:
    """Form XObject invoked via Do, with its own /Resources (recursion)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    # NB: the page deliberately has NO /Font resource: the reference resolves
    # font names by scanning the resource stack page-first (__init__.py:128-158)
    # and raises if the page's Font dict exists but lacks the name.
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /XObject << /Fx1 6 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"q 1 0 0 1 0 0 cm /Fx1 Do Q")
    xcontent = b"BT /F1 12 Tf 72 700 Td (Inside form) Tj ET"
    # NB: the XObject's /Resources must be an indirect reference: the
    # reference returns an inline dict un-wrapped (parser/__init__.py:920-925)
    # and then GetFont crashes on Dictionary.Font -> page dropped.
    f.add(7, b"<< /Font << /F1 3 0 R >> >>")
    f.add_stream(
        6,
        b"/Type /XObject /Subtype /Form /BBox [0 0 612 792] "
        b"/Resources 7 0 R",
        xcontent,
    )
    return f.build(1)


def f10_incremental() -> bytes:
    """Incremental update: content stream overridden in a second section."""
    base = simple_doc(b"BT /F1 12 Tf 72 720 Td (Original text) Tj ET", HELV)
    # locate original xref offset (startxref value at the tail)
    tail = base.rsplit(b"startxref\n", 1)[1]
    orig_xref = int(tail.split(b"\n", 1)[0])
    # object 5 is the content stream in simple_doc layout; override it
    upd = bytearray(base)
    newoff = len(upd)
    upd += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Updated text) Tj ET")
    # NB: single subsection starting at the updated object -- the reference's
    # xref consolidator only consumes the first subsection (parser/pdf.py:240-281).
    xref_off = len(upd)
    upd += b"xref\n5 1\n%010d 00000 n \n" % newoff
    upd += (
        b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (orig_xref, xref_off)
    )
    return bytes(upd)


def f11_escapes() -> bytes:
    """Literal-string escapes (\\n \\t octal, escaped parens, backslash)."""
    # NB: stick to characters present in StandardEncoding -- the reference's
    # Type1 path raises on unmapped cids (fontcache.py:118-119), which would
    # drop the whole page.  \164 = 't', \040 = space.
    c = (b"BT /F1 12 Tf 72 720 Td "
         b"(Oc\\164al\\040char) Tj 0 -20 Td "
         b"(par\\(en\\)s) Tj 0 -20 Td "
         b"(back\\\\slash) Tj ET")
    return simple_doc(c, HELV)


def f12_badpage() -> bytes:
    """Unsupported operator (') mid-page: page dropped, rest extracted.

    Replicates the reference error policy: the page raises mid-render, its
    partial text stays in the fold buffer and leaks into the next page
    (__init__.py:287-296,542-543,607-609) and the page's pushed resources are
    never popped.
    """
    pages = [
        b"BT /F1 12 Tf 72 720 Td (First good page) Tj ET",
        b"BT /F1 12 Tf 72 720 Td (Partial) Tj (bad) ' ET",
        b"BT /F1 12 Tf 72 720 Td (Last good page) Tj ET",
    ]
    return simple_doc(b"", HELV, n_pages=3, contents_per_page=pages)


def f13_cff_mathpi() -> bytes:
    """Missing-glyph CFF path: Differences name custom glyphs that only the
    embedded FontFile3 (CFF) can resolve, mapped through the reference's
    MathematicalPi-One table (fontcache.py:268-366)."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from pypdfproc_spark.core.cff import build_cff

    cff = build_cff(
        "Fixture-MathematicalPi-One",
        [("gmathA", ord("a")), ("gmathB", ord("3"))],  # -> alpha, multiply
    )
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(6, b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
             b"/Differences [65 /gmathA /gmathB] >>")
    f.add_stream(8, b"/Subtype /Type1C", cff)
    f.add(7, b"<< /Type /FontDescriptor /FontName /Fixture-MathematicalPi-One "
             b"/Flags 4 /FontFile3 8 0 R >>")
    widths = b" ".join(b"500" for _ in range(10))
    f.add(3, b"<< /Type /Font /Subtype /TrueType "
             b"/BaseFont /Fixture-MathematicalPi-One "
             b"/FirstChar 65 /LastChar 74 /Widths [%s] "
             b"/Encoding 6 0 R /FontDescriptor 7 0 R >>" % widths)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (AB) Tj ET")
    return f.build(1)


def f14_contents_array() -> bytes:
    """Page /Contents as an ARRAY of streams, concatenated with ' ' by the
    reference (__init__.py:312-325); the split lands mid-operator sequence."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents [5 0 R 6 0 R] >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720")
    f.add_stream(6, b"", b"Td (Split streams) Tj ET")
    return f.build(1)


def f15_indirect_length() -> bytes:
    """Stream /Length as an indirect reference (two-pass discovery in the
    reference, parser/__init__.py:371-413)."""
    raw = b"BT /F1 12 Tf 72 720 Td (Indirect length) Tj ET"
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_raw(5, b"5 0 obj\n<< /Length 6 0 R >>\nstream\n" + raw
                 + b"\nendstream\nendobj\n")
    f.add(6, b"%d" % len(raw))
    return f.build(1)


def f16_extgstate_font() -> bytes:
    """gs operator sets the font via ExtGState /Font — note the reference
    fires NO 'change font' callback for it (__init__.py:373-413), so the
    width state for the implied-space heuristic stays at the last Tf."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(7, b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman >>")
    f.add(8, b"<< /Type /ExtGState /LW 2 /Font [/F2 10] >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R /F2 7 0 R >> "
             b"/ExtGState << /G1 8 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (Helv) Tj "
                         b"/G1 gs [(Times) -400 (kern)] TJ ET")
    return f.build(1)


def f17_tz_tc_tw() -> bytes:
    """Tz/Tc/Tw spacing params: change advances (and the TJ kern threshold
    arithmetic, state.py:384-416) but stay on one line."""
    c = (b"BT /F1 12 Tf 50 Tz 1.5 Tc 2 Tw 72 720 Td "
         b"[(Wide) -900 (gap) -10 (close)] TJ ET")
    return simple_doc(c, HELV)


def f18_q_Q_cm() -> bytes:
    """q/Q state save-restore with a cm translate: glyph y moves while the
    cm is active and snaps back after Q -> newline boundaries from state
    stack behavior (state.py:83-105)."""
    c = (b"BT /F1 12 Tf 72 720 Td (Base) Tj ET "
         b"q 1 0 0 1 0 -50 cm BT /F1 12 Tf 72 720 Td (Shifted) Tj ET Q "
         b"BT /F1 12 Tf 72 720 Td (Back) Tj ET")
    return simple_doc(c, HELV)


def f19_hexstring_simple_font() -> bytes:
    """Hexstring Tj under a non-Identity (Type1) font: the reference raises
    NotImplementedError (__init__.py:502-510) -> page dropped; a good page
    follows."""
    pages = [
        b"BT /F1 12 Tf 72 720 Td <48656C6C6F> Tj ET",
        b"BT /F1 12 Tf 72 720 Td (Survivor page) Tj ET",
    ]
    return simple_doc(b"", HELV, n_pages=2, contents_per_page=pages)


def f20_nested_xobject() -> bytes:
    """XObject invoking another XObject: the reference resolves Do names
    against the PAGE's resources regardless of nesting (__init__.py:448)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(9, b"<< /Font << /F1 3 0 R >> >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /XObject << /FxA 6 0 R /FxB 7 0 R >> >> "
             b"/Contents 5 0 R >>")
    f.add_stream(5, b"", b"/FxA Do")
    f.add_stream(6, b"/Type /XObject /Subtype /Form /BBox [0 0 612 792] "
                    b"/Resources 9 0 R",
                 b"BT /F1 12 Tf 72 700 Td (Outer form) Tj ET /FxB Do")
    f.add_stream(7, b"/Type /XObject /Subtype /Form /BBox [0 0 612 792] "
                    b"/Resources 9 0 R",
                 b"BT /F1 12 Tf 72 680 Td (Inner form) Tj ET")
    return f.build(1)


def f21_type0_tounicode() -> bytes:
    """Type0 with an explicit /ToUnicode CMap overriding Identity mapping:
    bfchar + bfrange drive the CID->unicode translation
    (fontcache.py:370-452 Type0FontCache with a real CMap)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    cmap = (
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0001> <0394>\n<0002> <03A9>\nendbfchar\n"
        b"1 beginbfrange\n<0010> <0012> <0041>\nendbfrange\n"
        b"endcmap\n"
    )
    f.add_stream(7, b"", cmap)
    f.add(6, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FixtureT2U "
             b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
             b"/Supplement 0 >> /W [1 2 600 16 18 500] >>")
    f.add(3, b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureT2U "
             b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
             b"/ToUnicode 7 0 R >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    # cids 1,2 -> Delta, Omega (bfchar); cids 16,17,18 -> A,B,C (bfrange)
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td "
                         b"<00010002> Tj <001000110012> Tj ET")
    return f.build(1)


def f22_mac_encoding() -> bytes:
    """MacRomanEncoding with high-bit codes: 0x8E eacute, 0xA5 bullet,
    0x87 aacute, 0xD0 endash (validates the Mac table against the
    reference's Appendix D data)."""
    font = (
        b"<< /Type /Font /Subtype /TrueType /BaseFont /FixtureMac "
        b"/FirstChar 32 /LastChar 224 /Widths [%s] "
        b"/Encoding /MacRomanEncoding >>"
        % b" ".join(b"500" for _ in range(193))
    )
    c = (b"BT /F1 12 Tf 72 720 Td "
         b"(caf\\216 \\207 \\245 a\\320b) Tj ET")
    return simple_doc(c, font)


def f23_tr_ts_rise() -> bytes:
    """Tr (render mode) and Ts (rise): the reference uses **Tr** — not Ts —
    in the glyph position matrix ([Tfs*Tz 0; 0 Tfs; 0 Tr] x Tm x cm,
    __init__.py:521), so a nonzero Tr shifts glyph y (new line breaks in
    GetFullText) while Ts is tracked but never observed.  Differential
    coverage for the quirk and for the scalarized position arithmetic."""
    c = (b"BT /F1 12 Tf 72 720 Td (Base line) Tj "
         b"7 Tr (shifted by render mode) Tj "
         b"0 Tr 5 Ts (rise is ignored) Tj "
         b"3 Tr [(mix) -600 (kern)] TJ ET")
    return simple_doc(c, HELV)


def f24_graphics_soup() -> bytes:
    """The non-text operator vocabulary interleaved with text: color ops
    (incl. variadic sc/scn), path building (m/l/c/v/y/h/re), painting
    (S/s/f/F/f*/B/b/B*/b*/n), clipping (W/W*), graphics params
    (i/j/J/M/ri/w, dash array d) — all state-tracked or no-ops in the
    reference (__init__.py:363-476); any dispatch/arity mismatch on our
    side would drop the page and break the golden.  Second page is a
    plain-text survivor for contrast."""
    pages = [
        # page 1: drops via the B*/b* regrouper membership bug
        (b"0.5 0.5 0.5 rg 100 100 m 200 200 l B* b* "
         b"BT /F1 12 Tf 72 720 Td (Never extracted) Tj ET"),
        # page 2: drops via the scn pattern-name skipped-token bug
        # (the reference's SCN/scn operand scan collects INT/FLOAT/LIT only,
        # so /P1 is skipped and the lastidx check raises, text.py:610)
        (b"0.2 0.4 /P1 scn "
         b"BT /F1 12 Tf 72 720 Td (Also never extracted) Tj ET"),
        b"BT /F1 12 Tf 72 720 Td (Survivor page three) Tj ET",
    ]
    return simple_doc(b"", HELV, n_pages=3, contents_per_page=pages)


def f25_graphics_survivor() -> bytes:
    """f24's vocabulary minus B*/b*: the page must SURVIVE, so the color /
    path / painting / clipping / param dispatches (and the S stroke
    callback) are differentially exercised around extracted text."""
    c = (b"0.5 0.5 0.5 rg 0 0 1 RG 0.1 G 0.9 g "
         b"/DeviceRGB cs /DeviceGray CS 1 0 0 sc 0.3 SC 0.2 0.4 scn "
         b"0.9 SCN 0.2 0.9 0.3 0.1 k 0.1 0.2 0.3 0.4 K "
         b"1 i 2 j 1 J 3 M /RelativeColorimetric ri 2 w [3 2] 0 d "
         b"100 100 m 200 200 l "
         b"110 120 130 140 150 160 c 10 20 30 40 v 50 60 70 80 y h "
         b"50 60 70 80 re S s f F f* B b n W n W* n "
         b"BT /F1 12 Tf 72 720 Td (Text amid graphics) Tj ET "
         b"q 0.7 0.7 0.7 rg Q BT /F1 12 Tf 72 700 Td (After q Q) Tj ET")
    return simple_doc(c, HELV)


def f26_image_xobject() -> bytes:
    """``Do`` on an IMAGE XObject: the reference pushes ``x.Resources``
    unconditionally (__init__.py:454) but XObjectImage declares no
    _Resources attr -> KeyError -> page exception AFTER the page's earlier
    glyphs fired — so the partial text leaks into the NEXT page's buffer
    (no 'page end' flush), joined without a newline when the y coordinate
    matches.  Golden: one merged page string."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R 8 0 R] /Count 2 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> "
             b"/XObject << /Im1 6 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (Before image) Tj ET "
                         b"q 10 0 0 10 100 100 cm /Im1 Do Q "
                         b"BT /F1 12 Tf 72 700 Td (After image) Tj ET")
    f.add_stream(6, b"/Type /XObject /Subtype /Image /Width 2 /Height 2 "
                    b"/ColorSpace /DeviceGray /BitsPerComponent 8",
                 bytes([0, 64, 128, 255]))
    f.add(8, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 9 0 R >>")
    f.add_stream(9, b"", b"BT /F1 12 Tf 72 720 Td (Survivor) Tj ET")
    return f.build(1)


def f27_rotated_matrix() -> bytes:
    """Rotated cm x rotated/scaled Tm: every glyph's y differs, so the
    assembler emits one char per line — each newline decision is an EXACT
    float equality on the product of two matrix chains, making this the
    strongest differential stress on the scalarized position/advance
    arithmetic (any ulp divergence reorders the output bytes)."""
    c = (b"q 0.96 0.28 -0.28 0.96 10 20 cm "
         b"BT /F1 12 Tf 0.866 0.5 -0.5 0.866 72 720 Tm (Rotated glyphs) Tj "
         b"1.5 0 0 0.75 100 500 Tm [(Scaled) -250 (too)] TJ ET Q "
         b"BT /F1 12 Tf 72 100 Td (Plain after) Tj ET")
    return simple_doc(c, HELV)


def f28_literal_edges() -> bytes:
    """Literal-escape edge semantics + cascading mid-string page drops:
    the reference APPENDS the control char for backslash+real-newline/tab
    (__init__.py:697-706, no spec line-continuation), then the glyph lookup
    for cid 10/9 raises MID-STRING -> pages 1 and 2 drop AFTER emitting
    'AB'/'tab', and page 3 (printable octal + escaped parens) inherits both
    partial buffers joined without newlines (same y).  Exercises the
    partial-advance writeback on mid-string exceptions."""
    pages = [
        b"BT /F1 12 Tf 72 720 Td (AB\\\nCD) Tj ET",
        b"BT /F1 12 Tf 72 720 Td (tab\\\there) Tj ET",
        b"BT /F1 12 Tf 72 720 Td (oct\\53x \\1013 \\105nd \\( \\) mix) Tj ET",
    ]
    return simple_doc(b"", HELV, n_pages=3, contents_per_page=pages)


def f29_font_shadowing() -> bytes:
    """/F1 defined BOTH on the page (Helvetica) and in the XObject's own
    resources (Courier): the reference's resource scan resolves the PAGE
    entry first even inside the Do (__init__.py:128-158 iterates the stack
    from index 0), observable through the implied-space threshold — kern
    -260 exceeds half of Helvetica's avg width (space) but not Courier's
    300 (no space); kern -255 is below both.  Pins scan order AND the
    avg-width float arithmetic at a 5-unit boundary."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(10, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> /XObject << /Fx 6 0 R >> "
             b">> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"/Fx Do")
    f.add(7, b"<< /Font << /F1 10 0 R >> >>")
    f.add_stream(
        6,
        b"/Type /XObject /Subtype /Form /BBox [0 0 612 792] /Resources 7 0 R",
        b"BT /F1 12 Tf 72 700 Td [(A) -260 (B) -255 (C)] TJ ET",
    )
    return f.build(1)


def f30_type1_dict_encoding() -> bytes:
    """A STANDARD Type1 font (Helvetica) with a dict /Encoding (BaseEncoding
    + Differences): the reference's Type1 dispatch passes the FontEncoding
    OBJECT into MapCIDToGlyphName (fontcache.py:115-117) -> KeyError ->
    page drop — the Differences path is reachable only for non-Type1
    subtypes.  Page 2 then ALSO drops: page 1's resources stay leaked on
    the stack (never popped on exception), its /F1 shadows page 2's good
    /F1 in the page-first scan, and the broken font wins again -> golden
    is an empty document.  Two quirks compounding."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R 8 0 R] /Count 2 >>")
    f.add(5, b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
             b"/Differences [ 65 /bullet ] >>")
    f.add(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
             b"/Encoding 5 0 R >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 6 0 R >>")
    f.add_stream(6, b"", b"BT /F1 12 Tf 72 720 Td (Auto dropped) Tj ET")
    f.add(7, HELV)
    f.add(8, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 7 0 R >> >> /Contents 9 0 R >>")
    f.add_stream(9, b"", b"BT /F1 12 Tf 72 720 Td (Dict enc survivor) Tj ET")
    return f.build(1)


def f31_truetype_no_widths() -> bytes:
    """TrueType + standard BaseFont + WinAnsiEncoding but NO /Widths: the
    glyph path demands f.Widths (fontcache.py:158-166), yet extraction
    SUCCEEDS because the 'change font' callback's GetFontWidths call
    synthesizes AFM widths and MEMOIZES them onto the font dict
    (__init__.py:176-213, ``f.Widths =``) before the first glyph — an
    order-dependent side effect both engines must share.  Includes a
    WinAnsi high-bit char."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, b"<< /Type /Font /Subtype /TrueType /BaseFont /Helvetica "
             b"/Encoding /WinAnsiEncoding >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"",
                 b"BT /F1 12 Tf 72 720 Td (TrueType sans widths \xe9!) Tj ET")
    return f.build(1)


def f32_split_contents() -> bytes:
    """A statement split MID-OPERANDS across a /Contents array: operands in
    stream 1, operator in stream 2 — legal PDF; the reference joins the
    decoded streams with a single space (__init__.py:312-325) so the
    statement reassembles."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents [5 0 R 6 0 R] >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720")
    f.add_stream(6, b"", b"Td (Split across streams) Tj ET")
    return f.build(1)


def f33_hybrid_chain() -> bytes:
    """Hybrid incremental-update chain: a PLAINTEXT xref/trailer update
    (overriding the content stream) whose /Prev points at the base
    document's XREF STREAM — the parser must sniff each section's format
    independently (parser/__init__.py:212-237) and newest-wins across the
    mixed chain."""
    import re as _re

    base = f05_xrefstream()
    prev_off = int(_re.search(rb"startxref\n(\d+)\n", base).group(1))
    out = bytearray(base)
    new5_off = len(out)
    out += _stream_obj(
        5, b"", b"BT /F1 12 Tf 72 720 Td (Updated via hybrid chain) Tj ET"
    )
    xref_off = len(out)
    out += b"xref\n5 1\n%010d 00000 n \n" % new5_off
    out += b"trailer << /Size 8 /Root 1 0 R /Prev %d >>\n" % prev_off
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def f34_tounicode_partial() -> bytes:
    """Type0 whose ToUnicode bfchar covers only SOME cids: the covered cid
    maps through the CMap, the uncovered one falls back PER-CID to
    Identity (fontcache.py:425-440 KeyError path) — golden mixes both in
    one string ('W' from the CMap, 'e' from Identity)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    tou = (b"begincmap 1 begincodespacerange <0000> <FFFF> endcodespacerange "
           b"1 beginbfchar <0048> <0057> endbfchar endcmap")
    f.add_stream(7, b"", tou)
    f.add(6, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /X "
             b"/W [ 72 [ 500 ] 101 [ 500 ] ] /CIDSystemInfo << >> >>")
    f.add(3, b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
             b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
             b"/ToUnicode 7 0 R >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td <00480065> Tj ET")
    return f.build(1)


def f35_advp_table() -> bytes:
    """Missing-glyph resolution via the reference's hardcoded AdvP4C4E74
    table (fontcache.py:249-257): Differences map codes to the private
    glyph names C0/C6, which resolve to minus-sign / plus-minus."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(5, b"<< /Type /Encoding /Differences [ 65 /C0 66 /C6 ] >>")
    f.add(3, b"<< /Type /Font /Subtype /TrueType /BaseFont /AdvP4C4E74 "
             b"/Encoding 5 0 R /Widths [500 500] /FirstChar 65 "
             b"/LastChar 66 >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 6 0 R >>")
    f.add_stream(6, b"", b"BT /F1 12 Tf 72 720 Td (AB) Tj ET")
    return f.build(1)


def f36_identity_v() -> bytes:
    """Type0 with /Encoding /Identity-V: effectively unsupported in the
    reference (the vertical path references ``self.f`` instead of
    ``self.font``, fontcache.py:406,435) -> page drop -> empty golden.
    Pins that the engine must NOT extract here (over-extraction is the
    same parity failure class f30 caught)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(6, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /X "
             b"/W [ 72 [ 500 ] ] /CIDSystemInfo << >> >>")
    f.add(3, b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
             b"/Encoding /Identity-V /DescendantFonts [6 0 R] >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td <0048> Tj ET")
    return f.build(1)


def f37_symbol_font() -> bytes:
    """Symbol standard font under the default Std encoding map: the AFM
    indexes glyphs by Symbol's own names (alpha, beta...), so the
    Std-mapped name 'a' passes the unicode lookup but MISSES the widths
    dict (fontcache.py:128 KeyError) -> page drop -> empty golden."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Symbol >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (abg) Tj ET")
    return f.build(1)


def f38_gs_unsupported_key() -> bytes:
    """``gs`` with an unsupported ExtGState key (/SMask): the reference
    raises NotImplementedError mid-page (__init__.py:381-413) AFTER the
    first text block emitted, so 'pre gs' leaks into the survivor page's
    output (with a newline: different y)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R 8 0 R] /Count 2 >>")
    f.add(3, HELV)
    f.add(7, b"<< /Type /ExtGState /LW 1 /SMask /None >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> "
             b"/ExtGState << /G1 7 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (pre gs) Tj ET /G1 gs "
                         b"BT /F1 12 Tf 72 700 Td (post gs) Tj ET")
    f.add(8, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 9 0 R >>")
    f.add_stream(9, b"", b"BT /F1 12 Tf 72 680 Td (gs survivor) Tj ET")
    return f.build(1)


def f39_bfrange_array() -> bytes:
    """ToUnicode bfrange with the ARRAY destination form: unimplemented in
    the reference's CMap compiler (parser/__init__.py:997-999
    NotImplementedError) -> page drop -> empty golden."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    tou = (b"begincmap 1 begincodespacerange <0000> <FFFF> endcodespacerange "
           b"1 beginbfrange <0048> <0049> [<0057> <0058>] endbfrange endcmap")
    f.add_stream(7, b"", tou)
    f.add(6, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /X "
             b"/W [ 72 [ 500 ] ] /CIDSystemInfo << >> >>")
    f.add(3, b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
             b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
             b"/ToUnicode 7 0 R >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td <0048> Tj ET")
    return f.build(1)


def f40_alias_subset_drop() -> bytes:
    """Subset-tagged ('ABCDEF+Helvetica') and aliased ('Arial') BaseFonts:
    the reference looks the name up VERBATIM in its metrics manager
    (fontmetrics.py:110-113 KeyError) -> both pages drop -> empty golden.
    Pins that the parity path must NOT normalize font names (the engine's
    normalize_basefont helper is an explicit beyond-parity opt-in)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R 8 0 R] /Count 2 >>")
    f.add(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /ABCDEF+Helvetica >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (Tagged) Tj ET")
    f.add(7, b"<< /Type /Font /Subtype /Type1 /BaseFont /Arial >>")
    f.add(8, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 7 0 R >> >> /Contents 9 0 R >>")
    f.add_stream(9, b"", b"BT /F1 12 Tf 72 720 Td (Aliased) Tj ET")
    return f.build(1)


def f41_missing_glyph_fontfile2() -> bytes:
    """Differences maps a code to a non-AGL glyph name on a TrueType font
    whose descriptor carries only FontFile2: the missing-glyph resolver
    unconditionally dereferences the (absent) FontFile3 stream
    (fontcache.py:270, ``CFFTokenizer(ff.Stream)`` on None ->
    AttributeError) -> page drop; the FontFile2 path is additionally dead
    via the ``sefl`` typo (parser/__init__.py:880).  Page 2 shares the
    /F1 name, so the leaked broken font drops it too -> empty golden."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R 9 0 R] /Count 2 >>")
    f.add(5, b"<< /Type /Encoding /Differences [ 65 /myWeirdGlyph ] >>")
    f.add_stream(8, b"", b"\x00\x01\x00\x00fakettf")
    f.add(7, b"<< /Type /FontDescriptor /FontName /Fake /FontFile2 8 0 R >>")
    f.add(3, b"<< /Type /Font /Subtype /TrueType /BaseFont /FakeFont "
             b"/Encoding 5 0 R /Widths [500] /FirstChar 65 /LastChar 65 "
             b"/FontDescriptor 7 0 R >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 6 0 R >>")
    f.add_stream(6, b"", b"BT /F1 12 Tf 72 720 Td (A) Tj ET")
    f.add(10, HELV)
    f.add(9, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 10 0 R >> >> /Contents 11 0 R >>")
    f.add_stream(11, b"", b"BT /F1 12 Tf 72 720 Td (A) Tj ET")
    return f.build(1)


def f42_inherited_resources() -> bytes:
    """Spec-inheritable /Resources living on the Pages NODE instead of the
    leaf Page: the reference never walks up the tree (GetFont pushes only
    the page's own Resources -> None -> AttributeError, __init__.py:141)
    -> page drop -> empty golden.  Pins that neither engine implements
    resource inheritance."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 "
             b"/Resources << /Font << /F1 3 0 R >> >> >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (Inherited resources) Tj ET")
    return f.build(1)


def _type0_cmap_doc(cmap_payload: bytes, text_hex: bytes) -> bytes:
    """Type0/Identity-H font whose ToUnicode CMap is ``cmap_payload``;
    descendant W covers cid 0..255 (range form) so CMap quirks are probed
    in isolation from the width map."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, b"<< /Type /Font /Subtype /Type0 /BaseFont /Test-H "
             b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
             b"/ToUnicode 7 0 R >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td " + text_hex + b" Tj ET")
    f.add(6, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Test "
             b"/CIDSystemInfo << /Registry (T) /Ordering (T) /Supplement 0 >> "
             b"/W [ 0 255 500 ] >>")
    f.add_stream(7, b"", cmap_payload)
    return f.build(1)


_CMAP_SCAFFOLD_TOP = (b"/CIDInit /ProcSet findresource begin\n"
                      b"12 dict begin begincmap\n"
                      b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n")
_CMAP_SCAFFOLD_END = (b"\nendcmap CMapName currentdict /CMap defineresource "
                      b"pop end end")


def f43_inline_image() -> bytes:
    """BI/ID/EI inline image: the reference's content lexer has NO rule for
    'I' ('BI' lexes as token B then t_error raises on 'I',
    parser/text.py:229-231) -> tokenization fails BEFORE any op runs ->
    page 1 drops with no partial leak; clean page 2 still extracts."""
    c1 = (b"BT /F1 12 Tf 72 720 Td (Partial one) Tj ET\n"
          b"BI /W 1 /H 1 /CS /G /BPC 8 ID \x41 EI")
    c2 = b"BT /F1 12 Tf 72 720 Td (Clean page) Tj ET"
    return simple_doc(None, HELV, n_pages=2, contents_per_page=[c1, c2])


def f44_cmap_second_bfchar_ignored() -> bytes:
    """TWO beginbfchar sections: the reference's bfchar loop breaks after
    the FIRST endbfchar (parser/__init__.py:965), so section 2's
    <0042>-><0059> never applies; cid 0x42 falls back per-CID to
    Identity-H ('B', the f34-pinned fallback).  Golden: '\\nXB', not
    '\\nXY'."""
    cm = (_CMAP_SCAFFOLD_TOP
          + b"1 beginbfchar <0041> <0058> endbfchar\n"
          + b"1 beginbfchar <0042> <0059> endbfchar"
          + _CMAP_SCAFFOLD_END)
    return _type0_cmap_doc(cm, b"<00410042>")


def f45_cmap_unterminated_bfchar() -> bytes:
    """beginbfchar with no endbfchar: the reference's section loop raises
    NotImplementedError('Unrecognized token') on the next keyword token
    (endcmap) because only CODEs are legal inside an open section
    (parser/__init__.py:967-969) -> page drop."""
    cm = (_CMAP_SCAFFOLD_TOP + b"1 beginbfchar <0041> <0058>"
          + _CMAP_SCAFFOLD_END)
    return _type0_cmap_doc(cm, b"<0041>")


def f46_cmap_odd_bfchar() -> bytes:
    """Odd CODE count in a bfchar section: the reference pairs codes with
    codes[i+1] and IndexErrors on the dangler (parser/__init__.py:961-963)
    -> page drop (silently mapping the complete pairs would extract text
    here — pinned divergence risk)."""
    cm = (_CMAP_SCAFFOLD_TOP
          + b"2 beginbfchar <0041> <0058> <0042> endbfchar"
          + _CMAP_SCAFFOLD_END)
    return _type0_cmap_doc(cm, b"<00410042>")


def f47_cmap_multi_codespace() -> bytes:
    """Multiple/multi-entry codespacerange blocks: BuildMapper consumes
    ONLY bfchar/bfrange/cidrange sections (parser/__init__.py:943-1024) —
    codespace ranges are scaffolding to it, so mixed 1-/2-byte codespace
    declarations change nothing and the bfchar mapping applies."""
    cm = (b"/CIDInit /ProcSet findresource begin\n"
          b"12 dict begin begincmap\n"
          b"2 begincodespacerange <00> <80> <8140> <9FFC> endcodespacerange\n"
          b"1 begincodespacerange <A0> <DF> endcodespacerange\n"
          b"1 beginbfchar <0041> <0058> endbfchar"
          + _CMAP_SCAFFOLD_END)
    return _type0_cmap_doc(cm, b"<0041>")


def f48_type3_cascade() -> bytes:
    """Type3 font: GetFontWidths has no branch for it and raises
    NotImplementedError (__init__.py:229-230) -> page 1 drops AND leaks
    its resources; page 2's /F2 lookup then scans the leaked page-1
    resources first, misses, and dies in the ValueError's own '%d' %
    Page formatting bug (__init__.py:146 TypeError) -> page 2 drops too.
    Golden: no pages at all from a 2-page document."""
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


_CMAP_ONE_BFCHAR = None  # built lazily below


def _one_bfchar_cmap() -> bytes:
    return (_CMAP_SCAFFOLD_TOP
            + b"1 beginbfchar <0041> <0058> endbfchar"
            + _CMAP_SCAFFOLD_END)


def f49_hex_whitespace() -> bytes:
    """Whitespace INSIDE a hex string (spec-legal, 7.3.4.3): every
    reference lexer's hexstring rule is <[0-9A-Fa-f]+> with no whitespace
    (parser/text.py:221), so '<00 41>' fails tokenization at the lone '<'
    -> t_error raise -> page drop."""
    return _type0_cmap_doc(_one_bfchar_cmap(), b"<00 41>")


def f50_hex_odd_pad() -> bytes:
    """Odd hex digit count <004>: SplitHex pads ONE trailing zero
    (__init__.py:728-733) -> cid 0x0040, not in the CMap -> per-CID
    Identity fallback '@'."""
    return _type0_cmap_doc(_one_bfchar_cmap(), b"<004>")


def f51_hex_odd_drop() -> bytes:
    """5 hex digits <00410>: padding yields 6 digits, not divisible into
    2-byte cids -> SplitHex ValueError (__init__.py:735-737) -> page
    drop."""
    return _type0_cmap_doc(_one_bfchar_cmap(), b"<00410>")


def f52_tj_name_operand() -> bytes:
    """A NAME operand inside a TJ array ([(A) /Oops (B)] TJ): the
    reference's GetTokenString has branches only for LIT/HEXSTRING and
    raises TypeError on NAME (__init__.py:654-657) -> page drop."""
    c = b"BT /F1 12 Tf 72 720 Td [(A) /Oops (B)] TJ ET"
    return simple_doc(c, HELV)


def f53_bt_no_et() -> bytes:
    """BT block never closed (no ET before stream end): text still
    extracts — the reference processes tokens sequentially and the
    assembler flushes at page end, not at ET."""
    c = b"BT /F1 12 Tf 72 720 Td (NoET) Tj"
    return simple_doc(c, HELV)


def f54_contents_nonstream() -> bytes:
    """/Contents resolving to a dict instead of a stream: the reference
    dies retrieving stream tokens (IndexError) -> page drop."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add(5, b"<< /NotA /Stream >>")
    return f.build(1)


def _widths_font_doc(widths_body: bytes, extra_objs: list) -> bytes:
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
             b"/FirstChar 65 /LastChar 66 /Widths " + widths_body +
             b" /Encoding /WinAnsiEncoding >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (AB) Tj "
                         b"[(A) -600 (B)] TJ ET")
    for oid, body in extra_objs:
        f.add(oid, body)
    return f.build(1)


def f55_widths_indirect_elems() -> bytes:
    """Widths array whose ELEMENTS are indirect refs: the implied-space
    average sums raw elements -> TypeError int + IndirectObject -> page
    drop (the reference never resolves refs nested INSIDE arrays)."""
    return _widths_font_doc(b"[6 0 R 7 0 R]", [(6, b"556"), (7, b"556")])


def f56_widths_indirect_array() -> bytes:
    """/Widths VALUE as an indirect ref to the array: resolved by the
    lazy attribute loader -> extracts normally (contrast f55)."""
    return _widths_font_doc(b"6 0 R", [(6, b"[556 556]")])


# LZW encoding of b"BT /F1 12 Tf 72 720 Td (LZW page) Tj ET" (spec
# 7.4.4 code widths, EarlyChange default; frozen literal so pdfgen stays
# import-light — tests/test_lzw.py's round-trip encoder produced it)
_LZW_CONTENT = (b"\x80\x10\x8a\x82\x01y\x18b \x18\x8c\x84\x05C0\x80o\n"
                b"\x87\x8c!fA\x00\xa0\x98Z+\x88\x0e\x06\x139\x94S\x0b5"
                b"\x08\x08\xa5H\x08")


def f57_lzw_strict_drop() -> bytes:
    """/Filter /LZWDecode content stream: the reference decodes ONLY the
    exact name FlateDecode (pdf.py:456-469 ValueError) -> page drops; the
    plain page 2 survives.  Pins the engine's STRICT filter default (the
    extended superset is the documented opt-in)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R 6 0 R] /Count 2 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"/Filter /LZWDecode", _LZW_CONTENT)
    f.add(6, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 7 0 R >>")
    f.add_stream(7, b"", b"BT /F1 12 Tf 72 700 Td (Plain page) Tj ET")
    return f.build(1)


def f58_filter_array_flate() -> bytes:
    """ARRAY-form /Filter [/FlateDecode]: the reference compares the
    filter value with == 'FlateDecode', so even a one-element array of
    the supported filter raises -> page drop."""
    content = b"BT /F1 12 Tf 72 720 Td (Array filter) Tj ET"
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"/Filter [/FlateDecode]", flate(content))
    return f.build(1)


def f59_bare_dot() -> bytes:
    """A bare '.' operand: the FLOAT lexeme regex r'[-+]?\\d*\\.\\d*'
    matches it with both digit runs empty, then float('.') raises inside
    t_FLOAT (parser/text.py:207-210) -> page drop."""
    return simple_doc(b"BT /F1 12 Tf 72 . Td (Dot) Tj ET", HELV)


def f60_trailing_dot() -> bytes:
    """'72.' and '-.5' are valid FLOAT lexemes -> extracts normally."""
    return simple_doc(b"BT /F1 12 Tf 72. -.5 Td (TrailDot) Tj ET", HELV)


def f61_xref_w0_free() -> bytes:
    """xref stream with W=[0 2 1]: the spec (7.5.8.3) says an absent type
    field defaults to 1 (in-use), but the reference unpacks W[0]=0 bytes
    to the integer 0 (pdf.py:632-645) -> EVERY row reads as FREE -> all
    objects unfindable -> doc-level ValueError -> no text at all."""
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
        f2 = xref_off if oid == 6 else (offsets.get(oid, 0) if oid else 0)
        rows += bytes([(f2 >> 8) & 0xFF, f2 & 0xFF, 0])
    xdict = (b"/Type /XRef /Size 7 /W [0 2 1] /Root 1 0 R "
             b"/Filter /FlateDecode")
    out += _stream_obj(6, xdict, flate(rows))
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def f62_missing_eof() -> bytes:
    """Document with the final %%EOF marker stripped: the reference's
    startxref tail-finder demands exactly startxref / INT / %%EOF
    (parser/__init__.py:104-106) and raises at DOC level -> no text."""
    data = simple_doc(b"BT /F1 12 Tf 72 720 Td (No EOF) Tj ET", HELV)
    assert data.endswith(b"%%EOF\n")
    return data[: -len(b"%%EOF\n")]


def f63_xref_two_subsections() -> bytes:
    """Plaintext xref with TWO subsections (0 3 / 4 3): the reference's
    consolidator consumes only the first, so objects 4-6 are unfindable
    -> doc-level raise -> no text (we previously read all subsections —
    divergence fixed)."""
    out = bytearray(b"%PDF-1.4\n")
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
    out += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Two subsections) Tj ET")
    xref_off = len(out)
    out += b"xref\n0 3\n0000000000 65535 f \n"
    out += b"%010d 00000 n \n" % offsets[1]
    out += b"%010d 00000 n \n" % offsets[2]
    out += b"4 3\n"
    for oid in (4, 5, 6):
        out += b"%010d 00000 n \n" % offsets[oid]
    out += (b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % xref_off)
    return bytes(out)


def f64_xref_multi_index() -> bytes:
    """xref STREAM with multi-part /Index [0 3 4 3]: StreamRows reads only
    Index[0:2] (pdf.py:623-625), so the second part's objects never load
    -> doc-level raise -> no text (we previously read all parts —
    divergence fixed)."""
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


def _length_doc(length_field: bytes) -> bytes:
    """1-page doc whose content stream dict is exactly ``length_field``."""
    content = b"BT /F1 12 Tf 72 720 Td (Length case) Tj ET"
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_raw(5, b"5 0 obj\n<< " + length_field + b" >>\nstream\n" + content
                 + b"\nendstream\nendobj\n")
    return f.build(1)


def f65_length_short() -> bytes:
    """/Length smaller than the stream: the reference yanks exactly that
    many bytes and resumes LEXING inside the stream remnant -> t_error ->
    page drop (no scan-for-endstream recovery exists)."""
    return _length_doc(b"/Length 10")


def f66_length_long() -> bytes:
    """/Length larger than the stream: the yank swallows endstream and the
    lexer dies in the following bytes -> page drop."""
    return _length_doc(b"/Length 200")


def f67_length_missing() -> bytes:
    """No /Length at all: the two-pass loader re-reads the dict and
    KeyErrors on 'Length' (parser/__init__.py:401) -> page drop."""
    return _length_doc(b"/X 1")


def f68_no_endobj() -> bytes:
    """Stream object missing its endobj keyword: tolerated by both engines
    (the reference's object loader stops at endstream) -> extracts."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    content = b"BT /F1 12 Tf 72 720 Td (No endobj) Tj ET"
    f.add_raw(5, b"5 0 obj\n<< /Length %d >>\nstream\n" % len(content)
                 + content + b"\nendstream\n")
    return f.build(1)


def f69_double_backslash_paren() -> bytes:
    r"""Literal containing \\( — an escaped backslash followed by a real
    paren: the reference's literal splitter dies in its own NameError
    ('lis' undefined, __init__.py SplitLiteral escape branch) -> page
    drop; the engine's strict escape handling drops the page too."""
    c = b"BT /F1 12 Tf 72 720 Td (AB\\\\(CD) EF) Tj ET"
    return simple_doc(c, HELV)


def f70_bad_literal_leak() -> bytes:
    r"""Draws 'Good' before the \\\\( literal fails at DRAW time: the
    partial buffer leaks into clean page 2 (no newline: same buffer
    fold) -> golden '\nGoodClean' in both engines."""
    c1 = (b"BT /F1 12 Tf 72 720 Td (Good) Tj ET\n"
          b"BT /F1 12 Tf 72 700 Td (AB\\\\(CD) EF) Tj ET")
    c2 = b"BT /F1 12 Tf 72 720 Td (Clean) Tj ET"
    return simple_doc(None, HELV, n_pages=2, contents_per_page=[c1, c2])


def _enc_doc(enc_inline: bytes | None, enc_obj: bytes | None) -> bytes:
    """TrueType font showing (AB); /Encoding inline or as object 6."""
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


def f71_enc_inline_dict() -> bytes:
    """INLINE /Encoding dict: only indirect values route through
    GetFontEncoding into a FontEncoding (parser/__init__.py:847-854); an
    inline dict stays a raw Dictionary and the glyph dispatch TypeErrors
    -> page drop (we previously accepted any dict — divergence fixed)."""
    return _enc_doc(b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
                    b"/Differences [66 /C] >>", None)


def f72_enc_float_differences() -> bytes:
    """Indirect Encoding whose /Differences starts with the FLOAT 66.0:
    the type check is type(item) == int (fontcache.py:496-514), so 66.0
    is consumed as a glyph NAME at code 0 and code 66 keeps WinAnsi 'B'
    -> '\nAB' (we previously coerced floats to codes -> '\nAC' —
    divergence fixed)."""
    return _enc_doc(None, b"<< /Type /Encoding /BaseEncoding "
                          b"/WinAnsiEncoding /Differences [66.0 /C] >>")


def f73_enc_indirect_no_type() -> bytes:
    """Indirect Encoding dict WITHOUT /Type /Encoding: GetFontEncoding's
    StupidObjectParser never checks /Type, so it still becomes a
    FontEncoding and the Differences apply -> '\nAC'."""
    return _enc_doc(None, b"<< /BaseEncoding /WinAnsiEncoding "
                          b"/Differences [66 /C] >>")


# --- round 4: Flate DecodeParms / predictor strict surface + content
# --- text-lexer character classes (probed via tools/probe_r3.py) ---------

def _flate_parms_doc(dict_extra: bytes, data: bytes,
                     extra_objs: list | None = None) -> bytes:
    """One page whose content stream carries the given filter dict."""
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


_PRED_CONTENT = b"BT /F1 12 Tf 72 720 Td (Pred text) Tj ET"


def _pred12_rows(content: bytes, col: int, row0_tag: int = 2,
                 bad_row: int | None = None) -> bytes:
    """PNG-Up(2)-encode content into col-byte rows (space-padded)."""
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
    return flate(bytes(out))


def f74_parms_no_predictor() -> bytes:
    """DecodeParms present WITHOUT /Predictor: the reference requires the
    key (decoder/flate.py:20-21 KeyError) -> page drop."""
    return _flate_parms_doc(
        b"/Filter /FlateDecode /DecodeParms << /Columns 5 >>",
        flate(_PRED_CONTENT))


def f75_parms_predictor1() -> bytes:
    """Predictor 1 ('no predictor' per spec) is NOT the reference's
    no-predictor value (that is 0): flate.py:36 NotImplementedError."""
    return _flate_parms_doc(
        b"/Filter /FlateDecode /DecodeParms << /Predictor 1 >>",
        flate(_PRED_CONTENT))


def f76_parms_predictor0() -> bytes:
    """Predictor 0 control: decodes and extracts."""
    return _flate_parms_doc(
        b"/Filter /FlateDecode /DecodeParms << /Predictor 0 >>",
        flate(_PRED_CONTENT))


def f77_pred12_content_pad() -> bytes:
    """Predictor-12 CONTENT stream: PNG_Up allocates len(data) output
    bytes but writes nrows*col (decoder/flate.py:88), so the decoded
    stream carries nrows trailing NULs — which the text lexer has no rule
    for (t_error 'Bad character ord=0') -> page drop.  Every predictor-12
    content stream drops this way in the reference."""
    return _flate_parms_doc(
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 8 >>",
        _pred12_rows(_PRED_CONTENT, 8))


def f78_pred12_tag_change() -> bytes:
    """Row tag != 2 after row 0 -> flate.py:105-107 ValueError drop."""
    return _flate_parms_doc(
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 8 >>",
        _pred12_rows(_PRED_CONTENT, 8, bad_row=2))


def f79_pred12_no_columns() -> bytes:
    """Predictor 12 without /Columns -> flate.py:77-78 ValueError drop."""
    return _flate_parms_doc(
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 >>",
        _pred12_rows(_PRED_CONTENT, 8))


def f80_parms_nondict() -> bytes:
    """Page 1: DecodeParms is an ARRAY ('Predictor' not in Array ->
    KeyError).  Page 2: DecodeParms is an INDIRECT ref — pdf.py:459 passes
    it verbatim, so 'in' raises TypeError.  Both pages drop."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R 6 0 R] /Count 2 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"/Filter /FlateDecode /DecodeParms [ << /Predictor 0 >> ]",
                 flate(_PRED_CONTENT))
    f.add(6, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 7 0 R >>")
    f.add_stream(7, b"/Filter /FlateDecode /DecodeParms 8 0 R",
                 flate(_PRED_CONTENT))
    f.add(8, b"<< /Predictor 0 >>")
    return f.build(1)


def f81_content_unspaced_ops() -> bytes:
    """Operators glued to numbers/operators lex fine in the reference:
    PLY tries FLOAT/INT then per-operator rules at every position, so
    'q1' is q + INT 1, '0cm' is INT 0 + cm, 'ETq' is ET + q."""
    return simple_doc(b"q1 0 0 1 0 0cm BT /F1 12 Tf 72 720 Td "
                      b"(Unspaced ops) Tj ETq Q", HELV)


def f82_content_comment() -> bytes:
    """'%' has NO rule in the content text lexer (no comment folding,
    parser/text.py) -> t_error -> page drop."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (Commented) Tj ET "
                      b"% trailing comment", HELV)


def f83_content_nul_ff() -> bytes:
    """Page 1: standalone NUL after ET; page 2: \\x0c between operands.
    Neither byte is whitespace to the text lexer (t_WS is [\\t \\r\\n]
    only) -> t_error -> both pages drop."""
    return simple_doc(None, HELV, n_pages=2, contents_per_page=[
        b"BT /F1 12 Tf 72 720 Td (NulByte) Tj ET \x00",
        b"BT /F1 12 Tf \x0c 72 720 Td (FormFeed) Tj ET",
    ])


def f84_content_float_chain() -> bytes:
    """'12.5.6' lexes as FLOAT 12.5 + FLOAT .6 (t_FLOAT can't span two
    dots), leaving Td with 3 operands -> regrouper skipped-token
    ValueError (text.py:610) -> page drop."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (Chain) Tj "
                      b"12.5.6 0 Td (After) Tj ET", HELV)


def _xrefstream_doc(row0_tag: int = 2, parms_extra: bytes = b"") -> bytes:
    """f05 variant generator with tweakable predictor encoding."""
    header = b"%PDF-1.5\n"
    out = bytearray(header)
    offsets = {}
    offsets[5] = len(out)
    out += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Tagged rows) Tj ET")
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
    objstm_data = index + bodies
    offsets[6] = len(out)
    out += _stream_obj(
        6, b"/Type /ObjStm /N %d /First %d" % (len(inner), len(index)),
        objstm_data)
    xref_off = len(out)

    def row(t, f2, f3):
        return bytes([t, (f2 >> 8) & 0xFF, f2 & 0xFF, f3])

    rows = [
        row(0, 0, 255),
        row(2, 6, 0), row(2, 6, 1), row(2, 6, 2), row(2, 6, 3),
        row(1, offsets[5], 0), row(1, offsets[6], 0),
        row(1, xref_off, 0),
    ]
    enc = bytearray()
    prev = bytes(4)
    for i, r in enumerate(rows):
        enc.append(row0_tag if i == 0 else 2)
        enc.extend((b - p) % 256 for b, p in zip(r, prev))
        prev = r
    xdata = flate(bytes(enc))
    xdict = (
        b"/Type /XRef /Size 8 /W [1 2 1] /Root 1 0 R "
        b"/Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 12 /Columns 4 %s>>" % parms_extra
    )
    out += _stream_obj(7, xdict, xdata)
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def f85_xref_row0_tag() -> bytes:
    """xref stream whose PNG-Up row 0 carries tag 7: the reference checks
    tags only for r > 0 (flate.py:105 'if r > 0 and ...'), so the doc
    loads and extracts normally — and the nrows of trailing NUL padding
    are ignored by the Index-count-limited row reader."""
    return _xrefstream_doc(row0_tag=7)


def f86_xref_colors_ignored() -> bytes:
    """DecodeParms carries /Colors 3 /BitsPerComponent 8: the reference
    PNG_Up never reads either (Columns is the RAW byte width), so the
    xref stream decodes as if they were absent."""
    return _xrefstream_doc(parms_extra=b"/Colors 3 /BitsPerComponent 8 ")


def f87_td_after_draw() -> bytes:
    """The reference has NO independent text line matrix: TextState.Tm is
    a property whose setter aliases Tlm (state.py:364 ``self._Tm =
    self._Tlm = v``), so glyph advances move Tlm too and Td/T* translate
    from the END of the previous show.  With Tm.b != 0 the advance shifts
    y, so '0 0 Td' lands each string on a NEW line ('\\nA\\nB\\nC'); a
    spec-style separate line matrix would put all three at the same y."""
    return simple_doc(b"BT /F1 12 Tf 1 1 0 1 100 300 Tm (A) Tj "
                      b"0 0 Td (B) Tj 0 0 Td (C) Tj ET", HELV)


_TF_INF = b"9" * 320 + b".0"           # float() == inf
_TF_NEARMAX = b"17" + b"9" * 306 + b".0"  # ~1.79e308, finite


def f88_tf_inf() -> bytes:
    """Tf = inf: the first advance makes Tm.E/F nonfinite (tx*b with
    b == 0 gives NaN in Tm.F), later strings in the SAME text object draw
    at NaN -> newline per glyph; the Tf 12 reset still inherits the
    poisoned matrix through Td."""
    return simple_doc(b"BT /F1 " + _TF_INF + b" Tf 72 720 Td (AB) Tj "
                      b"0 0 Td (CD) Tj /F1 12 Tf 10 10 Td (EF) Tj ET", HELV)


def f89_tf_nearmax() -> bytes:
    """Tf huge-but-finite: Tm.E overflows to inf mid-string by
    ACCUMULATION (each tx finite), exercising the fast-path bail-out where
    tf must stay exact."""
    return simple_doc(b"BT /F1 " + _TF_NEARMAX + b" Tf 72 720 Td (ABCDE) "
                      b"Tj /F1 12 Tf 5 5 Td (After) Tj ET", HELV)


def _objstm_doc(n=None, first=None, index_override=None, extends=False,
                xref_idx=(0, 1, 2, 3)) -> bytes:
    """f05-shaped doc with tweakable /N, /First, index pairs, /Extends and
    xref-row positions — the ObjectStream dark-corner family (reference
    parser/__init__.py:1065-1127: index = first N*2 TOKENS, object i's
    tokens selected by lexpos window, index object ids IGNORED, no
    /Extends handling at all)."""
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
        bodies += body + b" "
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
    out += _stream_obj(7, xdict, xdata)
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def f90_objstm_extends() -> bytes:
    """/Extends chain present: the reference has NO /Extends code
    (parser/__init__.py:1065-1127 never reads the key), so a stream whose
    objects are all locally indexed extracts normally and the extension
    stream is never consulted.  Probed r04: both engines OK."""
    return _objstm_doc(extends=True)


def f91_objstm_id_mismatch() -> bytes:
    """Objstm index claims bogus object ids (all 99) at correct offsets:
    GetObjectTokens ignores the index ids — the xref row's POSITION wins
    (reference :1126 'the object id in [0] is ignored').  Extracts
    normally in both engines."""
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (3, HELV),
        (4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
    ]
    bodies = b""
    offs = []
    for _oid, body in inner:
        offs.append((99, len(bodies)))
        bodies += body + b" "
    return _objstm_doc(index_override=offs)


def f92_objstm_n_short() -> bytes:
    """N=3 with an xref row pointing at index 3: reference KeyError at
    GetObjectTokens -> doc dies.  Probed r04: doc failure both engines."""
    return _objstm_doc(n=3)


def f93_objstm_n_long() -> bytes:
    """N=5 with 4 real index pairs: the reference slurps the first body
    token into the index and dies (TypeError on '<<' - 1).  Doc failure
    both engines."""
    return _objstm_doc(n=5)


def f94_objstm_first_shift() -> bytes:
    """/First 4 bytes long: every lexpos window shifts into the wrong
    bytes -> truncated catalog dict -> doc failure both engines."""
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
    return _objstm_doc(first=len(index) + 4)


def f95_objstm_swapped_rows() -> bytes:
    """xref rows point at permuted objstm positions (catalog row -> index
    1, pages row -> index 0): position wins, the graph comes out scrambled
    (catalog loads the pages dict) -> doc failure both engines."""
    return _objstm_doc(xref_idx=(1, 0, 2, 3))


def f96_objstm_window_cut() -> bytes:
    """A phantom 5th index entry whose offset points 2 bytes before the
    font's true end: the reference's lexpos window drops the font dict's
    '>>' (handler raises 'Did not find end of dictionary'); our positional
    parser instead chokes eagerly parsing the phantom entry.  Different
    mechanism, same observable: doc failure both engines."""
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
    pairs = offs + [(9, font_off + len(HELV) - 2)]
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
        row(2, 6, 0), row(2, 6, 1), row(2, 6, 3),
        row(2, 6, 2),
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


def f97_qq_td_inside() -> bytes:
    """Td+show inside q..Q: the reference pushes a DEEPCOPY of the whole
    State incl. .text (state.py:104,162), so Q rewinds the text matrix —
    (C) continues from (A)'s end, not (B)'s.  Probed r04, parity OK."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (A) Tj "
                      b"q 0 -50 Td (B) Tj Q (C) Tj ET", HELV)


def f98_qq_tf_inside() -> bytes:
    """Tf size change inside q..Q reverts at Q (both engines draw Small
    at 12pt after Big at 24pt)."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td q /F1 24 Tf (Big) Tj Q "
                      b"(Small) Tj ET", HELV)


def f99_qq_spanning_bt() -> bytes:
    """q BT ... Q inside the text object: Q rewinds to the PRE-BT text
    state (no font), so the post-Q show dies -> page drop both engines
    (reference: 'Unrecognize font name' masked by its %d-of-Page
    TypeError, still a page-level failure)."""
    return simple_doc(b"q BT /F1 12 Tf 72 720 Td (A) Tj Q (B) Tj ET", HELV)


def f100_qq_tf_before_bt() -> bytes:
    """Font selected only inside a q..Q BEFORE BT: gone at show time ->
    page drop both engines."""
    return simple_doc(b"q /F1 12 Tf Q BT 72 720 Td (NoFont) Tj ET", HELV)


def f101_qq_unbalanced_pop() -> bytes:
    """Bare Q after ET with nothing pushed: 'Cannot pop initial values'
    -> page drop both engines (the already-drawn text is discarded)."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (A) Tj ET Q", HELV)


def f102_qq_unclosed_push() -> bytes:
    """q never closed: the page ends cleanly in both engines (no
    balance check at page end)."""
    return simple_doc(b"q BT /F1 12 Tf 72 720 Td (Open q) Tj ET", HELV)


def _t0_doc(desc_bodies: list[bytes], text_hex: bytes = b"<0041>",
            font_extra: bytes = b"") -> bytes:
    """Type0/Identity-H font with custom DescendantFonts objects 6..6+n
    (the fontcache.py:370-452 dark-corner family, probed r04)."""
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


def f103_t0_w_float_start() -> bytes:
    """W [ 65.5 [500] ]: the reference keeps the FLOAT base code as the
    width-map key (no coercion), so integer cid 65 misses at draw ->
    page drop.  Was a silent superset here (int() cast) until r04."""
    return _t0_doc([_cidfont(b"/W [ 65.5 [500] ]")])


def f104_t0_w_float_range() -> bytes:
    """W [ 0.5 255 500 ]: range() on the float bound TypeErrors at font
    build -> page drop.  Also a fixed r04 silent superset."""
    return _t0_doc([_cidfont(b"/W [ 0.5 255 500 ]")])


def f105_t0_two_descendants() -> bytes:
    """Two descendant fonts with overlapping /W: width maps merge
    last-wins per-CID (fontcache.py:391-395); extracts normally."""
    return _t0_doc([_cidfont(b"/W [ 0 255 500 ]"),
                    _cidfont(b"/W [ 65 [900] ]")])


def f106_t0_empty_descendants() -> bytes:
    """DescendantFonts []: empty width map -> avg-width division by zero
    -> page drop both engines."""
    return _t0_doc([])


def f107_t0_no_w() -> bytes:
    """Descendant without /W: page drop both engines (reference:
    len(None) TypeError; ours: empty-map ZeroDivisionError)."""
    return _t0_doc([_cidfont(b"")])


def f108_t0_w_truncated() -> bytes:
    """W [ 0 ]: lone int (reference IndexError at arr[i+1]) -> page
    drop both engines."""
    return _t0_doc([_cidfont(b"/W [ 0 ]")])


def f109_t0_w_missing_cid() -> bytes:
    """W covers 0..64 only; cid 65 missing from the width map at draw
    -> page drop both engines."""
    return _t0_doc([_cidfont(b"/W [ 0 64 500 ]")])


def f110_t0_w_reverse_range() -> bytes:
    """W [ 200 100 500 ]: empty range -> empty width map -> page drop."""
    return _t0_doc([_cidfont(b"/W [ 200 100 500 ]")])


def f111_t0_w_nested_empty() -> bytes:
    """W [ 65 [] 65 [600] ]: empty inner array is a no-op segment; the
    second segment supplies the width -> extracts normally."""
    return _t0_doc([_cidfont(b"/W [ 65 [] 65 [600] ]")])


def _simple_tu_doc(enc: bytes, cmap: bytes | None,
                   enc_obj: bytes | None = None) -> bytes:
    """TrueType font, /Encoding `enc` (or indirect object 6), optional
    /ToUnicode stream 7, drawing (AB) — the ToUnicode-on-simple-fonts
    dark-corner family (fontcache.py:140-229, probed r04)."""
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


def f112_tu_encdict_broken() -> bytes:
    """Indirect Encoding dict + UNPARSEABLE ToUnicode, all glyphs
    resolvable via the base encoding: the reference builds the CMapper
    EAGERLY (fontcache.py:204-205), so the broken CMap kills the page
    even though it is never consulted.  Was a silent superset (lazy
    build) until r04."""
    return _simple_tu_doc(b"", _TU_BROKEN,
                          enc_obj=b"<< /Type /Encoding /BaseEncoding "
                                  b"/WinAnsiEncoding /Differences [] >>")


def f113_tu_named_enc_ignored() -> bytes:
    """WinAnsiEncoding + ToUnicode mapping A->X: the named-encoding glyph
    path (fontcache.py:140-175) never reads ToUnicode -> text stays AB."""
    return _simple_tu_doc(b"/WinAnsiEncoding", _TU_AX)


def f114_tu_named_enc_broken_ignored() -> bytes:
    """WinAnsiEncoding + unparseable ToUnicode: never reached -> AB."""
    return _simple_tu_doc(b"/WinAnsiEncoding", _TU_BROKEN)


def f115_tu_encdict_not_consulted() -> bytes:
    """Encoding dict with resolvable glyphs + ToUnicode A->X: the CMapper
    is BUILT but only MissingGlyphName consults it -> AB, not XB."""
    return _simple_tu_doc(b"", _TU_AX,
                          enc_obj=b"<< /Type /Encoding /BaseEncoding "
                                  b"/WinAnsiEncoding /Differences [] >>")


def f116_tu_no_encoding() -> bytes:
    """No /Encoding at all (ToUnicode present): the reference dispatch
    has no handler for Encoding None -> page drop both engines."""
    return _simple_tu_doc(b"", _TU_AX)


def f117_hybrid_xrefstm_ignored() -> bytes:
    """Hybrid file: plaintext xref covers only the free row; the trailer's
    /XRefStm points at an xref stream indexing the whole graph.  The
    reference has NO hybrid support (parser/__init__.py:95-160 walks only
    /Prev) -> catalog unfindable -> doc dies.  Our chain-walk followed
    /XRefStm until r04 — silent superset, fixed."""
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
    xstm_off = len(out)

    def row(t, f2, f3):
        return bytes([t, (f2 >> 16) & 0xFF, (f2 >> 8) & 0xFF, f2 & 0xFF, f3])

    rows = [row(0, 0, 255)] + [row(1, offsets[o], 0) for o in range(1, 6)]
    rows.append(row(1, xstm_off, 0))
    out += _stream_obj(
        6, b"/Type /XRef /Size 7 /W [1 3 1] /Root 1 0 R /Filter /FlateDecode",
        flate(b"".join(rows)))
    xref_off = len(out)
    out += (b"xref\n0 1\n0000000000 65535 f \n"
            b"trailer\n<< /Size 7 /Root 1 0 R /XRefStm %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (xstm_off, xref_off))
    return bytes(out)


def f118_gen_mismatch_ref() -> bytes:
    """Content ref '5 7 R' but object 5 is gen 0 in the xref: loads are
    keyed (objid, generation) -> not found -> page drop both engines."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 7 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (Gen) Tj ET")
    return f.build(1)


def f119_gen_nonzero_row() -> bytes:
    """xref row carries gen 00007 and the ref says '5 7 R': generation
    agreement -> loads and extracts in both engines."""
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
    lines = doc.split(b"\n")
    xi = lines.index(b"xref")
    lines[xi + 2 + 5] = lines[xi + 2 + 5].replace(b" 00000 n", b" 00007 n")
    return b"\n".join(lines)


def f120_startxref_mid_file() -> bytes:
    """startxref points into an object body: xref sniff fails -> doc
    dies in both engines (reference: NeedStreamLegnthError [sic])."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (Mid) Tj ET", HELV)
    i = doc.rindex(b"startxref\n")
    j = doc.index(b"\n", i + 10)
    return doc[:i] + b"startxref\n42" + doc[j:]


def f121_prev_self_loop() -> bytes:
    """Trailer /Prev pointing at its own xref offset: NOT a hang — the
    reference re-reads the section and dies ('Reached end-of-file before
    xref was read'); our seen-offset cycle guard stops after one lap and
    the re-parse attempt dies too.  Doc failure both engines."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (Loop) Tj ET", HELV)
    xref_off = doc.rindex(b"xref\n")
    return doc.replace(b"trailer\n<< /Size",
                       b"trailer\n<< /Prev %d /Size" % xref_off)


def f122_no_contents() -> bytes:
    """Page without /Contents: the reference reads .Stream off None
    (AttributeError) -> the page DROPS; it is not an empty page.  Ours
    returned '' until r04 — silent superset, fixed."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> >>")
    return f.build(1)


def f123_contents_split_bt() -> bytes:
    """BT..ET split across a two-stream /Contents array: the ' '-join
    (reference __init__.py:312-325) makes '(Sp' + 'lit)' lex as the
    literal '(Sp lit)' — the joiner byte lands INSIDE the string."""
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


def f124_do_self_cycle() -> bytes:
    """Form XObject Do-invoking itself: unguarded recursion in both
    engines -> Python RecursionError -> page drop (the text drawn before
    the Do is discarded with the page)."""
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


def f125_lit_octal() -> bytes:
    """Octal escapes: 3-digit \\101\\102 -> AB; 2-digit mid-string
    \\41B -> '!B' (non-digit terminates the short form)."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (\\101\\102 A\\41B) Tj ET",
                      HELV)


def f126_lit_octal_truncated() -> bytes:
    """1-2 octal digits at the literal's END: the reference's unguarded
    digit lookahead (lit[i+2]/lit[i+3], __init__.py:700-710) IndexErrors
    -> page drop; short octal does NOT decode at end-of-string.  Our
    bounds-guarded decoder extracted 'A ' here until r04 — fixed."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (A\\40) Tj ET", HELV)


def f127_lit_octal_8() -> bytes:
    """\\8: '8' passes isdigit but int(base 8) ValueErrors -> page
    drop in both engines."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (A\\8B) Tj ET", HELV)


def f128_lit_backslash_eol() -> bytes:
    """Backslash-newline: spec says line continuation, but SplitLiteral
    KEEPS the raw newline (__init__.py:666-668) -> glyph ord 10 -> not in
    the encoding map -> page drop in both engines."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (AB\\\nCD) Tj ET", HELV)


def f129_lit_raw_newline() -> bytes:
    """Unescaped newline inside a literal: kept as a char -> glyph ord 10
    -> page drop in both engines."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (AB\nCD) Tj ET", HELV)


def f130_cmap_astral_dst() -> bytes:
    """bfchar dst <D835DC63> (the CORRECT UTF-16BE surrogate pair for an
    astral char): BuildMapper does chr(0xD835DC63) -> OverflowError ->
    page drop in both engines.  Astral ToUnicode values are simply
    unsupported by the reference."""
    cm = (_CMAP_SCAFFOLD_TOP
          + b"1 beginbfchar <0041> <D835DC63> endbfchar"
          + _CMAP_SCAFFOLD_END)
    return _type0_cmap_doc(cm, b"<0041>")


def f131_cmap_lone_surrogate() -> bytes:
    """bfchar dst <D835>: chr(0xD835) is a LONE SURROGATE — it rides
    through extraction into the output in both engines."""
    cm = (_CMAP_SCAFFOLD_TOP
          + b"1 beginbfchar <0041> <D835> endbfchar"
          + _CMAP_SCAFFOLD_END)
    return _type0_cmap_doc(cm, b"<0041>")


def f132_cmap_cidrange() -> bytes:
    """begincidrange <0040> <0060> 97: the CODE CODE INT triple fills
    rangedat; mapper yields chr(97 + cid - 0x40) -> 'bc'."""
    cm = (_CMAP_SCAFFOLD_TOP
          + b"1 begincidrange <0040> <0060> 97 endcidrange"
          + _CMAP_SCAFFOLD_END)
    return _type0_cmap_doc(cm, b"<00410042>")


def f133_tj_positive_kern() -> bytes:
    """TJ with POSITIVE kerns: the implied-space rule is
    abs(w) > 0.5*avg (__init__.py:603) — +400 draws a space even though
    the pen moves LEFT; +20 stays below threshold."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td "
                      b"[(Hello) 400 (World) 20 (!)] TJ ET", HELV)


def f134_gs_font_ref() -> bytes:
    """ExtGState /Font [3 0 R 14]: gs assigns the indirect REF to Tf
    (__init__.py:394-396), and the next show's font lookup cannot treat
    a Ref as a resource name -> page drop in both engines (the
    reference additionally trips its own %d-of-Page error formatting)."""
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


def f135_encrypt_plaintext() -> bytes:
    """/Encrypt present but streams are PLAINTEXT (broken producer): the
    reference has no decryption AND no fast-fail — it parses the streams
    and extracts.  Our doc-level /Encrypt fast-fail was a silent
    superset, removed r04."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (NotReallyEncrypted) Tj ET")
    f.add(6, b"<< /Filter /Standard /V 1 /R 2 /O (x) /U (y) /P -44 >>")
    return f.build(1, extra_trailer=b"/Encrypt 6 0 R ")


def f136_encrypted_garbage() -> bytes:
    """/Encrypt with actually-unreadable ('ciphertext') streams: each
    page's content fails to lex -> per-PAGE drops (n_pages counted,
    pages_dropped counted), NOT a doc-level failure."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", bytes(range(48, 90)) * 2)
    f.add(6, b"<< /Filter /Standard /V 1 /R 2 /O (x) /U (y) /P -44 >>")
    return f.build(1, extra_trailer=b"/Encrypt 6 0 R ")


def f137_no_root() -> bytes:
    """Trailer without /Root: doc-level failure in both engines."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (NoRoot) Tj ET", HELV)
    return doc.replace(b"/Root 1 0 R ", b"")


def f138_tj_empty_array() -> bytes:
    """[] TJ is a zero-element show; the following Tj draws normally."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td [] TJ (After) Tj ET", HELV)


def f139_tj_outside_bt() -> bytes:
    """Show with no BT: the text matrix is None at draw time ->
    AttributeError page drop in both engines."""
    return simple_doc(b"/F1 12 Tf (Loose) Tj BT /F1 12 Tf "
                      b"72 720 Td (Inside) Tj ET", HELV)


def f140_symbol_font() -> bytes:
    """Standard-14 Symbol, no /Encoding: the AFM path looks glyphs up by
    LITERAL char name ('A'), which Symbol's AFM (alpha, beta, ...) does
    not contain -> KeyError page drop in both engines."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (Aab) Tj ET",
                      b"<< /Type /Font /Subtype /Type1 /BaseFont /Symbol >>")


def f141_zapf_font() -> bytes:
    """ZapfDingbats: same literal-name AFM miss -> page drop."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (abc) Tj ET",
                      b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /ZapfDingbats >>")


def f142_times_bold() -> bytes:
    """Times-Bold via the AFM width path extracts normally."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (Bold text) Tj ET",
                      b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Times-Bold >>")


def f143_font_no_type() -> bytes:
    """Font dict without /Type: _ParseFont reads o['Type'] first
    (parser/__init__.py:678) -> KeyError -> page drop in both engines."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (NoType) Tj ET",
                      b"<< /Subtype /Type1 /BaseFont /Helvetica >>")


def f144_font_unknown_subtype() -> bytes:
    """/Subtype /MMType1 is outside _ParseFont's six-entry dispatch ->
    'Unrecognized object type' -> page drop in both engines."""
    return simple_doc(b"BT /F1 12 Tf 72 720 Td (MM) Tj ET",
                      b"<< /Type /Font /Subtype /MMType1 "
                      b"/BaseFont /Helvetica >>")


def f145_descendant_bad_subtype() -> bytes:
    """Type0 whose descendant carries a corrupted /Subtype: each
    descendant loads through _ParseFont when the width map builds ->
    page drop (the diff_fuzz f105-flip2 case, pinned statically)."""
    return _t0_doc([b"<< /Type /Font /Subtype /CIDFonXType2 "
                    b"/BaseFont /Test /W [ 0 255 500 ] >>"])


def f146_truncated_update_tail() -> bytes:
    """Incremental update truncated mid-trailer: the reference's tail
    parse tokenizes from the last intact startxref line to EOF with no
    streamlength context, so the remnant's 'stream' keyword raises
    NeedStreamLegnthError -> DOC dies.  It does NOT recover to the
    previous consistent snapshot (we did until r04 — superset removed)."""
    base = f10_incremental()
    return base[: int(len(base) * 0.95)]


def f147_xref_row_nbsp() -> bytes:
    """A stray NBSP (0xa0) glued to an xref row's end: the reference's
    per-LINE str.rstrip() strips UNICODE whitespace, so the row parses
    and the doc extracts.  Raw-bytes tokenization died here until the
    r04 line-based rewrite."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (NbspRow) Tj ET", HELV)
    xi = doc.index(b"xref\n")
    # first row ends "65535 f \n" -> make it "65535 f\xa0\n"
    k = doc.index(b" f \n", xi)
    return doc[:k] + b" f\xa0\n" + doc[k + 4:]


def f148_trailer_glued_eof() -> bytes:
    """Garbage glued onto the startxref value line of an EARLIER
    trailer ('406\x8a%%EOF'): the line is not '%%EOF', so the trailer
    scan keeps collecting lines into the following update and the lexer
    dies on the glue byte -> doc failure (no recovery)."""
    base = f10_incremental()
    k = base.index(b"\n%%EOF")  # EOL before the original EOF marker
    return base[:k] + b"\x8a" + base[k + 1:]


# ---------------------------------------------------------------------------
# Round 5: chain-walk startxref semantics + COMMENT-token positionality
# (probed via tools/probe_r3.py chain_*/sniff_*/comment_*/tcmt_*/tail_*
# probes; the reference lexer RETURNS comment tokens and its conversion
# layer consumes tokens positionally, so comments shift or kill loads).


def _r5_graph(content_text: bytes) -> dict:
    """Standard 5-object graph bodies keyed by oid."""
    return {
        1: _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        2: _obj(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        3: _obj(3, HELV),
        4: _obj(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                   b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
        5: _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (" + content_text
                       + b") Tj ET"),
    }


def f149_chain_sxr_fork() -> bytes:
    """No-/Prev trailer whose own startxref points at an UNVISITED second
    xref section that alone indexes the content object: the reference
    follows t.startxref.offset (parser/__init__.py:149) and finds it ->
    extracts.  Our chain set offset=0 here until r05 — silent subset."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    bodies = _r5_graph(b"ForkText")
    for oid in sorted(bodies):
        offsets[oid] = len(out)
        out += bodies[oid]
    xb = len(out)  # section B: only obj 5; startxref 0 terminates
    out += b"xref\n5 1\n%010d 00000 n \n" % offsets[5]
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    xa = len(out)  # section A: objs 0-4; startxref -> XB (the fork)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for oid in range(1, 5):
        out += b"%010d 00000 n \n" % offsets[oid]
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xb
    out += b"startxref\n%d\n%%%%EOF\n" % xa  # file tail: entry -> XA
    return bytes(out)


def f150_chain_prev_no_sxr() -> bytes:
    """Update trailer WITH /Prev but NO startxref before its %%EOF:
    Convert_StartXRef(value[1:3]) -> toks[1] IndexError -> the doc dies
    EVEN THOUGH /Prev is present (Convert_Trailer runs for every
    plaintext trailer, parser/__init__.py:1281-1307).  We followed /Prev
    here until r05 — silent superset."""
    base = simple_doc(b"BT /F1 12 Tf 72 720 Td (Original text) Tj ET", HELV)
    tail = base.rsplit(b"startxref\n", 1)[1]
    orig_xref = int(tail.split(b"\n", 1)[0])
    upd = bytearray(base)
    newoff = len(upd)
    upd += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Updated text) Tj ET")
    xref_off = len(upd)
    upd += b"xref\n5 1\n%010d 00000 n \n" % newoff
    upd += b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n%%%%EOF\n" % orig_xref
    upd += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(upd)


def f151_chain_comment_before_sxr() -> bytes:
    """Comment line between the trailer dict and startxref: COMMENT is a
    real token, so positional value[2] yields the STRING 'startxref' as
    the next offset -> `offset > 0` TypeError -> doc dies."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (CmtSxr) Tj ET", HELV)
    return doc.replace(b">>\nstartxref\n", b">>\n% note\nstartxref\n")


def f152_chain_bare_ints() -> bytes:
    """Bare '999 0' between dict and startxref: positional value[2]=0 is
    taken as the next offset -> chain terminates cleanly -> extracts
    (the REAL startxref int is never read)."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (BareZero) Tj ET", HELV)
    return doc.replace(b">>\nstartxref\n", b">>\n999 0\nstartxref\n")


def f153_sniff_nbsp_xref() -> bytes:
    """NBSP glued to the 'xref' header line: the sniff decodes latin-1
    and str.strip()s (UNICODE, both ends, parser/__init__.py:221) ->
    extracts.  Raw-bytes sniff lexing died on \\xa0 until r05."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (NbspXref) Tj ET", HELV)
    i = doc.rindex(b"xref\n0 ")
    return doc[:i] + b"xref\xa0\n" + doc[i + 5:]


def f154_sniff_comment_objline() -> bytes:
    """Comment glued to the xref-stream header line: sniff tokens are
    [INT,INT,obj,COMMENT] -> len 4 -> NOT a stream -> plaintext scan for
    a nonexistent 'trailer' line -> doc dies.  We folded the comment and
    took the stream path until r05 — silent superset."""
    doc = f05_xrefstream()
    return doc.replace(b"7 0 obj\n", b"7 0 obj % c\n")


def f155_comment_in_catalog() -> bytes:
    """Comment inside the catalog dict: lands in a Convert_Dictionary
    key/value slot -> ValueError 'Unknown token type' -> doc dies."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog % c\n/Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (CmtCat) Tj ET")
    return f.build(1)


def f156_comment_in_content_dict() -> bytes:
    """Comment inside the content STREAM dict: dies in the
    NeedStreamLength replay's Convert -> PAGE drop (not doc death)."""
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


def f157_comment_in_kids() -> bytes:
    """Comment inside the /Kids array: Convert of the array elements hits
    the COMMENT -> doc dies (page tree loads at doc level)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [% c\n4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (CmtKids) Tj ET")
    return f.build(1)


def f158_comment_in_xref_rows() -> bytes:
    """Comment line between the subsection header and the first row:
    Convert_XRef's 3-stride finds COMMENT where INT is required -> doc
    dies.  We folded it until r05."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (CmtRows) Tj ET", HELV)
    i = doc.rindex(b"xref\n0 ")
    eol = doc.index(b"\n", i + 5)
    return doc[:eol + 1] + b"% c\n" + doc[eol + 1:]


def f159_comment_in_trailer_dict() -> bytes:
    """Comment inside the trailer dictionary -> Convert dies -> doc dies."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (CmtTrailer) Tj ET", HELV)
    return doc.replace(b"trailer\n<< /Size", b"trailer\n<< % c\n/Size")


def f160_tcmt_tolerated() -> bytes:
    """Trailing comments AFTER the value (before endobj) in catalog,
    page, font, content stream AND an indirect /Length int — every one of
    these handlers indexes value[2][0]/[1] positionally, so the trailing
    COMMENT is ignored and the doc extracts (probed r05 tcmt_*)."""
    data = b"BT /F1 12 Tf 72 720 Td (TcmtAll) Tj ET"
    f = PdfFile()
    f.add_raw(1, b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >> % c\nendobj\n")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add_raw(3, b"3 0 obj\n" + HELV + b" % c\nendobj\n")
    f.add_raw(4, b"4 0 obj\n<< /Type /Page /Parent 2 0 R "
                 b"/MediaBox [0 0 612 792] /Resources << /Font "
                 b"<< /F1 3 0 R >> >> /Contents 5 0 R >> % c\nendobj\n")
    f.add_raw(5, b"5 0 obj\n<< /Length 6 0 R >>\nstream\n"
                 + data + b"\nendstream % c\nendobj\n")
    f.add_raw(6, b"6 0 obj\n%d %% c\nendobj\n" % len(data))
    return f.build(1)


def f161_tcmt_resource_dict() -> bytes:
    """Trailing comment in an INDIRECT resource sub-dict: the Resource
    attr loader is GetDictionary, whose _ParseDictionary Converts the
    WHOLE inner token list -> COMMENT dies -> PAGE drop (the one handler
    that is intolerant of trailing comments)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font 7 0 R >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (TcmtRes) Tj ET")
    f.add_raw(7, b"7 0 obj\n<< /F1 3 0 R >> % c\nendobj\n")
    return f.build(1)


def f162_objstm_cmt() -> bytes:
    """Comment inside an object-stream inner object (the catalog): that
    object's lazy Convert dies -> catalog load -> doc dies; siblings in
    the same stream stay loadable (lazy per-object conversion)."""
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


def f163_tail_glued_comment() -> bytes:
    """Appended tail whose startxref line has glued junk: the reverse
    scan needs a line EXACTLY 'startxref' (after unicode rstrip), so it
    walks back to the trailer's own startxref line -> still extracts via
    the original section.  Our substring rfind took the glued one (and
    died on offset 123) until r05."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (GluedTail) Tj ET", HELV)
    return doc + b"startxref % c\n123\n%%EOF\n"


def f164_tail_comment_between() -> bytes:
    """Clean appended tail with a comment line between startxref and the
    INT: toks[1] is COMMENT, not INT -> doc dies."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (TailCmt) Tj ET", HELV)
    tail = doc.rsplit(b"startxref\n", 1)[1]
    xa = int(tail.split(b"\n", 1)[0])
    return doc + b"startxref\n%% c\n%d\n%%%%EOF\n" % xa


def f165_cmt_before_header() -> bytes:
    """xref offset points at a comment line preceding 'INT INT obj':
    the OBJECT consolidation never forms at tokens[0] -> handler
    IndexErrors -> PAGE drop."""
    data = b"BT /F1 12 Tf 72 720 Td (CmtHdr) Tj ET"
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_raw(5, b"%% c\n5 0 obj\n<< /Length %d >>\nstream\n" % len(data)
                 + data + b"\nendstream\nendobj\n")
    return f.build(1)


def _r5_cmap_doc(cmap_body: bytes) -> bytes:
    """Type0/Identity-H + ToUnicode CMap doc (for the cmap comment pins)."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, b"<< /Type /Font /Subtype /Type0 /BaseFont /Test-H "
             b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
             b"/ToUnicode 7 0 R >>")
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td <0041> Tj ET")
    f.add(6, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Test "
             b"/CIDSystemInfo << /Registry (T) /Ordering (T) /Supplement 0 >> "
             b"/W [ 0 255 500 ] >>")
    f.add_stream(7, b"", cmap_body)
    return f.build(1)


def f166_cmap_cmt_outside() -> bytes:
    """Comment BETWEEN CMap sections: BuildMapper's section loops ignore
    tokens outside an open section -> extracts (the cmap lexer RETURNS
    comment tokens, cmap.py:117-122)."""
    return _r5_cmap_doc(b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
% a comment between sections
1 beginbfchar <0041> <0058> endbfchar
endcmap CMapName currentdict /CMap defineresource pop end end""")


def f167_cmap_cmt_in_bfchar() -> bytes:
    """Comment INSIDE beginbfchar..endbfchar: the COMMENT token hits
    BuildMapper's 'Unrecognized token' raise (__init__.py:971) -> the
    eager CMapper build kills the page (f112 semantics)."""
    return _r5_cmap_doc(b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
1 beginbfchar <0041>
% comment inside the section
<0058> endbfchar
endcmap CMapName currentdict /CMap defineresource pop end end""")


def f168_cmap_cmt_in_bfrange() -> bytes:
    """Same inside beginbfrange (raise at __init__.py:999)."""
    return _r5_cmap_doc(b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
1 beginbfrange <0041> <0043>
% comment inside range
<0058> endbfrange
endcmap CMapName currentdict /CMap defineresource pop end end""")


def f169_cr_tail() -> bytes:
    """CR-only line endings in the startxref tail: the reference's
    REVERSE reader splits on bare \r too (betterfile.py:94-130) ->
    extracts.  Our \n-only reverse scan died here until r05."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (CrTail) Tj ET", HELV)
    i = doc.rindex(b"startxref\n")
    return doc[:i] + doc[i:].replace(b"\n", b"\r")


def f170_cr_xref_region() -> bytes:
    """CR-only endings through the whole xref+trailer region: the
    FORWARD reader also ends lines at bare \r (betterfile readline;
    its CRLF peek compares int to bytes and never fires) -> extracts."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (CrXref) Tj ET", HELV)
    i = doc.rindex(b"xref\n0 ")
    return doc[:i] + doc[i:].replace(b"\n", b"\r")


def f171_crlf_tail() -> bytes:
    """CRLF endings in the tail: the reverse reader consumes \r\n as ONE
    terminator -> extracts (pins the asymmetric CRLF handling)."""
    doc = simple_doc(b"BT /F1 12 Tf 72 720 Td (CrlfTail) Tj ET", HELV)
    i = doc.rindex(b"startxref\n")
    return doc[:i] + doc[i:].replace(b"\n", b"\r\n")


def f172_objstm_float_idx() -> bytes:
    """FLOAT offset ('0.0') in the objstm index: the reference never
    type-checks index tokens (Tokens[0:2N].value) and float lexpos
    windows compare fine -> extracts.  Our int-only check died here
    until r05."""
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    offsets[5] = len(out)
    out += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (FloatIdx) Tj ET")
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
    parts = []
    for k, (o, off) in enumerate(offs):
        parts.append(b"%d %s" % (o, (b"0.0" if k == 0 else b"%d" % off)))
    index = b" ".join(parts) + b" "
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


def f173_root_fallback() -> bytes:
    """Incremental update whose NEWEST trailer has NO /Root: the
    reference's FindRootObject walks the combo chain newest->oldest
    (parser/__init__.py:444-472) and resolves /Root from the BASE
    trailer -> extracts.  Found by the r05 deep fuzz (NUL in '/Root');
    our newest-only trailer died here."""
    base = simple_doc(b"BT /F1 12 Tf 72 720 Td (Original text) Tj ET", HELV)
    tail = base.rsplit(b"startxref\n", 1)[1]
    orig_xref = int(tail.split(b"\n", 1)[0])
    upd = bytearray(base)
    newoff = len(upd)
    upd += _stream_obj(5, b"", b"BT /F1 12 Tf 72 720 Td (Updated text) Tj ET")
    xref_off = len(upd)
    upd += b"xref\n5 1\n%010d 00000 n \n" % newoff
    upd += (b"trailer\n<< /Size 6 /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
            % (orig_xref, xref_off))
    return bytes(upd)


def f174_xobject_no_subtype() -> bytes:
    """Form XObject whose dict has no /Subtype: _ParseXObject KeyErrors
    at load (parser/__init__.py:721) -> page drop.  Found by the r05
    deep fuzz (NBSP splitting '/Subtype')."""
    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> /XObject << /X1 6 0 R >> "
             b">> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (Pre) Tj ET /X1 Do")
    f.add_stream(6, b"/Type /XObject /BBox [0 0 612 792]",
                 b"BT /F1 12 Tf 72 700 Td (InForm) Tj ET")
    return f.build(1)


def f175_header_nbsp() -> bytes:
    """NBSP before %PDF- on the first line: ParseHeader splits the
    decoded line on UNICODE whitespace, so parts[0] is '%PDF-1.4' and
    the doc parses -> extracts.  The router and header check must accept
    it (deep fuzz r05); built with the NBSP inside the header so the
    xref offsets stay valid."""
    f = PdfFile()
    f.header = b"\xa0%PDF-1.4\n"
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    f.add(2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    f.add(3, HELV)
    f.add(4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    f.add_stream(5, b"", b"BT /F1 12 Tf 72 720 Td (NbspHeader) Tj ET")
    return f.build(1)


FIXTURES = {
    "f01_hello": f01_hello,
    "f02_multipage": f02_multipage,
    "f03_kerning": f03_kerning,
    "f04_flate": f04_flate,
    "f05_xrefstream": f05_xrefstream,
    "f06_widths": f06_widths,
    "f07_differences": f07_differences,
    "f08_type0": f08_type0,
    "f09_xobject": f09_xobject,
    "f10_incremental": f10_incremental,
    "f11_escapes": f11_escapes,
    "f12_badpage": f12_badpage,
    "f13_cff_mathpi": f13_cff_mathpi,
    "f14_contents_array": f14_contents_array,
    "f15_indirect_length": f15_indirect_length,
    "f16_extgstate_font": f16_extgstate_font,
    "f17_tz_tc_tw": f17_tz_tc_tw,
    "f18_q_Q_cm": f18_q_Q_cm,
    "f19_hexstring_simple_font": f19_hexstring_simple_font,
    "f20_nested_xobject": f20_nested_xobject,
    "f21_type0_tounicode": f21_type0_tounicode,
    "f22_mac_encoding": f22_mac_encoding,
    "f23_tr_ts_rise": f23_tr_ts_rise,
    "f24_graphics_soup": f24_graphics_soup,
    "f25_graphics_survivor": f25_graphics_survivor,
    "f26_image_xobject": f26_image_xobject,
    "f27_rotated_matrix": f27_rotated_matrix,
    "f28_literal_edges": f28_literal_edges,
    "f29_font_shadowing": f29_font_shadowing,
    "f30_type1_dict_encoding": f30_type1_dict_encoding,
    "f31_truetype_no_widths": f31_truetype_no_widths,
    "f32_split_contents": f32_split_contents,
    "f33_hybrid_chain": f33_hybrid_chain,
    "f34_tounicode_partial": f34_tounicode_partial,
    "f35_advp_table": f35_advp_table,
    "f36_identity_v": f36_identity_v,
    "f37_symbol_font": f37_symbol_font,
    "f38_gs_unsupported_key": f38_gs_unsupported_key,
    "f39_bfrange_array": f39_bfrange_array,
    "f40_alias_subset_drop": f40_alias_subset_drop,
    "f41_missing_glyph_fontfile2": f41_missing_glyph_fontfile2,
    "f42_inherited_resources": f42_inherited_resources,
    "f43_inline_image": f43_inline_image,
    "f44_cmap_second_bfchar_ignored": f44_cmap_second_bfchar_ignored,
    "f45_cmap_unterminated_bfchar": f45_cmap_unterminated_bfchar,
    "f46_cmap_odd_bfchar": f46_cmap_odd_bfchar,
    "f47_cmap_multi_codespace": f47_cmap_multi_codespace,
    "f48_type3_cascade": f48_type3_cascade,
    "f49_hex_whitespace": f49_hex_whitespace,
    "f50_hex_odd_pad": f50_hex_odd_pad,
    "f51_hex_odd_drop": f51_hex_odd_drop,
    "f52_tj_name_operand": f52_tj_name_operand,
    "f53_bt_no_et": f53_bt_no_et,
    "f54_contents_nonstream": f54_contents_nonstream,
    "f55_widths_indirect_elems": f55_widths_indirect_elems,
    "f56_widths_indirect_array": f56_widths_indirect_array,
    "f57_lzw_strict_drop": f57_lzw_strict_drop,
    "f58_filter_array_flate": f58_filter_array_flate,
    "f59_bare_dot": f59_bare_dot,
    "f60_trailing_dot": f60_trailing_dot,
    "f61_xref_w0_free": f61_xref_w0_free,
    "f62_missing_eof": f62_missing_eof,
    "f63_xref_two_subsections": f63_xref_two_subsections,
    "f64_xref_multi_index": f64_xref_multi_index,
    "f65_length_short": f65_length_short,
    "f66_length_long": f66_length_long,
    "f67_length_missing": f67_length_missing,
    "f68_no_endobj": f68_no_endobj,
    "f69_double_backslash_paren": f69_double_backslash_paren,
    "f70_bad_literal_leak": f70_bad_literal_leak,
    "f71_enc_inline_dict": f71_enc_inline_dict,
    "f72_enc_float_differences": f72_enc_float_differences,
    "f73_enc_indirect_no_type": f73_enc_indirect_no_type,
    "f74_parms_no_predictor": f74_parms_no_predictor,
    "f75_parms_predictor1": f75_parms_predictor1,
    "f76_parms_predictor0": f76_parms_predictor0,
    "f77_pred12_content_pad": f77_pred12_content_pad,
    "f78_pred12_tag_change": f78_pred12_tag_change,
    "f79_pred12_no_columns": f79_pred12_no_columns,
    "f80_parms_nondict": f80_parms_nondict,
    "f81_content_unspaced_ops": f81_content_unspaced_ops,
    "f82_content_comment": f82_content_comment,
    "f83_content_nul_ff": f83_content_nul_ff,
    "f84_content_float_chain": f84_content_float_chain,
    "f85_xref_row0_tag": f85_xref_row0_tag,
    "f86_xref_colors_ignored": f86_xref_colors_ignored,
    "f87_td_after_draw": f87_td_after_draw,
    "f88_tf_inf": f88_tf_inf,
    "f89_tf_nearmax": f89_tf_nearmax,
    "f90_objstm_extends": f90_objstm_extends,
    "f91_objstm_id_mismatch": f91_objstm_id_mismatch,
    "f92_objstm_n_short": f92_objstm_n_short,
    "f93_objstm_n_long": f93_objstm_n_long,
    "f94_objstm_first_shift": f94_objstm_first_shift,
    "f95_objstm_swapped_rows": f95_objstm_swapped_rows,
    "f96_objstm_window_cut": f96_objstm_window_cut,
    "f97_qq_td_inside": f97_qq_td_inside,
    "f98_qq_tf_inside": f98_qq_tf_inside,
    "f99_qq_spanning_bt": f99_qq_spanning_bt,
    "f100_qq_tf_before_bt": f100_qq_tf_before_bt,
    "f101_qq_unbalanced_pop": f101_qq_unbalanced_pop,
    "f102_qq_unclosed_push": f102_qq_unclosed_push,
    "f103_t0_w_float_start": f103_t0_w_float_start,
    "f104_t0_w_float_range": f104_t0_w_float_range,
    "f105_t0_two_descendants": f105_t0_two_descendants,
    "f106_t0_empty_descendants": f106_t0_empty_descendants,
    "f107_t0_no_w": f107_t0_no_w,
    "f108_t0_w_truncated": f108_t0_w_truncated,
    "f109_t0_w_missing_cid": f109_t0_w_missing_cid,
    "f110_t0_w_reverse_range": f110_t0_w_reverse_range,
    "f111_t0_w_nested_empty": f111_t0_w_nested_empty,
    "f112_tu_encdict_broken": f112_tu_encdict_broken,
    "f113_tu_named_enc_ignored": f113_tu_named_enc_ignored,
    "f114_tu_named_enc_broken_ignored": f114_tu_named_enc_broken_ignored,
    "f115_tu_encdict_not_consulted": f115_tu_encdict_not_consulted,
    "f116_tu_no_encoding": f116_tu_no_encoding,
    "f117_hybrid_xrefstm_ignored": f117_hybrid_xrefstm_ignored,
    "f118_gen_mismatch_ref": f118_gen_mismatch_ref,
    "f119_gen_nonzero_row": f119_gen_nonzero_row,
    "f120_startxref_mid_file": f120_startxref_mid_file,
    "f121_prev_self_loop": f121_prev_self_loop,
    "f122_no_contents": f122_no_contents,
    "f123_contents_split_bt": f123_contents_split_bt,
    "f124_do_self_cycle": f124_do_self_cycle,
    "f125_lit_octal": f125_lit_octal,
    "f126_lit_octal_truncated": f126_lit_octal_truncated,
    "f127_lit_octal_8": f127_lit_octal_8,
    "f128_lit_backslash_eol": f128_lit_backslash_eol,
    "f129_lit_raw_newline": f129_lit_raw_newline,
    "f130_cmap_astral_dst": f130_cmap_astral_dst,
    "f131_cmap_lone_surrogate": f131_cmap_lone_surrogate,
    "f132_cmap_cidrange": f132_cmap_cidrange,
    "f133_tj_positive_kern": f133_tj_positive_kern,
    "f134_gs_font_ref": f134_gs_font_ref,
    "f135_encrypt_plaintext": f135_encrypt_plaintext,
    "f136_encrypted_garbage": f136_encrypted_garbage,
    "f137_no_root": f137_no_root,
    "f138_tj_empty_array": f138_tj_empty_array,
    "f139_tj_outside_bt": f139_tj_outside_bt,
    "f140_symbol_font": f140_symbol_font,
    "f141_zapf_font": f141_zapf_font,
    "f142_times_bold": f142_times_bold,
    "f143_font_no_type": f143_font_no_type,
    "f144_font_unknown_subtype": f144_font_unknown_subtype,
    "f145_descendant_bad_subtype": f145_descendant_bad_subtype,
    "f146_truncated_update_tail": f146_truncated_update_tail,
    "f147_xref_row_nbsp": f147_xref_row_nbsp,
    "f148_trailer_glued_eof": f148_trailer_glued_eof,
    "f149_chain_sxr_fork": f149_chain_sxr_fork,
    "f150_chain_prev_no_sxr": f150_chain_prev_no_sxr,
    "f151_chain_comment_before_sxr": f151_chain_comment_before_sxr,
    "f152_chain_bare_ints": f152_chain_bare_ints,
    "f153_sniff_nbsp_xref": f153_sniff_nbsp_xref,
    "f154_sniff_comment_objline": f154_sniff_comment_objline,
    "f155_comment_in_catalog": f155_comment_in_catalog,
    "f156_comment_in_content_dict": f156_comment_in_content_dict,
    "f157_comment_in_kids": f157_comment_in_kids,
    "f158_comment_in_xref_rows": f158_comment_in_xref_rows,
    "f159_comment_in_trailer_dict": f159_comment_in_trailer_dict,
    "f160_tcmt_tolerated": f160_tcmt_tolerated,
    "f161_tcmt_resource_dict": f161_tcmt_resource_dict,
    "f162_objstm_cmt": f162_objstm_cmt,
    "f163_tail_glued_comment": f163_tail_glued_comment,
    "f164_tail_comment_between": f164_tail_comment_between,
    "f165_cmt_before_header": f165_cmt_before_header,
    "f166_cmap_cmt_outside": f166_cmap_cmt_outside,
    "f167_cmap_cmt_in_bfchar": f167_cmap_cmt_in_bfchar,
    "f168_cmap_cmt_in_bfrange": f168_cmap_cmt_in_bfrange,
    "f169_cr_tail": f169_cr_tail,
    "f170_cr_xref_region": f170_cr_xref_region,
    "f171_crlf_tail": f171_crlf_tail,
    "f172_objstm_float_idx": f172_objstm_float_idx,
    "f173_root_fallback": f173_root_fallback,
    "f174_xobject_no_subtype": f174_xobject_no_subtype,
    "f175_header_nbsp": f175_header_nbsp,
}


def build_all() -> dict[str, bytes]:
    return {name: fn() for name, fn in FIXTURES.items()}


if __name__ == "__main__":
    import sys

    for name, data in build_all().items():
        sys.stdout.write("%s: %d bytes\n" % (name, len(data)))
