"""Deterministic mutation fuzzing of the document extractor.

At 10^12 documents every imaginable corruption arrives eventually; the
extractor's contract is NEVER to raise (errors become per-row metric
events).  Byte-flip / truncate / splice each fixture deterministically and
assert the contract holds.
"""

import hashlib

import pytest

from fixtures.pdfgen import build_all
from pypdfproc_spark.core.extract import ExtractResult, extract_document

PDFS = sorted(build_all().items())


def _rand_ints(seed: str, n: int, lo: int, hi: int):
    """Deterministic pseudo-random ints from sha256 (no wall-clock, no
    global RNG state)."""
    out = []
    counter = 0
    while len(out) < n:
        h = hashlib.sha256(("%s:%d" % (seed, counter)).encode()).digest()
        for k in range(0, len(h) - 4, 4):
            v = int.from_bytes(h[k : k + 4], "big")
            out.append(lo + v % (hi - lo))
            if len(out) >= n:
                break
        counter += 1
    return out


def _check(payload: bytes) -> ExtractResult:
    r = extract_document(payload)
    assert isinstance(r, ExtractResult)
    assert isinstance(r.pages, list)
    return r


@pytest.mark.parametrize("name,data", PDFS)
def test_byte_flips_never_raise(name, data):
    positions = _rand_ints("flip:" + name, 40, 0, len(data))
    values = _rand_ints("val:" + name, 40, 0, 256)
    for pos, val in zip(positions, values):
        mutated = bytearray(data)
        mutated[pos] ^= val or 0xFF
        _check(bytes(mutated))


@pytest.mark.parametrize("name,data", PDFS)
def test_truncations_never_raise(name, data):
    for cut in _rand_ints("cut:" + name, 12, 1, len(data)):
        _check(data[:cut])


def test_splices_never_raise():
    datas = [d for _, d in PDFS]
    for i in range(len(datas)):
        a = datas[i]
        b = datas[(i + 1) % len(datas)]
        _check(a[: len(a) // 2] + b[len(b) // 2 :])
        _check(b[: len(b) // 3] + a[len(a) // 3 :])


def test_repeated_extraction_is_deterministic():
    for name, data in PDFS:
        r1 = extract_document(data)
        r2 = extract_document(data)
        assert r1.pages == r2.pages and r1.error == r2.error, name


ADVERSARIAL = {
    # recursion bombs
    "deep_arrays": b"%PDF-1.4\n1 0 obj\n" + b"[" * 4000 + b"]" * 4000
                   + b"\nendobj\n",
    "deep_dicts": b"%PDF-1.4\n1 0 obj\n" + b"<< /A " * 2000 + b">> " * 2000
                  + b"\nendobj\n",
    # a page tree that points at itself (cycle guard)
    "cyclic_page_tree": (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [2 0 R] /Count 1 >> endobj\n"
        b"xref\n0 3\n0000000000 65535 f \n0000000009 00000 n \n"
        b"0000000058 00000 n \ntrailer << /Size 3 /Root 1 0 R >>\n"
        b"startxref\n117\n%%EOF\n"
    ),
    # /Length lies beyond EOF
    "lying_length": (
        b"%PDF-1.4\n1 0 obj << /Length 999999 >> stream\nxx\nendstream"
        b" endobj\n"
    ),
    # an XObject that Do-es itself forever (RecursionError -> error row)
    "cyclic_xobject": (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R "
        b"/Resources << /XObject << /X 4 0 R >> >> /Contents 5 0 R >> endobj\n"
        b"4 0 obj << /Subtype /Form /Length 5 >> stream\n/X Do\nendstream"
        b" endobj\n"
        b"5 0 obj << /Length 5 >> stream\n/X Do\nendstream endobj\n"
    ),
    # header only / garbage tails
    "header_only": b"%PDF-1.7",
    "binary_noise": b"%PDF-1.4" + bytes(range(256)) * 64,
}


@pytest.mark.parametrize("name", sorted(ADVERSARIAL))
def test_adversarial_shapes_never_raise(name):
    """Structured hostile inputs (not random mutations): recursion bombs,
    cyclic graphs, lying stream lengths.  Contract: typed error rows, no
    exception, no hang."""
    r = _check(ADVERSARIAL[name])
    assert r.parser in ("pdf", "html", "error")
