"""THE correctness gate: byte-identical extracted text vs the reference.

Goldens were frozen by running the actual reference library in-process
(fixtures/freeze_goldens.py); this test needs only the frozen JSON.
"""

import json
import os

import pytest

from fixtures.pdfgen import build_all
from fixtures.htmlgen import build_all as build_html
from pypdfproc_spark.core.extract import extract_document
from pypdfproc_spark.core.htmltext import extract_main_text

GOLDENS = json.load(
    open(os.path.join(os.path.dirname(__file__), "..", "fixtures", "goldens",
                      "pdf_goldens.json"))
)
HTML_GOLDENS = json.load(
    open(os.path.join(os.path.dirname(__file__), "..", "fixtures", "goldens",
                      "html_goldens.json"))
)

PDFS = build_all()


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_pdf_byte_identical(name):
    result = extract_document(PDFS[name])
    assert result.parser == "pdf"
    assert result.pages == GOLDENS[name], (
        "extracted text diverges from reference for %s" % name
    )


def test_all_fixtures_have_goldens():
    assert set(PDFS) == set(GOLDENS)


def test_router_detects_pdf_vs_html():
    r = extract_document(b"%PDF-1.4\ngarbage")
    assert r.parser == "pdf" and r.error is not None
    r = extract_document(b"<html><body><p>x</p></body></html>")
    assert r.parser == "html" and r.error is None


def test_error_fixture_metrics():
    r = extract_document(PDFS["f12_badpage"])
    assert r.n_pages == 3
    assert r.pages_dropped == 1
    assert len(r.pages) == 2  # dropped page contributes no entry


def test_never_raises_on_garbage():
    for payload in (b"", b"%PDF-", b"\x00" * 64, b"%PDF-1.4", None,
                    b"%PDF-1.4\nxref\ntrailer\n"):
        r = extract_document(payload)
        assert isinstance(r.pages, list)


@pytest.mark.parametrize("name", sorted(HTML_GOLDENS))
def test_html_regression(name):
    html = build_html()[name]
    assert extract_main_text(html) == HTML_GOLDENS[name]


def test_spans_cover_lines():
    r = extract_document(PDFS["f06_widths"])
    # three lines on one page -> three spans, offsets index into page text
    page_text = r.pages[0]
    spans = r.spans[0]
    assert len(spans) == 3
    for (_page, start, end, _x, _y) in spans:
        assert page_text[start:end].strip()
