"""S12 CLI object-graph browser: scripted-driver tests over fixtures."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pytest

from fixtures.pdfgen import build_all
from pypdfproc_spark.cli.browser import BrowserState, run_commands, run_line


@pytest.fixture(scope="module")
def state():
    s = BrowserState()
    fx = build_all()
    s.open_bytes("hello.pdf", fx["f01_hello"])
    s.open_bytes("flate.pdf", fx["f04_flate"])
    return s


def test_root_ls_and_cd(state):
    run_line(state, "cd /")
    out = run_line(state, "ls")
    assert out.startswith("total 2")
    assert "hello.pdf" in out and "flate.pdf" in out
    assert run_line(state, "pwd") == "/"
    run_line(state, "cd hello.pdf")
    assert run_line(state, "pwd") == "/hello.pdf"
    assert run_line(state, "ls") == "catalog\ntrailer\nxref\npages"


def test_catalog_navigation(state):
    run_line(state, "cd /")
    run_line(state, "cd hello.pdf/catalog")
    out = run_line(state, "ls")
    assert "Type" in out and "Pages" in out
    run_line(state, "cd Pages/Kids/0")
    assert run_line(state, "pwd") == "/hello.pdf/catalog/Pages/Kids/[0]"
    page_ls = run_line(state, "ls")
    assert "Contents" in page_ls and "MediaBox" in page_ls
    # array index + cat on a leaf
    run_line(state, "cd MediaBox/2")
    assert run_line(state, "cat") == "612"
    run_line(state, "cd ../..")
    assert run_line(state, "pwd") == "/hello.pdf/catalog/Pages/Kids/[0]"


def test_stream_views(state):
    run_line(state, "cd /")
    run_line(state, "cd flate.pdf/catalog/Pages/Kids/0/Contents")
    ls = run_line(state, "ls")
    assert "dict" in ls and "stream" in ls and "streamraw" in ls
    run_line(state, "cd stream")
    decoded = run_line(state, "cat")
    assert "Tj" in decoded  # FlateDecode applied
    run_line(state, "cd ../streamraw")
    raw = run_line(state, "cat")
    assert "Tj" not in raw  # still compressed


def test_xref_and_trailer(state):
    run_line(state, "cd /")
    run_line(state, "cd hello.pdf/xref")
    out = run_line(state, "ls")
    assert out.startswith("total ") and "offset" in out
    run_line(state, "cd /hello.pdf/trailer")
    assert "Root" in run_line(state, "ls")


def test_errors_keep_shell_alive(state):
    run_line(state, "cd /")
    assert run_line(state, "cd nope.pdf").startswith("error:")
    assert run_line(state, "bogus").startswith("error:")
    assert run_line(state, "cd hello.pdf/zzz").startswith("error:")
    # still usable
    assert run_line(state, "pwd") in ("/", "/hello.pdf")


def test_text_command(state):
    run_line(state, "cd /")
    run_line(state, "cd hello.pdf")
    assert "Hello World" in run_line(state, "text")
    assert "Hello World" in run_line(state, "text 0")


def test_scripted_driver_and_close():
    fx = build_all()
    s = BrowserState()
    s.open_bytes("doc.pdf", fx["f02_multipage"])
    outs = run_commands(
        ["cd doc.pdf/pages", "ls", "cd 0", "pwd", "cd /", "close doc.pdf",
         "ls"],
        state=s,
    )
    assert "[  0]" in outs[1]
    assert outs[3] == "/doc.pdf/pages/[0]"
    assert outs[6].startswith("total 0")
