"""Deterministic ``pages`` table builder (FIXTURES.md §1).

Synthesizes the BASELINE.json input_hint table
``pages(url string, warc_ts timestamp, html binary, text string, lang
string)`` from the driver-generated ``documents`` parquet (no external
data): each document becomes an HTML page or a synthesized PDF, a seeded
~1% of urls get a duplicate older capture (exercises the latest-snapshot
window dedup), and a seeded ~0.2% get many-page payloads (exercises
salting / skew handling).  Fully deterministic: content is a pure function
of doc_id.
"""

from __future__ import annotations

import datetime
import hashlib
import zlib

from fixtures.pdfgen import PdfFile, HELV, flate

_EPOCH = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _h(doc_id: int, salt: str) -> int:
    return int.from_bytes(
        hashlib.sha256(b"%d:%s" % (doc_id, salt.encode())).digest()[:8], "big"
    )


def _escape_lit(s: str) -> bytes:
    return (
        s.encode("latin-1", "replace")
        .replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
    )


def make_pdf(text: str, n_pages: int = 1) -> bytes:
    """Multi-line, multi-page PDF carrying ``text`` in Helvetica Tj lines."""
    words = text.split()
    lines: list[str] = []
    cur: list[str] = []
    width = 0
    for w in words:
        width += len(w) + 1
        cur.append(w)
        if width > 60:
            lines.append(" ".join(cur))
            cur, width = [], 0
    if cur:
        lines.append(" ".join(cur))
    if not lines:
        lines = ["empty"]

    f = PdfFile()
    f.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    page_oids = [4 + i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % o for o in page_oids)
    f.add(2, b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages))
    f.add(3, HELV)
    per_page = max(1, (len(lines) + n_pages - 1) // n_pages)
    for i, po in enumerate(page_oids):
        co = 4 + n_pages + i
        chunk = lines[i * per_page : (i + 1) * per_page] or ["..."]
        body = [b"BT /F1 10 Tf 72 740 Td"]
        for j, ln in enumerate(chunk):
            if j:
                body.append(b"0 -12 Td")
            body.append(b"(" + _escape_lit(ln) + b") Tj")
        body.append(b"ET")
        content = flate(b" ".join(body))
        f.add(po, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                  b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
              % co)
        f.add_stream(co, b"/Filter /FlateDecode", content)
    return f.build(1)


_HTML_TMPL = """<!DOCTYPE html>
<html><head><title>doc</title><script>var x=1;</script>
<style>p {{ margin: 0 }}</style></head><body>
<nav><a href="/">home</a> <a href="/a">a</a> <a href="/b">b</a></nav>
<article><h1>Document {doc_id}</h1>
{paras}
</article>
<footer>footer boilerplate text that should be stripped away</footer>
</body></html>"""


def make_html(doc_id: int, text: str) -> bytes:
    words = text.split()
    paras = []
    for i in range(0, len(words), 40):
        chunk = " ".join(words[i : i + 40])
        paras.append("<p>%s</p>" % chunk)
    return _HTML_TMPL.format(doc_id=doc_id, paras="\n".join(paras)).encode()


def page_rows(doc_id: int, text: str, lang: str):
    """Rows for one source document (1 or 2 captures)."""
    h = _h(doc_id, "kind")
    kind = "pdf" if h % 2 == 0 else "html"
    url = "https://example-%s.test/%016x/%d" % (lang, _h(doc_id, "url"), doc_id)
    ts = _EPOCH + datetime.timedelta(seconds=(_h(doc_id, "ts") % 10_000_000))
    big = _h(doc_id, "big") % 500 == 0  # ~0.2%: many-page giant
    if kind == "pdf":
        payload = make_pdf(text * (20 if big else 1), n_pages=50 if big else 1)
    else:
        payload = make_html(doc_id, text * (20 if big else 1))
    rows = [(url, ts, payload, text, lang)]
    if _h(doc_id, "dup") % 100 == 0:  # ~1%: an older stale capture
        old = ts - datetime.timedelta(days=30)
        rows.append((url, old, make_html(doc_id, "stale " + text), text, lang))
    return rows


def build_pages_rows(documents, repl: int = 1) -> list[tuple]:
    """documents: iterable of (doc_id, text, lang) -> pages rows.

    ``repl`` > 1 replicates the corpus with distinct doc ids (deterministic)
    to scale the benchmark input without external data."""
    docs = list(documents)
    out = []
    stride = (max(int(d[0]) for d in docs) + 1) if docs else 0
    for r in range(repl):
        for doc_id, text, lang in docs:
            out.extend(
                page_rows(int(doc_id) + r * stride, text or "", lang or "en")
            )
    return out


def load_documents(sf_dir: str, limit: int | None = None):
    import pyarrow.parquet as pq

    t = pq.read_table(
        sf_dir.rstrip("/") + "/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    rows = zip(
        t.column("doc_id").to_pylist(),
        t.column("text").to_pylist(),
        t.column("lang").to_pylist(),
    )
    rows = list(rows)
    return rows[:limit] if limit else rows


def build_pages_parquet(sf_dir: str, out_path: str, limit: int | None = None,
                        repl: int = 1, n_files: int = 32) -> int:
    """Materialize the pages table as a parquet dataset directory sharded
    into ``n_files`` files (file-level scan parallelism); returns rows."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = build_pages_rows(load_documents(sf_dir, limit), repl=repl)
    os.makedirs(out_path, exist_ok=True)
    chunk = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        part = rows[i * chunk : (i + 1) * chunk]
        if not part:
            break
        cols = list(zip(*part))
        table = pa.table(
            {
                "url": pa.array(cols[0], pa.string()),
                "warc_ts": pa.array(cols[1], pa.timestamp("us")),
                "html": pa.array(cols[2], pa.binary()),
                "text": pa.array(cols[3], pa.string()),
                "lang": pa.array(cols[4], pa.string()),
            }
        )
        pq.write_table(
            table,
            os.path.join(out_path, "part-%04d.parquet" % i),
            row_group_size=4096,
        )
    return len(rows)
