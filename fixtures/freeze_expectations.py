"""Freeze DuckDB-checkable expectations for the extraction queries.

``extract_pages`` / ``extract_metrics`` run the Arrow-batched extraction UDF
— not expressible in ANSI SQL — so their oracle is a SELECT from an
expectations parquet frozen HERE, computed by a pure-Python re-derivation of
the pipeline semantics (latest-snapshot dedup incl. the xxhash64(html)
tie-break, magic-byte routing, core extract_document per payload, bucket =
pmod(xxhash64(url), n)) with NO Spark involved.  The text values themselves
are additionally gated by the byte-identical golden suite, so the oracle is
independent of the Spark plumbing it checks (routing, dedup, explode,
metrics aggregation).

Usage: python fixtures/freeze_expectations.py
Refreeze whenever fixtures/pagesgen.py, the extraction core, or the
pipeline's dedup/bucket semantics change.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"
LIMIT = 150  # must match __spark_entry__._q_extract_pages / _q_extract_metrics
N_BUCKETS = 16
OUT_DIR = os.path.join(REPO, "fixtures", "expectations")

# ---------------------------------------------------------------------------
# XXH64 (public spec, github.com/Cyan4973/xxHash) — Spark's xxhash64() is
# XXH64 with seed 42 over the column's byte representation (UTF-8 for
# strings).  Verified against pyspark.sql.functions.xxhash64 in
# tests/test_expectations.py.

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return ((h * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (
            (_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M), 23)
             * _P2) + _P3
        ) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Signed-64 value identical to Spark F.xxhash64(string_col)."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(url: str, n_buckets: int = N_BUCKETS) -> int:
    # F.pmod(F.xxhash64(url), n): Python % on the signed value IS pmod
    return spark_xxhash64_str(url) % n_buckets


# ---------------------------------------------------------------------------


def expected_rows(sf_dir: str = SF_DIR, limit: int = LIMIT,
                  n_buckets: int = N_BUCKETS):
    """Pure-Python pipeline twin -> (pages_rows, metrics_rows)."""
    from fixtures.pagesgen import build_pages_rows, load_documents
    from pypdfproc_spark.core.extract import extract_document, utf8_safe

    rows = build_pages_rows(load_documents(sf_dir, limit))
    # latest_snapshot: newest warc_ts per url, xxhash64(html) desc tie-break
    # (pipeline.latest_snapshot uses F.xxhash64; same function, same seed)
    best: dict[str, tuple] = {}
    import datetime as _dt

    for url, ts, payload, _text, _lang in rows:
        h = xxh64(bytes(payload))
        # None warc_ts -> sentinel matching Spark's nulls-LAST desc ordering
        # (a null ts loses to any real ts; ties fall through to the hash)
        if ts is None:
            ts = _dt.datetime.min
        key = (ts, h - (1 << 64) if h >= (1 << 63) else h)
        if url not in best or key > best[url][0]:
            best[url] = (key, payload)

    page_rows = []
    span_rows = []
    per_doc = []
    for url in best:
        payload = best[url][1]
        r = extract_document(payload)
        b = bucket_of(url, n_buckets)
        for page_no, text in enumerate(r.pages):
            page_rows.append((url, page_no, utf8_safe(text), r.parser))
        if not r.pages:  # posexplode_outer: empty array -> one null row
            page_rows.append((url, None, None, r.parser))
        # flattened span rows (extract_spans oracle): page index by
        # position in r.spans — the same indexing the pipeline's
        # element_at(spans_all, page_no + 1) uses.  Empty span lists
        # produce no rows (Spark side uses plain posexplode).
        for page_no, page_spans in enumerate(r.spans):
            for span_no, s in enumerate(page_spans):
                span_rows.append(
                    (url, page_no, span_no, int(s[1]), int(s[2]),
                     _round4(float(s[3])), _round4(float(s[4])))
                )
        per_doc.append((b, r))

    metrics: dict[int, list] = {}
    for b, r in per_doc:
        m = metrics.setdefault(b, [0, 0, 0, 0, 0])
        m[0] += 1
        m[1] += r.n_pages
        m[2] += r.pages_dropped
        m[3] += r.decode_failures
        m[4] += 1 if (r.fallbacks + r.decode_failures) > 0 else 0
    metrics_rows = [
        (b, m[0], m[1], m[2], m[3], _round4(m[4] / m[0]))
        for b, m in metrics.items()
    ]

    # streaming twin (stream_batch_equivalence oracle): the stream path
    # has NO latest-snapshot dedup — every capture row extracts, so the
    # twin runs over ALL rows, not best[url]
    stream_rows = []
    for url, _ts, payload, _text, _lang in rows:
        r = extract_document(payload)
        for page_no, text in enumerate(r.pages):
            stream_rows.append((url, page_no, utf8_safe(text), r.parser))
        if not r.pages:
            stream_rows.append((url, None, None, r.parser))
    return page_rows, metrics_rows, span_rows, stream_rows


def _round4(x: float) -> float:
    """Spark F.round semantics (HALF_UP on the decimal repr of the double),
    not Python's banker's rounding."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.0001"),
                                           rounding=ROUND_HALF_UP))


def freeze(out_dir: str = OUT_DIR) -> tuple[int, int, int, int]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    page_rows, metrics_rows, span_rows, stream_rows = expected_rows()
    os.makedirs(out_dir, exist_ok=True)

    pcols = list(zip(*page_rows))
    pq.write_table(
        pa.table(
            {
                "url": pa.array(pcols[0], pa.string()),
                "page_no": pa.array(pcols[1], pa.int64()),
                "text": pa.array(pcols[2], pa.string()),
                "parser": pa.array(pcols[3], pa.string()),
            }
        ),
        os.path.join(out_dir, "extract_pages_sf001.parquet"),
    )
    mcols = list(zip(*metrics_rows))
    pq.write_table(
        pa.table(
            {
                "bucket": pa.array(mcols[0], pa.int64()),
                "docs": pa.array(mcols[1], pa.int64()),
                "pages_parsed": pa.array(mcols[2], pa.int64()),
                "pages_dropped": pa.array(mcols[3], pa.int64()),
                "decode_failures": pa.array(mcols[4], pa.int64()),
                "fallback_rate": pa.array(mcols[5], pa.float64()),
            }
        ),
        os.path.join(out_dir, "extract_metrics_sf001.parquet"),
    )
    scols = list(zip(*span_rows))
    pq.write_table(
        pa.table(
            {
                "url": pa.array(scols[0], pa.string()),
                "page_no": pa.array(scols[1], pa.int64()),
                "span_no": pa.array(scols[2], pa.int64()),
                "span_start": pa.array(scols[3], pa.int64()),
                "span_end": pa.array(scols[4], pa.int64()),
                "x": pa.array(scols[5], pa.float64()),
                "y": pa.array(scols[6], pa.float64()),
            }
        ),
        os.path.join(out_dir, "extract_spans_sf001.parquet"),
    )
    tcols = list(zip(*stream_rows))
    pq.write_table(
        pa.table(
            {
                "url": pa.array(tcols[0], pa.string()),
                "page_no": pa.array(tcols[1], pa.int64()),
                "text": pa.array(tcols[2], pa.string()),
                "parser": pa.array(tcols[3], pa.string()),
            }
        ),
        os.path.join(out_dir, "extract_stream_sf001.parquet"),
    )
    return len(page_rows), len(metrics_rows), len(span_rows), len(stream_rows)


if __name__ == "__main__":
    n_pages, n_buckets, n_spans, n_stream = freeze()
    print("froze %d page rows, %d metric buckets, %d span rows, "
          "%d stream rows -> %s" % (
              n_pages, n_buckets, n_spans, n_stream, OUT_DIR))
