"""Guards for the frozen extraction expectations (fixtures/expectations/):
the pure-Python pipeline twin must agree with Spark's hash/bucketing, and
the committed parquet must be regenerable bit-for-bit from current code."""

import os

import pyarrow.parquet as pq
import pytest

from fixtures.freeze_expectations import (
    LIMIT,
    N_BUCKETS,
    OUT_DIR,
    SF_DIR,
    bucket_of,
    expected_rows,
    spark_xxhash64_str,
)


def test_xxh64_matches_spark():
    """The from-spec XXH64 must equal Spark's xxhash64(seed=42) on strings
    covering every tail-length branch (0..33 bytes) and real urls."""
    from pypdfproc_spark.spark.session import build_session

    samples = ["x" * n for n in range(34)] + [
        "https://example-en.test/0123456789abcdef/42",
        "https://example-de.test/deadbeefdeadbeef/7",
        "ünïcode-ürl/☃",
    ]
    spark = build_session(app="xxh-test", master="local[2]",
                          shuffle_partitions=2)
    try:
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(s,) for s in samples], ["s"])
        got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}

        # binary columns too (latest_snapshot tie-breaks on xxhash64(html))
        from fixtures.freeze_expectations import xxh64

        payloads = [b"", b"x" * 7, b"<html>capture</html>", bytes(range(64))]
        bdf = spark.createDataFrame(
            [(i, p) for i, p in enumerate(payloads)], ["i", "b"]
        )
        bgot = {r.i: r.h
                for r in bdf.select("i", F.xxhash64("b").alias("h")).collect()}
        for i, p in enumerate(payloads):
            h = xxh64(p)
            assert (h - (1 << 64) if h >= (1 << 63) else h) == bgot[i], p
    finally:
        spark.stop()
    for s in samples:
        assert spark_xxhash64_str(s) == got[s], s


def test_bucket_range():
    assert all(
        0 <= bucket_of("u%d" % i, N_BUCKETS) < N_BUCKETS for i in range(100)
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no sf0.01 testdata")
def test_frozen_expectations_are_current():
    """Regenerating from the current code must reproduce the committed
    parquet exactly (catches silent drift of pagesgen / extractor / dedup
    semantics vs the frozen oracle)."""
    page_rows, metrics_rows, span_rows, stream_rows = expected_rows(
        SF_DIR, LIMIT, N_BUCKETS)

    pt = pq.read_table(os.path.join(OUT_DIR, "extract_pages_sf001.parquet"))
    frozen_pages = set(zip(*(pt.column(c).to_pylist()
                             for c in ("url", "page_no", "text", "parser"))))
    assert set(page_rows) == frozen_pages

    mt = pq.read_table(os.path.join(OUT_DIR, "extract_metrics_sf001.parquet"))
    frozen_metrics = set(zip(*(mt.column(c).to_pylist()
                               for c in ("bucket", "docs", "pages_parsed",
                                         "pages_dropped", "decode_failures",
                                         "fallback_rate"))))
    assert set(metrics_rows) == frozen_metrics

    st = pq.read_table(os.path.join(OUT_DIR, "extract_spans_sf001.parquet"))
    frozen_spans = set(zip(*(st.column(c).to_pylist()
                             for c in ("url", "page_no", "span_no",
                                       "span_start", "span_end", "x", "y"))))
    assert set(span_rows) == frozen_spans
    assert len(span_rows) > 0

    rt = pq.read_table(os.path.join(OUT_DIR, "extract_stream_sf001.parquet"))
    frozen_stream = sorted(zip(*(rt.column(c).to_pylist()
                                 for c in ("url", "page_no", "text",
                                           "parser"))),
                           key=repr)
    assert sorted(stream_rows, key=repr) == frozen_stream
    # the stream twin skips dedup, so it must carry at least the deduped
    # row count (stale re-crawl captures extract too)
    assert len(stream_rows) >= len(page_rows)
