"""Multimodal plumbing tests: the mapInPandas harnesses (metadata, decode
gate, byte-histogram featurizer) must keep their batch shape and
never-raise contracts even though real media decode is stubbed."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from pypdfproc_spark.spark.session import build_session

    s = build_session(app="multimodal-tests", master="local[4]",
                      shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [
        (0, b"\x89PNG\r\n\x1a\nxxxx"),
        (1, b"\xff\xd8\xffjpegdata"),
        (2, b"%PDF-1.4 something"),
        (3, b"plain bytes"),
        (4, b""),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_blob_decode_gate_surfaces_typed_errors(spark, blobs):
    """The decode stub must surface as a per-row error VALUE through the
    mapInPandas harness — one row per blob, no exceptions."""
    from pypdfproc_spark.spark.multimodal import blob_decode

    rows = {r.doc_id: r for r in blob_decode(blobs).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert all(not r.decoded for r in rows.values())
    assert all(
        r.error and r.error.startswith("NotImplementedError")
        for r in rows.values()
    )


def test_blob_metadata_builtin_matches_pandas_harness(spark, blobs):
    """The JVM built-in metadata path and the mapInPandas harness must
    produce identical rows (the harness stays alive for real decode)."""
    from pypdfproc_spark.spark.multimodal import (
        blob_metadata,
        blob_metadata_pandas,
    )

    a = {r.doc_id: (r.n_bytes, r.sha256, r.magic)
         for r in blob_metadata(blobs).collect()}
    b = {r.doc_id: (r.n_bytes, r.sha256, r.magic)
         for r in blob_metadata_pandas(blobs).collect()}
    assert a == b
    assert a[0][2] == "png" and a[1][2] == "jpeg" and a[2][2] == "pdf"
    assert a[3][2] == "bin" and a[4][0] == 0


def test_blob_byte_histogram_shape(spark, blobs):
    from pypdfproc_spark.spark.multimodal import blob_byte_histogram

    rows = blob_byte_histogram(blobs).collect()
    # 16 bins per blob, including the empty one (all-zero histogram)
    assert len(rows) == 5 * 16
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, 0)
        by_doc[r.doc_id] += r.n
    assert by_doc[4] == 0
    assert by_doc[3] == len(b"plain bytes")
