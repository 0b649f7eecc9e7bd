"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct.  The Spark-side plumbing — schema, Arrow batch shape,
mapInPandas signature, partitioning — is real and tested; the actual media
decode is STUBBED (the sandbox ships no image/audio libraries): decode
functions raise NotImplementedError behind a clearly-marked gate, and the
deterministic metadata path (byte length, content hash, magic sniff) is the
testable surface.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("magic", T.StringType()),
    ]
)

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"%PDF-", "pdf"),
]


def sniff_magic(payload: bytes) -> str:
    for prefix, kind in _MAGIC:
        if payload.startswith(prefix):
            return kind
    return "bin"


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real image decode requires PIL/cv2, absent in this container.
    The Spark plumbing around it (binary column -> mapInPandas batches ->
    struct rows) is the tested contract."""
    raise NotImplementedError("image decode requires an image library")


def resize_image(payload: bytes, w: int, h: int):  # pragma: no cover - stub
    raise NotImplementedError("image resize requires an image library")


def sample_frames(payload: bytes, n: int):  # pragma: no cover - stub
    raise NotImplementedError("video frame sampling requires an av library")


import os as _os

_PKG_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def _make_meta_batches(pkg_root: str):
    """Factory closure (pickled by value; see pipeline._make_extract_batch)."""

    def _meta_batches(it):
        import hashlib as _hashlib
        import sys as _sys

        import pandas as _pd

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        from pypdfproc_spark.spark.multimodal import sniff_magic

        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "sha256": pdf["payload"].map(
                    lambda b: _hashlib.sha256(bytes(b)).hexdigest()
                ),
                "magic": pdf["payload"].map(lambda b: sniff_magic(bytes(b))),
            }
            yield _pd.DataFrame(out)

    return _meta_batches


def blob_metadata(blobs: DataFrame) -> DataFrame:
    """blobs(doc_id long, payload binary) -> typed metadata, all JVM-side.

    length / sha2 / prefix-match are built-in expressions (whole-stage
    codegen, no Python worker); the mapInPandas harness below exists only
    for the real media-decode path that needs Python libraries."""
    magic = None
    for prefix, kind in _MAGIC:
        cond = F.substring("payload", 1, len(prefix)) == F.lit(prefix)
        magic = F.when(cond, kind) if magic is None else magic.when(cond, kind)
    return blobs.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
        magic.otherwise("bin").alias("magic"),
    )


def blob_metadata_pandas(blobs: DataFrame) -> DataFrame:
    """The mapInPandas harness (binary column -> Arrow batches -> struct
    rows): the plumbing real image/audio decode plugs into (decode_image &
    co. above are the gated stubs).  Kept tested so the batch shape and
    schema contract stay alive; the shipped metadata query uses the
    built-in path."""
    return blobs.mapInPandas(_make_meta_batches(_PKG_ROOT), schema=BLOB_META_SCHEMA)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def _make_decode_batches(pkg_root: str):
    """Factory closure (pickled by value; see pipeline._make_extract_batch)."""

    def _decode_batches(it):
        import sys as _sys

        import pandas as _pd

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        from pypdfproc_spark.spark.multimodal import decode_image

        for pdf in it:
            ids, oks, errs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    decode_image(bytes(payload))
                    ok, err = True, None
                except NotImplementedError as e:
                    ok, err = False, "NotImplementedError: %s" % e
                except Exception as e:  # a real decoder's failure path
                    ok, err = False, "%s: %s" % (type(e).__name__, e)
                ids.append(int(doc_id))
                oks.append(ok)
                errs.append(err)
            yield _pd.DataFrame({"doc_id": ids, "decoded": oks, "error": errs})

    return _decode_batches


def blob_decode(blobs: DataFrame) -> DataFrame:
    """The gated media-decode harness: binary column -> mapInPandas ->
    typed (decoded, error) rows.  decode_image is a declared stub in this
    container (no media libraries), so every row surfaces the typed
    NotImplementedError as an error VALUE — never an exception — which is
    exactly the contract a real decoder plugs into (its failures become
    per-row errors, its successes flip ``decoded``)."""
    return blobs.mapInPandas(_make_decode_batches(_PKG_ROOT),
                             schema=DECODE_SCHEMA)


HIST_BINS = 16  # high-nibble histogram: bin = byte >> 4

HIST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bin", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _make_hist_batches(pkg_root: str):
    """Factory closure (pickled by value; see pipeline._make_extract_batch)."""

    def _hist_batches(it):
        import numpy as _np
        import pandas as _pd
        import sys as _sys

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        bins = list(range(16))
        for pdf in it:
            ids, bs, ns = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = _np.frombuffer(bytes(payload), dtype=_np.uint8)
                hist = _np.bincount(arr >> 4, minlength=16)
                ids.extend([int(doc_id)] * 16)
                bs.extend(bins)
                ns.extend(int(x) for x in hist)
            yield _pd.DataFrame({"doc_id": ids, "bin": bs, "n": ns})

    return _hist_batches


def blob_byte_histogram(blobs: DataFrame) -> DataFrame:
    """Per-blob byte-value histogram (16 high-nibble bins): the REAL
    feature-extraction batch shape for multimodal columns — binary column
    in, Arrow batches through numpy (frombuffer + bincount, fully
    vectorized), typed rows out.  This is the harness an image/audio
    featurizer plugs into; unlike the decode stubs it does genuine work
    and has an exact DuckDB oracle (hex-nibble extraction)."""
    return blobs.mapInPandas(_make_hist_batches(_PKG_ROOT), schema=HIST_SCHEMA)


def blob_byte_histogram_query(spark, sf_dir) -> DataFrame:
    return blob_byte_histogram(documents_as_blobs(spark, sf_dir))


def documents_as_blobs(spark: SparkSession, sf_dir: str,
                       spread: bool = True) -> DataFrame:
    """Stand-in binary corpus: utf-8 payload per document (deterministic).

    ``spread`` (textops.spread_scan): the single-row-group input would
    otherwise feed the mapInPandas featurizer ONE partition — the whole
    Python stage serialized on one worker.  The cheap JVM metadata
    projection passes spread=False (the materialization would cost more
    than it parallelizes)."""
    from pypdfproc_spark.spark.textops import load_documents

    docs = load_documents(spark, sf_dir, spread=spread)
    return docs.select(
        "doc_id", F.encode(F.coalesce("text", F.lit("")), "utf-8").alias("payload")
    )


def blob_metadata_query(spark, sf_dir) -> DataFrame:
    """The oracle-checkable multimodal query: binary metadata extraction."""
    return blob_metadata(documents_as_blobs(spark, sf_dir, spread=False))
