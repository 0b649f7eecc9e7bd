"""Streaming ingestion: continuously extract newly-arriving page captures.

The batch pipeline (spark/pipeline.py) covers the reference's semantics;
this module is the continuous-ingestion variant for a live crawl feed
(SURVEY.md §2.9 notes it as an extension beyond the reference, which is
batch-only).

Shape: ``readStream`` over a directory/table of page captures ->
route -> Arrow-batched extraction -> ``writeStream`` (append) with exactly
once file-source progress tracked in the streaming checkpoint; late-data
metrics via an event-time watermark on ``warc_ts``.

The ``availableNow`` trigger processes the current backlog and stops — the
testable local mode, and also the recommended production catch-up mode;
leaving ``trigger=None`` runs micro-batches forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..spark.pipeline import PAGES_SCHEMA, extract, results, route, with_bucket


def read_pages_stream(spark: SparkSession, input_path: str,
                      max_files_per_trigger: int = 64) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def stream_extract(
    spark: SparkSession,
    input_path: str,
    results_path: str,
    checkpoint_path: str,
    n_buckets: int = 64,
    available_now: bool = True,
    dedup_within: str | None = None,
):
    """Start the extraction stream; returns the StreamingQuery.

    ``dedup_within``: optional watermark duration (e.g. "1 hour") enabling
    streaming url-dedup via dropDuplicatesWithinWatermark — re-crawls of a
    url arriving within the watermark are dropped (FIRST-arrival-wins;
    bounded state).  This differs from the batch pipeline's latest-snapshot
    semantics, which is a global newest-wins window: streaming keeps state
    only within the watermark horizon, so a periodic batch compaction with
    pipeline.latest_snapshot remains the source of truth for re-crawls
    farther apart than the watermark.
    """
    pages = read_pages_stream(spark, input_path)
    if dedup_within:
        pages = pages.withWatermark("warc_ts", dedup_within)
        pages = pages.dropDuplicatesWithinWatermark(["url"])
    ex = extract(with_bucket(route(pages), n_buckets))
    out = results(ex)
    writer = (
        out.writeStream.format("parquet")
        .option("path", results_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_metrics(
    spark: SparkSession,
    input_path: str,
    metrics_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
    window: str = "1 hour",
    available_now: bool = True,
    max_files_per_trigger: int = 64,
):
    """Windowed ingestion metrics with late-data handling: docs and payload
    bytes per (event-time window, kind), watermarked on warc_ts so state is
    bounded and stragglers later than the watermark are dropped.

    NB (append-mode semantics): a window is emitted only once the watermark
    passes its end, i.e. on a LATER micro-batch carrying newer event times —
    the correct behavior for an endless crawl feed; a drained backlog's last
    open windows stay in state until more data arrives."""
    pages = read_pages_stream(spark, input_path,
                              max_files_per_trigger=max_files_per_trigger)
    agg = (
        route(pages)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "kind")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.length("html")).alias("bytes_in"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "kind",
            "docs",
            "bytes_in",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", metrics_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
