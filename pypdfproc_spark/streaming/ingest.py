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


def stream_url_capture_state(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 64,
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a running per-url profile (total captures seen, newest capture time)
    maintained ACROSS micro-batches and across restarts.

    This is the harness for stateful logic that watermarked built-ins can't
    express (arbitrary per-key state transitions, e.g. crawl-politeness
    budgets or per-site change detectors).  State lives in the streaming
    checkpoint: a later availableNow catch-up run resumes the counts where
    the previous run stopped (proven by tests/test_streaming.py::
    test_stream_url_capture_state_persists).

    Scale shape: state is partitioned by url hash across executors, one
    Arrow batch per key-group per micro-batch; updated keys only are
    emitted (outputMode update)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_fn(key, pdfs, state):
        import pandas as _pd

        captures = 0
        last_ts = None
        if state.exists:
            captures, last_ts = state.get
        for pdf in pdfs:
            captures += len(pdf)
            m = pdf["warc_ts"].max()
            if not _pd.isna(m):
                m = m.to_pydatetime()
                if last_ts is None or m > last_ts:
                    last_ts = m
        state.update((captures, last_ts))
        yield _pd.DataFrame(
            {"url": [key[0]], "captures": [captures], "last_ts": [last_ts]}
        )

    pages = read_pages_stream(spark, input_path, max_files_per_trigger)
    counts = (
        pages.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            update_fn,
            outputStructType="url string, captures bigint, last_ts timestamp",
            stateStructType="captures bigint, last_ts timestamp",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    # foreachBatch parquet sink: update-mode emissions land as appended
    # snapshots (latest row per url wins downstream), and — unlike the
    # memory sink — it supports restarting from the checkpoint, which is
    # the whole point of durable per-key state
    def _sink(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(output_path)

    return (
        counts.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
