"""Benchmark harness.

Default mode (what the driver runs per round): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling mode: the two-cluster-size evidence run (north_rule): the same
extraction job + input at local[8] vs local[32], 3 runs each, median;
prints per-level docs/sec and efficiency = (T_8 / T_32) / 4 and appends
the table to BENCH/BASELINE.md.

The pages input is synthesized deterministically from the sf documents
table (fixtures/pagesgen.py) and cached as parquet in /tmp keyed by sf.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# replicate the (small) synthetic corpus deterministically so throughput is
# dominated by extraction work, not per-job overhead
REPL = int(os.environ.get("SPARK_GRAFT_PAGES_REPL", "10"))


def pages_parquet(sf_dir: str, repl: int = REPL) -> tuple[str, int]:
    """Deterministic cached pages table for this sf."""
    from fixtures.pagesgen import build_pages_parquet

    tag = sf_dir.rstrip("/").replace("/", "_") + "_x%d" % repl
    path = "/tmp/spark_graft_pages%s.parquet" % tag
    meta = path + ".count"
    if os.path.exists(path) and os.path.exists(meta):
        return path, int(open(meta).read())
    n = build_pages_parquet(sf_dir, path, repl=repl)
    with open(meta, "w") as fh:
        fh.write(str(n))
    return path, n


def build(master: str):
    from pypdfproc_spark.spark.session import build_session

    return build_session(app="bench", master=master,
                         shuffle_partitions=32)


def run_extraction(spark, pages_path: str) -> tuple[float, int, int]:
    """Returns (wall_sec, docs, result_rows) for the full pipeline."""
    from pypdfproc_spark.spark import pipeline as P

    pages = spark.read.parquet(pages_path)
    # warm the Python workers (interpreter spawn + imports are one-time
    # session costs that amortize to zero on a real corpus)
    P.extract(P.route(pages.limit(256))).agg({"doc.n_pages": "sum"}).collect()
    t0 = time.time()
    df = P.latest_snapshot(pages)
    df = P.route(df)
    df = P.with_bucket(df, 64)
    df = P.salted_repartition(df, int(CPUS))
    ex = P.extract(df).persist()
    try:
        n_rows = P.results(ex).count()
        m = P.metrics(ex).agg({"docs": "sum"}).collect()[0][0]
    finally:
        ex.unpersist()
    wall = time.time() - t0
    return wall, int(m), n_rows


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    """Time the headline operator set (action = count)."""
    import __spark_entry__ as E

    q = E.queries()
    names = [
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_ngram_jaccard", "doc_fingerprint", "lang_id",
        "quality_score", "token_count", "ann_topk_bruteforce",
        "ann_lsh_bucketed", "blob_metadata", "latest_snapshot",
        "events_sessionize", "metrics_rollup", "topk_skew",
    ]
    out = {}
    for name in names:
        t0 = time.time()
        q[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def default_mode() -> None:
    pages_path, n_docs_rows = pages_parquet(SF_DIR)
    spark = build("local[%s]" % CPUS)
    try:
        wall, docs, rows = run_extraction(spark, pages_path)
        qt = run_queries(spark, SF_DIR)
    finally:
        spark.stop()
    total = round(wall + sum(qt.values()), 3)
    line = {
        "metric": "e2e_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": dict({"extract_pipeline": round(wall, 3)}, **qt),
        "sf": SF_DIR,
        "extraction_docs": docs,
        "extraction_result_rows": rows,
        "extraction_docs_per_sec": round(docs / wall, 2) if wall else None,
        "cpus": int(CPUS),
    }
    print(json.dumps(line))


def scaling_mode(runs: int = 3) -> None:
    pages_path, _ = pages_parquet(SF_DIR)
    results = {}
    for cores in (8, 32):
        walls = []
        docs = 0
        for _ in range(runs):
            spark = build("local[%d]" % cores)
            try:
                w, docs, _rows = run_extraction(spark, pages_path)
            finally:
                spark.stop()
            walls.append(w)
        med = statistics.median(walls)
        results[cores] = {
            "walls_sec": [round(w, 2) for w in walls],
            "median_sec": round(med, 2),
            "docs": docs,
            "docs_per_sec": round(docs / med, 2),
        }
    eff = (results[8]["median_sec"] / results[32]["median_sec"]) / 4.0
    out = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "levels": results,
        "sf": SF_DIR,
    }
    print(json.dumps(out))
    _write_baseline_md(out)


def _write_baseline_md(out: dict) -> None:
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    r8, r32 = out["levels"][8], out["levels"][32]
    with open(md, "a") as fh:
        fh.write(
            "\n## scaling run (sf=%s)\n\n"
            "| parallelism | walls (s) | median (s) | docs/sec |\n"
            "|---|---|---|---|\n"
            "| local[8] | %s | %s | %s |\n"
            "| local[32] | %s | %s | %s |\n\n"
            "efficiency (T_8/T_32)/4 = **%.3f** (target >= 0.8)\n"
            % (
                out["sf"],
                r8["walls_sec"], r8["median_sec"], r8["docs_per_sec"],
                r32["walls_sec"], r32["median_sec"], r32["docs_per_sec"],
                out["value"],
            )
        )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling_mode()
    else:
        default_mode()
