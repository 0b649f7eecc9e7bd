"""Isolated A/B bench for the round-4 query-regression lookalikes.

Per CLAUDE.md protocol: each measurement in its OWN Spark session,
variants interleaved across repeats so host-load drift hits all equally,
medians reported.

Variants:
  simhash      — dedup_simhash alone (r03 in-bench 1.69 s vs r02 1.55 s:
                 regression or host noise?)
  ivf_probe    — ann_ivf_topk against the PERSISTED index (the r04
                 refactor's recurring query path; index built once before
                 the runs)
  ivf_cold     — ivf_build_index forced rebuild + probe (the old r03
                 in-query-training shape, for the attribution table)

Usage: python tools/ab_queries.py [repeats]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _session():
    from bench import build

    return build("local[%d]" % CPUS)


def _run(variant: str) -> float:
    from pypdfproc_spark.spark import similarity as SIM
    from pypdfproc_spark.spark import textops as T

    spark = _session()
    try:
        # warm the session (JVM + parquet footer reads) outside the window
        T.load_documents(spark, SF_DIR).count()
        if variant == "simhash":
            t0 = time.time()
            T.dedup_simhash(spark, SF_DIR).count()
            return time.time() - t0
        if variant == "ivf_probe":
            idx = SIM.ivf_build_index(spark, SF_DIR)  # cached: no-op
            t0 = time.time()
            SIM.ann_ivf_topk(spark, SF_DIR, index_dir=idx).count()
            return time.time() - t0
        if variant == "ivf_cold":
            shutil.rmtree(SIM.ivf_index_path(SF_DIR), ignore_errors=True)
            t0 = time.time()
            SIM.ann_ivf_topk(spark, SF_DIR).count()  # builds then probes
            return time.time() - t0
        raise ValueError(variant)
    finally:
        spark.stop()


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    variants = ["simhash", "ivf_probe", "ivf_cold"]
    # ensure the persisted index exists before any ivf_probe measurement
    s = _session()
    try:
        from pypdfproc_spark.spark import similarity as SIM

        SIM.ivf_build_index(s, SF_DIR)
    finally:
        s.stop()
    walls: dict[str, list[float]] = {v: [] for v in variants}
    for r in range(repeats):
        for v in variants:
            w = _run(v)
            walls[v].append(w)
            print(json.dumps({"repeat": r, "variant": v,
                              "wall": round(w, 2)}), flush=True)
    out = {
        v: {"runs": [round(w, 2) for w in walls[v]],
            "median": round(statistics.median(walls[v]), 2)}
        for v in variants
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
