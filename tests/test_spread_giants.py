"""spread_giants: skew handling without re-shuffling the normal majority."""

import datetime

import pytest


@pytest.fixture(scope="module")
def spark():
    from pypdfproc_spark.spark.session import build_session

    s = build_session(app="spread-tests", master="local[4]",
                      shuffle_partitions=4)
    yield s
    s.stop()


def test_giants_spread_and_rows_preserved(spark):
    import pyspark.sql.functions as F

    from pypdfproc_spark.spark import pipeline as P

    ts = datetime.datetime(2024, 1, 1)
    big = b"%PDF-" + b"x" * (2 << 20)
    small = b"<html><p>tiny</p></html>"
    rows = [("https://g.test/%d" % i, ts, big, None, "en") for i in range(12)]
    rows += [("https://s.test/%d" % i, ts, small, None, "en") for i in range(50)]
    df = spark.createDataFrame(rows, P.PAGES_SCHEMA)

    out = P.spread_giants(df, partitions=8, big_doc_bytes=1 << 20)
    assert out.count() == len(rows)  # no rows lost by the split/union
    giant_parts = (
        out.filter(F.length("html") > (1 << 20))
        .withColumn("pid", F.spark_partition_id())
        .select("pid").distinct().count()
    )
    assert giant_parts >= 4, "giants collapsed onto %d partitions" % giant_parts


def test_pipeline_with_dedup_still_correct(spark):
    """run_pipeline's spread_giants path returns the same rows as the
    salted path."""
    from fixtures.pagesgen import build_pages_rows, load_documents
    from pypdfproc_spark.spark import pipeline as P

    rows = build_pages_rows(load_documents("/root/testdata/sf0.001", limit=60))
    df = spark.createDataFrame(rows, P.PAGES_SCHEMA)
    res_dedup, _ = P.run_pipeline(df, n_buckets=8, partitions=4, dedup=True)
    a = {(r.url, r.page_no, r.text) for r in res_dedup.collect()}
    # manual reference: dedup then salted repartition then extract
    alt = P.salted_repartition(
        P.with_bucket(P.route(P.latest_snapshot(df)), 8), 4
    )
    res_alt = P.results(P.extract(alt))
    b = {(r.url, r.page_no, r.text) for r in res_alt.collect()}
    assert a == b
