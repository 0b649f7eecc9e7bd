"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Two paths, both pure built-in expressions (zip_with/aggregate fold for the
dot product -- JVM-side, no Python):

- brute-force cosine top-k: the correctness baseline.  The query side is
  tiny, so at scale it broadcasts; the candidate scan is embarrassingly
  parallel and the only shuffle is the per-query top-k (TopK sort, k small).
- sign-LSH bucketed top-k: the scale path.  Vectors are quantized to a
  2^B-bucket code from coordinate signs; candidates must share the query's
  bucket, cutting the scanned pairs by ~2^B for uniform data.  Bucketing is
  a plain projection; the join is an equi-join on the bucket code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(sf_dir.rstrip("/") + "/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_topk_bruteforce(spark, sf_dir, n_queries: int = 5, k: int = 5) -> DataFrame:
    """Exact cosine top-k: queries are vec_id < n_queries, candidates the
    rest.  Ranking key is (rounded cosine desc, vec_id asc) so that the
    DuckDB oracle ranks identically under float rounding."""
    emb = load_embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        F.round(cosine_expr(F.col("qv"), F.col("cv")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _sign_bucket(col, bits: int = 8):
    b = None
    for j in range(bits):
        bit = (F.element_at(col, j + 1) > 0).cast("long") * (2 ** j)
        b = bit if b is None else b + bit
    return b


def ann_lsh_bucketed(spark, sf_dir, n_queries: int = 5, k: int = 3,
                     bits: int = 6) -> DataFrame:
    """Sign-LSH bucketed ANN: candidates share the query's sign-quantized
    bucket code (random-hyperplane LSH with axis-aligned planes)."""
    emb = load_embeddings(spark, sf_dir).withColumn(
        "bucket", _sign_bucket(F.col("embedding"), bits)
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "bucket",
    )
    c = emb.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        "bucket",
    )
    scored = F.broadcast(q).join(c, "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(cosine_expr(F.col("qv"), F.col("cv")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def dedup_embedding_cosine(spark, sf_dir, threshold: float = 0.4,
                           bits: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share a sign-LSH
    bucket (cuts the pair space ~2^bits for uniform data), survivors pass
    the cosine threshold.  The scale path of embedding dedup: bucket
    equi-join, never a full cross join."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("bucket", _sign_bucket(F.col("v"), bits))
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_buckets(spark, sf_dir, bits: int = 6) -> DataFrame:
    """Bucket occupancy histogram: the skew diagnostic for the LSH path."""
    emb = load_embeddings(spark, sf_dir)
    return (
        emb.withColumn("bucket", _sign_bucket(F.col("embedding"), bits))
        .groupBy("bucket")
        .agg(F.count("*").alias("vectors"))
    )
