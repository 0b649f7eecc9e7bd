"""Scale-shape tests for the LSH dedup paths: the degenerate-bucket caps
must bound pair fan-out (one hot bucket at corpus scale would otherwise
yield a quadratic within-bucket self-join)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def spark():
    from pypdfproc_spark.spark.session import build_session

    s = build_session(app="similarity-tests", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()


def _write_embeddings(dirpath: str, vectors) -> str:
    os.makedirs(dirpath, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vectors)), pa.int64()),
            "embedding": pa.array(vectors, pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "embeddings.parquet"))
    return dirpath


def _write_documents(dirpath: str, texts) -> str:
    os.makedirs(dirpath, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "documents.parquet"))
    return dirpath


def test_embedding_dedup_bucket_cap_bounds_fanout(spark, tmp_path_factory):
    """150 identical vectors put every (band, bucket) at occupancy 150 >
    MAX_EMB_BUCKET: the cap must drop them all -> zero candidate pairs
    (instead of 150^2/2 x 4 bands)."""
    from pypdfproc_spark.spark import similarity as S

    assert S.MAX_EMB_BUCKET < 150
    vec = [1.0] * 32 + [-1.0] * 32
    sf = _write_embeddings(
        str(tmp_path_factory.mktemp("emb_hot")), [vec] * 150
    )
    assert S.dedup_embedding_cosine(spark, sf).count() == 0


def test_embedding_dedup_finds_identical_pairs(spark, tmp_path_factory):
    """Below the cap, identical vectors pair up with cosine 1.0, and a
    far-away vector contributes nothing."""
    from pypdfproc_spark.spark import similarity as S

    a = [1.0] * 32 + [-1.0] * 32
    b = [-1.0] * 32 + [1.0] * 32  # opposite signs: different buckets
    sf = _write_embeddings(
        str(tmp_path_factory.mktemp("emb_pairs")), [a, a, a, b]
    )
    rows = S.dedup_embedding_cosine(spark, sf).collect()
    pairs = {(r.vec_a, r.vec_b) for r in rows}
    assert pairs == {(0, 1), (0, 2), (1, 2)}
    assert all(r.cosine == 1.0 for r in rows)


def test_simhash_pairs_identical_docs(spark, tmp_path_factory):
    """Identical texts have equal simhashes -> Hamming 0 pairs; a very
    different text stays unpaired."""
    from pypdfproc_spark.spark import textops as X

    same = "the quick brown fox jumps over the lazy dog " * 5
    other = "zzz qqq completely unrelated vocabulary entirely " * 5
    sf = _write_documents(
        str(tmp_path_factory.mktemp("sim_docs")), [same, same, same, other]
    )
    rows = X.dedup_simhash_pairs(spark, sf).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert {(0, 1), (0, 2), (1, 2)} <= set(pairs)
    assert all(pairs[p] == 0 for p in [(0, 1), (0, 2), (1, 2)])
    assert not any(3 in p for p in pairs)


def test_simhash_pairs_bucket_cap(spark, tmp_path_factory):
    """Above MAX_SIMHASH_BUCKET identical docs, the degenerate buckets are
    dropped and no pairs come out."""
    from pypdfproc_spark.spark import textops as X

    n = X.MAX_SIMHASH_BUCKET + 10
    sf = _write_documents(
        str(tmp_path_factory.mktemp("sim_hot")), ["same text here"] * n
    )
    assert X.dedup_simhash_pairs(spark, sf).count() == 0


def test_simhash_pairs_shared_signatures(spark):
    """dedup_simhash_pairs(sim=precomputed) must return exactly the rows of
    the self-computing path (the bench shares the persisted signature DF)."""
    from pypdfproc_spark.spark import textops as T

    sf = "/root/testdata/sf0.001"
    standalone = {tuple(r) for r in T.dedup_simhash_pairs(spark, sf).collect()}
    sim = T.dedup_simhash(spark, sf).persist()
    try:
        shared = {
            tuple(r) for r in T.dedup_simhash_pairs(spark, sf, sim=sim).collect()
        }
    finally:
        sim.unpersist()
    assert shared == standalone and standalone


def test_dedup_components_chain_closure(spark):
    """A chain 1-2, 2-3, 3-4 plus an isolated pair 10-11 must collapse to
    min-id components {1,2,3,4}->1 and {10,11}->10 — the transitive
    closure greedy pair-removal cannot express (it would need 2-3
    propagation rounds, exercising the fixpoint loop)."""
    from pypdfproc_spark.spark import textops

    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (10, 11, 1.0)],
        "doc_a long, doc_b long, jaccard double",
    )
    got = {
        (r["doc_id"], r["component"])
        for r in textops.dedup_components(spark, "", pairs=pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_dedup_components_nonconvergence_raises(spark):
    """A path of diameter 4 cannot reach its fixpoint in max_iter=1:
    exiting via max_iter must be an explicit error, not silently wrong
    labels (ADVICE r05)."""
    import pytest

    from pypdfproc_spark.spark import textops

    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0)],
        "doc_a long, doc_b long, jaccard double",
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        textops.dedup_components(spark, "", pairs=pairs, max_iter=1)


def test_ivf_recall_floor(spark, tmp_path):
    """Retrieval-quality regression gate (VERDICT r04 item 5): recall@5
    of the IVF probe vs brute force was measured 0.60-0.64 across rounds
    but never asserted — a codebook/probe change could degrade retrieval
    while staying oracle-green (the oracle checks determinism, not
    quality).  Floor: recall@5 >= 0.5 on sf0.001 with the bench
    parameters (n_cells=16, nprobe=4)."""
    from pypdfproc_spark.spark import similarity as S

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_topk_bruteforce(spark, sf).collect()
    }
    idx = S.ivf_build_index(spark, sf, path=str(tmp_path / "ivf"))
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_ivf_topk(spark, sf, index_dir=idx).collect()
    }
    assert exact, "brute-force baseline must return rows"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, "IVF recall@5 dropped to %.3f" % recall
