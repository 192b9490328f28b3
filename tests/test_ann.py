"""ANN operators: brute-force correctness + SRP-LSH recall."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(300, 32)).astype(np.float32)
    # plant near-neighbors of vector 0
    base[1] = base[0] + rng.normal(scale=0.05, size=32).astype(np.float32)
    base[2] = base[0] + rng.normal(scale=0.08, size=32).astype(np.float32)
    rows = [(int(i), base[i].tolist()) for i in range(len(base))]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        base,
    )


def _true_topk(base, qi, k):
    n = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = n @ n[qi]
    sims[qi] = -2
    order = np.lexsort((np.arange(len(base)), -sims))
    return [int(i) for i in order[:k]]


def test_bruteforce_topk_exact(spark, emb_df):
    from simhash_spark.operators.ann import cosine_topk_bruteforce

    df, base = emb_df
    q = df.filter("vec_id = 0").selectExpr("vec_id as query_id", "embedding")
    got = (
        cosine_topk_bruteforce(df.filter("vec_id != 0"), q, k=10)
        .orderBy("rnk")
        .collect()
    )
    want = _true_topk(base, 0, 10)
    assert [r.vec_id for r in got] == want
    assert got[0].vec_id in (1, 2)  # planted neighbor wins


def test_srp_bucketed_topk_recall(spark, emb_df):
    from simhash_spark.operators.ann import cosine_topk_bruteforce, srp_bucket_topk

    df, base = emb_df
    q = df.filter("vec_id < 5").selectExpr("vec_id as query_id", "embedding")
    v = df
    exact = cosine_topk_bruteforce(v, q, k=5).collect()
    approx = srp_bucket_topk(v, q, dim=32, k=5, n_bits=8, n_tables=8).collect()
    ex = {(r.query_id, r.vec_id) for r in exact}
    ap = {(r.query_id, r.vec_id) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6  # 8x8 SRP on 300 vecs: generous bound, seeded
    # the planted near-dup of q0 must survive bucketing
    assert (0, 1) in ap or (0, 0) in ap


def test_srp_multiprobe_recall_on_real_tables(spark):
    """Right-sized buckets (2^n_bits ~ n/32) + multiprobe-1 must reach
    recall@10 >= 0.9 against brute force on the driver's embeddings table
    (weak-structure synthetic data — the hard case for SRP)."""
    from pyspark.sql import functions as F

    from simhash_spark.operators.ann import cosine_topk_bruteforce, srp_bucket_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(e.select("embedding").first()[0])
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = {(r.query_id, r.vec_id) for r in cosine_topk_bruteforce(e, q, k=10).collect()}
    srp = {
        (r.query_id, r.vec_id)
        for r in srp_bucket_topk(
            e, q, dim=dim, k=10, n_bits=4, n_tables=16, multiprobe=1
        ).collect()
    }
    assert len(srp & brute) / len(brute) >= 0.9


def test_srp_multiprobe_probes_neighbor_buckets(spark, emb_df):
    """multiprobe=1 candidates are a superset of multiprobe=0's."""
    from simhash_spark.operators.ann import srp_bucket_topk

    df, _ = emb_df
    q = df.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    base = {(r.query_id, r.vec_id) for r in srp_bucket_topk(df, q, dim=32, k=5, n_bits=8, n_tables=4).collect()}
    mp = srp_bucket_topk(df, q, dim=32, k=5, n_bits=8, n_tables=4, multiprobe=1)
    got = {(r.query_id, r.vec_id) for r in mp.collect()}
    assert len(got) >= len(base)


def test_cosine_pairs_blocked_exact(spark, emb_df):
    """Blocked GEMM == brute-force numpy threshold pairs, any block count."""
    from simhash_spark.operators.ann import cosine_pairs_blocked

    df, base = emb_df
    n = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = n @ n.T
    want = {
        (i, j)
        for i in range(len(base))
        for j in range(i + 1, len(base))
        if sims[i, j] >= 0.5
    }
    for nb in (1, 4, 7):
        got = {(r.a, r.b) for r in cosine_pairs_blocked(df, 0.5, n_blocks=nb).collect()}
        assert got == want, f"n_blocks={nb}"
    assert want  # the planted neighbors guarantee a non-trivial set


def test_cosine_pairs_blocked_autosized_tiny_budget(spark, emb_df):
    """n_blocks=None derives B from count/block_target_rows; a FORCED
    tiny block budget (20 rows -> B=15 over 300 vectors) must still be
    exact — and since tiles arrive as cogrouped ordinary rows, no
    single row ever widens with the block (VERDICT r2 #2)."""
    from simhash_spark.operators.ann import cosine_pairs_blocked

    df, base = emb_df
    n = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = n @ n.T
    want = {
        (i, j)
        for i in range(len(base))
        for j in range(i + 1, len(base))
        if sims[i, j] >= 0.5
    }
    out = cosine_pairs_blocked(df, 0.5, n_blocks=None, block_target_rows=20)
    got = {(r.a, r.b) for r in out.collect()}
    assert got == want
    # plan shape: grouped-map over (bi, bj), no cartesian, no collect_list
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    ) if hasattr(out._sc._jvm, "PythonSQLUtils") else out._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_srp_buckets_deterministic(spark, emb_df):
    from simhash_spark.operators.ann import srp_buckets

    df, _ = emb_df
    b1 = sorted(map(tuple, srp_buckets(df, "vec_id", 32, 8, 2).collect()))
    b2 = sorted(map(tuple, srp_buckets(df, "vec_id", 32, 8, 2).collect()))
    assert b1 == b2


def test_ivf_nprobe_all_cells_is_exact(spark, emb_df):
    """nprobe == n_cells degenerates IVF to brute force: every query
    probes every cell, so the candidate set is the full corpus and the
    exact-cosine rerank must equal cosine_topk_bruteforce row for row."""
    from simhash_spark.operators.ann import cosine_topk_bruteforce, ivf_topk

    df, base = emb_df
    q = df.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    exact = cosine_topk_bruteforce(df, q, k=5).collect()
    got = ivf_topk(df, q, n_cells=8, nprobe=8, k=5).collect()
    assert {(r.query_id, r.vec_id, r.rnk) for r in got} == {
        (r.query_id, r.vec_id, r.rnk) for r in exact
    }


def test_ivf_topk_recall(spark, emb_df):
    from simhash_spark.operators.ann import cosine_topk_bruteforce, ivf_topk

    df, base = emb_df
    q = df.filter("vec_id < 5").selectExpr("vec_id as query_id", "embedding")
    exact = cosine_topk_bruteforce(df, q, k=5).collect()
    approx = ivf_topk(df, q, n_cells=16, nprobe=4, k=5).collect()
    ex = {(r.query_id, r.vec_id) for r in exact}
    ap = {(r.query_id, r.vec_id) for r in approx}
    assert len(ex & ap) / len(ex) >= 0.6  # 4/16 cells probed, seeded corpus
    assert (0, 1) in ap or (0, 2) in ap  # a planted neighbor of q0 survives


def test_ivf_centroids_deterministic_and_probe_bounded(spark, emb_df):
    """Same input -> byte-identical codebook (seeded sample + seeded
    k-means), and the candidate set is genuinely sub-linear: probing 1
    of 16 cells must touch well under half the corpus per query."""
    from simhash_spark.operators.ann import ivf_candidates, ivf_train_centroids

    df, base = emb_df
    c1 = ivf_train_centroids(df, 16)
    c2 = ivf_train_centroids(df, 16)
    assert c1.shape == (16, 32) and np.array_equal(c1, c2)
    # unit-normalized codebook
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)

    q = df.filter("vec_id < 5").selectExpr("vec_id as query_id", "embedding")
    cand = ivf_candidates(df, q, c1, nprobe=1)
    per_q = cand.groupBy("query_id").count().collect()
    assert all(r["count"] < 150 for r in per_q)  # < half of 300 vectors
