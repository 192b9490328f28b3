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


def test_srp_buckets_deterministic(spark, emb_df):
    from simhash_spark.operators.ann import srp_buckets

    df, _ = emb_df
    b1 = sorted(map(tuple, srp_buckets(df, "vec_id", 32, 8, 2).collect()))
    b2 = sorted(map(tuple, srp_buckets(df, "vec_id", 32, 8, 2).collect()))
    assert b1 == b2
