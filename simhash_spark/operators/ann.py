"""Approximate nearest neighbors over embedding columns.

Two tiers (SURVEY-mandated similarity-search ops for a training-data
pipeline):

- ``cosine_topk_bruteforce`` — exact baseline: broadcast the query
  vectors, JVM-side fold for the dot product (F.aggregate/zip_with —
  stays in whole-stage codegen, no Python).
- ``srp_bucket_topk`` — the scale path: Sign-Random-Projection LSH.
  Each vector gets ``n_tables`` bucket ids from ``n_bits`` seeded random
  hyperplanes; query vectors probe only their buckets, exact cosine is
  computed on the candidates. Probe cost ~ n/2^n_bits per table instead
  of n.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SRP_SEED = 0xA55_BEEF


def _cos_sim(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk_bruteforce(
    vectors: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """vectors(vec_id, embedding), queries(query_id, embedding) ->
    (query_id, vec_id, sim, rnk<=k). Exact; one pass over vectors per
    query batch (queries broadcast)."""
    from pyspark.sql import Window as W

    v = vectors.select("vec_id", _as_double("embedding").alias("emb"))
    q = queries.select("query_id", _as_double("embedding").alias("qemb"))
    scored = v.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        _cos_sim(F.col("emb"), F.col("qemb")).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def _srp_planes(dim: int, n_bits: int, n_tables: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(SRP_SEED))
    return rng.normal(size=(n_tables, n_bits, dim)).astype(np.float64)


def srp_buckets(df: DataFrame, id_col: str, dim: int, n_bits: int = 12, n_tables: int = 4) -> DataFrame:
    """(id, embedding) -> (id, table_id, bucket) — one row per table.
    bucket = sign-bit pattern of the hyperplane projections (int64)."""
    planes = _srp_planes(dim, n_bits, n_tables)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucket_udf(emb: pd.Series) -> pd.Series:
        m = np.array(emb.tolist(), dtype=np.float64)  # (batch, dim)
        out = np.empty((len(m), n_tables), dtype=np.int64)
        w = (1 << np.arange(n_bits, dtype=np.int64))[None, :]
        for t in range(n_tables):
            proj = m @ planes[t].T  # (batch, n_bits)
            out[:, t] = ((proj > 0).astype(np.int64) * w).sum(axis=1)
        return pd.Series(list(out))

    return df.select(
        F.col(id_col),
        F.posexplode(bucket_udf("embedding")).alias("table_id", "bucket"),
    )


def srp_bucket_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """LSH-bucketed ANN: probe only same-bucket candidates, exact cosine
    on the candidates, per-query top-k. Recall grows with n_tables /
    shrinks with n_bits (standard SRP tradeoff)."""
    from pyspark.sql import Window as W

    vb = srp_buckets(vectors, "vec_id", dim, n_bits, n_tables)
    qb = srp_buckets(queries, "query_id", dim, n_bits, n_tables)
    cand = (
        vb.join(qb, ["table_id", "bucket"], "inner")
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    v = vectors.select("vec_id", _as_double("embedding").alias("emb"))
    q = queries.select("query_id", _as_double("embedding").alias("qemb"))
    scored = (
        cand.join(v, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "vec_id", _cos_sim(F.col("emb"), F.col("qemb")).alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
