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
- ``cosine_pairs_blocked`` — EXACT threshold self-join via blocked GEMM:
  no row-level cartesian. Vectors are hashed into B blocks, the
  B*(B+1)/2 block pairs are enumerated as a tiny driver-built DataFrame,
  and each block pair runs one vectorized numpy matmul inside
  mapInPandas. Work is inherently O(n^2) flops (it is an exact
  threshold join) but distributes as bounded-memory BLAS tasks with no
  O(n^2) rows ever shuffled or materialized — the standard way to
  compute exact ANN ground truth on a cluster. For approximate
  at-scale similarity, use the SRP path.
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


def cosine_pairs_blocked(
    vectors: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine similarity >= threshold, blocked-GEMM plan.

    (id, embedding) -> (a, b, sim) with a < b. Each of the B*(B+1)/2
    block pairs computes one ``A_norm @ B_norm.T`` in a mapInPandas task;
    per-task memory is 2 * (n/B) * dim * 8 bytes, so pick ``n_blocks`` so
    a block holds <= ~50k vectors (e.g. B = ceil(n / 5e4)). The plan is
    two equi-joins of a B^2-row literal DataFrame against the B-row
    grouped table — no CartesianProduct / BroadcastNestedLoopJoin node,
    no O(n^2) shuffled rows.
    """
    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("emb")
    ).withColumn(
        "blk", F.pmod(F.xxhash64(F.col("vid").cast("string")), F.lit(n_blocks)).cast("int")
    )
    grouped = v.groupBy("blk").agg(
        F.collect_list(F.struct("vid", "emb")).alias("vecs")
    )
    block_pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    work = (
        block_pairs.join(
            grouped.select(F.col("blk").alias("bi"), F.col("vecs").alias("vecs_a")), "bi"
        )
        .join(
            grouped.select(F.col("blk").alias("bj"), F.col("vecs").alias("vecs_b")), "bj"
        )
        # one GEMM per task: spread the B*(B+1)/2 independent tiles
        .repartition(n_blocks * (n_blocks + 1) // 2, "bi", "bj")
    )

    out_schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )
    thr = float(threshold)

    def gemm(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray([r["vid"] for r in row.vecs_a], dtype=np.int64)
                ids_b = np.asarray([r["vid"] for r in row.vecs_b], dtype=np.int64)
                ma = np.array([r["emb"] for r in row.vecs_a], dtype=np.float64)
                mb = np.array([r["emb"] for r in row.vecs_b], dtype=np.float64)
                ma /= np.linalg.norm(ma, axis=1, keepdims=True)
                mb /= np.linalg.norm(mb, axis=1, keepdims=True)
                sims = ma @ mb.T
                ii, jj = np.nonzero(sims >= thr)
                if row.bi == row.bj:
                    keep = ids_a[ii] < ids_b[jj]  # same block: dedupe + drop self
                else:
                    keep = np.ones(len(ii), dtype=bool)
                ii, jj = ii[keep], jj[keep]
                aa, bb = ids_a[ii], ids_b[jj]
                lo = np.minimum(aa, bb)
                hi = np.maximum(aa, bb)
                yield pd.DataFrame(
                    {"a": lo, "b": hi, "sim": sims[ii, jj]}
                )

    return work.mapInPandas(gemm, schema=out_schema)


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
    multiprobe: int = 0,
) -> DataFrame:
    """LSH-bucketed ANN: probe only same-bucket candidates, exact cosine
    on the candidates, per-query top-k. Recall grows with n_tables /
    shrinks with n_bits (standard SRP tradeoff). ``multiprobe=1`` probes
    every bucket at Hamming distance <= 1 from each query bucket
    (n_bits extra probes/table — the classic multi-probe LSH recall
    boost at a fraction of the cost of more tables). Size n_bits so
    2^n_bits ~ n_vectors / desired_bucket_size."""
    from pyspark.sql import Window as W

    vb = srp_buckets(vectors, "vec_id", dim, n_bits, n_tables)
    qb = srp_buckets(queries, "query_id", dim, n_bits, n_tables)
    if multiprobe >= 1:
        # neighbor buckets (one bit flipped), JVM-side: explode a literal
        # flip-mask array — no UDF, no extra encode pass.
        flips = F.array(*[F.lit(0)] + [F.lit(1 << i) for i in range(n_bits)])
        qb = qb.select(
            "query_id",
            "table_id",
            F.explode(flips).alias("_flip"),
            F.col("bucket"),
        ).select(
            "query_id",
            "table_id",
            F.col("bucket").bitwiseXOR(F.col("_flip")).alias("bucket"),
        )
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
