"""Candidate-pair verification: Hamming / Jaccard / substring.

Tiered so the expensive (Python/Arrow) checks only see pairs the cheap
(JVM) checks couldn't settle:

  tier 0 — det=='exact' pairs: identical normalized text, pre-verified.
  tier 1 — Hamming on the 64-bit simhashes: ``bit_count(a ^ b)`` — pure
           whole-stage-codegen JVM, zero Python.
  tier 2 — exact char-5-shingle Jaccard + substring containment: Arrow
           pandas UDFs over only the pairs that failed tiers 0-1.

VERIFY rule (config.py, SURVEY.md §2.2): hamming <= 3 OR jaccard >= 0.8
OR verbatim containment of the (>= 64-char) shorter side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_spark import config as C
from simhash_spark.functions.signatures import (
    hamming_col,
    jaccard_udf,
    substring_contained_udf,
)


def verify_pairs(
    pairs: DataFrame,
    normalized: DataFrame,
    signatures: DataFrame,
    metrics_sink=None,
) -> DataFrame:
    """pairs(a, b, det) -> verified_pairs(a, b, det, method, hamming,
    jaccard).

    ``normalized``: (clip_id, norm_text); ``signatures``: (clip_id, simhash).
    Joins are plain sort-merge on clip_id (pairs are a small fraction of
    the corpus; the side tables are pre-bucketable on clip_id in the
    Iceberg layout).
    """
    side = normalized.join(signatures, "clip_id").select(
        "clip_id", "norm_text", "simhash"
    )
    pa = side.select(
        F.col("clip_id").alias("a"),
        F.col("norm_text").alias("norm_a"),
        F.col("simhash").alias("sig_a"),
    )
    pb = side.select(
        F.col("clip_id").alias("b"),
        F.col("norm_text").alias("norm_b"),
        F.col("simhash").alias("sig_b"),
    )
    joined = pairs.join(pa, "a").join(pb, "b")
    joined = joined.withColumn("hamming", hamming_col("sig_a", "sig_b"))

    tier01 = joined.filter(
        (F.col("det") == "exact") | (F.col("hamming") <= C.VERIFY_HAMMING_MAX)
    ).select(
        "a",
        "b",
        "det",
        F.when(F.col("det") == "exact", "exact").otherwise("hamming").alias("method"),
        "hamming",
        F.lit(None).cast("double").alias("jaccard"),
    )

    rest = joined.filter(
        (F.col("det") != "exact") & (F.col("hamming") > C.VERIFY_HAMMING_MAX)
    )
    tier2 = (
        rest.withColumn("jaccard", jaccard_udf("norm_a", "norm_b"))
        .withColumn(
            "contained",
            F.when(
                F.col("jaccard") >= C.VERIFY_JACCARD_MIN, F.lit(False)
            ).otherwise(substring_contained_udf("norm_a", "norm_b")),
        )
        .filter((F.col("jaccard") >= C.VERIFY_JACCARD_MIN) | F.col("contained"))
        .select(
            "a",
            "b",
            "det",
            F.when(F.col("jaccard") >= C.VERIFY_JACCARD_MIN, "jaccard")
            .otherwise("substring")
            .alias("method"),
            "hamming",
            "jaccard",
        )
    )
    return tier01.unionByName(tier2)
