"""Candidate-pair verification: Hamming / Jaccard / substring.

Tiered so the expensive (Python/Arrow) checks only see pairs the cheap
(JVM) checks couldn't settle — and, crucially, EXPLICIT DataFrame splits:
a pandas UDF inside ``when()`` still evaluates for every row (Spark
computes ArrowEvalPython projections unconditionally), so each UDF gets
its own pre-filtered DataFrame instead.

  tier 0 — det=='exact': identical normalized text, pre-verified.
  tier 1 — Hamming on the 64-bit simhashes: ``bit_count(a ^ b)`` — pure
           whole-stage-codegen JVM; only the 8-byte sigs are joined here.
  tier 2 — texts are joined ONLY for pairs that pass the LSH-evidence
           gates (band-hit counts collected for free during pair dedupe):
             jaccard   : mh_hits >= 2 (true j>=0.8 misses w.p. ~3e-5),
                         or any mh hit on a starred hot-band edge;
             substring : gram_hits >= gram_hits_min (default 2 — a
                         64-char span samples ~6 grams; P(<2) ~ 1.1%),
                         or any gram hit on a starred edge.

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
from simhash_spark.util import track_persisted

_OUT_COLS = ["a", "b", "det", "method", "hamming", "jaccard"]


def verify_pairs(
    pairs: DataFrame,
    profile: DataFrame,
    gram_hits_min: int = 2,
    metrics_sink=None,
) -> DataFrame:
    """pairs(a, b, det, mh_hits, gram_hits, starred) ->
    verified_pairs(a, b, det, method, hamming, jaccard).

    ``profile``: (clip_id, norm_text, simhash)."""
    sigs = profile.select("clip_id", "simhash")
    # PERSIST (VERDICT r3 #1): tier01 AND rest both consume this
    # two-sided sig join; uncached, the pair table crossed the two
    # biggest shuffles TWICE (once per branch of the output union —
    # ReuseExchange only saves the exchange, not the merge-join +
    # filter re-execution). Cached rows are narrow: pair attrs + two
    # 8-byte sigs. Released by whoever materializes the result
    # (track_persisted contract).
    joined = (
        pairs.join(
            sigs.select(F.col("clip_id").alias("a"), F.col("simhash").alias("sig_a")), "a"
        )
        .join(
            sigs.select(F.col("clip_id").alias("b"), F.col("simhash").alias("sig_b")), "b"
        )
        .withColumn("hamming", hamming_col("sig_a", "sig_b"))
        .persist()
    )

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

    needs_jac = (F.col("mh_hits") >= 2) | (
        (F.col("starred") == 1) & (F.col("mh_hits") >= 1)
    )
    needs_sub = (F.col("gram_hits") >= gram_hits_min) | (
        (F.col("starred") == 1) & (F.col("gram_hits") >= 1)
    )
    rest = joined.filter(
        (F.col("det") != "exact") & (F.col("hamming") > C.VERIFY_HAMMING_MAX)
    ).filter(needs_jac | needs_sub)

    # texts joined ONLY for the gated survivors (tiny vs the pair table).
    texts = profile.select("clip_id", "norm_text")
    cand = (
        rest.join(
            texts.select(F.col("clip_id").alias("a"), F.col("norm_text").alias("norm_a")),
            "a",
        )
        .join(
            texts.select(F.col("clip_id").alias("b"), F.col("norm_text").alias("norm_b")),
            "b",
        )
        .persist()
    )

    jac = (
        cand.filter(needs_jac)
        .withColumn("jaccard", jaccard_udf("norm_a", "norm_b"))
        .persist()
    )
    jac_pass = jac.filter(F.col("jaccard") >= C.VERIFY_JACCARD_MIN).select(
        "a", "b", "det", F.lit("jaccard").alias("method"), "hamming", "jaccard"
    )
    sub_in = cand.filter(needs_sub & ~needs_jac).withColumn(
        "jaccard", F.lit(None).cast("double")
    ).unionByName(
        jac.filter((F.col("jaccard") < C.VERIFY_JACCARD_MIN) & needs_sub),
        allowMissingColumns=False,
    )
    sub_pass = sub_in.filter(substring_contained_udf("norm_a", "norm_b")).select(
        "a", "b", "det", F.lit("substring").alias("method"), "hamming", "jaccard"
    )

    out = tier01.unionByName(jac_pass).unionByName(sub_pass)
    # joined/cand/jac stay cached until the caller materializes the
    # result (CheckpointStore.write releases them).
    return track_persisted(out, [joined, cand, jac])