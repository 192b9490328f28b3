"""Overlap-span detector: pairs sharing a verbatim common run >= L chars,
with the span localized (length + offsets on both sides).

This is the suffix-array detector leg of the north rule, generalized past
boolean containment (operators/verify.py's ``substring`` tier): partial
overlaps — a contaminated paragraph inside two otherwise-different
transcripts — are found and LOCALIZED, the shape a training-data
decontamination pass needs.

Spark plan (scales like the substring tier, SURVEY.md §7.2/5):
  1. winnowed gram inverted index (``reference.substring_grams`` — content
     -sampled, alignment-free) -> explode -> self-equi-join on gram id.
     Hot grams over ``gram_cap`` docs (boilerplate, all-silence
     transcripts) are DROPPED WITH A METRICS ROW, never silently
     (lsh.py idiom).
  2. pair dedupe via groupBy(a, b) with a hit count (map-side combinable).
  3. per-pair exact confirm: suffix-array + Kasai LCP longest-common-
     substring (simhash_spark/suffix.py) in ONE Arrow-batched pandas UDF,
     run only on deduped candidates — never all pairs.

At 10^12 rows every stage is a hash shuffle on gram id / pair key; no
broadcast of anything row-scale, no driver-side loop, no cartesian.
"""

from __future__ import annotations

import logging

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from .. import config as C
from ..functions.signatures import normalize_udf, substring_grams_udf
from ..suffix import lcs_batch
from ..util import track_persisted

_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("overlap_len", T.LongType()),
        T.StructField("off_a", T.LongType()),
        T.StructField("off_b", T.LongType()),
    ]
)


@F.pandas_udf(_SPAN_SCHEMA)
def _lcs_span(norm_a: pd.Series, norm_b: pd.Series) -> pd.DataFrame:
    """Longest common substring per pair -> (overlap_len, off_a, off_b)."""
    spans = lcs_batch(norm_a.fillna(""), norm_b.fillna(""))
    return pd.DataFrame(
        {"overlap_len": spans[:, 0], "off_a": spans[:, 1], "off_b": spans[:, 2]}
    )


# asNondeterministic: the kernel IS deterministic, but without the marker
# Catalyst collapses the span projection into the overlap_len filter and
# runs the suffix-array UDF TWICE per pair (seen in .explain: two
# ArrowEvalPython nodes over the same inputs). The marker forces one
# evaluation; the filter runs on the materialized struct.
lcs_span_udf = _lcs_span.asNondeterministic()


def overlap_span_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = C.SUBSTR_MIN_LEN,
    gram_cap: int = 2000,
    partitions: int | None = None,
    metrics_sink=None,
) -> DataFrame:
    """(a, b, overlap_len, off_a, off_b) with a < b and overlap_len >=
    ``min_len``; offsets index the NORMALIZED texts.

    Recall is gram-sampled (deterministic in content): a shared span of
    exactly ``min_len`` chars holds ``min_len - GRAM_K + 1`` gram
    positions of which 1-in-GRAM_STRIDE is emitted — miss probability
    (1 - 1/8)^49 ~ 0.14% at the 64-char default, vanishing for longer
    spans.  The confirm itself is exact (suffix-array LCS).

    BLIND SPOT (by design, logged): a span shared verbatim by MORE THAN
    ``gram_cap`` docs has all of its grams hot, so every pair sharing
    only that span is dropped with the hot grams — widely-replicated
    boilerplate is deliberately not pairwise-enumerated (it would be
    O(multiplicity^2)). Such spans are exactly what the drop metric
    counts; handle them with the exact/star-edge detectors, or raise
    ``gram_cap``. When no ``metrics_sink`` is passed, drops are logged
    via ``logging`` (never silent).
    """
    spark = docs.sparkSession
    n_part = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if metrics_sink is None:
        # visible-by-default drop accounting (module contract: hot grams
        # are dropped WITH a metrics row, never silently).
        log = logging.getLogger(__name__)

        def metrics_sink(name, value, **kw):  # noqa: ANN001
            if value:
                log.warning("overlap %s=%s %s", name, value, kw)

    # PERSIST (released via track_persisted by whoever materializes the
    # result): norm feeds gram generation AND two text re-joins; caching
    # BEFORE the length filter keeps Catalyst from pushing the filter
    # under the projection and evaluating normalize_udf twice (the filter
    # is then a JVM length() over the cached column).
    norm = docs.select(
        F.col(id_col).alias("id"), normalize_udf(F.col(text_col)).alias("norm_text")
    ).persist()
    eligible = norm.filter(F.length("norm_text") >= min_len)

    grams = (
        eligible.select("id", F.explode(substring_grams_udf("norm_text")).alias("gram"))
        .repartition(n_part, "gram")
        .persist()
    )

    # Size every gram group once (map-side combinable); drop singletons
    # (no pairs) and over-cap hot grams (logged, not silent).
    counts = grams.groupBy("gram").agg(F.count("*").alias("grp_n"))
    if metrics_sink is not None:
        hot = counts.filter(F.col("grp_n") > gram_cap).agg(
            F.count("*").alias("groups"), F.coalesce(F.sum("grp_n"), F.lit(0)).alias("rows")
        ).first()
        metrics_sink(
            "overlap_hot_grams_dropped",
            int(hot["groups"]),
            rows=int(hot["rows"]),
            cap=gram_cap,
        )
    keep = counts.filter(F.col("grp_n").between(2, gram_cap)).select("gram")

    # PERSIST kept: both sides of the self-join scan it — otherwise the
    # sizing aggregation + keep join run once per side.
    kept = grams.join(keep, "gram").persist()
    pairs = (
        kept.alias("x")
        .join(kept.alias("y"), "gram")
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("gram_hits"))
        # EXPLICIT round-robin repartition before the Python confirm: the
        # pair frame is tiny in BYTES (~40 B/row), so AQE's byte-based
        # coalescing folds the post-agg exchange down to a handful of
        # partitions — and the suffix-array UDF's cost (invisible to byte
        # sizing) then runs at that parallelism (measured: 5 tasks,
        # ~79 s/task at sf0.1 vs ~20 s total at full width). Must be
        # round-robin, NOT repartition(n, "a", "b"): a hash repartition
        # on the groupBy keys is optimizer-removed as redundant and the
        # coalesce re-appears. A numbered user repartition is exempt from
        # AQE coalescing; the extra shuffle is ~MBs.
        .repartition(n_part)
    )

    texts = eligible.select(F.col("id"), F.col("norm_text"))
    with_texts = pairs.join(
        texts.select(F.col("id").alias("a"), F.col("norm_text").alias("norm_a")), "a"
    ).join(texts.select(F.col("id").alias("b"), F.col("norm_text").alias("norm_b")), "b")

    span: Column = lcs_span_udf("norm_a", "norm_b")
    out = (
        with_texts.withColumn("span", span)
        .select("a", "b", "gram_hits", "span.overlap_len", "span.off_a", "span.off_b")
        .filter(F.col("overlap_len") >= min_len)
    )
    return track_persisted(out, [norm, grams, kept])
