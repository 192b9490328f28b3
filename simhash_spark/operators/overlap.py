"""Overlap-span detector: pairs sharing a verbatim common run >= L chars,
with the span localized (length + offsets on both sides).

This is the suffix-array detector leg of the north rule, generalized past
boolean containment (operators/verify.py's ``substring`` tier): partial
overlaps — a contaminated paragraph inside two otherwise-different
transcripts — are found and LOCALIZED, the shape a training-data
decontamination pass needs.

Spark plan (scales like the substring tier, SURVEY.md §7.2/5):
  1. winnowed FINGERPRINT inverted index
     (``reference.winnowed_fingerprints_batch`` — min span-hash per
     winnow window, content-determined, alignment-free; the winnowing
     guarantee makes candidates EXACT for spans >= min_len) -> explode
     -> self-equi-join on fingerprint. Hot fingerprints over
     ``gram_cap`` docs (boilerplate, all-silence transcripts) are
     DROPPED WITH A METRICS ROW, never silently (lsh.py idiom).
  2. pair dedupe via groupBy(a, b) with a hit count (map-side combinable).
  3. per-pair exact confirm: rolling-hash screen, then suffix-array LCP
     longest-common-substring (simhash_spark/suffix.py) in ONE
     Arrow-batched pandas UDF, run only on deduped candidates — never
     all pairs.

At 10^12 rows every stage is a hash shuffle on gram id / pair key; no
broadcast of anything row-scale, no driver-side loop, no cartesian.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from .. import config as C
from ..functions.signatures import normalize_udf
from ..suffix import lcs_batch
from ..util import track_persisted

_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("overlap_len", T.LongType()),
        T.StructField("off_a", T.LongType()),
        T.StructField("off_b", T.LongType()),
    ]
)


def lcs_span_udf_for(min_len: int | None):
    """Span-confirm pandas UDF with the flat rolling-hash screen pinned
    to ``min_len``: pairs sharing no min_len-gram (provably no
    qualifying span) skip the per-pair suffix array entirely — exact
    for this operator, whose output filter keeps only overlap_len >=
    min_len (suffix.lcs_batch docstring). ~99% of gram-index candidate
    pairs are screened out at sf0.1, which is most of the stage's wall.

    asNondeterministic: the kernel IS deterministic, but without the
    marker Catalyst collapses the span projection into the overlap_len
    filter and runs the suffix-array UDF TWICE per pair (seen in
    .explain: two ArrowEvalPython nodes over the same inputs). The
    marker forces one evaluation; the filter runs on the materialized
    struct."""

    @F.pandas_udf(_SPAN_SCHEMA)
    def _lcs_span(norm_a: pd.Series, norm_b: pd.Series) -> pd.DataFrame:
        spans = lcs_batch(
            norm_a.fillna(""), norm_b.fillna(""), min_len=min_len
        )
        return pd.DataFrame(
            {
                "overlap_len": spans[:, 0],
                "off_a": spans[:, 1],
                "off_b": spans[:, 2],
            }
        )

    return _lcs_span.asNondeterministic()


# unscreened instance (true LCS for every pair) — kept for callers that
# want spans of any length
lcs_span_udf = lcs_span_udf_for(None)


def fingerprints_udf_for(min_len: int):
    """Winnowed-fingerprint candidate index pinned to ``min_len``:
    w_gram = min_len // 2 char grams, winnow window w_win = min_len -
    w_gram + 1, so w_gram + w_win - 1 == min_len and the winnowing
    guarantee makes the index EXACT for spans >= min_len
    (reference.winnowed_fingerprints_batch) — no sampling miss, and
    ~100x fewer coincidence candidates than short sampled grams (a
    32-char verbatim match is evidence; a 16-char one is boilerplate)."""
    w_gram = max(1, min_len // 2)
    w_win = min_len - w_gram + 1

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _fps(norm_text: pd.Series) -> pd.Series:
        from ..reference import winnowed_fingerprints_batch

        fps = winnowed_fingerprints_batch(
            norm_text.fillna("").tolist(), w_gram, w_win
        )
        return pd.Series([f.astype(np.int64) for f in fps])

    return _fps


def overlap_span_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = C.SUBSTR_MIN_LEN,
    gram_cap: int = 2000,
    partitions: int | None = None,
    metrics_sink=None,
    keep_norms: bool = False,
) -> DataFrame:
    """(a, b, overlap_len, off_a, off_b) with a < b and overlap_len >=
    ``min_len``; offsets index the NORMALIZED texts. ``keep_norms=True``
    additionally carries both normalized texts (norm_a, norm_b) in the
    output — they are already joined for the confirm kernel, so callers
    that need them (the span-audit gate queries) avoid re-normalizing
    the corpus and re-joining (r6).

    Recall of the candidate index is EXACT (winnowing guarantee,
    ``fingerprints_udf_for``): every pair sharing a >= ``min_len``-char
    run shares a fingerprint — the only recall caveat left is the
    explicit ``gram_cap`` hot-fingerprint drop below.  The confirm is
    exact too (suffix-array LCS over screened candidates).

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

    # FUSED normalize + winnowed fingerprints: ONE Arrow crossing per
    # document (r6, guide §4.1 — the chained normalize_udf ->
    # fingerprint UDF shipped every text JVM->Py->JVM twice). The
    # profile frame (id, norm_text, fps) is PERSISTED (released via
    # track_persisted by whoever materializes the result): norm_text
    # feeds the confirm re-joins, fps feeds the gram index. Caching
    # BEFORE the length filter keeps Catalyst from pushing the filter
    # under the projection and evaluating the UDF twice. Fingerprints
    # are only computed for eligible (>= min_len) texts inside the
    # kernel; short rows get [] and are filtered before the explode.
    w_gram = max(1, min_len // 2)
    w_win = min_len - w_gram + 1

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("norm_text", T.StringType()),
                T.StructField("fps", T.ArrayType(T.LongType())),
            ]
        )
    )
    def _norm_fps(s: pd.Series) -> pd.DataFrame:
        from ..reference import normalize_batch, winnowed_fingerprints_batch

        vals = [t if isinstance(t, str) else None for t in s.tolist()]
        norm = normalize_batch(vals)
        fps = winnowed_fingerprints_batch(
            [nt if len(nt) >= min_len else "" for nt in norm], w_gram, w_win
        )
        return pd.DataFrame(
            {
                "norm_text": pd.Series(norm, dtype="object"),
                "fps": [f.astype(np.int64) for f in fps],
            }
        )

    prof = (
        docs.select(F.col(id_col).alias("id"), _norm_fps(F.col(text_col)).alias("p"))
        .select("id", "p.norm_text", "p.fps")
        .persist()
    )
    eligible = prof.filter(F.length("norm_text") >= min_len)

    grams = eligible.select("id", F.explode("fps").alias("gram")).repartition(
        n_part, "gram"
    )

    # Size every gram group with count() OVER (PARTITION BY gram) on the
    # just-established gram partitioning — one sorted pass, no separate
    # aggregation + join (r6, the lsh.py 'window' sizing idiom; the old
    # shape was groupBy + equi-join + an eager .first() metrics job).
    # Drop singletons (no pairs) and over-cap hot grams (logged, not
    # silent): the drop accounting rides the same pass via an
    # Observation, flushed by whoever materializes the result
    # (util.flush_deferred_metrics — _overlap_spans and the tests do).
    from pyspark.sql import Observation, Window

    w = Window.partitionBy("gram")
    sized = grams.select(
        "gram", "id", F.count(F.lit(1)).over(w).alias("grp_n")
    )
    hot_obs = None
    if metrics_sink is not None:
        is_hot = F.col("grp_n") > gram_cap
        hot_obs = Observation()
        sized = sized.observe(
            hot_obs,
            # per-ROW observation: each hot group of size g contributes
            # g rows, so #groups = round(sum 1/g) and #rows = row count.
            F.sum(
                F.when(is_hot, F.lit(1.0) / F.col("grp_n")).otherwise(0.0)
            ).alias("groups"),
            F.sum(F.when(is_hot, 1).otherwise(0)).alias("rows"),
        )

    # PERSIST kept: both sides of the self-join scan it — otherwise the
    # fingerprint explode + window would run once per side.
    kept = (
        sized.filter(F.col("grp_n").between(2, gram_cap))
        .select("gram", "id")
        .persist()
    )
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

    span: Column = lcs_span_udf_for(min_len)("norm_a", "norm_b")
    extra = ["norm_a", "norm_b"] if keep_norms else []
    out = (
        with_texts.withColumn("span", span)
        .select(
            "a", "b", "gram_hits",
            "span.overlap_len", "span.off_a", "span.off_b", *extra,
        )
        .filter(F.col("overlap_len") >= min_len)
    )
    if hot_obs is not None:
        from ..util import defer_metric

        def _emit_hot(_v, obs=hot_obs):
            try:
                m = obs.get
                groups, rows = int(round(m["groups"] or 0.0)), int(m["rows"] or 0)
            except Exception:
                # corner case: when the kept side comes up EMPTY (every
                # gram hot), AQE's empty-relation propagation prunes the
                # CollectMetrics node and the observation never fires —
                # fall back to the eager aggregation (rare, and exactly
                # the case where the drop MUST be reported). prof is
                # still persisted at flush time, so this recomputes only
                # the explode + aggregation over the cached profile.
                hot = (
                    grams.groupBy("gram")
                    .agg(F.count("*").alias("grp_n"))
                    .filter(F.col("grp_n") > gram_cap)
                    .agg(
                        F.count("*").alias("groups"),
                        F.coalesce(F.sum("grp_n"), F.lit(0)).alias("rows"),
                    )
                    .first()
                )
                groups, rows = int(hot["groups"]), int(hot["rows"])
            metrics_sink(
                "overlap_hot_grams_dropped", groups, rows=rows, cap=gram_cap
            )

        out = defer_metric(out, hot_obs, "groups", _emit_hot)
    return track_persisted(out, [prof, kept])
