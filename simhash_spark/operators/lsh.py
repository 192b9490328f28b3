"""LSH banding + hot-band handling + candidate pair generation.

Three detectors share one band-table shape
``(clip_id, det, band_id, band_hash)``:

- ``exact``  — xxhash64 of the normalized text (JVM-side, zero UDF);
- ``sim``    — Manku-style SimHash tables: C(6,3)=20 keys, each packing
               3 of 6 blocks (~33 bits; JVM shifts; pigeonhole covers
               hamming <= 3 with ~2^17x fewer accidental collisions than
               naive 16-bit quarter blocks);
- ``mh``     — 32 MinHash band hashes (fused minhash+banding pandas UDF);
- ``gram``   — content-sampled 16-char gram ids (substring detector).

Scale design (the part that must survive 10^12 rows):

- Pair generation is an equi self-join on (det, band_id, band_hash) —
  sort-merge under AQE with skew-join splitting enabled.
- A single pathological band key still yields O(n^2) pairs no matter how
  AQE splits partitions, so band GROUPS are sized first with a cheap
  map-side-combinable groupBy().count(); groups over ``band_group_cap``
  are diverted: the ``exact`` detector always emits linear STAR edges
  (hub = min clip_id — identical text is transitively duplicate, so no
  pairwise loss), and hot sim/mh/gram groups emit star edges too
  (approximation, counts logged to _metrics — no silent truncation).
- Pair dedupe also counts per-detector band hits (mh_hits/gram_hits) and
  flags star edges — verify uses these as free LSH-evidence gates so the
  Python tier only sees pairs that can plausibly pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_spark import config as C
from simhash_spark.functions.signatures import (
    minhash_bands_udf,
    simhash_table_key_cols,
    substring_grams_udf,
)
from simhash_spark.util import track_persisted


def build_bands(
    normalized: DataFrame,
    signatures: DataFrame,
    detectors: tuple = ("simhash", "minhash", "substring"),
) -> DataFrame:
    """normalized(clip_id, norm_text) + signatures(clip_id, simhash)
    -> bands(clip_id, det, band_id, band_hash)."""
    parts: list[DataFrame] = []

    # exact detector — always on; pure JVM hash of the normalized text.
    parts.append(
        normalized.select(
            "clip_id",
            F.lit("exact").alias("det"),
            F.lit(0).alias("band_id"),
            F.xxhash64("norm_text").alias("band_hash"),
        )
    )

    if "simhash" in detectors:
        keys = simhash_table_key_cols("simhash")
        # table index is packed INSIDE each key -> band_id stays 0 and one
        # flat band_hash column carries all SIM_TABLES tables.
        sim = signatures.select(
            "clip_id",
            F.explode(F.array(*keys)).alias("band_hash"),
        ).select(
            "clip_id", F.lit("sim").alias("det"), F.lit(0).alias("band_id"), "band_hash"
        )
        parts.append(sim)

    if "minhash" in detectors:
        mh = normalized.select(
            "clip_id", F.posexplode(minhash_bands_udf("norm_text")).alias("band_id", "band_hash")
        ).select("clip_id", F.lit("mh").alias("det"), "band_id", "band_hash")
        parts.append(mh)

    if "substring" in detectors:
        gr = normalized.select(
            "clip_id", F.explode(substring_grams_udf("norm_text")).alias("band_hash")
        ).select("clip_id", F.lit("gram").alias("det"), F.lit(0).alias("band_id"), "band_hash")
        parts.append(gr)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_KEYS = ["det", "band_id", "band_hash"]


def candidate_pairs(
    bands: DataFrame,
    band_group_cap: int = 2000,
    partitions: int | None = None,
    max_pairs_per_group: int | None = None,
    metrics_sink=None,
) -> DataFrame:
    """bands -> candidate_pairs(a, b, det) with a < b, deduplicated.

    ``partitions`` sets the EXPLICIT hash-partitioning on the band keys
    (north_rule: explicit partition counts): the sizing aggregation, the
    annotate join and the self-join all reuse the one Exchange.
    ``max_pairs_per_group`` caps the pairs a single band group may emit:
    groups whose n*(n-1)/2 exceeds it are diverted to linear star edges
    (same mechanism as ``band_group_cap``, expressed in pairs instead of
    rows); diverted groups/pairs are logged to ``metrics_sink`` — no
    silent truncation.
    """
    spark = bands.sparkSession
    n_part = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # EXPLICIT co-partitioning on the band keys: every downstream keyed op
    # (sizing groupBy, annotate join, pairwise self-join) sees
    # HashPartitioning(_KEYS, n_part) and reuses this single shuffle.
    bands = bands.repartition(n_part, *_KEYS)

    # One partial-aggregable pass sizes every band group and picks its hub
    # (map-side combine keeps hot keys linear — one row per key per mapper).
    counts = bands.groupBy(*_KEYS).agg(
        F.count("*").alias("grp_n"), F.min("clip_id").alias("hub")
    )
    # Groups of size 1 produce no pairs — drop their rows before any join
    # (the vast majority of band rows at realistic dup rates).
    multi = counts.filter(F.col("grp_n") >= 2)

    # Attach grp_n/hub: plain shuffle equi-join (NOT broadcast — `multi`
    # can be billions of keys at 10^12 rows); AQE handles skew. PERSIST:
    # three consumers (metrics agg, cold self-join x2 branches, star
    # filter) would otherwise re-run the join per branch.
    annotated = bands.join(multi, _KEYS, "inner").persist()

    # a group is diverted to star edges if its ROW count exceeds
    # band_group_cap or its implied PAIR count n*(n-1)/2 exceeds
    # max_pairs_per_group (both knobs guard the same O(n^2) blow-up at
    # different granularity).
    over_cap = F.col("grp_n") > band_group_cap
    if max_pairs_per_group is not None:
        over_cap = over_cap | (
            F.col("grp_n") * (F.col("grp_n") - 1) / 2 > max_pairs_per_group
        )

    if metrics_sink is not None:
        # one pass over the per-key sizes yields band stats AND hot-band
        # diagnostics (exact distinct-hash counts — no extra bands scan).
        is_hot = over_cap & (F.col("det") != "exact")
        stat_rows = counts.groupBy("det").agg(
            F.sum("grp_n").alias("rows"),
            F.count("*").alias("distinct_hashes"),
            F.sum(F.when(is_hot, 1).otherwise(0)).alias("hot_groups"),
            F.sum(F.when(is_hot, F.col("grp_n")).otherwise(0)).alias("hot_rows"),
        ).collect()
        for r in stat_rows:
            metrics_sink(
                "band_stats",
                int(r["rows"]),
                det=r["det"],
                distinct_hashes=int(r["distinct_hashes"]),
                hot_groups=int(r["hot_groups"]),
                hot_rows_starred=int(r["hot_rows"]),
                cap=band_group_cap,
            )
        metrics_sink(
            "lsh_hot_band_groups",
            sum(int(r["hot_groups"]) for r in stat_rows),
            cap=band_group_cap,
        )
        metrics_sink(
            "lsh_hot_band_rows_starred",
            sum(int(r["hot_rows"]) for r in stat_rows),
            band_group_cap=band_group_cap,
            max_pairs_per_group=max_pairs_per_group,
        )

    is_star = over_cap | (F.col("det") == "exact")

    # cold path: full pairwise within group via co-partitioned self-join
    # (group size <= cap bounds the worst group at cap^2/2 pairs).
    cold_bands = annotated.filter(~is_star).select(*_KEYS, "clip_id")
    a = cold_bands.alias("a")
    b = cold_bands.alias("b")
    pairs_cold = (
        a.join(b, _KEYS, "inner")
        .where(F.col("a.clip_id") < F.col("b.clip_id"))
        .select(
            F.col("a.clip_id").alias("a"),
            F.col("b.clip_id").alias("b"),
            F.col("det"),
            F.lit(0).alias("starred"),
        )
    )

    # star path (exact groups of any size + over-cap sim/mh/gram groups):
    # linear edges to the group's min clip_id. For 'exact' this is lossless
    # (identical text is transitively dup); for over-cap groups it is the
    # logged approximation that avoids O(n^2).
    pairs_hot = (
        annotated.filter(is_star)
        .where(F.col("clip_id") != F.col("hub"))
        .select(
            F.col("hub").alias("a"),
            F.col("clip_id").alias("b"),
            F.col("det"),
            F.lit(1).alias("starred"),
        )
    )

    pairs = pairs_cold.unionByName(pairs_hot)
    # one pair may surface from many bands/detectors — dedupe keeping
    # exact > sim > mh > gram priority, and COUNT per-detector band hits:
    # verify uses mh_hits as a free jaccard pre-filter (a true j>=0.8
    # pair hits >=2 of the 32 minhash bands w.p. 1-3e-5) and gram_hits to
    # route substring checks.
    pr = F.when(F.col("det") == "exact", 0).when(F.col("det") == "sim", 1).when(
        F.col("det") == "mh", 2
    ).otherwise(3)
    pairs = (
        pairs.withColumn("det_pr", pr)
        .groupBy("a", "b")
        .agg(
            F.min("det_pr").alias("det_pr"),
            F.sum(F.when(F.col("det") == "mh", 1).otherwise(0)).alias("mh_hits"),
            F.sum(F.when(F.col("det") == "gram", 1).otherwise(0)).alias("gram_hits"),
            F.max("starred").alias("starred"),
        )
        .select(
            "a",
            "b",
            F.element_at(
                F.array(F.lit("exact"), F.lit("sim"), F.lit("mh"), F.lit("gram")),
                F.col("det_pr") + 1,
            ).alias("det"),
            "mh_hits",
            "gram_hits",
            "starred",
        )
    )
    # `annotated` stays cached until the caller materializes `pairs`
    # (CheckpointStore.write releases it — no executor-storage leak in a
    # long-lived driver).
    return track_persisted(pairs, [annotated])
