"""Streaming / incremental ingestion — the reference's serving mode
(EP3: /root/reference/app/simhash-runner.hs:163-177, a periodic job-queue
worker pulling one document at a time) re-expressed two ways:

1. ``IncrementalDedup`` — batch-over-new-snapshots: sign + band + match
   ONLY the clips added since the last committed watermark, joining the
   new bands against the accumulated band index. All state tables are
   APPEND-ONLY (CheckpointStore.append — the Iceberg append-snapshot
   analog): per-batch write IO is O(new rows), never a rewrite of the
   accumulated index, and a deterministic per-batch token makes every
   append idempotent under crash-and-retry (state can never bloat).
   Matches go through the SAME verify tier as the batch pipeline
   (operators/verify.py), so incremental and batch answers have
   identical semantics: VERIFIED duplicates, not raw band collisions.
2. ``streaming_signatures`` — Structured Streaming: readStream over a
   clips directory -> signature UDFs -> sink; used with
   ``trigger(availableNow=True)`` for incremental batch or a continuous
   trigger for serving.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simhash_spark.config import EngineConfig
from simhash_spark.functions.signatures import normalize_udf, simhash64_udf
from simhash_spark.operators.lsh import build_bands
from simhash_spark.operators.verify import verify_pairs
from simhash_spark.sources.tableio import CheckpointStore


class IncrementalDedup:
    """Micro-batch incremental near-dup matcher.

    State tables (in a CheckpointStore, all append-only):
      band_index  (clip_id, det, band_id, band_hash) — all clips seen
      profile     (clip_id, norm_text, simhash)      — verify side table
      matches     (a, b, det, method, hamming, jaccard) — per-batch output
      seen_ids    (clip_id)                          — ingestion watermark

    ``ingest(new_clips)`` returns VERIFIED duplicate pairs
    (a, b, det, method, hamming, jaccard) of new clips against the
    existing index (and among themselves) — the same schema and verify
    rule as the batch pipeline's verified_pairs stage.

    Crash safety: the batch token is deterministic (caller-supplied, or a
    hash of the fresh clip_ids), every state append is idempotent on that
    token, the batch's OUTPUT (matches) is appended durably BEFORE the
    watermark, and the watermark (seen_ids) is appended LAST. A crash
    anywhere leaves a retry that re-appends nothing new; a retry whose
    token is already watermarked re-reads the durably stored matches
    instead of recomputing — recomputing would see an empty fresh set and
    silently replace the batch's real duplicates with an empty result
    (the exactly-once hole ADVICE r2 found in the foreachBatch wiring).
    """

    MATCHES_SCHEMA = (
        "a string, b string, det string, method string, hamming int, jaccard double"
    )

    def __init__(self, spark: SparkSession, state_dir: str, cfg: EngineConfig | None = None):
        self.spark = spark
        self.cfg = cfg or EngineConfig()
        self.store = CheckpointStore(spark, state_dir, run_config=self.cfg.to_dict())

    def _state(self, name: str, schema: str) -> DataFrame:
        if self.store.is_committed(name):
            return self.store.read(name)
        return self.spark.createDataFrame([], schema)

    def ingest(self, clips: DataFrame, batch_id: str | None = None) -> DataFrame:
        if batch_id is not None and self.store.has_batch("seen_ids", batch_id):
            # Fully-committed replay (e.g. the stream's output write failed
            # AFTER ingest returned): every clip is already watermarked, so
            # a recompute would produce an empty fresh set — return the
            # batch's durably stored matches instead.
            return self.store.read_batch("matches", batch_id, self.MATCHES_SCHEMA)
        seen = self._state("seen_ids", "clip_id string")
        index = self._state(
            "band_index", "clip_id string, det string, band_id int, band_hash long"
        )
        prof_old = self._state(
            "profile", "clip_id string, norm_text string, simhash long"
        )

        fresh = clips.join(seen, "clip_id", "left_anti")
        prof_new = (
            fresh.select("clip_id", normalize_udf("transcript").alias("norm_text"))
            .withColumn("simhash", simhash64_udf("norm_text"))
            .persist()
        )
        new_bands = build_bands(prof_new, prof_new, detectors=self.cfg.detectors).persist()

        if batch_id is None:
            # deterministic token over the batch's id set -> idempotent
            # retries (micro-batches are small; one driver-side row).
            row = prof_new.agg(
                F.md5(F.concat_ws("\x00", F.sort_array(F.collect_list("clip_id")))).alias("h")
            ).first()
            batch_id = row["h"] or hashlib.md5(b"empty").hexdigest()

        # --- candidate collisions (band hits, counted per detector) -----
        keys = ["det", "band_id", "band_hash"]
        vs_old = new_bands.join(
            index.select(*keys, F.col("clip_id").alias("other_id")), keys, "inner"
        ).filter(F.col("clip_id") != F.col("other_id"))
        nb = new_bands.select(*keys, F.col("clip_id").alias("other_id"))
        vs_new = new_bands.join(nb, keys, "inner").filter(
            F.col("clip_id") < F.col("other_id")
        )
        coll = vs_old.unionByName(vs_new).select(
            F.least("clip_id", "other_id").alias("a"),
            F.greatest("clip_id", "other_id").alias("b"),
            "det",
        )
        # same dedupe + evidence-count shape as operators/lsh.candidate_pairs
        pr = (
            F.when(F.col("det") == "exact", 0)
            .when(F.col("det") == "sim", 1)
            .when(F.col("det") == "mh", 2)
            .otherwise(3)
        )
        pairs = (
            coll.withColumn("det_pr", pr)
            .groupBy("a", "b")
            .agg(
                F.min("det_pr").alias("det_pr"),
                F.sum(F.when(F.col("det") == "mh", 1).otherwise(0)).alias("mh_hits"),
                F.sum(F.when(F.col("det") == "gram", 1).otherwise(0)).alias("gram_hits"),
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
                F.lit(0).alias("starred"),
            )
        )

        # --- VERIFY: identical rule/tiers as the batch pipeline ---------
        profile_all = prof_old.unionByName(prof_new)
        verified = verify_pairs(pairs, profile_all)

        # --- commit state: idempotent appends, output BEFORE watermark,
        # watermark LAST. Ordering invariant: once seen_ids holds this
        # token, `matches` provably holds the batch's output, so the
        # replay fast-path above can always serve it back. The append
        # itself materializes `verified` (one pass) and releases the
        # verify tier's internal persists.
        self.store.append("matches", verified, batch_id=batch_id)
        self.store.append("band_index", new_bands, batch_id=batch_id)
        self.store.append("profile", prof_new, batch_id=batch_id)
        self.store.append("seen_ids", fresh.select("clip_id"), batch_id=batch_id)
        new_bands.unpersist()
        prof_new.unpersist()
        # Serve the durable copy: parquet-backed, fault-tolerant, replayable.
        matches = self.store.read_batch("matches", batch_id, self.MATCHES_SCHEMA)
        self.store.append_metric(
            "incremental_ingest_matches", matches.count(), batch_id=batch_id
        )
        return matches


def streaming_signatures(
    spark: SparkSession,
    input_dir: str,
    schema: str = "clip_id string, transcript string",
) -> DataFrame:
    """Structured Streaming source -> per-clip signatures (unbounded).
    Start with e.g.::

        q = (streaming_signatures(spark, dir)
             .writeStream.format("memory").queryName("sigs")
             .trigger(availableNow=True).start())
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)
    norm = stream.select("clip_id", normalize_udf("transcript").alias("norm_text"))
    return norm.select(
        "clip_id",
        simhash64_udf("norm_text").alias("simhash"),
    )
