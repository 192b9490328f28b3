"""Streaming / incremental ingestion — the reference's serving mode
(EP3: /root/reference/app/simhash-runner.hs:163-177, a periodic job-queue
worker pulling one document at a time) re-expressed two ways:

1. ``incremental_dedup`` — batch-over-new-snapshots: sign + band + match
   ONLY the clips added since the last committed watermark, joining the
   new bands against the accumulated band index (the Iceberg-snapshot
   pattern: matching cost is linear in the NEW data; the parquet
   fallback rewrites the index on commit, where Iceberg would append a
   snapshot — swap CheckpointStore.write for an append there).
2. ``streaming_signatures`` — Structured Streaming: readStream over a
   clips directory -> signature UDFs -> sink; used with
   ``trigger(availableNow=True)`` for incremental batch or a continuous
   trigger for serving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simhash_spark.config import EngineConfig
from simhash_spark.functions.signatures import normalize_udf, simhash64_udf
from simhash_spark.operators.lsh import build_bands
from simhash_spark.sources.tableio import CheckpointStore


class IncrementalDedup:
    """Micro-batch incremental near-dup matcher.

    State tables (in a CheckpointStore):
      band_index    (clip_id, det, band_id, band_hash) — all clips seen
      seen_ids      (clip_id)                          — ingestion watermark

    ``ingest(new_clips)`` returns matches(new_id, matched_id, det) of new
    clips against the EXISTING index (and among themselves), then commits
    the enlarged index — the at-most-once queue-item semantics of the
    reference's infer-learn loop, at table granularity.
    """

    def __init__(self, spark: SparkSession, state_dir: str, cfg: EngineConfig | None = None):
        self.spark = spark
        self.cfg = cfg or EngineConfig()
        self.store = CheckpointStore(spark, state_dir, run_config=self.cfg.to_dict())

    def _state(self, name: str, schema: str) -> DataFrame:
        if self.store.is_committed(name):
            return self.store.read(name)
        return self.spark.createDataFrame([], schema)

    def ingest(self, clips: DataFrame) -> DataFrame:
        seen = self._state("seen_ids", "clip_id string")
        index = self._state(
            "band_index", "clip_id string, det string, band_id int, band_hash long"
        )

        fresh = clips.join(seen, "clip_id", "left_anti")
        norm = fresh.select("clip_id", normalize_udf("transcript").alias("norm_text"))
        sigs = norm.select("clip_id", simhash64_udf("norm_text").alias("simhash"))
        new_bands = build_bands(norm, sigs, detectors=self.cfg.detectors).persist()

        keys = ["det", "band_id", "band_hash"]
        # new vs existing index
        vs_old = (
            new_bands.join(
                index.select(*keys, F.col("clip_id").alias("matched_id")), keys, "inner"
            )
            .filter(F.col("clip_id") != F.col("matched_id"))
            .select(F.col("clip_id").alias("new_id"), "matched_id", "det")
        )
        # new vs new (same-batch duplicates)
        nb = new_bands.select(*keys, F.col("clip_id").alias("matched_id"))
        vs_new = (
            new_bands.join(nb, keys, "inner")
            .filter(F.col("clip_id") < F.col("matched_id"))
            .select(F.col("clip_id").alias("new_id"), "matched_id", "det")
        )
        matches = vs_old.unionByName(vs_new).dropDuplicates(["new_id", "matched_id"])

        # commit enlarged state (atomic per table; ingest is idempotent for
        # already-seen clip_ids thanks to the anti-join watermark).
        matches = matches.localCheckpoint(eager=True)
        self.store.write("band_index", index.unionByName(new_bands))
        self.store.write(
            "seen_ids", seen.unionByName(fresh.select("clip_id")).distinct()
        )
        new_bands.unpersist()
        self.store.append_metric("incremental_ingest_matches", matches.count())
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
