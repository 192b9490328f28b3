#!/usr/bin/env python
"""spark-submit entry point for the dedup pipeline.

Cluster:  spark-submit --py-files src.zip bin/run_pipeline.py \
              --clips s3://bucket/clips --checkpoint s3://bucket/ckpt \
              --partitions 4096
Local:    python bin/run_pipeline.py --master local[32] \
              --clips /path/clips.parquet --checkpoint /tmp/ckpt

Build src.zip with:  cd /root/repo && zip -qr src.zip simhash_spark

The job is resumable: re-running with the same --checkpoint skips every
committed stage (and refuses checkpoints written under different
signature semantics).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", required=True, help="parquet path of the clips table")
    ap.add_argument("--checkpoint", required=True, help="checkpoint/lineage dir")
    ap.add_argument("--master", default=None, help="spark master (default: env/local)")
    ap.add_argument("--partitions", type=int, default=None, help="explicit shuffle/band partitions")
    ap.add_argument("--band-cap", type=int, default=2000, help="max rows per LSH band group")
    ap.add_argument(
        "--max-pairs-per-group",
        type=int,
        default=None,
        help="max implied pairs per band group before star-edge diversion",
    )
    ap.add_argument(
        "--cc-checkpoint-every",
        type=int,
        default=5,
        help="durable CC labels commit every k rounds",
    )
    ap.add_argument("--detectors", default="simhash,minhash,substring")
    ap.add_argument("--vacuum", action="store_true", help="expire old stage snapshots at the end")
    args = ap.parse_args()

    from simhash_spark.config import EngineConfig
    from simhash_spark.plans.pipeline import DedupPipeline
    from simhash_spark.session import get_spark

    spark = get_spark(
        app="simhash-pipeline",
        master=args.master,
        shuffle_partitions=args.partitions,
    )
    cfg = EngineConfig(
        partitions=args.partitions,
        band_group_cap=args.band_cap,
        max_pairs_per_group=args.max_pairs_per_group,
        cc_checkpoint_every=args.cc_checkpoint_every,
        detectors=tuple(args.detectors.split(",")),
    )
    # NO repartition of the raw clips table: that would shuffle the audio
    # bytes the pipeline never reads (they're column-pruned by the first
    # projection). Scan parallelism comes from parquet splits; the band
    # table is explicitly repartitioned downstream (candidate_pairs).
    clips = spark.read.parquet(args.clips)

    t0 = time.time()
    pipe = DedupPipeline(spark, args.checkpoint, cfg)
    clusters = pipe.run(clips)
    n_rows = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    wall = time.time() - t0
    if args.vacuum:
        pipe.store.vacuum()
    print(
        json.dumps(
            {
                "rows": n_rows,
                "clusters": n_clusters,
                "dup_rows": n_rows - n_clusters,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n_rows / wall, 1),
                "checkpoint": args.checkpoint,
            }
        )
    )


if __name__ == "__main__":
    main()
