#!/usr/bin/env python
"""Dup-pair recall at BENCH scale vs planted ground truth (VERDICT r4 #1).

The binding north-rule metric is dup-pair recall >= 0.99. It was
evidenced at pytest scale (800-8k rows, vs the O(n^2) brute-force
oracle); at bench scale (2M/8M rows) the engine additionally runs with
hot-band star edges, source-side pair gating, densified-OPH minhash and
stride-8 gram sampling — each argued recall-safe individually, never
jointly MEASURED at scale. This harness closes that gap:

  1. run the full checkpointed pipeline on the cached synth corpus
     (sources/synth.py — the same recipe as every scaling bench),
  2. compute, for every planted truth pair, whether it satisfies the
     REFERENCE verify rule (hamming <= HAM or jaccard >= J or >= 64-char
     containment — reference.brute_force_dup_pairs semantics, evaluated
     with the pipeline's own JVM hamming + Arrow jaccard kernels): the
     ELIGIBLE set is the recall denominator, exactly as at pytest scale
     (planted token-edit pairs can legitimately fall below the rule —
     those are not the engine's to find),
  3. recall = |eligible AND same-cluster| / |eligible| from the
     pipeline's clusters table (found = the CLUSTER joins the pair,
     directly or transitively — the set the north rule names),
  4. per-kind and per-rule miss attribution for anything under 1.0.

O(truth) joins only — no all-pairs anything; the truth table is ~20% of
corpus rows. Results -> BENCH/recall-n{rows}.json and stdout.

Usage:
  python bin/recall_bench.py --rows 2000000 --shm
  python bin/recall_bench.py --rows 8000000 --corpus /tmp/simhash-bench-clips/scaling-n8000000-seed42
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--shm", action="store_true", help="corpus+ckpt on tmpfs")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from simhash_spark import config as C
    from simhash_spark.config import EngineConfig, partitions_for_rows
    from simhash_spark.functions.signatures import jaccard_udf
    from simhash_spark.plans.pipeline import DedupPipeline
    from simhash_spark.session import get_spark

    cache = "/dev/shm/simhash-bench-clips" if args.shm else "/tmp/simhash-bench-clips"
    corpus = args.corpus or os.path.join(cache, f"scaling-n{args.rows}-seed42")
    for t in ("clips.parquet", "truth_pairs.parquet"):
        if not os.path.exists(os.path.join(corpus, t)):
            raise SystemExit(f"{corpus}/{t} missing — synthesize the corpus first")

    ckpt_base = "/dev/shm/simhash-recall-ckpt" if args.shm else None
    if ckpt_base:
        os.makedirs(ckpt_base, exist_ok=True)
    sp = partitions_for_rows(args.rows, floor=8)
    spark = get_spark(
        app=f"recall-bench-{args.rows}",
        master=f"local[{args.cores}]",
        shuffle_partitions=sp,
        extra={"spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024)},
    )
    clips = spark.read.parquet(os.path.join(corpus, "clips.parquet"))
    truth = spark.read.parquet(os.path.join(corpus, "truth_pairs.parquet"))

    ckpt = tempfile.mkdtemp(prefix=f"recall-ckpt-{args.rows}-", dir=ckpt_base)
    t0 = time.time()
    pipe = DedupPipeline(spark, ckpt, EngineConfig(partitions=sp))
    clusters = pipe.run(clips)
    pipeline_wall = time.time() - t0

    try:
        profile = pipe.store.read("profile").select("clip_id", "norm_text", "simhash")
        # truth pair -> both sides' profile + cluster label. truth is
        # O(0.2 n) rows; both joins shuffle on clip_id.
        t = (
            truth.join(
                profile.select(
                    F.col("clip_id").alias("a"),
                    F.col("norm_text").alias("norm_a"),
                    F.col("simhash").alias("sig_a"),
                ),
                "a",
            )
            .join(
                profile.select(
                    F.col("clip_id").alias("b"),
                    F.col("norm_text").alias("norm_b"),
                    F.col("simhash").alias("sig_b"),
                ),
                "b",
            )
            .join(
                clusters.select(
                    F.col("clip_id").alias("a"), F.col("cluster_id").alias("cl_a")
                ),
                "a",
            )
            .join(
                clusters.select(
                    F.col("clip_id").alias("b"), F.col("cluster_id").alias("cl_b")
                ),
                "b",
            )
        )
        # reference verify rule, per truth pair (exactly
        # reference.brute_force_dup_pairs: hamming OR jaccard OR
        # containment, with the two-empty-shingle-sets => jaccard 1.0
        # convention handled inside jaccard_udf). repartition: the truth
        # frame is byte-small; the Arrow jaccard below must not run at
        # coalesced width.
        la, lb = F.length("norm_a"), F.length("norm_b")
        t = (
            t.repartition(sp)
            .withColumn(
                "r_ham",
                F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
                <= C.VERIFY_HAMMING_MAX,
            )
            .withColumn(
                "r_jac", jaccard_udf("norm_a", "norm_b") >= C.VERIFY_JACCARD_MIN
            )
            .withColumn(
                "r_sub",
                F.when(
                    la <= lb,
                    (la >= C.SUBSTR_MIN_LEN) & F.col("norm_b").contains(F.col("norm_a")),
                ).otherwise(
                    (lb >= C.SUBSTR_MIN_LEN) & F.col("norm_a").contains(F.col("norm_b"))
                ),
            )
            .withColumn("eligible", F.col("r_ham") | F.col("r_jac") | F.col("r_sub"))
            .withColumn("found", F.col("cl_a") == F.col("cl_b"))
        )
        agg = (
            t.groupBy("kind")
            .agg(
                F.count("*").alias("truth_pairs"),
                F.sum(F.col("eligible").cast("long")).alias("eligible"),
                F.sum((F.col("eligible") & F.col("found")).cast("long")).alias(
                    "eligible_found"
                ),
                F.sum((F.col("eligible") & ~F.col("found") & F.col("r_ham")).cast("long")).alias("missed_ham"),
                F.sum((F.col("eligible") & ~F.col("found") & F.col("r_jac")).cast("long")).alias("missed_jac"),
                F.sum((F.col("eligible") & ~F.col("found") & F.col("r_sub")).cast("long")).alias("missed_sub"),
                F.sum(F.col("found").cast("long")).alias("found_any"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    kinds = {}
    tot_e = tot_f = tot_t = 0
    for r in agg:
        d = r.asDict()
        k = d.pop("kind")
        d["recall"] = round(d["eligible_found"] / d["eligible"], 6) if d["eligible"] else None
        kinds[k] = d
        tot_e += d["eligible"]
        tot_f += d["eligible_found"]
        tot_t += d["truth_pairs"]
    report = {
        "mode": "recall-at-scale",
        "rows": args.rows,
        "cores": args.cores,
        "partitions": sp,
        "corpus": corpus,
        "pipeline_wall_sec": round(pipeline_wall, 1),
        "truth_pairs": tot_t,
        "eligible_pairs": tot_e,
        "eligible_found": tot_f,
        "recall": round(tot_f / tot_e, 6) if tot_e else None,
        "target": 0.99,
        "by_kind": kinds,
        "config": {
            "hamming_max": C.VERIFY_HAMMING_MAX,
            "jaccard_min": C.VERIFY_JACCARD_MIN,
            "substr_min_len": C.SUBSTR_MIN_LEN,
            "minhash_scheme": C.MINHASH_SCHEME,
        },
        "ts": time.time(),
    }
    out = args.out or os.path.join(REPO, "BENCH", f"recall-n{args.rows}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
