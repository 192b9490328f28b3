#!/usr/bin/env python
"""Overlap-span detector at bench scale (round 5).

The round-5 winnowed-fingerprint index (operators/overlap.py) is exact
for >= 64-char spans by the winnowing guarantee — this drill measures
the operator at corpus scale, where the hot-fingerprint caps and the
rolling-hash screen are active together:

  1. load the standard cached synth corpus (clips + planted truth),
  2. run the FULL operator on the transcripts (fingerprint index ->
     hot caps -> pair dedupe -> screen -> SA confirm), timed,
  3. eligibility: a planted truth pair is ELIGIBLE iff the engine's own
     exact kernel (suffix.lcs_batch via the confirm UDF) finds a
     >= 64-char common run in the pair's normalized transcripts —
     evaluated DIRECTLY on the truth pairs, independent of the index
     (planted edits can legitimately destroy every 64-char run),
  4. recall = |eligible AND emitted| / |eligible|, with per-kind
     attribution; hot-fingerprint drops are collected, never silent.

O(truth) eligibility joins only; the operator itself is the only
corpus-scale work. Results -> BENCH/overlap-n{rows}.json and stdout.

Usage:
  python bin/overlap_bench.py --rows 2000000 --shm
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--shm", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from simhash_spark.config import partitions_for_rows
    from simhash_spark.functions.signatures import normalize_udf
    from simhash_spark.operators.overlap import lcs_span_udf_for, overlap_span_pairs
    from simhash_spark.session import get_spark
    from simhash_spark.util import release_persisted

    cache = "/dev/shm/simhash-bench-clips" if args.shm else "/tmp/simhash-bench-clips"
    corpus = args.corpus or os.path.join(cache, f"scaling-n{args.rows}-seed42")
    for t in ("clips.parquet", "truth_pairs.parquet"):
        if not os.path.exists(os.path.join(corpus, t)):
            raise SystemExit(f"{corpus}/{t} missing — synthesize the corpus first")

    sp = partitions_for_rows(args.rows, floor=8)
    spark = get_spark(
        app=f"overlap-bench-{args.rows}",
        master=f"local[{args.cores}]",
        shuffle_partitions=sp,
        extra={"spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024)},
    )
    clips = spark.read.parquet(os.path.join(corpus, "clips.parquet")).select(
        "clip_id", "transcript"
    )
    truth = spark.read.parquet(os.path.join(corpus, "truth_pairs.parquet"))

    drops: list[dict] = []

    def sink(name, value, **kw):
        drops.append({"metric": name, "value": int(value), **kw})

    t0 = time.time()
    spans = overlap_span_pairs(
        clips,
        id_col="clip_id",
        text_col="transcript",
        partitions=sp,
        metrics_sink=sink,
    )
    # materialize once; keep only the pair identity for the recall join
    found = (
        spans.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_found = found.count()
    from simhash_spark.util import flush_deferred_metrics

    flush_deferred_metrics(spans)  # hot-gram drop accounting (deferred, r6)
    release_persisted(spans)
    wall = time.time() - t0

    # eligibility: exact >= 64 decision straight on the truth pairs
    norm = clips.select(
        "clip_id", normalize_udf("transcript").alias("nt")
    )
    t = (
        truth.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"), "kind"
        )
        .join(norm.select(F.col("clip_id").alias("a"), F.col("nt").alias("na")), "a")
        .join(norm.select(F.col("clip_id").alias("b"), F.col("nt").alias("nb")), "b")
        .withColumn("span", lcs_span_udf_for(64)("na", "nb"))
        .select("a", "b", "kind", (F.col("span.overlap_len") >= 64).alias("eligible"))
    )
    scored = t.join(found.withColumn("hit", F.lit(True)), ["a", "b"], "left").select(
        "kind", "eligible", F.coalesce("hit", F.lit(False)).alias("hit")
    )
    agg = (
        scored.groupBy("kind")
        .agg(
            F.count("*").alias("truth_pairs"),
            F.sum(F.col("eligible").cast("long")).alias("eligible"),
            F.sum((F.col("eligible") & F.col("hit")).cast("long")).alias("found"),
        )
        .collect()
    )
    by_kind = {
        r["kind"]: {
            "truth_pairs": r["truth_pairs"],
            "eligible": int(r["eligible"]),
            "found": int(r["found"]),
            "recall": round(r["found"] / r["eligible"], 6) if r["eligible"] else None,
        }
        for r in agg
    }
    n_elig = sum(v["eligible"] for v in by_kind.values())
    n_hit = sum(v["found"] for v in by_kind.values())
    result = {
        "mode": "overlap-at-scale",
        "rows": args.rows,
        "cores": args.cores,
        "partitions": sp,
        "corpus": corpus,
        "operator_wall_sec": round(wall, 1),
        "rows_per_sec": round(args.rows / wall, 1),
        "span_pairs_emitted": n_found,
        "eligible_truth_pairs": n_elig,
        "eligible_found": n_hit,
        "recall": round(n_hit / n_elig, 6) if n_elig else None,
        "by_kind": by_kind,
        "drops": drops,
    }
    out = args.out or os.path.join(REPO, "BENCH", f"overlap-n{args.rows}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
