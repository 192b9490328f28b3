#!/usr/bin/env python
"""Audio-payload dedup at bench scale (round 5).

The Haitsma-Kalker perceptual dedup path (functions/audio.py:
sub-fingerprint + duration-bucket LSH -> JVM BER verify) is evidenced by
the 60-clip gate query and pytest; this drill runs it over the standard
2M-clip synth corpus — 11 GB of real WAV bytes — where every planted
text-dup copy reuses its source's AUDIO verbatim, giving byte-identical
ground truth for the audio detector:

  1. run the FULL operator (decode -> HK fingerprints -> composite-key
     candidates with hot-key caps -> BER verify), timed,
  2. eligibility: a truth pair is ELIGIBLE iff both sides' bytes are
     md5-identical AND the engine's own fingerprint kernel yields >= 2
     frames with >= 2 DISTINCT sub-fingerprint keys on them (the
     operator's documented admission gate — 100-200 ms clips at 8 kHz
     legitimately fall below the 1024-sample STFT floor),
  3. recall = |eligible AND emitted| / |eligible|, per planted kind;
     hot-key drops logged, never silent.

``--len-bucket-frames`` defaults to 1 here (the corpus is 2-16 frames
per clip, so the production default of 128 would put every clip in one
duration bucket and the 16-bit key space alone would have to carry 2M
clips — exactly the saturation the composite key exists to prevent).

Usage: python bin/audio_dedup_bench.py --rows 2000000 --shm
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
    ap.add_argument("--len-bucket-frames", type=int, default=1)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from simhash_spark.config import partitions_for_rows
    from simhash_spark.functions.audio import audio_dup_pairs, audio_fingerprints
    from simhash_spark.session import get_spark
    from simhash_spark.util import release_persisted

    cache = "/dev/shm/simhash-bench-clips" if args.shm else "/tmp/simhash-bench-clips"
    corpus = args.corpus or os.path.join(cache, f"scaling-n{args.rows}-seed42")
    for t in ("clips.parquet", "truth_pairs.parquet"):
        if not os.path.exists(os.path.join(corpus, t)):
            raise SystemExit(f"{corpus}/{t} missing — synthesize the corpus first")

    sp = partitions_for_rows(args.rows, floor=8)
    spark = get_spark(
        app=f"audio-dedup-bench-{args.rows}",
        master=f"local[{args.cores}]",
        shuffle_partitions=sp,
        extra={"spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024)},
    )
    clips = spark.read.parquet(os.path.join(corpus, "clips.parquet")).select(
        "clip_id", "bytes"
    )
    truth = spark.read.parquet(os.path.join(corpus, "truth_pairs.parquet"))

    drops: list[dict] = []

    def sink(name, value, **kw):
        drops.append({"metric": name, "value": int(value), **kw})

    t0 = time.time()
    pairs = audio_dup_pairs(
        clips, len_bucket_frames=args.len_bucket_frames, metrics_sink=sink
    )
    found = (
        pairs.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_found = found.count()
    release_persisted(pairs)
    wall = time.time() - t0

    # eligibility: O(truth) — md5-identical bytes + the kernel's own
    # admission gate, applied fresh to exactly the truth clip set
    tnorm = truth.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"), "kind"
    )
    tids = (
        tnorm.select(F.col("a").alias("clip_id"))
        .unionByName(tnorm.select(F.col("b").alias("clip_id")))
        .distinct()
    )
    tclips = clips.join(tids, "clip_id")
    admit = audio_fingerprints(tclips).select(
        "clip_id",
        (
            (F.size("fps") >= 2) & (F.size(F.array_distinct("fps")) >= 2)
        ).alias("ok"),
    )
    sigs = tclips.select("clip_id", F.md5("bytes").alias("b_md5")).join(admit, "clip_id")
    t = (
        tnorm.join(
            sigs.select(
                F.col("clip_id").alias("a"),
                F.col("b_md5").alias("md5_a"),
                F.col("ok").alias("ok_a"),
            ),
            "a",
        )
        .join(
            sigs.select(
                F.col("clip_id").alias("b"),
                F.col("b_md5").alias("md5_b"),
                F.col("ok").alias("ok_b"),
            ),
            "b",
        )
        .withColumn(
            "eligible",
            (F.col("md5_a") == F.col("md5_b")) & F.col("ok_a") & F.col("ok_b"),
        )
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
        "mode": "audio-dedup-at-scale",
        "rows": args.rows,
        "cores": args.cores,
        "partitions": sp,
        "len_bucket_frames": args.len_bucket_frames,
        "corpus": corpus,
        "operator_wall_sec": round(wall, 1),
        "clips_per_sec": round(args.rows / wall, 1),
        "dup_pairs_emitted": n_found,
        "eligible_truth_pairs": n_elig,
        "eligible_found": n_hit,
        "recall": round(n_hit / n_elig, 6) if n_elig else None,
        "by_kind": by_kind,
        "drops": drops,
    }
    out = args.out or os.path.join(REPO, "BENCH", f"audio-dedup-n{args.rows}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
