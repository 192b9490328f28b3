"""Benchmark harness — prints ONE JSON line.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the flagship
signature+LSH throughput on a deterministic synthetic clips corpus
(clips/sec — the north-rule throughput metric).

Measurement protocol (VERDICT r3 #5 — the r3 driver reading was a 3.2x
cold/contended artifact): every headline query gets BENCH_WARMUPS
untimed passes (default 2: JIT + Python-worker pool + page cache — one
pass measurably leaves the heavier join/UDF shapes mid-JIT), then the
reported number is the MEDIAN OF 3 timed runs; the clips stage runs
FIRST on a young JVM (heap/GC residue from the suite measurably
depresses it) with its own small-corpus warm-up, and BENCH_CLIPS_N
defaults to 200k so throughput is not startup-dominated.

Extra env knobs:
  SPARK_GRAFT_SF_DIR     testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS       cores for local[] master (default 32)
  BENCH_CLIPS_N          synthetic clips rows (default 200000)
  BENCH_REPEATS          timed repeats per query (default 3, median)
  BENCH_WARMUPS          untimed passes per query (default 2 — one pass
                         leaves the heavier join/UDF shapes mid-JIT:
                         measured jaccard 7.0 s after 1 warm-up vs
                         3.5 s steady-state, same session)
  BENCH_SKIP_CLIPS=1     skip the clips-throughput section
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CLIPS_N = int(os.environ.get("BENCH_CLIPS_N", "200000"))
REPEATS = max(1, int(os.environ.get("BENCH_REPEATS", "3")))
WARMUPS = max(0, int(os.environ.get("BENCH_WARMUPS", "2")))
CLIPS_CACHE = os.environ.get("BENCH_CLIPS_CACHE", "/tmp/simhash-bench-clips")

HEADLINE = [
    "tpch_q1",
    "customer_revenue",
    "top_docs_per_source",
    "events_hourly",
    "user_sessions",
    "jaccard_neardup_pairs",
    "substring_pairs",
    "cosine_topk",
    "cosine_neardup_pairs",
    "srp_ann_topk",
    "ivf_ann_topk",
    "overlap_span_pairs",
    "audio_dup_pairs",
    "audio_spectral_features",
    "decontam_ngram_hits",
    "doc_dup_clusters",
    # runs after doc_dup_clusters on purpose: resumes the shared pipeline
    # checkpoint, so it measures the incremental deliverable cost
    # (cluster read + keep-min join + accounting agg), not a re-run
    "dedup_survivors",
]


def _clips_parquet(n: int) -> str:
    """Synthesize-once cache of the bench clips corpus (seeded)."""
    path = os.path.join(CLIPS_CACHE, f"n{n}-seed42")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        from simhash_spark.sources.synth import write_clips_parquet

        shutil.rmtree(path, ignore_errors=True)
        write_clips_parquet(path, n, seed=42, dur_ms_range=(100, 300))
        open(marker, "w").close()
    return os.path.join(path, "clips.parquet")


def clips_throughput(spark, n: int, warm: bool = False) -> dict:
    """Signature+LSH stage throughput: normalize -> simhash+minhash bands +
    grams -> candidate pairs (materialized via count). ``warm=True`` runs
    the same path as an untimed warm-up (small n)."""
    from pyspark.sql import functions as F

    from simhash_spark.functions.signatures import profile_udf
    from simhash_spark.operators.lsh import build_bands, candidate_pairs

    path = _clips_parquet(n)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # explicit partitioning: the corpus arrives as one parquet file locally;
    # without a repartition the UDF stages would run on <=2 tasks.
    clips = (
        spark.read.parquet(path)
        .select("clip_id", "transcript")
        .repartition(n_part, "clip_id")
    )
    t0 = time.time()
    # materialize each stage once (the checkpointed pipeline does this via
    # stage tables; multiple consumers would otherwise re-run the UDFs).
    # Same stage shapes as the pipeline: fused normalize+simhash profile,
    # sig-carrying bands, hamming-carrying pairs.
    prof = clips.select(
        "clip_id", profile_udf("transcript").alias("p")
    ).select("clip_id", "p.norm_text", "p.simhash").localCheckpoint(eager=True)
    bands = build_bands(prof, prof).localCheckpoint(eager=True)
    pairs = candidate_pairs(bands, band_group_cap=2000)
    n_pairs = pairs.count()
    wall = time.time() - t0
    return {
        "rows": n,
        "candidate_pairs": n_pairs,
        "wall_sec": round(wall, 3),
        "clips_per_sec": round(n / wall, 1),
    }


def main() -> None:
    import __spark_entry__ as E
    from simhash_spark.session import get_spark

    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(
        app="simhash-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    qs = E.queries()
    per_query: dict[str, float] = {}
    total = 0.0
    from simhash_spark.util import releasing

    clips_result = None
    if os.environ.get("BENCH_SKIP_CLIPS") != "1":
        # clips FIRST, on a young JVM: the north-rule throughput number
        # must not depend on heap/GC state left by ~85 preceding query
        # runs (measured 29.4k clips/s early-JVM vs 9.5k on the same
        # code after the full suite — same session class of artifact as
        # the scaling benches' fresh-JVM-per-leg rule). Warm the
        # UDF/worker path on a small corpus, then time full-size.
        clips_throughput(spark, min(20_000, CLIPS_N), warm=True)
        clips_result = clips_throughput(spark, CLIPS_N)

    def run_once(name: str) -> float:
        if name == "doc_dup_clusters":
            # pipeline-backed query resumes from its shared checkpoint —
            # drop it so every run (warm-up and timed) recomputes all
            # stages instead of re-reading committed parquet.
            ckpt = E._PIPE_CKPTS.pop(SF_DIR, None)
            if ckpt:
                shutil.rmtree(ckpt, ignore_errors=True)
        if name == "overlap_span_pairs":
            # same idea for the memoized overlap spans: every timed run
            # measures the full detector, not a parquet re-read.
            E._SPAN_CACHE.pop(SF_DIR, None)
        t0 = time.time()
        with releasing(qs[name](spark, SF_DIR)) as df:
            df.count()  # materialize the full plan
        return time.time() - t0

    for name in HEADLINE:
        for _ in range(WARMUPS):  # untimed (JIT, Py workers, page cache)
            run_once(name)
        times = sorted(run_once(name) for _ in range(REPEATS))
        dt = times[len(times) // 2]  # median
        per_query[name] = round(dt, 3)
        total += dt

    result = {
        "metric": "headline_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "cpus": CPUS,
    }

    if clips_result is not None:
        result["clips_sig_lsh"] = clips_result

    print(json.dumps(result))


if __name__ == "__main__":
    main()
