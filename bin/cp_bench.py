#!/usr/bin/env python
"""candidate_pairs-stage A-B microbench (pair_gen='join' vs 'agg').

Same pattern as verify_bench.py: whole-pipeline runs cost ~10-20 min, so
this harness isolates the one stage under test.

  1. --prep: commit profile + bands ONCE at 32 cores on a tmpfs
     checkpoint (identical stage input for every measurement).
  2. --cores A B ... --modes join agg: for each (cores, mode), copy the
     prepared checkpoint, spawn a fresh JVM, run ONLY the
     candidate_pairs stage with that pair_gen and report its commit wall
     and row count (counts must be identical across modes — asserted).

Back-to-back same-session runs only (this box drifts 20-30% across
hours); results go to BENCH/cp-stage-n{rows}.json.

Usage:
  python bin/cp_bench.py --rows 2000000 --prep
  python bin/cp_bench.py --rows 2000000 --cores 8 32 --modes join agg
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHM = "/dev/shm/simhash-bench-clips"
CKPT_BASE = "/dev/shm/simhash-cp-bench"

PREP = r"""
import sys, time
sys.path.insert(0, {repo!r})
from simhash_spark.session import get_spark
from simhash_spark.config import EngineConfig
from simhash_spark.plans.pipeline import DedupPipeline
from simhash_spark.operators.lsh import build_bands
from simhash_spark.functions.signatures import profile_udf

cores = 32
spark = get_spark(app="cp-prep", master=f"local[{{cores}}]",
                  shuffle_partitions=cores * 2,
                  extra={{"spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
                          "spark.driver.memory": "24g"}})
clips = spark.read.parquet({clips_path!r})
pipe = DedupPipeline(spark, {ckpt!r}, EngineConfig(partitions=cores * 2))
store, cfg = pipe.store, pipe.cfg
spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(cfg.arrow_batch))
t0 = time.time()
if not store.is_committed("profile"):
    profile = clips.select("clip_id", profile_udf("transcript").alias("p")) \
        .select("clip_id", "p.norm_text", "p.simhash")
    store.write("profile", profile)
profile = store.read("profile")
if not store.is_committed("bands"):
    store.write("bands", build_bands(profile.repartition(cores * 2), profile,
                                     detectors=cfg.detectors))
print("PREP_DONE", round(time.time() - t0, 1))
"""

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from simhash_spark.session import get_spark
from simhash_spark.config import EngineConfig
from simhash_spark.plans.pipeline import DedupPipeline
from simhash_spark.operators.lsh import candidate_pairs

cores = {cores}
sp = {sp} or cores * 2
extra = {{"spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
         "spark.driver.memory": "24g"}}
if {oha}:
    # A-B knob: ObjectHashAggregate (collect_set) falls back to slower
    # sort-based aggregation past this many keys per partition
    # (default 128); the 'agg' pair_gen produces millions of small
    # groups per partition.
    extra["spark.sql.objectHashAggregate.sortBased.fallbackThreshold"] = str({oha})
spark = get_spark(app=f"cp-bench-{{cores}}-{mode!r}", master=f"local[{{cores}}]",
                  shuffle_partitions=sp, extra=extra)
pipe = DedupPipeline(spark, {ckpt!r}, EngineConfig(partitions=sp))
store, cfg = pipe.store, pipe.cfg
bands = store.read("bands")
# mode strings compose 'join'/'agg' (pair_gen) with '+win' (window sizing)
pg, _, sz = {mode!r}.partition("+")
t0 = time.time()
pairs = candidate_pairs(bands, band_group_cap=cfg.band_group_cap,
                        partitions=sp,
                        max_pairs_per_group=cfg.max_pairs_per_group,
                        pair_gen=pg,
                        sizing="window" if sz == "win" else "join")
store.write("candidate_pairs", pairs)
wall = time.time() - t0
n = store.read("candidate_pairs").count()
print("RESULT " + json.dumps({{"cores": cores, "mode": {mode!r},
                               "cp_wall": round(wall, 1), "pairs": n}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--prep", action="store_true")
    ap.add_argument("--cores", type=int, nargs="*", default=[])
    ap.add_argument("--modes", nargs="*", default=["join", "agg"])
    ap.add_argument("--tag", default="")
    ap.add_argument("--oha", type=int, default=0)
    ap.add_argument("--sp", type=int, default=0,
                    help="explicit shuffle-partition count for the measured "
                         "stage (0 = cores*2, the pre-round-4 sizing)")
    args = ap.parse_args()

    clips_path = os.path.join(SHM, f"scaling-n{args.rows}-seed42", "clips.parquet")
    assert os.path.exists(clips_path), f"missing corpus {clips_path}"
    master = os.path.join(CKPT_BASE, f"master-n{args.rows}")

    if args.prep:
        shutil.rmtree(master, ignore_errors=True)
        os.makedirs(master, exist_ok=True)
        code = PREP.format(repo=REPO, clips_path=clips_path, ckpt=master)
        t0 = time.time()
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=10800, cwd=REPO)
        ok = [ln for ln in out.stdout.splitlines() if ln.startswith("PREP_DONE")]
        if not ok:
            raise RuntimeError(out.stderr[-3000:])
        print(f"prep: {ok[0]} (total {time.time()-t0:.0f}s)")
        return

    results = []
    # interleave modes per core count so box drift hits both arms equally
    for cores, mode in itertools.product(args.cores, args.modes):
        work = os.path.join(CKPT_BASE, f"work-{cores}-{mode}")
        shutil.rmtree(work, ignore_errors=True)
        shutil.copytree(master, work)
        code = CHILD.format(repo=REPO, cores=cores, ckpt=work, mode=mode,
                            oha=args.oha, sp=args.sp)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=10800, cwd=REPO)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            raise RuntimeError(out.stderr[-3000:])
        results.append(json.loads(line[0][len("RESULT "):]))
        print(json.dumps(results[-1]))
        shutil.rmtree(work, ignore_errors=True)

    counts = {r["pairs"] for r in results}
    report = {
        "rows": args.rows,
        "sp": args.sp,
        "results": results,
        "pair_counts_identical": len(counts) == 1,
        "ts": time.time(),
    }
    name = f"cp-stage-n{args.rows}{('-' + args.tag) if args.tag else ''}.json"
    with open(os.path.join(REPO, "BENCH", name), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
