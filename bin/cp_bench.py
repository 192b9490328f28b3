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
from pyspark.sql import functions as F
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
        .select("clip_id", F.xxhash64("clip_id").alias("cid"),
                "p.norm_text", "p.simhash")
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
         # UI on: the post-run per-stage diagnostics read the REST
         # status API (session default is ui off).
         "spark.ui.enabled": "true",
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
# mode strings compose 'join'/'agg' (pair_gen) with '+win' (window
# sizing) and an optional annotated-persist storage suffix
# ('+memdisk'/'+ser'/'+disk'/'+none' -> SPARK_GRAFT_ANNOT_STORAGE,
# already exported before this child imported simhash_spark.config).
parts = {mode!r}.split("+")
pg, sz = parts[0], (parts[1] if len(parts) > 1 else "")
t0 = time.time()
pairs = candidate_pairs(bands, band_group_cap=cfg.band_group_cap,
                        partitions=sp,
                        max_pairs_per_group=cfg.max_pairs_per_group,
                        pair_gen=pg,
                        sizing="window" if sz == "win" else "join")
store.write("candidate_pairs", pairs)
wall = time.time() - t0
n = store.read("candidate_pairs").count()
# Per-Spark-stage diagnostics (REST status API): the isolated repeats of
# this stage are bimodal (95 vs 148 s at T8/sp=128, identical input and
# pair counts), so each run records where ITS wall went — stage walls,
# run/cpu/gc, spill, and max-vs-median task time (straggler signature).
diag = []
try:
    import urllib.request
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    gc_sec = sum(beans.get(i).getCollectionTime() for i in range(beans.size())) / 1000.0
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(urllib.request.urlopen(
        f"{{ui}}/api/v1/applications/{{app}}/stages?status=complete&withSummaries=true",
        timeout=10))
    for s in stages:
        q = (s.get("taskMetricsDistributions") or {{}}).get("executorRunTime") or []
        diag.append({{
            "stage": s.get("stageId"),
            "name": (s.get("name") or "")[:60],
            "tasks": s.get("numCompleteTasks"),
            "run_s": round(int(s.get("executorRunTime", 0)) / 1e3, 1),
            "cpu_s": round(int(s.get("executorCpuTime", 0)) / 1e9, 1),
            "gc_s": round(int(s.get("jvmGcTime", 0) or 0) / 1e3, 1),
            "spill_disk": int(s.get("diskBytesSpilled", 0) or 0),
            "shuf_w": int(s.get("shuffleWriteBytes", 0) or 0),
            "shuf_r": int(s.get("shuffleReadBytes", 0) or 0),
            "task_run_q": [round(v / 1e3, 1) for v in q],
        }})
except Exception as e:
    diag = [{{"error": str(e)[:200]}}]
print("RESULT " + json.dumps({{"cores": cores, "mode": {mode!r},
                               "cp_wall": round(wall, 1), "pairs": n,
                               "gc_sec": round(gc_sec, 1) if diag and "error" not in diag[0] else None,
                               "stages": diag}}))
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
        env = dict(os.environ)
        storage = [p for p in mode.split("+")[1:] if p in ("memdisk", "ser", "disk", "none")]
        if storage:
            env["SPARK_GRAFT_ANNOT_STORAGE"] = storage[0]
        # '+advN' suffix -> AQE advisory partition size N MB (session knob)
        adv = [p[3:] for p in mode.split("+")[1:] if p.startswith("adv")]
        if adv:
            env["SPARK_GRAFT_ADVISORY_MB"] = adv[0]
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=10800, cwd=REPO, env=env)
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
