#!/usr/bin/env python
"""N-vs-4N EXECUTOR scaling bench on a real (local) standalone cluster.

The literal north-rule deployment clause: the full checkpointed dedup
pipeline, shipped with ``spark-submit --py-files src.zip`` (package
imported FROM the zip — no repo on any sys.path), run against a Spark
standalone cluster of separate JVM processes (bin/standalone.py):

  leg "1":  1 worker -> 1 executor  x 2 cores / 6g
  leg "4":  4 workers -> 4 executors x 2 cores / 6g each

Per-executor resources are CONSTANT and the executor count scales — the
N -> 4N cluster-size model — and every leg gets a fresh cluster, fresh
driver JVM and fresh checkpoint dir. Legs run order-balanced (4,1,1,4 by
default) so box drift cancels across the two pairs, same protocol as the
local[N] campaigns in BENCH/BASELINE.md.

Evidence captured per leg (driver REST API):
  - the executor roster (proves 1 vs 4 separate executor JVMs, each with
    its own heap + GC),
  - per-executor shuffle read/write bytes (proves the shuffle crossed
    JVM boundaries over Netty, not local-mode in-process handoff),
  - stage-aggregate cpu/run/shuffle totals (the constant-work check),
  - per-stage commit walls from the checkpoint MANIFESTs.

Usage:
  python bin/cluster_bench.py --rows 2000000 --shm           # campaign
  python bin/cluster_bench.py --rows 50000 --legs 2,1 --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from standalone import StandaloneCluster, build_src_zip, spark_submit_bin  # noqa: E402

CHILD = r'''
"""Cluster child: runs the checkpointed pipeline; package comes from the
--py-files zip (this file lives OUTSIDE the repo when submitted)."""
import argparse, glob, json, os, time, urllib.request

ap = argparse.ArgumentParser()
ap.add_argument("--clips", required=True)
ap.add_argument("--checkpoint", required=True)
ap.add_argument("--master", required=True)
ap.add_argument("--partitions", type=int, required=True)
ap.add_argument("--n-executors", type=int, required=True)
args = ap.parse_args()

from simhash_spark.session import get_spark
from simhash_spark.config import EngineConfig
from simhash_spark.plans.pipeline import DedupPipeline

spark = get_spark(
    app=f"cluster-bench-{args.n_executors}x",
    master=args.master,
    shuffle_partitions=args.partitions,
    extra={
        "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        "spark.ui.enabled": "true",  # REST evidence below
        # pin (the default, but load-bearing here): python UDF workers
        # are reused across tasks, so the warm-up below actually leaves
        # warm workers behind for the timed run
        "spark.python.worker.reuse": "true",
    },
)
clips = spark.read.parquet(args.clips)

# Per-executor warm-up BEFORE the timed window (small-corpus cluster
# legs pay per-executor fixed costs — JIT, python-worker spawn, Arrow
# init — that amortize by 4M rows but dominate 2M; a real fleet warms
# once per service start, not once per job). A tiny bootstrap through
# the same pandas-UDF + Arrow + shuffle path, sized to hit every
# executor core several waves.
import time as _t
_w0 = _t.time()
from pyspark.sql import functions as _F
from simhash_spark.functions.signatures import profile_udf, jaccard_udf
_par = spark.sparkContext.defaultParallelism
_warm = (
    spark.range(_par * 2000)
    .withColumn(
        "t",
        _F.concat(_F.lit("warm sample text chunk "), (_F.col("id") % 97).cast("string")),
    )
    .repartition(_par * 4)
)
_wp = _warm.select("id", profile_udf("t").alias("p")).select(
    "id", "p.norm_text", "p.simhash"
)
_wp = _wp.withColumn("j", jaccard_udf("norm_text", "norm_text"))
_wp.groupBy(_F.col("id") % 64).agg(_F.count("*"), _F.sum("j")).count()
warm_sec = round(_t.time() - _w0, 1)

t0 = time.time()
pipe = DedupPipeline(spark, args.checkpoint,
                     EngineConfig(partitions=args.partitions))
clusters = pipe.run(clips)
n = clusters.count()
wall = time.time() - t0

stage_walls = {}
for m in glob.glob(os.path.join(args.checkpoint, "*", "MANIFEST.json")):
    d = json.load(open(m))
    stage_walls[os.path.basename(os.path.dirname(m))] = round(d.get("wall_sec", 0.0), 1)

evidence = {}
try:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    execs = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/executors", timeout=10))
    evidence["executors"] = [
        {"id": e["id"], "host_port": e["hostPort"],
         "shuffle_read": e.get("totalShuffleRead", 0),
         "shuffle_write": e.get("totalShuffleWrite", 0),
         "gc_ms": e.get("totalGCTime", 0),
         "tasks": e.get("totalTasks", 0)}
        for e in execs if e["id"] != "driver"
    ]
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10))
    agg = {}
    keys = {"executorRunTime": "run_ms", "executorCpuTime": "cpu_ns",
            "shuffleWriteBytes": "shuf_w", "shuffleReadBytes": "shuf_r",
            "inputBytes": "input", "memoryBytesSpilled": "spill_mem",
            "diskBytesSpilled": "spill_disk"}
    for s in stages:
        for k, short in keys.items():
            agg[short] = agg.get(short, 0) + int(s.get(k, 0) or 0)
    if "cpu_ns" in agg:
        agg["cpu_sec"] = round(agg.pop("cpu_ns") / 1e9, 1)
    if "run_ms" in agg:
        agg["run_sec"] = round(agg.pop("run_ms") / 1e3, 1)
    evidence["stage_totals"] = agg
    # per-stage decomposition: where does cluster-mode CPU go vs local?
    per = []
    for s in stages:
        g = lambda k: int(s.get(k, 0) or 0)
        per.append({
            "id": s.get("stageId"),
            "name": (s.get("name") or "").split(" at ")[-1][:48],
            "tasks": s.get("numCompleteTasks", 0),
            "run_s": round(g("executorRunTime") / 1e3, 1),
            "cpu_s": round(g("executorCpuTime") / 1e9, 1),
            "gc_s": round(g("jvmGcTime") / 1e3, 1),
            "deser_s": round(g("executorDeserializeTime") / 1e3, 1),
            "fetch_wait_s": round(g("shuffleFetchWaitTime") / 1e3, 1),
            "shuf_write_s": round(g("shuffleWriteTime") / 1e9, 1),
            "shuf_r_mb": g("shuffleReadBytes") // (1 << 20),
            "shuf_w_mb": g("shuffleWriteBytes") // (1 << 20),
            "input_mb": g("inputBytes") // (1 << 20),
        })
    per.sort(key=lambda x: -x["run_s"])
    evidence["stages_top"] = per[:18]
except Exception as e:
    evidence["error"] = str(e)[:200]

print("RESULT " + json.dumps({
    "n_executors": args.n_executors, "rows": n, "wall_sec": round(wall, 1),
    "rows_per_sec": round(n / wall, 1), "warmup_sec": warm_sec,
    "stage_walls": stage_walls,
    "evidence": evidence,
}))
'''


def _cpu_jiffies() -> tuple[int, int]:
    vals = list(map(int, open("/proc/stat").readline().split()[1:]))
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def run_leg(
    leg: str,
    clips_path: str,
    ckpt_base: str | None,
    sp: int,
    zpath: str,
    child_path: str,
    cores_per: int,
    exec_mem: str,
    timeout_s: int,
    control_mem: str = "24g",
) -> dict:
    """Run one leg. ``leg`` is an executor count ("4") or "L<cores>" for a
    local[N] control leg submitted through the SAME spark-submit + child
    code path (only the master differs) — the apples-to-apples local-mode
    comparator for cluster-path overhead."""
    local_cores = int(leg[1:]) if leg.startswith("L") else None
    n_executors = 0 if local_cores is not None else int(leg)
    ckpt = tempfile.mkdtemp(prefix=f"cluster-ckpt-{leg}x-", dir=ckpt_base)
    s0, t0 = _cpu_jiffies()
    try:
        if local_cores is not None:
            master = f"local[{local_cores}]"
            cmd = [
                spark_submit_bin(),
                "--master", master,
                # one JVM hosts driver+executors: give it the cluster
                # legs' AGGREGATE heap (max executors x exec mem, computed
                # in main from the leg list) like the local[N] series
                "--driver-memory", control_mem,
                "--py-files", zpath,
                child_path,
                "--clips", clips_path,
                "--checkpoint", ckpt,
                "--master", master,
                "--partitions", str(sp),
                "--n-executors", "0",
            ]
            env = dict(os.environ)
            env.pop("PYTHONPATH", None)
            env["PYTHONDONTWRITEBYTECODE"] = "1"
            env["PYSPARK_PYTHON"] = sys.executable
            env["PYSPARK_DRIVER_PYTHON"] = sys.executable
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout_s,
                cwd=os.path.dirname(child_path), env=env,
            )
        else:
            with StandaloneCluster(
                n_workers=n_executors, cores_per_worker=cores_per
            ) as cl:
                cmd = [
                    spark_submit_bin(),
                    "--master", cl.master_url,
                    "--driver-memory", "8g",
                    "--conf", f"spark.executor.cores={cores_per}",
                    "--conf", f"spark.executor.memory={exec_mem}",
                    "--conf", f"spark.cores.max={cores_per * n_executors}",
                    "--py-files", zpath,
                    child_path,
                    "--clips", clips_path,
                    "--checkpoint", ckpt,
                    "--master", cl.master_url,
                    "--partitions", str(sp),
                    "--n-executors", str(n_executors),
                ]
                out = subprocess.run(
                    cmd,
                    capture_output=True,
                    text=True,
                    timeout=timeout_s,
                    cwd=os.path.dirname(child_path),  # bare dir: no repo in cwd
                    env=cl.submit_env(),
                )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    s1, t1 = _cpu_jiffies()
    if out.returncode != 0:
        # a RESULT line may have printed before a teardown failure; a
        # nonzero exit is never a valid measurement (ADVICE r4)
        raise RuntimeError(
            f"leg {leg}: spark-submit exited {out.returncode}:\n"
            f"{out.stderr[-3000:]}"
        )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["leg"] = leg
            r["host_steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
            got = len(r.get("evidence", {}).get("executors", []))
            if local_cores is None and got != n_executors:
                raise RuntimeError(
                    f"leg asked for {n_executors} executors but the REST "
                    f"roster shows {got} — not a valid cluster-size leg"
                )
            return r
    raise RuntimeError(
        f"leg {leg} failed:\n{out.stderr[-3000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument(
        "--legs",
        default="4,1,1,4",
        help="executor counts in run order (order-balanced pairs by default)",
    )
    ap.add_argument("--cores-per-executor", type=int, default=2)
    ap.add_argument("--executor-mem", default="6g")
    ap.add_argument("--shm", action="store_true", help="corpus/ckpt/shuffle on tmpfs")
    ap.add_argument("--timeout", type=int, default=7200)
    ap.add_argument("--out", default=None, help="override BENCH output path")
    ap.add_argument(
        "--corpus",
        default=None,
        help="use this corpus dir (containing clips.parquet) as-is, "
        "regardless of --shm. The dedup pipeline column-prunes the audio "
        "bytes (the corpus scan reads only the transcript column — ~80 MB "
        "at 2M rows), so a disk-resident corpus does not gate scaling legs "
        "and frees tmpfs RAM for shuffle + checkpoints at large sizes.",
    )
    args = ap.parse_args()

    from simhash_spark.config import partitions_for_rows
    from simhash_spark.sources.synth import write_clips_parquet

    cache = "/tmp/simhash-bench-clips"
    ckpt_base = None
    if args.shm:
        cache = "/dev/shm/simhash-bench-clips"
        ckpt_base = "/dev/shm/simhash-bench-ckpt"
        os.makedirs(ckpt_base, exist_ok=True)
        local_dir = "/dev/shm/simhash-bench-local"
        os.makedirs(local_dir, exist_ok=True)
        os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", local_dir)
    corpus = args.corpus or os.path.join(cache, f"scaling-n{args.rows}-seed42")
    clips_path = os.path.join(corpus, "clips.parquet")
    if args.corpus is not None:
        if not os.path.exists(clips_path):
            raise SystemExit(f"--corpus {args.corpus}: no clips.parquet inside")
    elif not os.path.exists(os.path.join(corpus, "_DONE")):
        disk = os.path.join("/tmp/simhash-bench-clips", f"scaling-n{args.rows}-seed42")
        if args.shm and os.path.exists(os.path.join(disk, "_DONE")):
            shutil.copytree(disk, corpus, dirs_exist_ok=True)
        else:
            print(f"synthesizing {args.rows} clips ...", file=sys.stderr)
            write_clips_parquet(corpus, args.rows, seed=42, dur_ms_range=(100, 200))
            open(os.path.join(corpus, "_DONE"), "w").close()

    sp = partitions_for_rows(args.rows, floor=8)
    stage_dir = tempfile.mkdtemp(prefix="cluster-submit-")
    zpath = os.path.join(stage_dir, "src.zip")
    build_src_zip(zpath)
    child_path = os.path.join(stage_dir, "cluster_child.py")
    with open(child_path, "w") as f:
        f.write(CHILD)

    legs = [x.strip() for x in args.legs.split(",")]
    # control legs are aggregate-matched to the LARGEST cluster leg in
    # this run (not a hardcoded 4x6g — ADVICE r4)
    import re as _re

    m = _re.fullmatch(r"(\d+)([gm])", args.executor_mem.lower())
    if not m:
        raise SystemExit(f"--executor-mem {args.executor_mem!r}: expected e.g. 6g")
    max_exec = max((int(x) for x in legs if not x.startswith("L")), default=0)
    control_mem = f"{max(1, int(m.group(1)) * max_exec)}{m.group(2)}"
    results: list[dict] = []
    for leg in legs:
        what = (
            f"local[{leg[1:]}] control"
            if leg.startswith("L")
            else f"{leg} executor(s) x {args.cores_per_executor} cores"
        )
        print(f"leg: {what} ...", file=sys.stderr)
        r = run_leg(
            leg, clips_path, ckpt_base, sp, zpath, child_path,
            args.cores_per_executor, args.executor_mem, args.timeout,
            control_mem=control_mem,
        )
        print(f"  {json.dumps(r)[:400]}", file=sys.stderr)
        results.append(r)

    # adjacent-pair efficiencies: (wall_small / wall_big) / (ex_big / ex_small)
    # (cluster-executor legs only; local control legs are diagnostics)
    pairs = []
    cluster_results = [r for r in results if r["n_executors"] > 0]
    if len(cluster_results) % 2:
        # never silently drop a measured leg from the mean (ADVICE r4)
        print(
            f"WARNING: odd number of cluster legs ({len(cluster_results)}) — "
            f"trailing leg {cluster_results[-1]['leg']!r} is excluded from "
            "pairwise efficiencies",
            file=sys.stderr,
        )
    for i in range(0, len(cluster_results) - 1, 2):
        a, b = cluster_results[i], cluster_results[i + 1]
        small, big = (a, b) if a["n_executors"] < b["n_executors"] else (b, a)
        ratio = big["n_executors"] / small["n_executors"]
        eff = (small["wall_sec"] / big["wall_sec"]) / ratio
        pairs.append(
            {
                "order": f"{a['n_executors']}-first",
                "t_small": small["wall_sec"],
                "t_big": big["wall_sec"],
                "executor_ratio": ratio,
                "efficiency": round(eff, 3),
            }
        )
    report = {
        "mode": "standalone-cluster",
        "rows": args.rows,
        "cores_per_executor": args.cores_per_executor,
        "executor_mem": args.executor_mem,
        "partitions": sp,
        "storage": "tmpfs" if args.shm else "single-disk",
        "legs": results,
        "pairs": pairs,
        "mean_efficiency": round(
            sum(p["efficiency"] for p in pairs) / max(len(pairs), 1), 3
        ),
        "target": 0.8,
        "ts": time.time(),
    }
    suffix = "-shm" if args.shm else ""
    out = args.out or os.path.join(
        REPO, "BENCH", f"cluster-scaling-n{args.rows}{suffix}.json"
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    shutil.rmtree(stage_dir, ignore_errors=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
