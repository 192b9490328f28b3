"""Extra benchmarks (guide §1.4): per-stage pipeline walls, per-query
noop-sink isolation, explain dumps. NOT part of the frozen bench.py
protocol — cite numbers in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py pipeline     # per-stage walls of the dedup pipeline
  python bench_extra.py query NAME   # one query, 2 warmups + 3 timed (count)
  python bench_extra.py explain NAME OUT  # write .explain("formatted")
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


def _spark():
    from simhash_spark.session import get_spark

    return get_spark(
        app="simhash-bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )


def pipeline_stages(repeats: int = 3) -> None:
    """Time each pipeline stage separately (fresh checkpoint each run)."""
    import __spark_entry__ as E
    from simhash_spark.config import EngineConfig
    from simhash_spark.plans.pipeline import DedupPipeline
    from simhash_spark.sources.tableio import CheckpointStore

    spark = _spark()
    clips = E._docs_as_clips(spark, SF_DIR)
    results = []
    for rep in range(repeats + 1):  # first run = warmup
        ckpt = tempfile.mkdtemp(prefix="bench-extra-pipe-")
        pipe = DedupPipeline(spark, ckpt, EngineConfig())
        t0 = time.time()
        pipe.run(clips)
        wall = time.time() - t0
        stages = {}
        for st in ["profile", "bands", "candidate_pairs", "verified_pairs", "cc_labels", "clusters"]:
            m = pipe.store.read_manifest(st)
            if m:
                stages[st] = round(m.get("wall_sec", -1), 3)
        # CC iteration count from metrics
        cc_iters = 0
        mpath = os.path.join(ckpt, "_metrics.jsonl")
        if os.path.exists(mpath):
            for line in open(mpath):
                r = json.loads(line)
                if r.get("name") == "cc_changed":
                    cc_iters += 1
        results.append({"rep": rep, "wall": round(wall, 3), "stages": stages, "cc_iters": cc_iters})
        shutil.rmtree(ckpt, ignore_errors=True)
        print(json.dumps(results[-1]))


def one_query(name: str, warmups: int = 2, repeats: int = 3) -> None:
    import __spark_entry__ as E
    from simhash_spark.util import releasing

    spark = _spark()
    qs = E.queries()

    def run_once() -> float:
        if name == "doc_dup_clusters":
            ckpt = E._PIPE_CKPTS.pop(SF_DIR, None)
            if ckpt:
                shutil.rmtree(ckpt, ignore_errors=True)
        if name == "overlap_span_pairs":
            E._SPAN_CACHE.pop(SF_DIR, None)
        t0 = time.time()
        with releasing(qs[name](spark, SF_DIR)) as df:
            df.count()
        return time.time() - t0

    for i in range(warmups):
        print(f"warmup {i}: {run_once():.3f}")
    times = [run_once() for _ in range(repeats)]
    print(json.dumps({"query": name, "times": [round(t, 3) for t in times],
                      "median": round(sorted(times)[len(times) // 2], 3)}))


def explain(name: str, out_path: str) -> None:
    import __spark_entry__ as E

    spark = _spark()
    qs = E.queries()
    df = qs[name](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(out_path, "w") as f:
        f.write(plan)
    print(f"wrote {out_path} ({len(plan)} bytes)")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "pipeline":
        pipeline_stages()
    elif cmd == "query":
        one_query(sys.argv[2])
    elif cmd == "explain":
        explain(sys.argv[2], sys.argv[3])
