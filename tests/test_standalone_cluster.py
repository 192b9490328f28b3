"""Multi-executor standalone-cluster e2e: the north rule's deployment
clause driven literally at test scale.

Spins a real local standalone cluster (Master + 2 single-executor Worker
JVMs, bin/standalone.py), submits the full checkpointed pipeline via
``spark-submit --py-files src.zip`` (package imported FROM the zip, repo
off every sys.path), and pins:

  - the executor roster really is TWO separate executor JVMs, both of
    which ran tasks and wrote shuffle data (cross-JVM Netty shuffle, not
    local-mode in-process handoff);
  - the cluster run's dedup output (rows, clusters, dup_rows) is
    IDENTICAL to the same corpus run in-process on local[2] — the engine
    is deployment-mode-invariant.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "bin"))

CHILD = r"""
import argparse, json, time, urllib.request
ap = argparse.ArgumentParser()
ap.add_argument("--clips"); ap.add_argument("--checkpoint")
ap.add_argument("--master"); ap.add_argument("--partitions", type=int)
args = ap.parse_args()

from simhash_spark.session import get_spark
from simhash_spark.config import EngineConfig
from simhash_spark.plans.pipeline import DedupPipeline

spark = get_spark(app="cluster-e2e-test", master=args.master,
                  shuffle_partitions=args.partitions,
                  extra={"spark.ui.enabled": "true"})
clips = spark.read.parquet(args.clips)
pipe = DedupPipeline(spark, args.checkpoint, EngineConfig(partitions=args.partitions))
clusters = pipe.run(clips)
n = clusters.count()
k = clusters.select("cluster_id").distinct().count()
ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
execs = json.load(urllib.request.urlopen(
    f"{ui}/api/v1/applications/{app}/executors", timeout=10))
roster = [
    {"id": e["id"], "tasks": e.get("totalTasks", 0),
     "shuffle_write": e.get("totalShuffleWrite", 0)}
    for e in execs if e["id"] != "driver"
]
print("RESULT " + json.dumps({"rows": n, "clusters": k, "roster": roster}))
"""


def test_pipeline_survives_worker_loss(tmp_path):
    """Executor-loss drill: SIGKILL one of two worker JVMs mid-run.

    A 10^12-row job WILL lose executors; Spark's contract is task retry +
    stage recompute (lost shuffle blocks refetched via FetchFailed
    resubmission), and this engine's contract on top is that even a
    killed JOB resumes from the last committed stage (CheckpointStore).
    The drill accepts either outcome — ride-through or fail-then-resume —
    but the final output must be byte-equivalent to an undisturbed run:
    same rows, same cluster count. localCheckpoint blocks (CC loop) are
    the one non-recomputable state; they live late in the job, and the
    kill lands early (first completed stage), so ride-through is the
    common path. A second submit against the surviving worker is the
    REQUIRED path if the first exits nonzero."""
    from standalone import StandaloneCluster, build_src_zip, spark_submit_bin

    sub = spark_submit_bin()
    if not os.path.exists(sub):
        pytest.skip("spark-submit not available")

    import json as _json
    import time
    import urllib.request

    from simhash_spark.config import EngineConfig
    from simhash_spark.plans.pipeline import DedupPipeline
    from simhash_spark.session import get_spark
    from simhash_spark.sources.synth import write_clips_parquet

    corpus = str(tmp_path / "corpus")
    write_clips_parquet(corpus, 20_000, seed=17, dur_ms_range=(100, 200))
    clips_path = os.path.join(corpus, "clips.parquet")
    zpath = str(tmp_path / "src.zip")
    build_src_zip(zpath)
    child = str(tmp_path / "child.py")
    with open(child, "w") as f:
        f.write(CHILD)
    ckpt = str(tmp_path / "ckpt")

    def submit(cl):
        return subprocess.Popen(
            [
                sub,
                "--master", cl.master_url,
                "--driver-memory", "2g",
                "--conf", "spark.executor.cores=1",
                "--conf", "spark.executor.memory=2g",
                "--conf", "spark.cores.max=2",
                "--py-files", zpath,
                child,
                "--clips", clips_path,
                "--checkpoint", ckpt,
                "--master", cl.master_url,
                "--partitions", "8",
            ],
            cwd=str(tmp_path),
            env=cl.submit_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )

    with StandaloneCluster(
        n_workers=2,
        cores_per_worker=1,
        worker_mem="3g",
        base_dir=str(tmp_path / "cluster"),
        master_port=7187,
        webui_port=8201,
    ) as cl:
        p = submit(cl)
        # wait until the app is actually executing, then pull the plug
        deadline = time.time() + 120
        running = False
        while time.time() < deadline and p.poll() is None:
            try:
                st = _json.load(
                    urllib.request.urlopen(
                        f"http://127.0.0.1:8201/json/", timeout=3
                    )
                )
                if any(
                    a.get("state") == "RUNNING" for a in st.get("activeapps", [])
                ):
                    running = True
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert running, "app never reached RUNNING before the drill window"
        time.sleep(5)  # let real tasks (and shuffle writes) land on both
        cl.kill_worker(1)
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            # acceptable only if the committed-stage resume completes
            p2 = submit(cl)
            out, err = p2.communicate(timeout=600)
            assert p2.returncode == 0, (out[-2000:], err[-4000:])
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        res = _json.loads(lines[-1][len("RESULT "):])

    # ground truth: undisturbed in-process run on the same corpus
    spark = get_spark(app="cluster-drill-local", master="local[2]", shuffle_partitions=8)
    pipe = DedupPipeline(
        spark, str(tmp_path / "ckpt-local"), EngineConfig(partitions=8)
    )
    local = pipe.run(spark.read.parquet(clips_path))
    assert (res["rows"], res["clusters"]) == (
        local.count(),
        local.select("cluster_id").distinct().count(),
    )


def test_pipeline_on_two_executor_standalone_cluster(tmp_path):
    from standalone import StandaloneCluster, build_src_zip, spark_submit_bin

    sub = spark_submit_bin()
    if not os.path.exists(sub):
        pytest.skip("spark-submit not available")

    from simhash_spark.config import EngineConfig
    from simhash_spark.plans.pipeline import DedupPipeline
    from simhash_spark.session import get_spark
    from simhash_spark.sources.synth import write_clips_parquet

    corpus = str(tmp_path / "corpus")
    write_clips_parquet(corpus, 2000, seed=13, dur_ms_range=(100, 200))
    clips_path = os.path.join(corpus, "clips.parquet")

    zpath = str(tmp_path / "src.zip")
    build_src_zip(zpath)
    child = str(tmp_path / "child.py")
    with open(child, "w") as f:
        f.write(CHILD)

    with StandaloneCluster(
        n_workers=2,
        cores_per_worker=1,
        worker_mem="3g",
        base_dir=str(tmp_path / "cluster"),
        master_port=7177,  # off the default: never collides with a bench
        webui_port=8191,
    ) as cl:
        out = subprocess.run(
            [
                sub,
                "--master", cl.master_url,
                "--driver-memory", "2g",
                "--conf", "spark.executor.cores=1",
                "--conf", "spark.executor.memory=2g",
                "--conf", "spark.cores.max=2",
                "--py-files", zpath,
                child,
                "--clips", clips_path,
                "--checkpoint", str(tmp_path / "ckpt"),
                "--master", cl.master_url,
                "--partitions", "8",
            ],
            cwd=str(tmp_path),
            env=cl.submit_env(),
            capture_output=True,
            text=True,
            timeout=600,
        )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-4000:])
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert lines, out.stdout[-2000:]
    res = json.loads(lines[-1][len("RESULT "):])

    # two separate executor JVMs, both doing real work incl. shuffle writes
    assert len(res["roster"]) == 2, res["roster"]
    for e in res["roster"]:
        assert e["tasks"] > 0, res["roster"]
        assert e["shuffle_write"] > 0, res["roster"]

    # deployment-mode invariance: identical output on local[2] in-process
    spark = get_spark(app="cluster-e2e-local", master="local[2]", shuffle_partitions=8)
    pipe = DedupPipeline(
        spark, str(tmp_path / "ckpt-local"), EngineConfig(partitions=8)
    )
    local = pipe.run(spark.read.parquet(clips_path))
    n_local = local.count()
    k_local = local.select("cluster_id").distinct().count()
    assert (res["rows"], res["clusters"]) == (n_local, k_local)
    assert res["rows"] == 2000 and res["clusters"] < res["rows"]  # dups found
