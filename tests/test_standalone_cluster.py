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
