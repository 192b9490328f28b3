"""Local Spark STANDALONE cluster harness — real multi-executor runs.

The north rule's deployment clause is "run via spark-submit --py-files on
a multi-executor cluster at two cluster sizes (N and 4N executors)". The
local[N] scaling bench varies thread counts inside ONE JVM; this harness
gets as close to the literal clause as one box allows:

  - a Master JVM and K Worker JVMs (separate processes, launched from the
    pyspark distribution's own jars),
  - each worker sized to host exactly ONE executor (worker cores ==
    spark.executor.cores), so "N workers" == "N executors",
  - the app submitted with spark-submit --py-files src.zip, the package
    imported FROM THE ZIP (no repo on any executor's sys.path),
  - shuffle between executors crossing real JVM boundaries over Netty
    (serialized + compressed), not local-mode in-process handoff.

Still one box underneath: all executors share its memory bandwidth and
page cache, so cross-size efficiency carries the same host caveats as
the local[N] series (BENCH/BASELINE.md quantifies them). What this adds
over local[N] is the real cluster CODE PATH: cluster scheduling,
per-executor heaps + GC, TCP shuffle, and the shipping story.

pip-installed pyspark lacks sbin/start-{master,worker}.sh; the daemon
classes ship in the jars, so we exec them directly. SPARK_SCALA_VERSION
must be set for the worker's ExecutorRunner (no launcher/target build
dirs in a pip install to sniff the Scala version from).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import urllib.request
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    """OS-assigned free TCP port (closed immediately; tiny race window is
    acceptable for a single-box bench harness)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def spark_dist() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def spark_submit_bin() -> str:
    p = os.path.join(spark_dist(), "bin", "spark-submit")
    return p if os.path.exists(p) else (shutil.which("spark-submit") or p)


def build_src_zip(zpath: str) -> None:
    """cd repo && zip -qr src.zip simhash_spark (README's shipping step)."""
    pkg = os.path.join(REPO, "simhash_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


class StandaloneCluster:
    """Master + K single-executor workers on localhost; context manager."""

    def __init__(
        self,
        n_workers: int,
        cores_per_worker: int = 2,
        worker_mem: str = "7g",
        base_dir: str | None = None,
        master_port: int | None = None,
        webui_port: int | None = None,
    ) -> None:
        self.n_workers = n_workers
        self.cores_per_worker = cores_per_worker
        self.worker_mem = worker_mem
        # default to OS-assigned free ports so a concurrent bench or a
        # pre-existing Spark master on 7077 can't collide with (or be
        # mistaken for) this cluster's REST endpoint (ADVICE r4).
        self.master_port = master_port or _free_port()
        self.webui_port = webui_port or _free_port()
        self.base_dir = base_dir or f"/tmp/simhash-standalone-{os.getpid()}"
        self.procs: list[subprocess.Popen] = []
        self._logs: list = []

    @property
    def master_url(self) -> str:
        return f"spark://127.0.0.1:{self.master_port}"

    def _daemon_env(self) -> dict:
        env = dict(os.environ)
        env["SPARK_HOME"] = spark_dist()
        env["SPARK_SCALA_VERSION"] = "2.13"  # pip dist: no build dirs to sniff
        env["PYSPARK_PYTHON"] = sys.executable
        env.pop("PYTHONPATH", None)  # executors see only the shipped zip
        return env

    def _launch(self, name: str, cls: str, args: list[str]) -> subprocess.Popen:
        jars = os.path.join(spark_dist(), "jars", "*")
        log = open(os.path.join(self.base_dir, f"{name}.log"), "w")
        self._logs.append(log)
        java = os.path.join(os.environ.get("JAVA_HOME", "/usr"), "bin", "java")
        p = subprocess.Popen(
            [java, "-Xmx1g", "-cp", jars, cls, *args],
            stdout=log,
            stderr=subprocess.STDOUT,
            env=self._daemon_env(),
            cwd=self.base_dir,
        )
        self.procs.append(p)
        return p

    def _master_state(self) -> dict:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{self.webui_port}/json/", timeout=5
        ) as r:
            return json.load(r)

    def __enter__(self) -> "StandaloneCluster":
        os.makedirs(self.base_dir, exist_ok=True)
        self._launch(
            "master",
            "org.apache.spark.deploy.master.Master",
            [
                "--host", "127.0.0.1",
                "--port", str(self.master_port),
                "--webui-port", str(self.webui_port),
            ],
        )
        self._wait(lambda: self._master_state(), "master REST", 60)
        for i in range(self.n_workers):
            wd = os.path.join(self.base_dir, f"worker{i}")
            os.makedirs(wd, exist_ok=True)
            self._launch(
                f"worker{i}",
                "org.apache.spark.deploy.worker.Worker",
                [
                    "--host", "127.0.0.1",
                    "--port", str(_free_port()),
                    "--webui-port", str(_free_port()),
                    "--cores", str(self.cores_per_worker),
                    "--memory", self.worker_mem,
                    "--work-dir", wd,
                    self.master_url,
                ],
            )
        self._wait(
            lambda: self._alive_workers() == self.n_workers,
            f"{self.n_workers} workers ALIVE",
            120,
        )
        return self

    def _alive_workers(self) -> int:
        st = self._master_state()
        return sum(1 for w in st.get("workers", []) if w.get("state") == "ALIVE")

    @staticmethod
    def _wait(cond, what: str, timeout_s: float) -> None:
        t0 = time.time()
        last: Exception | None = None
        while time.time() - t0 < timeout_s:
            try:
                if cond():
                    return
            except Exception as e:  # REST not up yet
                last = e
            time.sleep(1.0)
        raise TimeoutError(f"standalone cluster: timed out waiting for {what}: {last}")

    def kill_worker(self, i: int = 0) -> None:
        """SIGKILL worker i (procs[0] is the master) — executor-loss drills."""
        self.procs[1 + i].kill()

    def __exit__(self, *exc) -> None:
        for p in reversed(self.procs):  # workers first, master last
            p.terminate()
        deadline = time.time() + 15
        for p in self.procs:
            try:
                p.wait(timeout=max(0.1, deadline - time.time()))
            except subprocess.TimeoutExpired:
                p.kill()
        self.procs.clear()
        for log in self._logs:  # flush + release after the procs are reaped
            try:
                log.close()
            except Exception:
                pass
        self._logs.clear()

    def submit_env(self) -> dict:
        """Env for spark-submit: cluster-node view (no repo on sys.path)."""
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env["PYTHONDONTWRITEBYTECODE"] = "1"
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        env["SPARK_SCALA_VERSION"] = "2.13"
        return env
