"""The north rule's shipping clause, driven literally: the job runs via
``spark-submit --py-files src.zip bin/run_pipeline.py`` with the package
imported FROM THE ZIP (the entry script is copied outside the repo, the
subprocess env drops PYTHONPATH, and cwd is a bare temp dir — exactly a
cluster node's view), then resumes idempotently from the same checkpoint
on a second submit."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    import pyspark

    bundled = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(bundled):
        return bundled  # matches the interpreter's pyspark version exactly
    return shutil.which("spark-submit")


def _build_src_zip(zpath: str) -> None:
    # what README/run_pipeline document: cd repo && zip -qr src.zip simhash_spark
    pkg = os.path.join(REPO, "simhash_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


def _submit(sub, runner, zpath, corpus, ckpt, cwd):
    env = dict(os.environ)
    # A cluster node has no repo on sys.path: the zip must satisfy every
    # simhash_spark import. Drop PYTHONPATH; pin the worker interpreter.
    env.pop("PYTHONPATH", None)
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            sub,
            "--master",
            "local[4]",
            "--py-files",
            zpath,
            runner,
            "--clips",
            os.path.join(corpus, "clips.parquet"),
            "--checkpoint",
            ckpt,
            "--partitions",
            "8",
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-4000:])
    payload = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert payload, out.stdout[-2000:]
    return json.loads(payload[-1])


def test_spark_submit_py_files_end_to_end_and_resume(tmp_path):
    sub = _spark_submit()
    if sub is None:
        pytest.skip("spark-submit not available")

    from simhash_spark.sources.synth import write_clips_parquet

    corpus = str(tmp_path / "corpus")
    write_clips_parquet(corpus, 400, seed=11, dur_ms_range=(100, 200))

    zpath = str(tmp_path / "src.zip")
    _build_src_zip(zpath)
    # the entry script leaves the repo too — its repo-relative
    # sys.path.insert then points at tmp, which holds no package
    runner = str(tmp_path / "run_pipeline.py")
    shutil.copyfile(os.path.join(REPO, "bin", "run_pipeline.py"), runner)

    ckpt = str(tmp_path / "ckpt")
    res = _submit(sub, runner, zpath, corpus, ckpt, str(tmp_path))
    assert res["rows"] == 400
    assert res["dup_rows"] > 0  # the synth mix plants dups; LSH must find them
    assert 0 < res["clusters"] < res["rows"]

    # second submit, same checkpoint: every stage committed -> resume is a
    # read-back no-op with identical cluster structure
    res2 = _submit(sub, runner, zpath, corpus, ckpt, str(tmp_path))
    assert (res2["rows"], res2["clusters"]) == (res["rows"], res["clusters"])
