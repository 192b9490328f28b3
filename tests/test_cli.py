"""CLI parity surface (bin/simhash_runner.py) — the reference runner's
four v2 commands. No Spark needed for the serving-side commands."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_model(tmp_path):
    from simhash_spark.ml import SimHashClassifier

    m = SimHashClassifier()
    for _ in range(5):
        m.learn_one("yes", "affirmative words indeed")
        m.learn_one("no", "negative denial words")
    mf = str(tmp_path / "m.bin")
    m.save(mf)
    return mf


def test_cli_v2_test_infers(tmp_path):
    mf = _mk_model(tmp_path)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "simhash_runner.py"),
         "-f", mf, "v2-test", "-s", "affirmative words"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    r = json.loads(out.stdout)
    assert r[0][0] == "yes"


def test_cli_defaults_match_reference():
    """Same option names/defaults as the reference parser
    (/root/reference/app/simhash-runner.hs:46-120): model file
    simhash.model, runner-size 10, iters 1."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "simhash_runner.py"), "--help"],
        capture_output=True, text=True, timeout=60,
    )
    for cmd in ("v2-train", "v2-test", "v2-infer", "v2-infer-learn"):
        assert cmd in out.stdout
    sub_help = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "simhash_runner.py"),
         "v2-infer", "--help"],
        capture_output=True, text=True, timeout=60,
    )
    assert "--runner-size" in sub_help.stdout  # reference default 10
    # default model file absent -> fresh model -> empty reply (no crash)
    t = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "simhash_runner.py"),
         "v2-test", "-s", "x"],
        capture_output=True, text=True, timeout=60,
    )
    assert t.returncode == 0
    assert t.stdout.strip() == "[]"
