"""Serving loop — the reference's periodic job-queue worker, complete:

  EP3 worker      /root/reference/app/simhash-runner.hs:163-177 (v2-infer /
                  v2-infer-learn): pull job payloads, reply per job.
                  Re-expressed as a DIRECTORY job queue: ``<name>.job``
                  files are the payloads, ``<name>.reply.json`` the
                  replies (atomic rename), processed in name order.
  F2 routing      doInferLearnTask /root/reference/src/SimHash.hs:53-91 —
                  payload prefix "0" = infer only, "1" = learn only,
                  anything else = infer THEN learn (the reference runner
                  infers before it learns, so the reply reflects the
                  pre-learn model).
  P1 split        splitLabelAndMsg (first comma; label and msg trimmed).
  K3 reply        JSON array of (label, score), top 10, score desc.
  Q3 debounce     startSaver /root/reference/src/Htm/Runner.hs:58-85 —
                  the model is saved ``save_delay_sec`` after the LAST
                  learn (each learn re-arms the delay), not on every
                  learn; single-threaded via a due-time check in the
                  poll loop.

Single items are scored with the same numpy kernel the Spark UDFs wrap
(simhash_spark.ml) — batch and serving inference cannot drift. For bulk
inference use ``SimHashClassifier.transform`` (distributed pandas UDF).
"""

from __future__ import annotations

import json
import os
import time

from simhash_spark.ml import SimHashClassifier


def split_label_and_msg(payload: str) -> tuple[str, str]:
    """P1: text before the FIRST comma (trimmed) is the label, the rest
    (trimmed) is the message; no comma -> empty msg."""
    label, sep, msg = payload.partition(",")
    return label.strip(), msg.strip() if sep else ""


def handle_payload(model: SimHashClassifier, payload: str, lr: float = 0.5):
    """F2 dispatch. Returns (reply_json_or_None, learned_bool)."""
    mode, rest = payload[:1], payload[1:]
    if mode == "0":
        return json.dumps(model.infer_one(rest)), False
    if mode == "1":
        label, msg = split_label_and_msg(rest)
        if label and msg:
            model.learn_one(label, msg, lr=lr)
            return None, True
        return None, False
    # default: infer first (reply = pre-learn model), then learn
    label, msg = split_label_and_msg(rest)
    reply = json.dumps(model.infer_one(msg))
    learned = False
    if label and msg:
        model.learn_one(label, msg, lr=lr)
        learned = True
    return reply, learned


def submit_job(job_dir: str, name: str, payload: str) -> str:
    """Atomically drop a job: write ``<name>.tmp``, then os.replace to
    ``<name>.job`` — the same rename idiom the reply path uses. The
    worker lists-then-consumes, so a job file must appear COMPLETE or
    not at all; an in-place open/write/close can be read mid-write,
    processing a truncated payload whose at-most-once removal then hides
    the corruption (ADVICE r2). Producers must use this (or the same
    idiom); ``grace_sec`` is the worker-side guard for those that can't."""
    os.makedirs(job_dir, exist_ok=True)
    tmp = os.path.join(job_dir, name + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    final = os.path.join(job_dir, name + ".job")
    os.replace(tmp, final)
    return final


class JobQueueWorker:
    """Directory-based job queue worker with a debounced checkpointer.

    Drop ``<name>.job`` files (UTF-8 payload, F2 prefix format) into
    ``job_dir`` — ATOMICALLY, via :func:`submit_job` or an equivalent
    write-then-rename; each processed job is atomically answered with
    ``<name>.reply.json`` (infer modes) and the job file removed
    (at-most-once, like the reference's workDone acknowledgement).
    ``grace_sec > 0`` additionally skips job files modified within that
    window, tolerating producers that write in place (at the cost of
    one poll of latency).
    """

    def __init__(
        self,
        model: SimHashClassifier,
        job_dir: str,
        model_path: str | None = None,
        save_delay_sec: float = 60.0,
        clock=time.monotonic,
        grace_sec: float = 0.0,
    ):
        self.model = model
        self.job_dir = job_dir
        self.model_path = model_path
        self.save_delay_sec = save_delay_sec
        self.clock = clock
        self.grace_sec = grace_sec
        self._save_due: float | None = None
        os.makedirs(job_dir, exist_ok=True)

    def run_once(self) -> int:
        """Process every pending job (name order); returns jobs handled."""
        handled = 0
        for name in sorted(os.listdir(self.job_dir)):
            if not name.endswith(".job"):
                continue
            path = os.path.join(self.job_dir, name)
            if self.grace_sec > 0:
                try:
                    if time.time() - os.path.getmtime(path) < self.grace_sec:
                        continue  # possibly still being written in place
                except OSError:
                    continue  # vanished between listdir and stat
            with open(path, encoding="utf-8") as f:
                payload = f.read()
            reply, learned = handle_payload(self.model, payload)
            if reply is not None:
                out = os.path.join(self.job_dir, name[: -len(".job")] + ".reply.json")
                tmp = out + ".1"
                with open(tmp, "w", encoding="utf-8") as f:
                    f.write(reply)
                os.replace(tmp, out)
            os.remove(path)  # workDone: the job is acknowledged
            if learned:
                # Q3: every learn RE-ARMS the save timer (registerDelay)
                self._save_due = self.clock() + self.save_delay_sec
            handled += 1
        self.maybe_save()
        return handled

    def maybe_save(self) -> bool:
        """Save iff a learn happened and its debounce delay elapsed."""
        if (
            self._save_due is not None
            and self.clock() >= self._save_due
            and self.model_path
        ):
            self.model.save(self.model_path)
            self._save_due = None
            return True
        return False

    def run_forever(self, poll_sec: float = 1.0, max_polls: int | None = None) -> None:
        polls = 0
        while max_polls is None or polls < max_polls:
            self.run_once()
            time.sleep(poll_sec)
            polls += 1
