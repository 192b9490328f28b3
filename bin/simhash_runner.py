#!/usr/bin/env python
"""CLI parity with the reference runner (/root/reference/app/simhash-runner.hs):
the four v2 commands, same defaults, Spark-first internals. Ship with
``spark-submit --py-files simhash_spark.zip bin/simhash_runner.py …`` on a
cluster; runs on local[N] here.

  v2-train        -f MODEL [-b BOOT] [-d DATA] [-t TEST] [--iters N]
                  distributed train + valid, per-iter stats JSON, atomic save
  v2-test         -f MODEL -s STRING          one-shot inference, prints scores
  v2-infer        -f MODEL [--runner-size N] [--sock PATH]
                  N-replica round-robin serving over a unix socket (Q1/EP3)
  v2-infer-learn  -f MODEL [--job-dir DIR] [--save-delay SEC]
                  single-replica directory job queue with F2 0/1/else routing
                  and the debounced checkpointer (Q3)
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_or_new(model_file: str):
    from simhash_spark.ml import SimHashClassifier

    if os.path.exists(model_file):
        return SimHashClassifier.load(model_file)
    return SimHashClassifier()


def cmd_train(args) -> int:
    from simhash_spark.ml import train_and_valid
    from simhash_spark.session import get_spark

    spark = get_spark(app="simhash-v2-train")
    train_and_valid(
        spark,
        args.data,
        args.test,
        args.file,
        iters=args.iters,
        boot_file=args.boot or None,
    )
    print(f"model saved to {args.file}; stats at {args.file}.stats.json")
    return 0


def cmd_test(args) -> int:
    import json

    model = _load_or_new(args.file)
    print(json.dumps(model.infer_one(args.str)))
    return 0


def cmd_infer(args) -> int:
    from simhash_spark.streaming.replicas import ReplicaPool, UnixSocketServer

    pool = ReplicaPool(lambda: _load_or_new(args.file), n_replicas=args.runner_size)
    srv = UnixSocketServer(pool, args.sock).start()
    print(f"serving {args.runner_size} replicas on {args.sock} (Ctrl-C to stop)")
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
        pool.stop()
    return 0


def cmd_infer_learn(args) -> int:
    from simhash_spark.streaming.serving import JobQueueWorker

    model = _load_or_new(args.file)
    w = JobQueueWorker(
        model,
        args.job_dir,
        model_path=args.file,
        save_delay_sec=args.save_delay,
    )
    print(f"single-replica infer-learn worker on {args.job_dir} (Ctrl-C to stop)")
    try:
        w.run_forever(poll_sec=args.poll_sec)
    except KeyboardInterrupt:
        pass
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="simhash-runner", description="SimHash Runner")
    ap.add_argument("-f", "--file", default="simhash.model", help="SimHash model file")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("v2-train", help="Train simhash model v2")
    t.add_argument("-b", "--boot", default="")
    t.add_argument("-d", "--data", default="data.txt")
    t.add_argument("-t", "--test", default="test.txt")
    t.add_argument("--iters", type=int, default=1)
    t.set_defaults(fn=cmd_train)

    s = sub.add_parser("v2-test", help="Test a string v2")
    s.add_argument("-s", "--str", default="")
    s.set_defaults(fn=cmd_test)

    i = sub.add_parser("v2-infer", help="Run infer task v2")
    i.add_argument("-s", "--runner-size", type=int, default=10)
    i.add_argument("--sock", default="/tmp/simhash-infer.sock")
    i.set_defaults(fn=cmd_infer)

    il = sub.add_parser("v2-infer-learn", help="Run infer learn task v2")
    il.add_argument("--job-dir", default="/tmp/simhash-jobs")
    il.add_argument("--save-delay", type=float, default=60.0)
    il.add_argument("--poll-sec", type=float, default=1.0)
    il.set_defaults(fn=cmd_infer_learn)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
