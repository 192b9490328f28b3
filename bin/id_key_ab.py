#!/usr/bin/env python
"""Interleaved pipeline-level A/B of config.ID_KEY (crash-safe).

cid (int64 xxhash64 interior keys) vs clip_id (legacy string keys) at
fixed rows/cores on the tmpfs corpus, legs alternated in ONE session so
box drift cancels. The knob reaches the subprocess legs via
SPARK_GRAFT_ID_KEY, read at import by config.py (same pattern as
SPARK_GRAFT_MINHASH_SCHEME).

Expected signature of a real win: candidate_pairs down (the pair-dedupe
hash aggregation and the band self-join run on 8-byte keys instead of
~24-byte strings) and verify flat-to-down (four profile side-joins on
long keys, plus two extra boundary joins mapping back to strings);
bands/profile roughly flat (kernel-bound). The dup-pair SET is identical
across modes (smoke-checked end-to-end; star-edge hubs differ — min-cid
vs min-string — which changes candidate pairs but not clusters' verified
fixpoint semantics).

Usage: python bin/id_key_ab.py [--rows 2000000] [--cores 8]
           [--legs cid,clip_id,clip_id,cid]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "bin"))

from scaling_bench import run_at  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=8)
    # order-balanced by default: A,B,B,A cancels first-leg page-cache bias
    ap.add_argument("--legs", default="cid,clip_id,clip_id,cid")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    cache = "/dev/shm/simhash-bench-clips"
    ckpt_base = "/dev/shm/simhash-bench-ckpt"
    local_dir = "/dev/shm/simhash-bench-local"
    for d in (ckpt_base, local_dir):
        os.makedirs(d, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", local_dir)
    corpus = os.path.join(cache, f"scaling-n{args.rows}-seed42")
    clips_path = os.path.join(corpus, "clips.parquet")
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        raise SystemExit(f"corpus missing: {corpus} (generate via scaling_bench --shm)")

    tag = f"-{args.tag}" if args.tag else ""
    out_path = os.path.join(
        REPO, "BENCH", f"ab-id-key-t{args.cores}-n{args.rows}{tag}.json"
    )
    legs = []
    if os.path.exists(out_path):
        legs = json.load(open(out_path)).get("legs", [])
    seq = args.legs.split(",")
    for i, key in enumerate(seq):
        if i < len(legs):
            print(f"leg {i} ({key}) already recorded, skipping", file=sys.stderr)
            continue
        os.environ["SPARK_GRAFT_ID_KEY"] = key
        print(f"leg {i}: id_key={key} local[{args.cores}] ...", file=sys.stderr)
        r = run_at(args.cores, clips_path, ckpt_base, None, "join", args.rows, "window")
        r["id_key"] = key
        r["order"] = i
        legs.append(r)
        _write(out_path, args, legs)
        print(
            json.dumps(
                {k: r[k] for k in ("id_key", "wall_sec", "gc_sec", "stage_walls")}
            ),
            file=sys.stderr,
        )
    _write(out_path, args, legs)
    print(json.dumps(json.load(open(out_path))["summary"], indent=1))


def _write(out_path: str, args, legs: list) -> None:
    by = {}
    for leg in legs:
        by.setdefault(leg["id_key"], []).append(leg["wall_sec"])
    summary = {
        s: {"mean_wall": round(sum(w) / len(w), 1), "walls": [round(x, 1) for x in w]}
        for s, w in by.items()
    }
    with open(out_path, "w") as f:
        json.dump(
            {
                "protocol": "interleaved same-session legs, fresh JVM each, "
                "tmpfs corpus+ckpt, key via SPARK_GRAFT_ID_KEY",
                "rows": args.rows,
                "cores": args.cores,
                "summary": summary,
                "legs": legs,
            },
            f,
            indent=1,
        )
        f.write("\n")


if __name__ == "__main__":
    main()
