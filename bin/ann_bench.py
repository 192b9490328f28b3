#!/usr/bin/env python
"""ANN at bench scale (round 5): IVF + multiprobe SRP vs exact brute
force on 1M vectors.

The two approximate paths (sampled-codebook IVF, multiprobe SRP-LSH)
are recall-pinned by pytest at sf0.001/0.01 (thousands of vectors);
this drill measures recall@10 and wall against the exact brute-force
top-k at 1M × dim-64 — cluster-structured data (a 1024-component
gaussian mixture, the case ANN indexes exist for), 100 queries drawn as
perturbations of corpus points. Parameters follow the operators' own
sizing guidance: n_cells = sqrt(n), nprobe = 32; SRP n_bits=12 (~244
vectors/bucket), 4 tables, multiprobe=1.

Corpus is deterministic (seed 7) and cached as parquet next to the
clips corpora. Results -> BENCH/ann-n{rows}.json and stdout.

Usage: python bin/ann_bench.py --rows 1000000 --shm
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--shm", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from simhash_spark.config import partitions_for_rows
    from simhash_spark.operators.ann import (
        cosine_topk_bruteforce,
        ivf_topk,
        ivf_train_centroids,
        srp_bucket_topk,
    )
    from simhash_spark.session import get_spark

    cache = "/dev/shm/simhash-bench-clips" if args.shm else "/tmp/simhash-bench-clips"
    corpus = os.path.join(cache, f"ann-n{args.rows}-d{args.dim}-seed7")
    sp = partitions_for_rows(args.rows, floor=8)
    spark = get_spark(
        app=f"ann-bench-{args.rows}",
        master=f"local[{args.cores}]",
        shuffle_partitions=sp,
    )

    rng = np.random.default_rng(7)
    n_comp = 1024
    centers = rng.normal(0, 1, (n_comp, args.dim)).astype(np.float32)
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        import pandas as pd
        import shutil

        shutil.rmtree(corpus, ignore_errors=True)
        os.makedirs(corpus, exist_ok=True)
        comp = rng.integers(0, n_comp, args.rows)
        vecs = centers[comp] + rng.normal(0, 0.35, (args.rows, args.dim)).astype(
            np.float32
        )
        pdf = pd.DataFrame(
            {"vec_id": np.arange(args.rows, dtype=np.int64), "embedding": list(vecs)}
        )
        spark.createDataFrame(pdf).repartition(sp).write.mode("overwrite").parquet(
            os.path.join(corpus, "vectors.parquet")
        )
        # queries: perturbed corpus points (realistic near-neighbor load)
        qidx = rng.integers(0, args.rows, args.queries)
        qv = vecs[qidx] + rng.normal(0, 0.1, (args.queries, args.dim)).astype(
            np.float32
        )
        qdf = pd.DataFrame(
            {
                "query_id": np.arange(args.queries, dtype=np.int64),
                "embedding": list(qv),
            }
        )
        spark.createDataFrame(qdf).write.mode("overwrite").parquet(
            os.path.join(corpus, "queries.parquet")
        )
        open(os.path.join(corpus, "_DONE"), "w").close()

    vectors = spark.read.parquet(os.path.join(corpus, "vectors.parquet"))
    queries = spark.read.parquet(os.path.join(corpus, "queries.parquet"))
    vectors.persist().count()

    def run(name, df):
        t0 = time.time()
        rows = df.select("query_id", "vec_id").collect()
        wall = time.time() - t0
        return {(r.query_id, r.vec_id) for r in rows}, round(wall, 1)

    truth, brute_wall = run("brute", cosine_topk_bruteforce(vectors, queries, k=10))

    t0 = time.time()
    cents = ivf_train_centroids(vectors, n_cells=1024)
    ivf_train_wall = round(time.time() - t0, 1)
    ivf, ivf_wall = run(
        "ivf", ivf_topk(vectors, queries, n_cells=1024, nprobe=32, centroids=cents)
    )
    srp, srp_wall = run(
        "srp",
        srp_bucket_topk(
            vectors, queries, dim=args.dim, n_bits=12, n_tables=4, multiprobe=1
        ),
    )

    result = {
        "mode": "ann-at-scale",
        "rows": args.rows,
        "dim": args.dim,
        "n_queries": args.queries,
        "cores": args.cores,
        "partitions": sp,
        "k": 10,
        "brute": {"wall_sec": brute_wall},
        "ivf": {
            "n_cells": 1024,
            "nprobe": 32,
            "train_wall_sec": ivf_train_wall,
            "query_wall_sec": ivf_wall,
            "recall_at_10": round(len(ivf & truth) / len(truth), 4),
        },
        "srp": {
            "n_bits": 12,
            "n_tables": 4,
            "multiprobe": 1,
            "query_wall_sec": srp_wall,
            "recall_at_10": round(len(srp & truth) / len(truth), 4),
        },
    }
    out = args.out or os.path.join(REPO, "BENCH", f"ann-n{args.rows}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
