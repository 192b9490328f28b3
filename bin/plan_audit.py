#!/usr/bin/env python
"""Print the executedPlan properties PLANS.md records, for re-audit after
plan-shape changes. Run: python bin/plan_audit.py [sf_dir]"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from simhash_spark.session import get_spark

    spark = get_spark(app="plan-audit", master="local[8]", shuffle_partitions=8)
    qs = E.queries()

    def plan(name):
        return qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()

    p = plan("cosine_neardup_pairs")
    print("== cosine_neardup_pairs ==")
    print("  CartesianProduct nodes:", p.count("CartesianProduct"))
    print("  BroadcastNestedLoopJoin:", p.count("BroadcastNestedLoopJoin"))
    print("  FlatMapGroupsInPandas (tile GEMM):", p.count("FlatMapGroupsInPandas"))
    print("  collect_list nodes:", p.count("collect_list"))

    p = plan("doc_dup_clusters")
    print("== doc_dup_clusters (pipeline) ==")
    print("  ArrowEvalPython:", p.count("ArrowEvalPython"))

    # candidate_pairs in pipeline context: audit the exchange on bkey
    from simhash_spark.operators.lsh import build_bands, candidate_pairs
    from pyspark.sql import functions as F
    from simhash_spark.functions.signatures import profile_udf

    d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    prof = d.select(
        F.col("doc_id").cast("string").alias("clip_id"), profile_udf("text").alias("p")
    ).select("clip_id", "p.norm_text", "p.simhash").localCheckpoint()
    bands = build_bands(prof, prof).localCheckpoint()
    p = candidate_pairs(bands, partitions=8)._jdf.queryExecution().executedPlan().toString()
    print("== candidate_pairs (bkey path) ==")
    print("  hashpartitioning(bkey:", p.count("hashpartitioning(bkey"))
    print("  ReusedExchange:", p.count("ReusedExchange"))
    print("  ArrowEvalPython:", p.count("ArrowEvalPython"))

    p = plan("tpch_q1")
    print("== tpch_q1 ==")
    for line in p.splitlines():
        if "ReadSchema" in line or "PushedFilters" in line:
            print(" ", line.strip()[:160])

    p = plan("verified_hamming_pairs")
    print("== verified_hamming_pairs ==")
    print("  ArrowEvalPython:", p.count("ArrowEvalPython"), "(tier rule is pure JVM)")


if __name__ == "__main__":
    main()
