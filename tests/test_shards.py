"""Two-level sharded execution == single whole-corpus run (plans/shards).

The 10^12-row deployment shape (shards.py module doc): per-shard
pipeline runs, a cross-shard link pass over the unioned bands, CC over
the union of edge tables. The claim worth a test is EQUIVALENCE: the
merged clusters must be bit-identical to one pipeline run over the whole
corpus — including for duplicate pairs that STRADDLE the shard boundary
(the pairs level 1 alone cannot see).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from simhash_spark.plans.pipeline import DedupPipeline
from simhash_spark.plans.shards import merge_shard_runs
from simhash_spark.sources.synth import make_clips


@pytest.fixture(scope="module")
def dirs(spark):
    """Temp root with BOTH shard pipelines already run (every test here
    consumes the shard checkpoints; building them once keeps each test
    self-sufficient under -k selection)."""
    d = tempfile.mkdtemp(prefix="shard-merge-test-")
    clips_pd, _ = make_clips(700, seed=11)
    shard_a = clips_pd.iloc[0::2].reset_index(drop=True)
    shard_b = clips_pd.iloc[1::2].reset_index(drop=True)
    DedupPipeline(spark, f"{d}/shard0").run(spark.createDataFrame(shard_a))
    DedupPipeline(spark, f"{d}/shard1").run(spark.createDataFrame(shard_b))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_shard_merge_equals_single_run(spark, dirs):
    clips_pd, truth = make_clips(700, seed=11)
    # interleaved split (matches the fixture's): planted (source, copy)
    # pairs land in DIFFERENT shards often (sources are early rows,
    # copies late), so the test actually exercises the cross-shard link,
    # not just the union.
    shard_a = clips_pd.iloc[0::2].reset_index(drop=True)
    full = spark.createDataFrame(clips_pd)

    # sanity: the split must leave some truth pairs straddling shards
    in_a = set(shard_a["clip_id"])
    straddle = [
        (a, b)
        for a, b in zip(truth["a"], truth["b"])
        if (a in in_a) != (b in in_a)
    ]
    assert len(straddle) >= 5, "fixture regression: no cross-shard dups"

    merged = merge_shard_runs(
        spark,
        [f"{dirs}/shard0", f"{dirs}/shard1"],
        f"{dirs}/merge",
        full,
    )

    single = DedupPipeline(spark, f"{dirs}/single").run(full)

    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, single.collect()))
    assert got == want

    # and the cross-shard straddling pairs ended up co-clustered wherever
    # the single run co-clusters them (they all should: planted dups)
    cl = dict(want)
    co = sum(1 for a, b in straddle if cl[a] == cl[b])
    assert co == sum(
        1 for a, b in straddle if dict(got)[a] == dict(got)[b]
    )
    assert co >= len(straddle) * 0.9


def test_merge_is_resumable(spark, dirs):
    """Re-invoking the merge with committed stages is a fast no-op that
    returns identical clusters (CheckpointStore resume semantics)."""
    full_pd, _ = make_clips(700, seed=11)
    full = spark.createDataFrame(full_pd)
    first = sorted(
        map(
            tuple,
            merge_shard_runs(
                spark, [f"{dirs}/shard0", f"{dirs}/shard1"], f"{dirs}/merge", full
            ).collect(),
        )
    )
    again = sorted(
        map(
            tuple,
            merge_shard_runs(
                spark, [f"{dirs}/shard0", f"{dirs}/shard1"], f"{dirs}/merge", full
            ).collect(),
        )
    )
    assert first == again


def test_cross_shard_link_is_bkey_shardable(spark, dirs):
    """shards.py claims the cross-shard link step is itself shardable by
    band-key range. Check the claim with the implemented shape
    (bkey_slices > 1: UNGATED per-slice candidate generation, one
    associative pair-evidence merge + gate across slices): the sliced
    link's verified pair set must equal the single-pass link's. Naive
    per-slice gating would NOT satisfy this — band-hit evidence and det
    priority span slices — which is exactly why the merge exists."""
    from simhash_spark.plans.shards import cross_shard_verified_pairs
    from simhash_spark.sources.tableio import CheckpointStore

    stores = [
        CheckpointStore(spark, f"{dirs}/shard0"),
        CheckpointStore(spark, f"{dirs}/shard1"),
    ]
    single = {
        tuple(r)
        for r in cross_shard_verified_pairs(spark, stores)
        .select("a", "b")
        .collect()
    }
    sliced = {
        tuple(r)
        for r in cross_shard_verified_pairs(spark, stores, bkey_slices=3)
        .select("a", "b")
        .collect()
    }
    assert sliced == single
    assert len(single) > 0  # the fixture must actually exercise the link
