"""Incremental / streaming ingestion tests."""

from pyspark.sql import functions as F

from simhash_spark import reference as R
from simhash_spark.streaming.incremental import IncrementalDedup, streaming_signatures


def _clips(spark, rows):
    return spark.createDataFrame(rows, "clip_id string, transcript string").select(
        "clip_id",
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(16000).alias("sr_hz"),
        F.lit(100).alias("dur_ms"),
        F.lit("pcm_s16le").alias("codec"),
        "transcript",
    )


def test_incremental_matches_new_against_index(spark, tmp_path):
    long = " ".join(f"word{i}" for i in range(40))
    inc = IncrementalDedup(spark, str(tmp_path))
    m1 = inc.ingest(_clips(spark, [("a", long), ("b", "something else entirely here")]))
    assert m1.count() == 0
    # batch 2: near-dup of a + dup within batch
    m2 = inc.ingest(
        _clips(
            spark,
            [
                ("c", long.replace("word20", "wordXX")),
                ("d", "fresh unrelated content"),
                ("e", "fresh unrelated content"),
            ],
        )
    ).collect()
    got = {(r.a, r.b) for r in m2}
    assert ("a", "c") in got
    assert ("d", "e") in got
    assert not any("b" in p for p in got)
    # batch-pipeline semantics: every match is VERIFIED, with a method.
    assert all(r.method in ("exact", "hamming", "jaccard", "substring") for r in m2)


def test_incremental_matches_are_verified_not_raw_collisions(spark, tmp_path):
    """A single shared gram / minhash band collision far below the 0.8
    jaccard threshold must NOT surface as a match (the batch pipeline's
    VERIFY rule applies to incremental answers too)."""
    # ~0.45-jaccard pair: plenty of shared shingles (band collisions
    # expected at minhash threshold ~0.42) but fails every verify tier.
    base = " ".join(f"tok{i}" for i in range(40))
    half = " ".join(f"tok{i}" for i in range(20)) + " " + " ".join(
        f"zzz{i}" for i in range(20)
    )
    inc = IncrementalDedup(spark, str(tmp_path))
    inc.ingest(_clips(spark, [("p", base)]))
    m = inc.ingest(_clips(spark, [("q", half)])).collect()
    assert m == []


def test_incremental_append_is_O_new_and_retry_safe(spark, tmp_path):
    """Each ingest appends ONLY the new batch's rows (manifest grows by
    one data dir; prior dirs untouched), and a crash-retry with the same
    batch token appends nothing."""
    inc = IncrementalDedup(spark, str(tmp_path))
    inc.ingest(_clips(spark, [("a", "first batch text one"), ("b", "first other")]))
    m1 = inc.store.read_manifest("band_index")
    assert len(m1["data_dirs"]) == 1
    rows_b1 = m1["rows"]

    inc.ingest(_clips(spark, [("c", "second batch text two")]))
    m2 = inc.store.read_manifest("band_index")
    assert len(m2["data_dirs"]) == 2
    assert m2["data_dirs"][0] == m1["data_dirs"][0]  # old dir untouched
    # appended volume is the NEW batch only (1 clip < 2-clip batch 1)
    assert m2["rows"] - rows_b1 < rows_b1

    # simulate crash-after-band-append retry: same batch token -> no-op
    bands = inc.store.read("band_index")
    tok = m2["batch_tokens"][-1]
    inc.store.append("band_index", bands.limit(1), batch_id=tok)
    m3 = inc.store.read_manifest("band_index")
    assert m3["rows"] == m2["rows"] and len(m3["data_dirs"]) == 2


def test_incremental_reingest_is_noop(spark, tmp_path):
    inc = IncrementalDedup(spark, str(tmp_path))
    batch = _clips(spark, [("x", "hello world one two three")])
    inc.ingest(batch)
    m = inc.ingest(batch)  # same clip_id again -> watermark filters it
    assert m.count() == 0


def test_streaming_signatures_match_batch(spark, tmp_path):
    import pandas as pd

    texts = ["stream one text", "stream two text", "totally different"]
    pdf = pd.DataFrame({"clip_id": ["s1", "s2", "s3"], "transcript": texts})
    src = str(tmp_path / "in")
    spark.createDataFrame(pdf).write.parquet(src)
    q = (
        streaming_signatures(spark, src)
        .writeStream.format("memory")
        .queryName("sigs_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.clip_id: r.simhash for r in spark.sql("SELECT * FROM sigs_out").collect()}
    want = R.simhash64_batch(texts)
    assert got == {"s1": int(want[0]), "s2": int(want[1]), "s3": int(want[2])}


def test_replayed_batch_returns_stored_matches_not_empty(spark, tmp_path):
    """Exactly-once across the OUTPUT write (ADVICE r2, medium): if the
    caller's sink write fails after ingest() committed the watermark, the
    replayed micro-batch must re-emit the batch's real matches — not
    recompute an empty set against the already-advanced watermark."""
    long = " ".join(f"word{i}" for i in range(40))
    inc = IncrementalDedup(spark, str(tmp_path))
    inc.ingest(_clips(spark, [("a", long)]), batch_id="stream-batch-0")
    b1 = _clips(spark, [("c", long.replace("word20", "wordXX"))])
    first = {(r.a, r.b) for r in inc.ingest(b1, batch_id="stream-batch-1").collect()}
    assert ("a", "c") in first
    # replay the SAME micro-batch (sink write "failed" after commit)
    replay = {(r.a, r.b) for r in inc.ingest(b1, batch_id="stream-batch-1").collect()}
    assert replay == first
    # and state was not double-appended by the replay
    m = inc.store.read_manifest("seen_ids")
    assert len(m["batch_tokens"]) == 2


def test_replayed_empty_match_batch_roundtrips(spark, tmp_path):
    """A batch with ZERO matches must replay as an empty DataFrame with
    the matches schema (empty parquet dirs have no parts to infer from)."""
    inc = IncrementalDedup(spark, str(tmp_path))
    b = _clips(spark, [("x", "nothing matches this text")])
    assert inc.ingest(b, batch_id="bz").count() == 0
    replay = inc.ingest(b, batch_id="bz")
    assert replay.count() == 0
    assert [f[0] for f in replay.dtypes] == ["a", "b", "det", "method", "hamming", "jaccard"]


def test_long_batch_id_idempotency(spark, tmp_path):
    """batch_ids longer than 32 chars (or path-unsafe) must stay
    idempotent: the stored token and the membership check use the same
    canonical mapping (ADVICE r2: it was stored truncated but compared
    in full, so every retry re-appended)."""
    from simhash_spark.sources.tableio import CheckpointStore, batch_token

    store = CheckpointStore(spark, str(tmp_path))
    df = spark.createDataFrame([("r1",)], "clip_id string")
    long_id = "external-system-supplied-batch-identifier-2026-08-16T00:00:00Z/7"
    assert len(long_id) > 32
    store.append("t", df, batch_id=long_id)
    store.append("t", df, batch_id=long_id)  # retry must be a no-op
    m = store.read_manifest("t")
    assert m["rows"] == 1 and len(m["data_dirs"]) == 1
    assert m["batch_tokens"] == [batch_token(long_id)]
    assert store.has_batch("t", long_id)
    # token is filesystem-safe and fixed-width for unsafe ids
    assert "/" not in batch_token(long_id) and len(batch_token(long_id)) == 32


def test_incremental_reads_prune_to_touched_buckets(spark, tmp_path):
    """Read-side state pruning (VERDICT r2 #3): at steady state a small
    micro-batch's band_index/profile/seen_ids reads list a STRICT subset
    of the stage's data paths, and matches are identical to a run whose
    bucket count degenerates pruning to a full scan."""
    from pyspark.sql import functions as F

    long = " ".join(f"word{i}" for i in range(40))
    rows = [(f"c{i}", f"unique text number {i} " + " ".join(f"w{i}_{j}" for j in range(12)))
            for i in range(24)]
    dup_batch = [("dup1", long.replace("word20", "wordXX"))]

    inc = IncrementalDedup(spark, str(tmp_path / "pruned"), n_buckets=64)
    flat = IncrementalDedup(spark, str(tmp_path / "full"), n_buckets=1)
    for sub in (rows[:8], rows[8:16], rows[16:] + [("base", long)]):
        inc.ingest(_clips(spark, sub))
        flat.ingest(_clips(spark, sub))
    got_p = {(r.a, r.b) for r in inc.ingest(_clips(spark, dup_batch)).collect()}
    got_f = {(r.a, r.b) for r in flat.ingest(_clips(spark, dup_batch)).collect()}
    assert got_p == got_f == {("base", "dup1")}

    # the paths a single-clip batch's band join would read: strict subset
    all_paths = set(inc.store.pruned_paths("band_index"))
    one = _clips(spark, [("probe", "probe text alpha beta gamma")])
    from simhash_spark.operators.lsh import build_bands
    from simhash_spark.functions.signatures import normalize_udf, simhash64_udf
    prof = one.select("clip_id", normalize_udf("transcript").alias("norm_text")).withColumn(
        "simhash", simhash64_udf("norm_text")
    )
    bands = build_bands(prof, prof, detectors=inc.cfg.detectors).withColumn(
        "bkt", F.pmod(F.col("bkey"), F.lit(inc.n_buckets)).cast("int")
    )
    touched = [r[0] for r in bands.select("bkt").distinct().collect()]
    pruned = set(inc.store.pruned_paths("band_index", touched))
    assert pruned < all_paths  # strict subset: pruning is real
    # adopted layout: a reopened instance inherits the pinned bucket count
    re = IncrementalDedup(spark, str(tmp_path / "pruned"), n_buckets=999)
    assert re.n_buckets == 64


def test_incremental_hot_group_stars_stay_connected_across_batches(spark, tmp_path):
    """A band group over band_group_cap diverts to LINEAR star edges (no
    per-bkey quadratic join), the diverted rows are logged, and stars
    from different batches stay in ONE transitive component even when a
    later batch introduces a new global hub (bridge edge)."""
    import json
    import os

    from simhash_spark.config import EngineConfig

    inc = IncrementalDedup(spark, str(tmp_path), EngineConfig(band_group_cap=5))
    boiler = " ".join(f"boiler{i}" for i in range(30))
    # batch 1: ids c10..c17 (hub c10); batch 2: c00..c07 -> NEW global
    # hub c00, which must bridge to the index-side hub c10.
    m1 = inc.ingest(_clips(spark, [(f"c1{i}", boiler) for i in range(8)]), "h1")
    m2 = inc.ingest(_clips(spark, [(f"c0{i}", boiler) for i in range(8)]), "h2")
    edges = [(r.a, r.b) for r in m1.collect()] + [(r.a, r.b) for r in m2.collect()]
    # linear, not quadratic: far fewer than C(16,2)=120 pairs
    assert len(set(edges)) < 40
    # single transitive component over all 16 clones
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    roots = {find(f"c1{i}") for i in range(8)} | {find(f"c0{i}") for i in range(8)}
    assert len(roots) == 1
    # every emitted pair is verified-identical text (exact tier)
    assert all(r.method == "exact_text" or r.method for r in m1.collect())
    # the diversion is logged, never silent
    metrics = [
        json.loads(l)
        for l in open(os.path.join(tmp_path, "_metrics.jsonl"))
    ]
    hot = [m for m in metrics if m["metric"] == "incremental_hot_band_rows_starred"]
    assert hot and hot[0]["value"] > 0
