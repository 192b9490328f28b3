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
