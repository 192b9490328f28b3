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
    got = {(r.new_id, r.matched_id) for r in m2}
    assert ("c", "a") in got
    assert ("d", "e") in got or ("e", "d") in got
    assert not any("b" in p for p in got)


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
