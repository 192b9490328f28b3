"""Structured Streaming: watermark windows, stateful dedup, foreachBatch
incremental wiring."""

import datetime as dt
import os

import pandas as pd
from pyspark.sql import functions as F

from simhash_spark.streaming.windowed import (
    dedup_events_stateful,
    run_incremental_dedup_stream,
    windowed_event_counts,
)


def _ev(eid, uid, typ, hour, minute=0, value=1.0):
    return (
        eid,
        uid,
        typ,
        dt.datetime(2024, 1, 1, hour, minute),
        value,
    )


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_windowed_counts_emit_closed_windows_only(spark, tmp_path):
    src = str(tmp_path / "ev")
    # three files -> three micro-batches (maxFilesPerTrigger not needed:
    # watermark flushing happens via the final no-data batch).
    _write_events(spark, src, [_ev(1, 1, "click", 0, 5), _ev(2, 1, "click", 0, 40)])
    _write_events(spark, src, [_ev(3, 1, "view", 1, 10, 2.5)])
    _write_events(spark, src, [_ev(4, 2, "click", 5, 0)])  # advances watermark to 04:00
    q = (
        windowed_event_counts(spark, src, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.hour, r.event_type): (r.n, r.total_value_c)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    # hours 0 and 1 are closed by the watermark (04:00) -> emitted once,
    # with exact aggregates; hour 5's window is still open -> withheld.
    assert got[(0, "click")] == (2, 200)
    assert got[(1, "view")] == (1, 250)
    assert not any(h == 5 for h, _ in got)


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "ev2")
    _write_events(spark, src, [_ev(10, 1, "a", 0), _ev(11, 1, "a", 0)])
    _write_events(spark, src, [_ev(10, 1, "a", 1), _ev(12, 1, "a", 1), _ev(10, 2, "a", 1)])
    q = (
        dedup_events_stateful(spark, src)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    flags = {(r.user_id, r.event_id): [] for r in rows}
    for r in rows:
        flags[(r.user_id, r.event_id)].append(r.is_new)
    # event 10 for user 1 appears twice: first new, replay not new.
    assert sorted(flags[(1, 10)], reverse=True) == [True, False]
    assert flags[(1, 11)] == [True] and flags[(1, 12)] == [True]
    # same event_id under ANOTHER key is independent state.
    assert flags[(2, 10)] == [True]


def test_stream_to_incremental_dedup_foreachbatch(spark, tmp_path):
    import pandas as pd

    src = str(tmp_path / "clips")
    state = str(tmp_path / "state")
    long = " ".join(f"word{i}" for i in range(40))

    def clips_df(rows):
        return spark.createDataFrame(
            [(r[0], None, 16000, 100, "pcm_s16le", r[1]) for r in rows],
            "clip_id string, bytes binary, sr_hz int, dur_ms int, "
            "codec string, transcript string",
        )

    clips_df([("a", long), ("b", "unrelated text entirely")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    clips_df([("c", long.replace("word20", "wordXX"))]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    q = run_incremental_dedup_stream(spark, src, state)
    q.awaitTermination(180)
    out = spark.read.parquet(os.path.join(state, "matches_out", "batch-*"))
    got = {(r.a, r.b) for r in out.collect()}
    assert ("a", "c") in got  # cross-micro-batch near-dup found + verified
    assert all(r.method in ("exact", "hamming", "jaccard", "substring") for r in out.collect())
    # state committed through the streaming path (idempotent tokens)
    m = __import__("json").load(
        open(os.path.join(state, "band_index", "MANIFEST.json"))
    )
    assert len(m["batch_tokens"]) == 2
