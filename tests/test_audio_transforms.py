"""Audio payload transforms: resample / frame-sample / silence-trim.

All kernels are real numpy over the PCM WAV corpus; oracles are direct
signal math on the same synthetic clips."""

import numpy as np
import pytest

from simhash_spark.sources.synth import decode_wav, wav_bytes


def _sine_wav(sr=16000, dur_ms=200, f=440.0, amp=0.5, pad_ms=(0, 0)):
    n = int(sr * dur_ms / 1000)
    t = np.arange(n) / sr
    x = (amp * 32767 * np.sin(2 * np.pi * f * t)).astype(np.int16)
    lead = np.zeros(int(sr * pad_ms[0] / 1000), dtype=np.int16)
    tail = np.zeros(int(sr * pad_ms[1] / 1000), dtype=np.int16)
    return wav_bytes(np.concatenate([lead, x, tail]), sr)


def _clips_df(spark, rows):
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
    )


def test_resample_halves_samples_and_keeps_tone(spark):
    from simhash_spark.functions.audio import resample_linear

    raw = _sine_wav(sr=16000, dur_ms=200, f=440.0)
    df = _clips_df(spark, [("c0", bytearray(raw), 16000, 200, "pcm_s16le", "t")])
    out = resample_linear(df, 8000).collect()[0]
    sr, y = decode_wav(bytes(out["bytes"]))
    assert sr == 8000 and out["sr_hz"] == 8000
    assert abs(len(y) - 1600) <= 2 and abs(out["dur_ms"] - 200) <= 1
    # the 440 Hz tone must survive: dominant FFT bin within 1 bin of 440
    spec = np.abs(np.fft.rfft(y.astype(np.float64)))
    peak_hz = np.argmax(spec[1:]) + 1
    assert abs(peak_hz * 8000 / len(y) - 440.0) < 10.0


def test_resample_noop_at_same_rate(spark):
    from simhash_spark.functions.audio import resample_linear

    raw = _sine_wav(sr=16000, dur_ms=100)
    df = _clips_df(spark, [("c0", bytearray(raw), 16000, 100, "pcm_s16le", "t")])
    out = resample_linear(df, 16000).collect()[0]
    _, y = decode_wav(bytes(out["bytes"]))
    _, x = decode_wav(raw)
    assert (x == y).all()


def test_frame_samples_cover_and_cap(spark):
    from simhash_spark.functions.audio import frame_samples

    raw = _sine_wav(sr=16000, dur_ms=1000)  # 1 s -> 40 non-overlap 25ms frames
    df = _clips_df(spark, [("c0", bytearray(raw), 16000, 1000, "pcm_s16le", "t")])
    rows = frame_samples(df, frame_ms=25, max_frames=64).collect()
    assert len(rows) == 40
    assert all(len(r["samples"]) == 400 for r in rows)
    t0s = sorted(r["t0_ms"] for r in rows)
    assert t0s[0] == 0 and t0s[1] == 25
    assert all(-1.0 <= v <= 1.0 for v in rows[0]["samples"])

    capped = frame_samples(df, frame_ms=25, max_frames=10).collect()
    assert len(capped) <= 10 and len(capped) >= 8  # uniform stride, deterministic
    again = frame_samples(df, frame_ms=25, max_frames=10).collect()
    assert [r["t0_ms"] for r in capped] == [r["t0_ms"] for r in again]


def test_trim_silence_removes_padding_only(spark):
    from simhash_spark.functions.audio import trim_silence

    raw = _sine_wav(sr=16000, dur_ms=200, amp=0.5, pad_ms=(50, 30))
    df = _clips_df(spark, [("c0", bytearray(raw), 16000, 280, "pcm_s16le", "t")])
    out = trim_silence(df, threshold_db=-40.0).collect()[0]
    assert abs(out["trimmed_lead_ms"] - 50) <= 2
    assert abs(out["trimmed_tail_ms"] - 30) <= 2
    _, y = decode_wav(bytes(out["bytes"]))
    assert abs(len(y) - 3200) <= 40  # ~200 ms of tone kept
    assert abs(out["dur_ms"] - 200) <= 3


def test_trim_silence_all_silent_keeps_one_sample(spark):
    from simhash_spark.functions.audio import trim_silence

    raw = wav_bytes(np.zeros(1600, dtype=np.int16), 16000)
    df = _clips_df(spark, [("c0", bytearray(raw), 16000, 100, "pcm_s16le", "t")])
    out = trim_silence(df).collect()[0]
    _, y = decode_wav(bytes(out["bytes"]))
    assert len(y) == 1
