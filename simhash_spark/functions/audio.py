"""Audio column functions — decode, SNR invariant, feature plumbing.

The corpus is PCM s16le WAV (FIXTURES.md §1), decodable with numpy alone,
so decode + SNR are REAL here. Heavier transforms (codec transcode,
resample beyond linear) would need audio libs not in this container —
those are stubbed behind clearly-marked NotImplementedError with the
Spark-side plumbing (schema, batching, UDF signature) real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simhash_spark.sources.synth import decode_wav


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` vs ``ref`` in dB; inf if equal."""
    ref = ref.astype(np.float64)
    test = test.astype(np.float64)
    if len(ref) != len(test):
        return float("-inf")
    noise = ref - test
    p_sig = float((ref**2).sum())
    p_noise = float((noise**2).sum())
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)


@F.pandas_udf(T.DoubleType())
def audio_snr_udf(bytes_a: pd.Series, bytes_b: pd.Series) -> pd.Series:
    """Decoded-PCM SNR (dB) between two WAV byte columns — the per-row
    pass-through invariant check (BASELINE.json input_hint: SNR >= 30 dB).
    inf (byte-identical PCM) is returned as 1e9."""
    out = []
    for a, b in zip(bytes_a, bytes_b):
        try:
            _, sa = decode_wav(bytes(a))
            _, sb = decode_wav(bytes(b))
            v = snr_db(sa, sb)
            out.append(1e9 if v == float("inf") else v)
        except Exception:
            out.append(float("-inf"))
    return pd.Series(out, dtype="float64")


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("frame_energy", T.ArrayType(T.DoubleType())),
    ]
)


def audio_features(df, n_frames: int = 16):
    """clips(clip_id, bytes) -> per-clip acoustic features via mapInPandas
    (Arrow batches; audio never leaves the executor). Real numpy compute:
    RMS, peak, zero-crossing rate, n_frames-bucket energy profile."""

    def op(batches):
        for pdf in batches:
            rows = []
            for cid, raw in zip(pdf["clip_id"], pdf["bytes"]):
                try:
                    sr, s = decode_wav(bytes(raw))
                except Exception:
                    rows.append((cid, 0, 0, 0.0, 0.0, 0.0, [0.0] * n_frames))
                    continue
                x = s.astype(np.float64) / 32768.0
                n = len(x)
                rms = float(np.sqrt((x**2).mean())) if n else 0.0
                peak = float(np.abs(x).max()) if n else 0.0
                zcr = float((np.diff(np.signbit(x)) != 0).mean()) if n > 1 else 0.0
                if n >= n_frames:
                    fe = (
                        (x[: n - n % n_frames].reshape(n_frames, -1) ** 2)
                        .mean(axis=1)
                        .tolist()
                    )
                else:
                    fe = [0.0] * n_frames
                rows.append((cid, sr, n, rms, peak, zcr, fe))
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id",
                    "sr_hz",
                    "n_samples",
                    "rms",
                    "peak",
                    "zcr",
                    "frame_energy",
                ],
            )

    return df.select("clip_id", "bytes").mapInPandas(op, schema=_FEATURE_SCHEMA)


def transcode(df, target_codec: str):
    """STUB — codec transcode needs ffmpeg/soundfile (not in container).
    The Spark plumbing (mapInPandas over binary, schema preserved) is the
    real part; the kernel raises until a codec lib is available."""

    def op(batches):
        raise NotImplementedError(
            f"transcode to {target_codec!r} requires an audio codec library "
            "(ffmpeg/libsndfile) not present in this environment"
        )
        yield  # pragma: no cover

    return df.mapInPandas(op, schema=df.schema)


def check_passthrough(source_df, result_df, min_snr_db: float = 30.0):
    """Join source and result on clip_id and assert the pass-through
    invariant: transcript byte-equality + decoded-PCM SNR >= min_snr_db.
    Returns a DataFrame of violations (empty == invariant holds)."""
    s = source_df.select(
        "clip_id",
        F.col("bytes").alias("bytes_src"),
        F.col("transcript").alias("transcript_src"),
    )
    r = result_df.select("clip_id", "bytes", "transcript")
    j = s.join(r, "clip_id", "inner")
    return (
        j.withColumn("snr", audio_snr_udf("bytes_src", "bytes"))
        .withColumn("transcript_ok", F.col("transcript_src").eqNullSafe(F.col("transcript")))
        .filter((F.col("snr") < min_snr_db) | (~F.col("transcript_ok")))
        .select("clip_id", "snr", "transcript_ok")
    )
