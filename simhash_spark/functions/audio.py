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


def audio_features(df, n_frames: int = 16, keep_samples: bool = False):
    """clips(clip_id, bytes) -> per-clip acoustic features via mapInPandas
    (Arrow batches; audio never leaves the executor). Real numpy compute:
    RMS, peak, zero-crossing rate, n_frames-bucket energy profile.

    ``keep_samples=True`` additionally emits the decoded int16 PCM as a
    ``samples int[]`` column — an AUDIT hook (the oracle gate re-derives
    rms/zcr/n_samples relationally from it); leave it off in pipelines,
    it multiplies the row width by the clip length."""

    schema = _FEATURE_SCHEMA
    if keep_samples:
        schema = T.StructType(
            schema.fields + [T.StructField("samples", T.ArrayType(T.IntegerType()))]
        )

    def op(batches):
        for pdf in batches:
            rows = []
            for cid, raw in zip(pdf["clip_id"], pdf["bytes"]):
                try:
                    sr, s = decode_wav(bytes(raw))
                except Exception:
                    rows.append((cid, 0, 0, 0.0, 0.0, 0.0, [0.0] * n_frames, []))
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
                rows.append((cid, sr, n, rms, peak, zcr, fe, s.tolist()))
            cols = [
                "clip_id",
                "sr_hz",
                "n_samples",
                "rms",
                "peak",
                "zcr",
                "frame_energy",
                "samples",
            ]
            out = pd.DataFrame(rows, columns=cols)
            yield out if keep_samples else out.drop(columns=["samples"])

    return df.select("clip_id", "bytes").mapInPandas(op, schema=schema)


# ---------------------------------------------------------------------------
# Spectral shape features — full-clip rFFT power folded into equal-width
# frequency bands, then the classic spectral descriptors (centroid,
# 85% rolloff, flatness, dominant band). All features are scale-invariant
# in the band powers, so the FFT normalization convention is free.
# ---------------------------------------------------------------------------

_SPEC_BANDS = 64


def _spectral_kernel(sr: int, s: np.ndarray, n_bands: int):
    """Band powers + shape features for one clip. Returns
    (bands, centroid_hz, rolloff85_hz, flatness, dominant_band)."""
    x = s.astype(np.float64) / 32768.0
    n = len(x)
    if n == 0 or sr <= 0:
        return [0.0] * n_bands, 0.0, 0.0, 0.0, 0
    p = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.arange(len(p)) * (sr / n)
    idx = np.minimum(
        (freqs / ((sr / 2.0) / n_bands)).astype(np.int64), n_bands - 1
    )
    bands = np.bincount(idx, weights=p, minlength=n_bands)[:n_bands]
    # tot and the rolloff threshold come from the SEQUENTIAL cumsum, not
    # np.sum (pairwise): DuckDB's list_sum is the same left fold, so the
    # oracle's prefix sums and total are BIT-IDENTICAL to these and the
    # discrete `cumsum >= 0.85*tot` band pick can never straddle a ulp
    # (probed: 200 random 64-band vectors, every prefix bit-equal).
    cs = np.cumsum(bands)
    tot = float(cs[-1])
    if tot == 0.0:
        return bands.tolist(), 0.0, 0.0, 0.0, 0
    centers = (np.arange(n_bands) + 0.5) * ((sr / 2.0) / n_bands)
    centroid = float(np.dot(centers, bands) / tot)
    k_roll = int(np.argmax(cs >= 0.85 * tot))
    rolloff = float(centers[k_roll])
    flat = float(
        np.exp(np.log(bands + 1e-12).mean()) / (tot / n_bands + 1e-12)
    )
    dom = int(np.argmax(bands))
    return bands.tolist(), centroid, rolloff, flat, dom


_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("spec_centroid_hz", T.DoubleType()),
        T.StructField("rolloff85_hz", T.DoubleType()),
        T.StructField("flatness", T.DoubleType()),
        T.StructField("dominant_band", T.LongType()),
    ]
)


def spectral_features(df, n_bands: int = _SPEC_BANDS, keep_bands: bool = False):
    """clips(clip_id, bytes) -> spectral shape features via mapInPandas.

    Full-clip rFFT power folded into ``n_bands`` equal-width bands of
    [0, sr/2); features are pure functions of the band-power vector:

      spec_centroid_hz — band-center power-weighted mean frequency
      rolloff85_hz     — center of the first band where the cumulative
                         power reaches 85% of the total
      flatness         — geometric / arithmetic mean of band powers
                         (1e-12 floor inside the log and denominator)
      dominant_band    — argmax band (ties -> first)

    ``keep_bands=True`` additionally emits the ``bands double[]`` vector
    — the AUDIT hook: the oracle gate re-derives every feature
    relationally from the same doubles. Decode failures / empty PCM
    yield zero bands and zero features (sr_hz 0)."""

    schema = _SPECTRAL_SCHEMA
    if keep_bands:
        schema = T.StructType(
            schema.fields + [T.StructField("bands", T.ArrayType(T.DoubleType()))]
        )

    def op(batches):
        for pdf in batches:
            rows = []
            for cid, raw in zip(pdf["clip_id"], pdf["bytes"]):
                try:
                    sr, s = decode_wav(bytes(raw))
                except Exception:
                    sr, s = 0, np.empty(0, dtype=np.int16)
                bands, cent, roll, flat, dom = _spectral_kernel(sr, s, n_bands)
                rows.append((cid, sr, cent, roll, flat, dom, bands))
            cols = [
                "clip_id",
                "sr_hz",
                "spec_centroid_hz",
                "rolloff85_hz",
                "flatness",
                "dominant_band",
                "bands",
            ]
            out = pd.DataFrame(rows, columns=cols)
            yield out if keep_bands else out.drop(columns=["bands"])

    return df.select("clip_id", "bytes").mapInPandas(op, schema=schema)


# ---------------------------------------------------------------------------
# Perceptual audio fingerprint (Haitsma & Kalker, "A Highly Robust Audio
# Fingerprinting System", ISMIR 2002 — public). Extends the engine's dedup
# to the AUDIO payload itself: exact byte hashing misses re-gained /
# re-noised copies; this does not.
# ---------------------------------------------------------------------------

_FP_NFFT = 1024
_FP_HOP = 512
_FP_BANDS = 17  # 17 log-spaced energy bands -> 16 sign bits per frame
_FP_FMIN = 300.0
_FP_FMAX = 3000.0


def audio_fingerprint_kernel(sr: int, samples: np.ndarray) -> np.ndarray:
    """PCM -> per-frame 16-bit fingerprints (uint32 array).

    Hann-windowed STFT -> 17 log-spaced band energies (300-3000 Hz) ->
    bit(b,t) = sign of the time-delta of the band-delta (the HK
    energy-difference sign): GAIN-INVARIANT by construction (a global
    scale multiplies every energy, leaving the signs untouched) and
    robust to small additive noise."""
    x = samples.astype(np.float64) / 32768.0
    if len(x) < _FP_NFFT + _FP_HOP:
        x = np.pad(x, (0, _FP_NFFT + _FP_HOP - len(x)))
    n_frames = 1 + (len(x) - _FP_NFFT) // _FP_HOP
    idx = np.arange(_FP_NFFT)[None, :] + _FP_HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(_FP_NFFT)[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    freqs = np.fft.rfftfreq(_FP_NFFT, 1.0 / sr)
    edges = np.geomspace(_FP_FMIN, min(_FP_FMAX, sr / 2.0 - 1.0), _FP_BANDS + 1)
    band_of = np.searchsorted(edges, freqs, side="right") - 1  # -1..BANDS
    E = np.zeros((n_frames, _FP_BANDS))
    valid = (band_of >= 0) & (band_of < _FP_BANDS)
    np.add.at(E.T, band_of[valid], spec[:, valid].T)
    d = E[:, :-1] - E[:, 1:]  # band deltas (T, 16)
    dd = d[1:] - d[:-1]  # time delta of band deltas (T-1, 16)
    bits = (dd > 0).astype(np.uint32)
    return (bits << np.arange(16, dtype=np.uint32)[None, :]).sum(axis=1, dtype=np.uint32)


_FP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("fps", T.ArrayType(T.LongType())),
    ]
)


def audio_fingerprints(df):
    """clips(clip_id, bytes) -> (clip_id, fps array<long>) via mapInPandas
    (bytes never leave the executor; rows that fail to decode get [])."""

    def op(batches):
        for pdf in batches:
            rows = []
            for cid, raw in zip(pdf["clip_id"], pdf["bytes"]):
                try:
                    sr, s = decode_wav(bytes(raw))
                    rows.append((cid, audio_fingerprint_kernel(sr, s).astype(np.int64).tolist()))
                except Exception:
                    rows.append((cid, []))
            yield pd.DataFrame(rows, columns=["clip_id", "fps"])

    return df.select("clip_id", "bytes").mapInPandas(op, schema=_FP_SCHEMA)


def audio_dup_candidates(
    clips,
    key_group_cap: int = 2000,
    min_shared_keys: int = 2,
    len_bucket_frames: int = 128,
    metrics_sink=None,
):
    """The candidate half of ``audio_dup_pairs``: (a, b, fps_a, fps_b)
    with a < b — sub-fingerprint-collision pairs carrying both clips'
    full fingerprint sequences, so the BER verify rule can be re-applied
    relationally (the side-parquet oracle idiom).

    Same candidate->verify shape as the text detectors:
      candidates — equi self-join on per-frame 16-bit sub-fingerprints
        (HK's lookup unit; a true copy shares MANY frames verbatim even
        when noise flips bits in most frames) COMPOSITED with a coarse
        duration bucket so a popular sub-fingerprint can't form one
        corpus-wide group: at 10^12 clips the 16-bit key space alone
        saturates, the (duration, key) composite keeps group sizes
        sub-linear. The bucket is ``floor(n_frames/len_bucket_frames)``
        over the clip's OWN fingerprint length (~2 s at 16 kHz default)
        — an intrinsic duration proxy measured from the payload, so it
        needs no metadata column and can't disagree with the audio.
        Each clip probes its own bucket AND the one below, so true
        copies whose lengths differ by < one bucket still collide
        (|b1-b2|<=1 => {b1, b1-1} meets {b2, b2-1}); a pair's evidence
        counts DISTINCT raw keys so the double-probe never inflates
        ``min_shared_keys`` gating (the mh_hits>=2 idiom — random 16-bit
        collisions never reach verify). Groups over ``key_group_cap``
        are dropped, and the drop is LOGGED to ``metrics_sink`` (same
        no-silent-truncation rule as operators/lsh.py).
      verify — bit error rate over the aligned fingerprint sequences,
        computed ENTIRELY in the JVM (zip_with + xor + bit_count):
        HK's match rule, BER < ``ber_max``.
    """
    fps = audio_fingerprints(clips).filter(F.size("fps") >= 2).persist()
    len_bkt = F.floor(F.size("fps") / F.lit(int(len_bucket_frames)))
    # per-clip key dedupe via array_distinct BEFORE the explodes (r6):
    # exact replacement for the old dropDuplicates([clip_id, dbkt, key])
    # — the dbkt explode replicates the WHOLE key set per probe bucket,
    # so per-row distinct == per-(clip, dbkt) distinct — and it runs
    # map-side instead of paying a 3-column shuffle. len_bkt reads the
    # ORIGINAL fps length (the duration proxy) before the dedupe.
    keys = fps.select(
        "clip_id",
        F.explode(F.array(len_bkt, len_bkt - 1)).alias("dbkt"),
        F.array_distinct("fps").alias("fpsd"),
    ).select("clip_id", "dbkt", F.explode("fpsd").alias("key"))
    grp = ["dbkt", "key"]
    if metrics_sink is not None:
        # hot-drop accounting needs the per-group sizes eagerly (the
        # no-silent-truncation rule); one partial-aggregable pass.
        over = (
            keys.groupBy(*grp)
            .agg(F.count("*").alias("grp_n"))
            .filter(F.col("grp_n") > key_group_cap)
            .agg(
                F.count("*").alias("groups"),
                F.coalesce(F.sum("grp_n"), F.lit(0)).alias("rows"),
            )
            .first()
        )
        metrics_sink(
            "audio_hot_key_groups_dropped",
            int(over["groups"]),
            rows_dropped=int(over["rows"]),
            cap=key_group_cap,
            len_bucket_frames=len_bucket_frames,
        )
    # group sizing via count() OVER (PARTITION BY dbkt, key) — the lsh.py
    # 'window' idiom (r6, guide §2.4): one exchange + sorted pass annotates
    # each key row in place, replacing the groupBy + equi-join shape (two
    # consumers of the keys frame and an extra shuffle). The window's
    # (dbkt, key) hash partitioning and sort order are exactly what the
    # pairwise self-join below needs, so the join adds no exchange and no
    # re-sort.
    from pyspark.sql import Window

    w = Window.partitionBy(*grp)
    cold = keys.withColumn("grp_n", F.count(F.lit(1)).over(w)).filter(
        F.col("grp_n").between(2, key_group_cap)
    )
    a = cold.select(*grp, F.col("clip_id").alias("a"))
    b = cold.select(*grp, F.col("clip_id").alias("b"))
    cand = (
        a.join(b, grp)
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.countDistinct("key").alias("shared_keys"))
        .filter(F.col("shared_keys") >= min_shared_keys)
        .select("a", "b")
    )
    fa = fps.select(F.col("clip_id").alias("a"), F.col("fps").alias("fps_a"))
    fb = fps.select(F.col("clip_id").alias("b"), F.col("fps").alias("fps_b"))
    out = cand.join(fa, "a").join(fb, "b").select("a", "b", "fps_a", "fps_b")
    from simhash_spark.util import track_persisted

    return track_persisted(out, [fps])


def ber_verify(cand, ber_max: float = 0.25):
    """The verify half of ``audio_dup_pairs``: HK bit-error-rate over the
    aligned fingerprint sequences, ENTIRELY JVM-side (zip_with + xor +
    bit_count). Input (a, b, fps_a, fps_b); output (a, b, ber) with
    ber < ``ber_max`` (round 6)."""
    n_cmp = F.least(F.size("fps_a"), F.size("fps_b"))
    bad_bits = F.aggregate(
        F.zip_with(
            F.slice("fps_a", 1, n_cmp),
            F.slice("fps_b", 1, n_cmp),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("ber", bad_bits.cast("double") / (n_cmp * 16).cast("double"))
        .filter(F.col("ber") < ber_max)
        .select("a", "b", F.round("ber", 6).alias("ber"))
    )


def audio_dup_pairs(
    clips,
    ber_max: float = 0.25,
    key_group_cap: int = 2000,
    min_shared_keys: int = 2,
    len_bucket_frames: int = 128,
    metrics_sink=None,
):
    """Audio-content near-dup pairs: (a, b, ber) with a < b — see
    ``audio_dup_candidates`` (sub-fingerprint + duration-bucket LSH) and
    ``ber_verify`` (HK match rule) for the two halves."""
    from simhash_spark.util import track_persisted

    cand = audio_dup_candidates(
        clips,
        key_group_cap=key_group_cap,
        min_shared_keys=min_shared_keys,
        len_bucket_frames=len_bucket_frames,
        metrics_sink=metrics_sink,
    )
    # re-home the candidates' persist handles onto the verified output so
    # releasing()/CheckpointStore.write frees them (ADVICE r2 contract).
    return track_persisted(
        ber_verify(cand, ber_max=ber_max), getattr(cand, "_persisted_deps", [])
    )


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


# ---------------------------------------------------------------------------
# Payload transforms: resample / frame-sample / silence-trim
# (training-data pipeline ops over the audio column — REAL numpy kernels;
# each is a per-row mapInPandas with no shuffle, so at 10^12 rows the cost
# is one Arrow-batched pass per partition)
# ---------------------------------------------------------------------------


def resample_linear(df, target_sr: int):
    """Resample every clip's PCM to ``target_sr`` via linear interpolation
    (np.interp — a real, deterministic resampler; quality caveat vs
    windowed-sinc is documented, not stubbed). Returns the same schema
    with bytes / sr_hz / dur_ms updated; all other columns pass through.
    """
    from simhash_spark.sources.synth import wav_bytes

    cols = [f.name for f in df.schema.fields]

    def op(batches):
        for pdf in batches:
            out_bytes, out_sr, out_dur = [], [], []
            for raw in pdf["bytes"]:
                sr, x = decode_wav(bytes(raw))
                if len(x) == 0:
                    # empty PCM: np.interp would raise on an empty xp; emit
                    # one zero sample (the never-empty-PCM invariant
                    # trim_silence's all-silent path already keeps).
                    y = np.zeros(1, dtype=np.int16)
                elif sr == target_sr:
                    y = x
                else:
                    n_out = max(1, int(round(len(x) * target_sr / sr)))
                    t_out = np.arange(n_out, dtype=np.float64) * (len(x) - 1) / max(n_out - 1, 1)
                    y = np.interp(t_out, np.arange(len(x), dtype=np.float64), x.astype(np.float64))
                    y = np.clip(np.round(y), -32768, 32767).astype(np.int16)
                out_bytes.append(wav_bytes(y, target_sr))
                out_sr.append(target_sr)
                out_dur.append(int(round(len(y) * 1000 / target_sr)))
            pdf = pdf.copy()
            pdf["bytes"] = out_bytes
            if "sr_hz" in pdf:
                pdf["sr_hz"] = pd.Series(out_sr, index=pdf.index, dtype="int32")
            if "dur_ms" in pdf:
                pdf["dur_ms"] = pd.Series(out_dur, index=pdf.index, dtype="int32")
            yield pdf[cols]

    return df.mapInPandas(op, schema=df.schema)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t0_ms", T.IntegerType()),
        T.StructField("samples", T.ArrayType(T.FloatType())),
    ]
)


def frame_samples(df, frame_ms: int = 25, hop_ms: int | None = None, max_frames: int = 64):
    """Explode each clip into sampled PCM frames — the audio analog of
    video frame-sampling for multimodal training pipelines.

    Frames of ``frame_ms`` every ``hop_ms`` (default: non-overlapping);
    if a clip yields more than ``max_frames``, frames are DETERMINISTICALLY
    strided down to <= max_frames (uniform coverage, no randomness), so a
    pathologically long clip cannot blow up the row count — the cap is the
    same no-silent-surprise bound the LSH stages use, applied row-local.
    Output: (clip_id, frame_idx, t0_ms, samples float[-1, 1]);
    ``frame_idx`` is the ORIGINAL pre-stride frame position (stable across
    different ``max_frames`` settings — joins on it stay aligned), so after
    capping the emitted indices are a strided subset, not 0..n.
    """
    hop = hop_ms if hop_ms is not None else frame_ms

    def op(batches):
        for pdf in batches:
            ids, idxs, t0s, frames = [], [], [], []
            for cid, raw in zip(pdf["clip_id"], pdf["bytes"]):
                sr, x = decode_wav(bytes(raw))
                flen = max(1, int(sr * frame_ms / 1000))
                fhop = max(1, int(sr * hop / 1000))
                starts = np.arange(0, max(len(x) - flen + 1, 1), fhop)
                orig_idx = np.arange(len(starts))
                if len(starts) > max_frames:
                    stride = int(np.ceil(len(starts) / max_frames))
                    starts = starts[::stride]
                    orig_idx = orig_idx[::stride]
                for k, s0 in zip(orig_idx.tolist(), starts):
                    ids.append(cid)
                    idxs.append(k)
                    t0s.append(int(s0 * 1000 / sr))
                    frames.append((x[s0 : s0 + flen].astype(np.float32) / 32768.0))
            yield pd.DataFrame(
                {
                    "clip_id": ids,
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "t0_ms": pd.Series(t0s, dtype="int32"),
                    "samples": frames,
                }
            )

    return df.select("clip_id", "bytes").mapInPandas(op, schema=_FRAME_SCHEMA)


def trim_silence(df, threshold_db: float = -40.0):
    """Trim leading/trailing silence (|x| below ``threshold_db`` dBFS).
    Returns the input schema plus trimmed_lead_ms / trimmed_tail_ms; a
    fully-silent clip keeps one sample (never emits empty PCM). bytes /
    dur_ms are updated; transcript and everything else pass through."""
    from simhash_spark.sources.synth import wav_bytes

    cols = [f.name for f in df.schema.fields]
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("trimmed_lead_ms", T.IntegerType()),
            T.StructField("trimmed_tail_ms", T.IntegerType()),
        ]
    )
    amp = 32767.0 * (10.0 ** (threshold_db / 20.0))

    def op(batches):
        for pdf in batches:
            out_bytes, out_dur, lead, tail = [], [], [], []
            for raw in pdf["bytes"]:
                sr, x = decode_wav(bytes(raw))
                if len(x) == 0:
                    # empty PCM: x[0:1] would be empty and the tail math
                    # negative — emit one zero sample, nothing trimmed.
                    x = np.zeros(1, dtype=np.int16)
                above = np.nonzero(np.abs(x.astype(np.float64)) >= amp)[0]
                if len(above) == 0:
                    i0, i1 = 0, 1
                else:
                    i0, i1 = int(above[0]), int(above[-1]) + 1
                y = x[i0:i1]
                out_bytes.append(wav_bytes(y, sr))
                out_dur.append(int(round(len(y) * 1000 / sr)))
                lead.append(int(i0 * 1000 / sr))
                tail.append(int((len(x) - i1) * 1000 / sr))
            pdf = pdf.copy()
            pdf["bytes"] = out_bytes
            if "dur_ms" in pdf:
                pdf["dur_ms"] = pd.Series(out_dur, index=pdf.index, dtype="int32")
            pdf["trimmed_lead_ms"] = pd.Series(lead, index=pdf.index, dtype="int32")
            pdf["trimmed_tail_ms"] = pd.Series(tail, index=pdf.index, dtype="int32")
            yield pdf[cols + ["trimmed_lead_ms", "trimmed_tail_ms"]]

    return df.mapInPandas(op, schema=out_schema)
