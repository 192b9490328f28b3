"""Audio column functions: WAV roundtrip, SNR, features, stub gating."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from simhash_spark.functions.audio import (
    audio_features,
    audio_snr_udf,
    snr_db,
    transcode,
)
from simhash_spark.sources.synth import decode_wav, make_clips, wav_bytes


def test_wav_roundtrip():
    rng = np.random.default_rng(0)
    samples = (rng.normal(0, 0.2, 1600) * 32767).astype(np.int16)
    raw = wav_bytes(samples, 16000)
    sr, out = decode_wav(raw)
    assert sr == 16000
    assert np.array_equal(out, samples)


def test_snr_semantics():
    a = np.array([1000, -1000, 500], dtype=np.int16)
    assert snr_db(a, a) == float("inf")
    noisy = a + np.array([10, -10, 5], dtype=np.int16)
    v = snr_db(a, noisy)
    assert 30 < v < 60
    assert snr_db(a, np.array([1, 2], dtype=np.int16)) == float("-inf")


def test_audio_snr_udf_identity_and_corrupt(spark):
    clips_pd, _ = make_clips(20, seed=1)
    df = spark.createDataFrame(clips_pd[["clip_id", "bytes"]])
    same = df.select(audio_snr_udf("bytes", "bytes").alias("snr"))
    assert all(r.snr >= 1e9 for r in same.collect())
    corrupt = df.withColumn("b2", F.lit(b"not a wav"))
    bad = corrupt.select(audio_snr_udf("bytes", "b2").alias("snr"))
    assert all(r.snr == float("-inf") for r in bad.collect())


def test_audio_features_real_compute(spark):
    clips_pd, _ = make_clips(30, seed=2)
    df = spark.createDataFrame(clips_pd[["clip_id", "bytes"]])
    feats = audio_features(df).collect()
    assert len(feats) == 30
    for r in feats:
        assert r.sr_hz in (8000, 16000, 44100)
        assert r.n_samples > 0
        assert 0.0 < r.rms < 1.0
        assert 0.0 < r.peak <= 1.0
        assert len(r.frame_energy) == 16
        assert all(e >= 0 for e in r.frame_energy)


def test_audio_features_keep_samples_is_the_decode(spark):
    """The keep_samples audit hook must emit EXACTLY the decoded int16
    PCM (the oracle gate re-derives rms/zcr/n_samples from it — a
    resampled/clipped/re-scaled copy would make that audit circularly
    pass on wrong features)."""
    from simhash_spark.sources.synth import decode_wav

    clips_pd, _ = make_clips(5, seed=11)
    df = spark.createDataFrame(clips_pd[["clip_id", "bytes"]])
    feats = {r.clip_id: r for r in audio_features(df, keep_samples=True).collect()}
    default_cols = set(audio_features(df).columns)
    assert "samples" not in default_cols  # pipelines keep the narrow row
    for cid, raw in zip(clips_pd["clip_id"], clips_pd["bytes"]):
        _, s = decode_wav(bytes(raw))
        r = feats[cid]
        assert r.samples == s.tolist()
        assert r.n_samples == len(s)


def test_transcode_stub_gated(spark):
    clips_pd, _ = make_clips(5, seed=3)
    df = spark.createDataFrame(clips_pd)
    stub = transcode(df, "opus")
    assert stub.schema == df.schema  # Spark plumbing is real
    with pytest.raises(Exception, match="NotImplementedError|codec library"):
        stub.collect()  # the kernel is honestly absent


def test_audio_fingerprint_gain_invariant_noise_robust():
    import numpy as np

    from simhash_spark.functions.audio import audio_fingerprint_kernel
    from simhash_spark.sources.synth import decode_wav, wav_bytes

    rng = np.random.default_rng(9)
    clips_pd, _ = make_clips(3, seed=9, dur_ms_range=(800, 1200))
    sr, s = decode_wav(bytes(clips_pd["bytes"][0]))
    fp = audio_fingerprint_kernel(sr, s)
    assert len(fp) > 10 and fp.dtype == np.uint32

    # exact gain invariance: scaling PCM leaves every bit unchanged
    sr2, s_half = decode_wav(wav_bytes((s * 0.5).astype(np.int16), sr))
    assert (audio_fingerprint_kernel(sr2, s_half) == fp).all()

    # small additive noise flips few bits (BER << match threshold)
    noisy = (s + rng.normal(0, 80, len(s))).clip(-32768, 32767).astype(np.int16)
    fp_n = audio_fingerprint_kernel(sr, noisy)
    ber = sum(int(v).bit_count() for v in (fp ^ fp_n)) / (len(fp) * 16)
    assert ber < 0.1


def test_audio_dup_pairs_finds_perturbed_copies(spark):
    import numpy as np

    from simhash_spark.functions.audio import audio_dup_pairs
    from simhash_spark.sources.synth import decode_wav, wav_bytes

    rng = np.random.default_rng(4)
    clips_pd, _ = make_clips(24, seed=4, dur_ms_range=(700, 1500))
    rows = [
        (cid, bytes(raw))
        for cid, raw in zip(clips_pd["clip_id"][:12], clips_pd["bytes"][:12])
    ]
    # perturbed copies of the first three: re-gained + noised -> bytes
    # differ (exact hash misses them), audio content is the same
    planted = set()
    for i in range(3):
        sr, s = decode_wav(rows[i][1])
        pert = (s * 0.82 + rng.normal(0, 60, len(s))).clip(-32768, 32767)
        rows.append((f"pert-{i}", wav_bytes(pert.astype(np.int16), sr)))
        planted.add((rows[i][0], f"pert-{i}"))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    got = {(r.a, r.b) for r in audio_dup_pairs(df).collect()}
    got_norm = {tuple(sorted(p)) for p in got}
    assert {tuple(sorted(p)) for p in planted} <= got_norm
    # no cross-pair between unrelated originals
    originals = {tuple(sorted((x, y))) for x in clips_pd["clip_id"][:12] for y in clips_pd["clip_id"][:12] if x < y}
    assert not (got_norm & originals)


def test_audio_hot_key_drop_is_logged(spark):
    """Over-cap sub-fingerprint groups must be reported to metrics_sink,
    not silently dropped (VERDICT r2 #4 — lsh.py's no-silent-truncation
    rule applies to the audio detector too)."""
    import numpy as np

    from simhash_spark.functions.audio import audio_dup_pairs
    from simhash_spark.sources.synth import make_clips

    clips_pd, _ = make_clips(6, seed=9, dur_ms_range=(900, 1100))
    # six byte-identical copies: every sub-fingerprint group has size 6
    raw = bytes(clips_pd["bytes"][0])
    rows = [(f"copy-{i}", raw) for i in range(6)]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    events = []

    def sink(name, value, **kw):
        events.append((name, value, kw))

    audio_dup_pairs(df, key_group_cap=2, metrics_sink=sink).collect()
    drops = [e for e in events if e[0] == "audio_hot_key_groups_dropped"]
    assert len(drops) == 1
    name, groups, kw = drops[0]
    assert groups > 0 and kw["rows_dropped"] >= groups * 3
    assert kw["cap"] == 2


def test_releasing_frees_direct_consumer_persists(spark):
    """audio_dup_pairs consumed directly (no CheckpointStore.write) must
    have an explicit release path for its internal persists (ADVICE r2)."""
    from simhash_spark.functions.audio import audio_dup_pairs
    from simhash_spark.sources.synth import make_clips
    from simhash_spark.util import releasing

    clips_pd, _ = make_clips(8, seed=3, dur_ms_range=(700, 900))
    rows = [(c, bytes(b)) for c, b in zip(clips_pd["clip_id"], clips_pd["bytes"])]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    base = n_persistent()
    with releasing(audio_dup_pairs(df)) as pairs:
        pairs.collect()
        assert n_persistent() > base  # persists live while consuming
    assert n_persistent() == base  # and are freed on exit


# ---------------------------------------------------------------------------
# spectral shape features
# ---------------------------------------------------------------------------

def test_spectral_kernel_matches_naive_dft():
    """Band powers from the rFFT kernel == a from-definition DFT."""
    from simhash_spark.functions.audio import _spectral_kernel

    rng = np.random.default_rng(0)
    s = rng.normal(0, 3000, 256).astype(np.int16)
    sr, nb = 16000, 8
    bands, _, _, _, _ = _spectral_kernel(sr, s, nb)

    x = s.astype(np.float64) / 32768.0
    n = len(x)
    t = np.arange(n)
    naive = np.array(
        [
            abs(np.sum(x * np.exp(-2j * np.pi * k * t / n))) ** 2
            for k in range(n // 2 + 1)
        ]
    )
    freqs = np.arange(n // 2 + 1) * (sr / n)
    idx = np.minimum((freqs / ((sr / 2.0) / nb)).astype(int), nb - 1)
    expect = np.bincount(idx, weights=naive, minlength=nb)
    assert np.allclose(bands, expect, rtol=1e-6)


def test_spectral_sine_tone_features():
    """A pure 3 kHz tone: dominant band 24 (125 Hz bands at sr 16k),
    centroid/rolloff at that band center, near-zero flatness."""
    from simhash_spark.functions.audio import _spectral_kernel

    sr, f = 16000, 3000.0
    t = np.arange(sr)
    s = (10000 * np.sin(2 * np.pi * f * t / sr)).astype(np.int16)
    bands, cent, roll, flat, dom = _spectral_kernel(sr, s, 64)
    assert dom == 24
    assert abs(cent - 3062.5) < 10.0
    assert roll == pytest.approx(3062.5)
    assert flat < 0.01
    # white noise, by contrast, is near-flat
    rng = np.random.default_rng(1)
    wn = rng.normal(0, 3000, sr).astype(np.int16)
    _, _, _, flat_wn, _ = _spectral_kernel(sr, wn, 64)
    assert flat_wn > 0.5


def test_spectral_scale_invariance_and_guards():
    from simhash_spark.functions.audio import _spectral_kernel

    rng = np.random.default_rng(2)
    s = rng.normal(0, 2000, 4096).astype(np.int16)
    b1, c1, r1, f1, d1 = _spectral_kernel(16000, s, 64)
    b2, c2, r2, f2, d2 = _spectral_kernel(16000, s.astype(np.float64) * 0.5, 64)
    assert (c1, r1, d1) == (c2, r2, d2)  # exact: power-of-two gain
    assert f1 == pytest.approx(f2, rel=1e-6)
    # guards: empty pcm / zero sr -> all-zero features
    assert _spectral_kernel(16000, np.empty(0, dtype=np.int16), 8) == (
        [0.0] * 8, 0.0, 0.0, 0.0, 0)
    assert _spectral_kernel(0, s, 8)[1:] == (0.0, 0.0, 0.0, 0)


def test_spectral_features_spark_decode_fail_guard(spark):
    from simhash_spark.functions.audio import spectral_features

    clips_pd, _ = make_clips(5, seed=3, dur_ms_range=(300, 500))
    rows = [
        (cid, bytes(raw))
        for cid, raw in zip(clips_pd["clip_id"], clips_pd["bytes"])
    ] + [("bad", b"not-a-wav")]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r["clip_id"]: r for r in spectral_features(df).collect()}
    assert len(out) == 6
    bad = out["bad"]
    assert bad["sr_hz"] == 0 and bad["spec_centroid_hz"] == 0.0
    assert bad["dominant_band"] == 0
    good = [r for k, r in out.items() if k != "bad"]
    assert all(r["sr_hz"] > 0 and r["spec_centroid_hz"] > 0 for r in good)
