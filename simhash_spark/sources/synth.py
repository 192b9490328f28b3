"""Deterministic synthetic clips corpus with planted duplicate clusters.

Implements FIXTURES.md §1: the flagship input table
``clips(clip_id, bytes, sr_hz, dur_ms, codec, transcript)`` plus the
side table ``truth_pairs(a, b, kind)`` that the pipeline never reads.
Everything is seeded — same (seed, n) => byte-identical corpus.

Audio is real PCM s16le WAV (RIFF container written with struct; decoded
with numpy.frombuffer — no external codec libs), so the decoded-PCM
SNR >= 30 dB invariant is checkable with stdlib+numpy only.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

_VOCAB_SIZE = 2000
_UNICODE_WORDS = ["naïve", "café", "übung", "東京", "привет", "ñandú", "açaí", "θεωρία"]


def _make_vocab(rng: np.random.Generator) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = []
    for _ in range(_VOCAB_SIZE):
        ln = int(rng.integers(2, 10))
        vocab.append("".join(rng.choice(letters, ln)))
    return vocab


def wav_bytes(samples: np.ndarray, sr: int) -> bytes:
    """PCM s16le mono WAV container (44-byte RIFF header + data)."""
    data = samples.astype("<i2").tobytes()
    n = len(data)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
    )
    return hdr + data


def decode_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """Parse the PCM s16le mono WAV produced by wav_bytes -> (sr, samples)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    sr = struct.unpack("<I", raw[24:28])[0]
    data_len = struct.unpack("<I", raw[40:44])[0]
    samples = np.frombuffer(raw[44 : 44 + data_len], dtype="<i2")
    return sr, samples


def _synth_audio(rng: np.random.Generator, sr: int, dur_ms: int) -> bytes:
    n = max(1, int(sr * dur_ms / 1000))
    t = np.arange(n, dtype=np.float64) / sr
    sig = np.zeros(n)
    for _ in range(int(rng.integers(2, 5))):
        f = rng.uniform(80.0, 2000.0)
        a = rng.uniform(0.05, 0.25)
        sig += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    sig += rng.normal(0, 0.01, n)
    sig = np.clip(sig, -0.8, 0.8)
    return wav_bytes((sig * 32767).astype(np.int16), sr)


def _transcript(rng: np.random.Generator, vocab: list[str]) -> str:
    n_words = int(rng.integers(5, 81))
    words = list(rng.choice(vocab, n_words))
    if rng.random() < 0.02:  # unicode rows ~2%
        pos = int(rng.integers(0, len(words)))
        words[pos] = _UNICODE_WORDS[int(rng.integers(0, len(_UNICODE_WORDS)))]
    if rng.random() < 0.3:  # punctuation sprinkle
        pos = int(rng.integers(0, len(words)))
        words[pos] = words[pos] + rng.choice([",", ".", "!", "?"])
    return " ".join(words)


def _char_edit(rng: np.random.Generator, text: str, n_edits: int) -> str:
    chars = list(text)
    for _ in range(n_edits):
        if not chars:
            break
        op = rng.choice(["sub", "ins", "del"])
        pos = int(rng.integers(0, len(chars)))
        c = chr(int(rng.integers(ord("a"), ord("z") + 1)))
        if op == "sub":
            chars[pos] = c
        elif op == "ins":
            chars.insert(pos, c)
        else:
            del chars[pos]
    return "".join(chars)


def _token_edit(rng: np.random.Generator, text: str, vocab: list[str], n_edits: int) -> str:
    words = text.split()
    for _ in range(n_edits):
        if len(words) < 2:
            break
        pos = int(rng.integers(0, len(words)))
        if rng.random() < 0.5:
            words[pos] = vocab[int(rng.integers(0, len(vocab)))]
        else:
            del words[pos]
    return " ".join(words)


def make_clips(
    n: int,
    seed: int = 42,
    dur_ms_range: tuple[int, int] = (500, 3000),
    id_offset: int = 0,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build (clips, truth_pairs) pandas frames.

    Row mix per FIXTURES.md §1: ~5% exact dups, ~5% char-level near dups,
    ~5% token-level near dups, ~3% substring dups, ~2% hot-band adversary
    (shared one-word transcripts), remainder singletons. ``n`` counts
    TOTAL rows (base + planted). ``id_offset`` shifts the numeric part of
    every clip_id so independently generated shards (sharded writer
    below) stay globally unique.
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = _make_vocab(rng)

    n_exact = max(1, int(n * 0.05))
    n_char = max(1, int(n * 0.05))
    n_token = max(1, int(n * 0.05))
    n_sub = max(1, int(n * 0.03))
    n_hot = max(2, int(n * 0.02))
    n_base = n - (n_exact + n_char + n_token + n_sub + n_hot)
    if n_base < 5:  # tiny corpora: all-base, no planted dups
        n_exact = n_char = n_token = n_sub = n_hot = 0
        n_base = n

    rows: list[dict] = []
    truth: list[tuple[str, str, str]] = []

    def add_row(i: int, transcript: str, raw: bytes | None, sr: int, dur: int) -> str:
        cid = f"clip-{i + id_offset:010d}"
        if raw is None:
            raw = _synth_audio(rng, sr, dur)
        rows.append(
            dict(
                clip_id=cid,
                bytes=raw,
                sr_hz=sr,
                dur_ms=dur,
                codec="pcm_s16le",
                transcript=transcript,
            )
        )
        return cid

    def rand_sr() -> int:
        r = rng.random()
        return 16000 if r < 0.9 else (8000 if r < 0.95 else 44100)

    idx = 0
    base_ids: list[str] = []
    for _ in range(n_base):
        sr, dur = rand_sr(), int(rng.integers(dur_ms_range[0], dur_ms_range[1] + 1))
        base_ids.append(add_row(idx, _transcript(rng, vocab), None, sr, dur))
        idx += 1

    base_by_id = {r["clip_id"]: r for r in rows}

    def pick_base() -> dict:
        return base_by_id[base_ids[int(rng.integers(0, len(base_ids)))]]

    for _ in range(n_exact):
        src = pick_base()
        cid = add_row(idx, src["transcript"], src["bytes"], src["sr_hz"], src["dur_ms"])
        truth.append((src["clip_id"], cid, "exact"))
        idx += 1

    for _ in range(n_char):
        src = pick_base()
        t = _char_edit(rng, src["transcript"], int(rng.integers(1, 4)))
        cid = add_row(idx, t, src["bytes"], src["sr_hz"], src["dur_ms"])
        truth.append((src["clip_id"], cid, "char"))
        idx += 1

    for _ in range(n_token):
        src = pick_base()
        t = _token_edit(rng, src["transcript"], vocab, int(rng.integers(1, 3)))
        cid = add_row(idx, t, src["bytes"], src["sr_hz"], src["dur_ms"])
        truth.append((src["clip_id"], cid, "token"))
        idx += 1

    for _ in range(n_sub):
        # embed a >=64-char base transcript verbatim inside a longer one
        src = pick_base()
        while len(" ".join(src["transcript"].split())) < 64:
            src = pick_base()
        pre = " ".join(rng.choice(vocab, int(rng.integers(3, 10))))
        post = " ".join(rng.choice(vocab, int(rng.integers(3, 10))))
        t = f"{pre} {src['transcript']} {post}"
        cid = add_row(idx, t, src["bytes"], src["sr_hz"], src["dur_ms"])
        truth.append((src["clip_id"], cid, "substring"))
        idx += 1

    hot_word = vocab[0]
    hot_first: str | None = None
    for _ in range(n_hot):
        sr, dur = 16000, 500
        cid = add_row(idx, hot_word, None, sr, dur)
        if hot_first is None:
            hot_first = cid
        else:
            truth.append((hot_first, cid, "hot"))
        idx += 1

    clips = pd.DataFrame(rows)
    truth_pairs = pd.DataFrame(truth, columns=["a", "b", "kind"])
    return clips, truth_pairs


def write_clips_parquet(
    out_dir: str, n: int, seed: int = 42, dur_ms_range: tuple[int, int] = (500, 3000)
) -> None:
    """Materialize the corpus to parquet (clips.parquet, truth_pairs.parquet)
    for bench runs — chunked so 10^5-row corpora don't hold all audio in RAM."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(out_dir, exist_ok=True)
    clips, truth = make_clips(n, seed=seed, dur_ms_range=dur_ms_range)
    schema = pa.schema(
        [
            ("clip_id", pa.string()),
            ("bytes", pa.binary()),
            ("sr_hz", pa.int32()),
            ("dur_ms", pa.int32()),
            ("codec", pa.string()),
            ("transcript", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(clips, schema=schema, preserve_index=False),
        os.path.join(out_dir, "clips.parquet"),
        row_group_size=8192,
    )
    pq.write_table(
        pa.Table.from_pandas(truth, preserve_index=False),
        os.path.join(out_dir, "truth_pairs.parquet"),
    )


_CLIPS_SCHEMA_FIELDS = [
    ("clip_id", "string"),
    ("bytes", "binary"),
    ("sr_hz", "int32"),
    ("dur_ms", "int32"),
    ("codec", "string"),
    ("transcript", "string"),
]


def _write_shard(args: tuple) -> int:
    """Worker: generate ONE shard and write it straight to its part file
    (module-level so multiprocessing can pickle it; returns row count)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir, k, shard_rows, seed, dur_ms_range = args
    clips, truth = make_clips(
        shard_rows, seed=seed + k, dur_ms_range=dur_ms_range, id_offset=k * shard_rows
    )
    schema = pa.schema([(n, getattr(pa, t)()) for n, t in _CLIPS_SCHEMA_FIELDS])
    pq.write_table(
        pa.Table.from_pandas(clips, schema=schema, preserve_index=False),
        os.path.join(out_dir, "clips.parquet", f"part-{k:05d}.parquet"),
        row_group_size=8192,
    )
    pq.write_table(
        pa.Table.from_pandas(truth, preserve_index=False),
        os.path.join(out_dir, "truth_pairs.parquet", f"part-{k:05d}.parquet"),
    )
    return len(clips)


def write_clips_parquet_sharded(
    out_dir: str,
    n: int,
    shard_rows: int = 500_000,
    seed: int = 42,
    workers: int = 8,
    dur_ms_range: tuple[int, int] = (500, 3000),
) -> None:
    """Sharded corpus writer for sizes that cannot be held in one pandas
    frame (8M rows ≈ 44 GB of audio bytes). Each FIXED-SIZE shard is an
    independent ``make_clips(shard_rows, seed+k)`` with offset clip_ids,
    written as ``clips.parquet/part-k.parquet`` (a directory Spark reads
    exactly like the single file).

    Fixed shard size is the point: every corpus size has the SAME
    per-shard dup mix and the SAME hot-band group size, so a data-scaling
    series compares corpora that grow by TILING the distribution — the
    way a real 100 TB corpus grows — instead of changing the workload
    shape with n. Cross-shard duplicates don't exist (distinct seeds,
    disjoint vocab draws), matching the per-shard truth tables.

    ``n`` must be a multiple of ``shard_rows``. Shards are generated in
    parallel processes, each streaming straight to its own part file, so
    peak RAM is ``workers × shard_rows`` rows.
    """
    import multiprocessing as mp

    if n % shard_rows:
        raise ValueError(f"n={n} not a multiple of shard_rows={shard_rows}")
    n_shards = n // shard_rows
    os.makedirs(os.path.join(out_dir, "clips.parquet"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "truth_pairs.parquet"), exist_ok=True)
    jobs = [(out_dir, k, shard_rows, seed, dur_ms_range) for k in range(n_shards)]
    # fork, not spawn: workers inherit the loaded module directly (spawn
    # re-imports __main__, which deadlocks under stdin-script callers),
    # and the generator is pure numpy/pandas compute — no JVM/thread
    # state to make fork unsafe.
    with mp.get_context("fork").Pool(min(workers, n_shards)) as pool:
        counts = pool.map(_write_shard, jobs)
    assert sum(counts) == n
