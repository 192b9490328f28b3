"""Reference-encoder tests: golden vectors + properties (SURVEY.md §5.2
items 1-2). No Spark involved."""

import json
import os

import numpy as np
import pytest

from simhash_spark import config as C
from simhash_spark import reference as R

GOLDEN = os.path.join(os.path.dirname(__file__), "vectors", "golden.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def test_golden_semantics_fingerprint(golden):
    sem = {k: v for k, v in C.SEMANTICS.items()}
    assert golden["semantics"] == json.loads(json.dumps(sem)), (
        "pinned config changed — regenerate tests/vectors/golden.json deliberately"
    )


def test_golden_normalize(golden):
    for v in golden["vectors"]:
        assert R.normalize_text(v["text"]) == v["norm"]


def test_golden_simhash_exact(golden):
    texts = [v["text"] for v in golden["vectors"]]
    sigs = R.simhash64_batch(texts)
    for v, s in zip(golden["vectors"], sigs):
        assert int(s) == v["simhash64"], v["text"][:40]


def test_golden_minhash_exact(golden):
    texts = [v["text"] for v in golden["vectors"]]
    mh = R.minhash_batch(texts)
    for v, row in zip(golden["vectors"], mh):
        assert [int(x) for x in row[:8]] == v["minhash8"], v["text"][:40]


def test_golden_pairs(golden):
    for p in golden["pairs"]:
        sa, sb = R.simhash64(p["a"]), R.simhash64(p["b"])
        assert R.hamming64(sa, sb) == p["hamming"]
        j = R.jaccard(R.normalize_text(p["a"]), R.normalize_text(p["b"]))
        assert abs(j - p["jaccard"]) < 1e-9


def test_simhash_deterministic_and_self_zero():
    texts = ["hello world", "", "a b c", "東京 tower"]
    s1, s2 = R.simhash64_batch(texts), R.simhash64_batch(texts)
    assert (s1 == s2).all()
    assert all(R.hamming64(int(a), int(a)) == 0 for a in s1)


def test_edit_distance_moves_hamming_boundedly():
    base = " ".join(f"tok{i}" for i in range(60))
    one = base.replace("tok30", "tokXX")
    many = " ".join(
        (f"zz{i}" if i % 3 == 0 else f"tok{i}") for i in range(60)
    )
    d1 = R.hamming64(R.simhash64(base), R.simhash64(one))
    dm = R.hamming64(R.simhash64(base), R.simhash64(many))
    assert d1 <= 6  # single-token edit barely moves a long doc's signature
    assert d1 < dm  # heavier edit moves it further


def test_jaccard_symmetric_and_bounds():
    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(50)]
    for _ in range(20):
        a = " ".join(rng.choice(vocab, 20))
        b = " ".join(rng.choice(vocab, 20))
        na, nb = R.normalize_text(a), R.normalize_text(b)
        j1, j2 = R.jaccard(na, nb), R.jaccard(nb, na)
        assert j1 == j2
        assert 0.0 <= j1 <= 1.0
        assert R.jaccard(na, na) == 1.0


def test_banding_pigeonhole_exhaustive():
    """Any pair with hamming <= HAM_D shares >= 1 of the SIM_BLOCKS
    blocks — exhaustively over random base sigs x all <=3-bit flips."""
    rng = np.random.default_rng(7)
    bases = rng.integers(0, 2**63, size=20, dtype=np.int64)
    for sig in bases:
        flips = [()]
        flips += [(i,) for i in range(0, 64, 7)]
        flips += [(i, (i + 13) % 64) for i in range(0, 64, 9)]
        flips += [(i, (i + 11) % 64, (i + 37) % 64) for i in range(0, 64, 11)]
        for fl in flips:
            other = np.int64(sig)
            for bit in fl:
                other = np.int64(np.uint64(other) ^ (np.uint64(1) << np.uint64(bit)))
            ka = R.simhash_table_keys(np.array([sig]))[0]
            kb = R.simhash_table_keys(np.array([other]))[0]
            assert (ka == kb).any(), (sig, fl)


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(3)
    vocab = [f"word{i}" for i in range(200)]
    errs = []
    for _ in range(30):
        ta = " ".join(rng.choice(vocab, 30))
        cut = rng.integers(30, len(ta))
        tb = ta[:cut] + " " + " ".join(rng.choice(vocab, 8))
        m = R.minhash_batch([ta, tb])
        est = (m[0] == m[1]).mean()
        true = R.jaccard(R.normalize_text(ta), R.normalize_text(tb))
        errs.append(abs(est - true))
    assert np.mean(errs) < 0.06


def test_minhash_band_collision_iff_equal_rows():
    m = R.minhash_batch(["abcdefgh ijklmnop", "abcdefgh ijklmnop", "zzzz yyyy xxxx"])
    bh = R.minhash_band_hashes(m)
    assert (bh[0] == bh[1]).all()
    assert not (bh[0] == bh[2]).any()


def test_substring_grams_alignment_free():
    core = "this shared span is definitely longer than sixty four characters in total yes"
    assert len(core) >= C.SUBSTR_MIN_LEN
    a = "prefix one two three " + core
    b = "x " + core + " completely different suffix content"
    ga = R.substring_grams(R.normalize_text(a))
    gb = R.substring_grams(R.normalize_text(b))
    assert len(np.intersect1d(ga, gb)) >= 1


def test_substring_contained_rule():
    core = "c" * 70
    assert R.substring_contained(core, "xx " + core + " yy")
    assert not R.substring_contained("short", "contains short inside")  # < 64 chars


def test_empty_and_none_inputs():
    sigs = R.simhash64_batch(["", None, "   ", "\t"])
    assert (sigs == 0).all()
    mh = R.minhash_batch(["", None])
    assert (mh == C.MINHASH_EMPTY).all()


def test_brute_force_pairs_small():
    long = " ".join(f"word{i}" for i in range(40))
    texts = [
        long,
        long,                                  # exact dup of 0
        long.replace("word20", "wordXX"),      # near dup of 0
        "totally different unrelated words here",
        "",
        "",
    ]
    pairs = R.brute_force_dup_pairs(texts)
    assert (0, 1) in pairs
    assert (0, 2) in pairs
    assert (4, 5) in pairs
    assert not any(3 in p for p in pairs)


def test_sdr_parity_mode():
    """Reference-default SDR mode: 600 wide, exactly 120 active,
    deterministic, similar docs overlap more (htm.core encoder
    properties, SimHashDocumentEncoderTest.cpp upstream, public)."""
    a = R.sdr_encode("the quick brown fox jumps over the lazy dog")
    a2 = R.sdr_encode("the quick brown fox jumps over the lazy dog")
    b = R.sdr_encode("the quick brown fox jumps over the lazy dogs")
    c = R.sdr_encode("completely different content about something else")
    assert len(a) == C.SDR_ACTIVE_BITS
    assert (a == a2).all()
    near = len(np.intersect1d(a, b))
    far = len(np.intersect1d(a, c))
    assert near > far
    assert len(R.sdr_encode("")) == C.SDR_ACTIVE_BITS  # all-zero votes: ties -> first 120
