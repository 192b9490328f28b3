"""Property-based tests (hypothesis) for the signature kernels — the
invariants the dedup guarantees rest on, checked over generated inputs
rather than fixtures (SURVEY §5 strategy: the reference's tests are
example-based; properties cover the space between examples)."""

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from simhash_spark import config as C
from simhash_spark import reference as R

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=400
)
settings.register_profile("ci", max_examples=60, deadline=None)
settings.load_profile("ci")


@given(TEXT, st.text(alphabet=" \t\n\r", min_size=0, max_size=10))
def test_normalize_whitespace_insensitive(t, pad):
    assert R.normalize_text(pad + t + pad) == R.normalize_text(t)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200))
def test_simhash_case_and_ws_invariant_ascii(t):
    # ASCII only: unicode case pairs (dotless i, ligatures) legitimately
    # diverge under upper->casefold; the engine's invariant is casefold.
    a = R.simhash64(t)
    b = R.simhash64("  " + t.upper() + "\n")
    assert a == b


@given(TEXT, TEXT)
def test_jaccard_symmetric_bounded(a, b):
    na, nb = R.normalize_text(a), R.normalize_text(b)
    jab = R.jaccard_batch([na], [nb])[0]
    jba = R.jaccard_batch([nb], [na])[0]
    assert jab == jba
    assert 0.0 <= jab <= 1.0
    assert R.jaccard_batch([na], [na])[0] == 1.0  # self-similarity


@given(TEXT)
def test_minhash_contains_jaccard_one_identity(t):
    n = R.normalize_text(t)
    s1 = R.minhash_from_norm([n, n])
    assert (s1[0] == s1[1]).all()
    assert s1.shape == (2, C.NUM_PERM)


@given(st.integers(0, (1 << 64) - 1), st.sets(st.integers(0, 63), max_size=C.HAM_D))
def test_manku_tables_pigeonhole(sig_u, flip_bits):
    """ANY signature pair at hamming <= HAM_D shares at least one of the
    C(6,3) table keys — the recall guarantee of the banding scheme,
    checked over random signatures and random <=3-bit corruptions."""
    a = np.array([np.int64(np.uint64(sig_u).astype(np.int64))])
    other = np.uint64(sig_u)
    for bit in flip_bits:
        other ^= np.uint64(1) << np.uint64(bit)
    b = np.array([other.astype(np.int64)])
    ka = R.simhash_table_keys(a)
    kb = R.simhash_table_keys(b)
    assert set(ka.ravel().tolist()) & set(kb.ravel().tolist())


@given(st.lists(TEXT, min_size=0, max_size=8))
@example(["0", "0\x00"])  # pinned: pd.factorize's C-string hash truncates at
# NUL, collapsing '0\x00' into '0' when both share a batch (VERDICT r2 #1)
def test_simhash_batch_matches_scalar(texts):
    """A row's signature must not depend on its batch neighbors (caught
    the reduceat-clipping bug: trailing empty rows truncated the last
    nonempty row's feature sum, AND the factorize NUL collision)."""
    batch = R.simhash64_batch(texts)
    for i, t in enumerate(texts):
        assert int(batch[i]) == R.simhash64(t)


@given(TEXT)
@example("ab ab ab ab x")  # heavy feature repetition
@example("aaaa")  # one token whose 3-shingles overlap and repeat
def test_simhash_occurrence_voting_equals_weighted_unique_voting(t):
    """The kernel votes one ballot per feature OCCURRENCE (no dedup);
    the defined semantics is one ballot per UNIQUE feature weighted by
    its occurrence count (reference.simhash_features). This oracle
    re-derives the signature the slow way — explicit dict of id->count
    over the same span-poly ids, then a per-bit weighted vote in pure
    Python — and must match the kernel exactly (the equivalence the
    dedup-free rewrite rests on)."""
    norm = R.normalize_text(t)
    c, row_start, lens = R._flatten_norms([norm])
    S, pw = R._span_prefix(c)
    trow, ti, tj = R._token_spans(c, row_start)
    grow, gi, gj = R._kgram_spans(row_start, lens, C.CHAR_SHINGLE_K, True)
    ids = np.concatenate(
        [R._span_hash(S, pw, ti, tj), R._span_hash(S, pw, gi, gj)]
    )
    weights: dict[int, int] = {}
    for h in ids.tolist():
        weights[h] = weights.get(h, 0) + 1
    sig = 0
    for bit in range(C.SIG_BITS):
        vote = sum(w if (h >> bit) & 1 else -w for h, w in weights.items())
        if vote > 0:
            sig |= 1 << bit
    want = sig - (1 << 64) if sig >= (1 << 63) else sig
    assert int(R.simhash64_from_norm([norm])[0]) == want


@given(st.lists(TEXT, min_size=0, max_size=6))
def test_minhash_batch_matches_scalar(texts):
    """Same batch-position independence for the minhash kernel."""
    batch = R.minhash_batch(texts)
    for i, t in enumerate(texts):
        assert (batch[i] == R.minhash(t)).all()


@given(TEXT, TEXT)
def test_substring_containment_consistency(a, b):
    na, nb = R.normalize_text(a), R.normalize_text(b)
    got = R.substring_contained(na, nb)
    short, long_ = (na, nb) if len(na) <= len(nb) else (nb, na)
    want = len(short) >= C.SUBSTR_MIN_LEN and short in long_
    assert got == want
