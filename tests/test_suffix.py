"""Suffix-array kernel + overlap-span detector tests.

Kernel oracle: brute-force sorted-suffix list and difflib's
SequenceMatcher (autojunk off — its longest-match is exact); operator
oracle: planted shared spans with known offsets."""

import difflib
import random

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from simhash_spark.suffix import (
    lcp_kasai,
    lcs_batch,
    longest_common_substring,
    suffix_array,
)


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.int32).astype(np.int64)


@pytest.mark.parametrize(
    "s", ["banana", "mississippi", "aaaa", "ab", "a", "", "abcabcabc", "東京 東京"]
)
def test_suffix_array_matches_brute_sort(s):
    sa = suffix_array(_codes(s))
    assert list(sa) == sorted(range(len(s)), key=lambda i: s[i:])


def test_lcp_matches_brute(s="mississippi"):
    codes = _codes(s)
    sa = suffix_array(codes)
    lcp = lcp_kasai(codes, sa)
    for r in range(1, len(s)):
        x, y = s[sa[r - 1] :], s[sa[r] :]
        n = 0
        while n < min(len(x), len(y)) and x[n] == y[n]:
            n += 1
        assert lcp[r] == n


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc ", max_size=80), st.text(alphabet="abc ", max_size=80))
def test_lcs_matches_difflib(a, b):
    L, oa, ob = longest_common_substring(a, b)
    m = difflib.SequenceMatcher(None, a, b, autojunk=False).find_longest_match(
        0, len(a), 0, len(b)
    )
    assert L == m.size
    if L:
        assert a[oa : oa + L] == b[ob : ob + L]


def test_lcs_planted_span_localized():
    span = "the quick brown fox jumps over the lazy dog " * 2
    a = "x" * 100 + span + "y" * 50
    b = "z" * 7 + span + "w" * 200
    L, oa, ob = longest_common_substring(a, b)
    assert (L, oa, ob) == (len(span), 100, 7)


def test_lcs_batch_shape_and_empties():
    out = lcs_batch(["abc", "", None], ["zabcz", "x", "y"])
    assert out.shape == (3, 3)
    assert out[0][0] == 3 and out[1][0] == 0 and out[2][0] == 0


def test_overlap_span_pairs_finds_and_localizes(spark):
    from simhash_spark.operators.overlap import overlap_span_pairs

    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz "

    def rand_text(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    span = rand_text(300)  # >> min_len; winnowing misses are negligible
    rows = [
        (0, rand_text(200) + span + rand_text(100)),  # pair (0,1): mid-text overlap
        (1, rand_text(50) + span + rand_text(400)),
        (2, rand_text(500)),  # unrelated
        (3, rand_text(500)),  # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): r
        for r in overlap_span_pairs(docs, min_len=64, partitions=4).collect()
    }
    assert set(got) == {(0, 1)}
    r = got[(0, 1)]
    # offsets index the NORMALIZED texts (normalize collapses the double
    # spaces random flanks can produce, shifting raw offsets).
    from simhash_spark.reference import normalize_text

    assert r["overlap_len"] >= len(normalize_text(span)) - 2  # edge ws may merge
    na, nb = normalize_text(rows[0][1]), normalize_text(rows[1][1])
    assert (
        na[r["off_a"] : r["off_a"] + r["overlap_len"]]
        == nb[r["off_b"] : r["off_b"] + r["overlap_len"]]
    )


def test_overlap_hot_gram_dropped_with_metrics(spark):
    from simhash_spark.operators.overlap import overlap_span_pairs

    # one 100-char block shared verbatim by ALL 30 docs -> its grams
    # exceed gram_cap=10 and are dropped (logged), so no pairs survive.
    block = "shared boilerplate header that appears in every document " * 3
    docs = spark.createDataFrame(
        [(i, block + f" unique tail {i}") for i in range(30)],
        "doc_id long, text string",
    )
    events = []

    def sink(metric, value, **kw):
        events.append((metric, value, kw))

    out_df = overlap_span_pairs(
        docs, min_len=64, gram_cap=10, partitions=4, metrics_sink=sink
    )
    out = out_df.collect()
    # drop accounting rides the collect pass (deferred Observation, r6);
    # direct consumers flush explicitly.
    from simhash_spark.util import flush_deferred_metrics

    flush_deferred_metrics(out_df)
    assert out == []
    (name, groups, kw), = [e for e in events if e[0] == "overlap_hot_grams_dropped"]
    assert groups > 0 and kw["rows"] >= groups * 30 and kw["cap"] == 10


# ---------------------------------------------------------------------------
# rolling-hash screen (lcs_batch min_len fast path)
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.tuples(st.text("abc ", max_size=40), st.text("abc ", max_size=40)),
        max_size=12,
    ),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=60, deadline=None)
def test_shares_gram_batch_matches_lcs_threshold(pairs, L):
    from simhash_spark.suffix import shares_gram_batch

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = shares_gram_batch(a, b, L)
    want = [longest_common_substring(x, y)[0] >= L for x, y in pairs]
    assert list(got) == want


def test_lcs_batch_screened_equals_unscreened_above_min_len():
    import pandas as pd

    rng = random.Random(5)
    base = "the common planted run that is quite long indeed " * 3
    pairs = []
    for k in range(50):
        fill_a = "".join(rng.choice("xyz ") for _ in range(rng.randrange(200)))
        fill_b = "".join(rng.choice("uvw ") for _ in range(rng.randrange(200)))
        if k % 5 == 0:  # planted >= 64-char shared run
            pairs.append((fill_a + base + fill_a, fill_b + base))
        else:  # disjoint alphabets -> LCS is tiny (spaces only)
            pairs.append((fill_a, fill_b))
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    full = lcs_batch(a, b)
    screened = lcs_batch(a, b, min_len=64)
    for k in range(len(pairs)):
        if full[k, 0] >= 64:
            assert tuple(screened[k]) == tuple(full[k])
        else:
            assert tuple(screened[k]) == (0, -1, -1)
    assert (full[:, 0] >= 64).sum() == 10  # the planted fifth


@given(
    st.text("abcd ", min_size=0, max_size=120),
    st.text("efgh ", min_size=0, max_size=120),
    st.text("abcdefgh ", min_size=64, max_size=100),
)
@settings(max_examples=40, deadline=None)
def test_winnowed_fingerprints_guarantee(pre_a, pre_b, run):
    """Winnowing guarantee: any two texts sharing a >= 64-char run share
    a fingerprint at (w_gram=32, w_win=33); disjoint-alphabet texts
    share none."""
    from simhash_spark.reference import winnowed_fingerprints_batch

    a, b = pre_a + run, run + pre_b
    fa, fb, fpa, fpb = winnowed_fingerprints_batch(
        [a, b, pre_a, pre_b], 32, 33
    )
    assert len(np.intersect1d(fa, fb)) >= 1  # shared run -> shared fp
    if pre_a and pre_b:  # disjoint alphabets (no space collision > 31)
        short_a = pre_a.replace(" ", "x")
        short_b = pre_b.replace(" ", "y")
        ga, gb = winnowed_fingerprints_batch([short_a * 3, short_b * 3], 32, 33)
        assert len(np.intersect1d(ga, gb)) == 0
