"""Property-based differential tests for the pure-numpy scoring kernels.

The batch kernels are already differential-tested against their scalar
twins on fixed fixtures (tests/test_hashing.py, tests/test_operators.py);
here hypothesis fuzzes BOTH layers against independent textbook reference
implementations written in plain Python — the reference's analog is its
unit-tested tokenization invariants (``blink/biencoder/data_process.py``
fixture tests). No Spark session needed; the whole module runs in ~seconds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from blink_spark.functions import hashing as H
from blink_spark.functions import strsim

# Realistic text: letters (heavy collision), spaces, punctuation, some
# non-ASCII. Noncharacter codepoints (U+10FFFE/F) are excluded by
# construction — they are not valid text and the pad sentinels rely on it.
_ALPHA = st.characters(min_codepoint=32, max_codepoint=0x2FF)
_TEXT = st.text(alphabet=_ALPHA, max_size=64)
_SMALL = st.text(alphabet="ab ", max_size=24)  # collision-heavy


# -- independent textbook implementations -----------------------------------

def _ref_levenshtein(s1: str, s2: str) -> int:
    """Wagner-Fischer, plain Python."""
    m, n = len(s1), len(s2)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (s1[i - 1] != s2[j - 1]))
            prev = cur
    return dp[n]


def _ref_lev_ratio(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    return 1.0 - _ref_levenshtein(s1, s2) / max(len(s1), len(s2))


def _ref_jaro(s1: str, s2: str) -> float:
    """Standard Jaro: greedy in-window matching + transposition count."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    window = max(max(len1, len2) // 2 - 1, 0)
    used = [False] * len2
    m1, m2 = [], []
    for i, c in enumerate(s1):
        for j in range(max(0, i - window), min(len2, i + window + 1)):
            if not used[j] and s2[j] == c:
                used[j] = True
                m1.append(i)
                m2.append(j)
                break
    m = len(m1)
    if m == 0:
        return 0.0
    s2_in_order = [s2[j] for j in sorted(m2)]
    t = sum(a != b for a, b in zip((s1[i] for i in m1), s2_in_order)) // 2
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def _ref_jaro_winkler(s1: str, s2: str) -> float:
    j = _ref_jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


# -- scalar kernels vs textbook references ----------------------------------

@settings(max_examples=200, deadline=None)
@given(_TEXT, _TEXT)
def test_levenshtein_ratio_matches_textbook(a, b):
    assert strsim.levenshtein_ratio(a, b) == _ref_lev_ratio(a, b)


@settings(max_examples=200, deadline=None)
@given(_SMALL, _SMALL)
def test_levenshtein_ratio_matches_textbook_small_alphabet(a, b):
    assert strsim.levenshtein_ratio(a, b) == _ref_lev_ratio(a, b)


@settings(max_examples=200, deadline=None)
@given(_TEXT, _TEXT)
def test_jaro_matches_textbook(a, b):
    assert strsim.jaro(a, b) == _ref_jaro(a, b)


@settings(max_examples=200, deadline=None)
@given(_SMALL, _SMALL)
def test_jaro_winkler_matches_textbook(a, b):
    assert strsim.jaro_winkler(a, b) == _ref_jaro_winkler(a, b)


@settings(max_examples=150, deadline=None)
@given(_TEXT, _TEXT)
def test_similarity_bounds_identity_symmetry(a, b):
    for fn in (strsim.levenshtein_ratio, strsim.jaro, strsim.jaro_winkler):
        s = fn(a, b)
        assert 0.0 <= s <= 1.0
        assert fn(a, b) == fn(b, a)
        assert fn(a, a) == 1.0


# -- batch kernels vs scalar twins on random batches -------------------------

_PAIRS = st.lists(st.tuples(_SMALL, _TEXT), max_size=24)


@settings(max_examples=60, deadline=None)
@given(_PAIRS)
def test_levenshtein_batch_matches_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = strsim.levenshtein_ratio_batch(a, b)
    want = np.array([strsim.levenshtein_ratio(x, y) for x, y in pairs])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@settings(max_examples=60, deadline=None)
@given(_PAIRS)
def test_jaro_winkler_batch_matches_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = strsim.jaro_winkler_batch(a, b)
    want = np.array([strsim.jaro_winkler(x, y) for x, y in pairs])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


_HASH_SETS = st.lists(
    st.tuples(
        st.lists(st.integers(0, 50), max_size=30),
        st.lists(st.integers(0, 50), max_size=30),
    ),
    max_size=16,
)


@settings(max_examples=60, deadline=None)
@given(_HASH_SETS)
def test_jaccard_batch_matches_set_algebra(pairs):
    sets_a = [np.unique(np.array(p[0], dtype=np.int64)) for p in pairs]
    sets_b = [np.unique(np.array(p[1], dtype=np.int64)) for p in pairs]
    got = strsim.jaccard_sorted_batch(sets_a, sets_b)
    want = []
    for sa, sb in zip(sets_a, sets_b):
        A, B = set(sa.tolist()), set(sb.tolist())
        want.append(1.0 if not A and not B else (len(A & B) / len(A | B) if A | B else 0.0))
    np.testing.assert_allclose(got, np.array(want), rtol=0, atol=0)


# -- hashing kernels ---------------------------------------------------------

_TOKEN_LISTS = st.lists(st.lists(st.text(alphabet="abc", min_size=1, max_size=4), max_size=12), max_size=8)


@settings(max_examples=50, deadline=None)
@given(_TOKEN_LISTS)
def test_token_shingles_batch_matches_scalar(token_lists):
    batch = H.token_shingles_batch(token_lists, k=3)
    for toks, got in zip(token_lists, batch):
        want = H.token_shingles(toks, k=3)
        np.testing.assert_array_equal(np.sort(got), np.sort(want))


@settings(max_examples=50, deadline=None)
@given(st.lists(_TEXT, max_size=8))
def test_simhash_deterministic_and_identity(texts):
    g1 = H.char_ngrams_hashed_batch(texts, n=3)
    g2 = H.char_ngrams_hashed_batch(texts, n=3)
    s1, s2 = H.simhash64(g1), H.simhash64(g2)
    np.testing.assert_array_equal(s1, s2)  # deterministic
    # identical text pairs must be Hamming-0 (the dedup invariant)
    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            if a == b:
                assert int(s1[i]) ^ int(s1[j]) == 0


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(0, 1000), max_size=40), max_size=6))
def test_minhash_equal_sets_equal_signatures(sets):
    mh = H.MinHasher(num_perm=32, seed=7)
    arrs = [np.unique(np.array(s, dtype=np.uint64)) for s in sets]
    sigs_a = mh.signatures(arrs)
    sigs_b = mh.signatures([a.copy() for a in arrs])
    np.testing.assert_array_equal(sigs_a, sigs_b)
    keys = mh.band_keys(sigs_a, bands=8)
    for i in range(len(arrs)):
        for j in range(len(arrs)):
            if np.array_equal(arrs[i], arrs[j]):
                np.testing.assert_array_equal(sigs_a[i], sigs_a[j])
                np.testing.assert_array_equal(keys[i], keys[j])
