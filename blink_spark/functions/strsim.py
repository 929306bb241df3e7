"""Vectorized string-similarity kernels for the stage-2 pair scorer.

The reference's stage 2 is a cross-encoder BERT scoring each
(mention, candidate) pair (``blink/crossencoder/crossencoder.py:135-144``);
the yc-song fork proves a cheap pair scorer over precomputed features is an
accepted substitute (MLP reranker, ``blink/crossencoder/mlp.py:98-140``).
Our scorer follows that fork's shape: a fixed feature blend of

* Jaro-Winkler similarity        (implemented here, numpy-assisted)
* Levenshtein ratio              (banded DP, numpy row-vectorized)
* token-shingle Jaccard          (exact, via np.intersect1d on hashes)
* cosine over hashed n-gram vecs (dot of L2-normalized vectors)

No external fuzzy-matching deps (rapidfuzz/jellyfish are not available in
this environment); everything below is stdlib + numpy and deterministic.
"""

from __future__ import annotations

import numpy as np


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity of two strings (0..1)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    a1 = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    a2 = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    used2 = np.zeros(len2, dtype=bool)
    m1_idx = []
    m2_idx = []
    for i in range(len1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        window = a2[lo:hi]
        cand = np.nonzero((window == a1[i]) & ~used2[lo:hi])[0]
        if len(cand):
            j = lo + cand[0]
            used2[j] = True
            m1_idx.append(i)
            m2_idx.append(j)
    m = len(m1_idx)
    if m == 0:
        return 0.0
    # transpositions: matched chars of s2 in the order they were matched in s1
    s2_matched_order = a2[np.sort(np.array(m2_idx))]
    s1_matched = a1[np.array(m1_idx)]
    t = int(np.count_nonzero(s1_matched != s2_matched_order)) // 2
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler similarity (0..1) with the standard 0.1 prefix boost."""
    j = jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for c1, c2 in zip(s1[:max_prefix], s2[:max_prefix]):
        if c1 != c2:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


def levenshtein_ratio(s1: str, s2: str, max_len: int = 512) -> float:
    """Normalized Levenshtein similarity ``1 - dist/max(len)`` (0..1).

    Row-vectorized DP (numpy per row) — O(len1) numpy ops instead of
    O(len1*len2) Python ops. Inputs capped at ``max_len`` chars: at ER
    scale the scorer runs on bounded text prefixes anyway.
    """
    s1, s2 = s1[:max_len], s2[:max_len]
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    if len1 < len2:  # iterate over the shorter string's rows
        s1, s2, len1, len2 = s2, s1, len2, len1
    a2 = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len2 + 1, dtype=np.int32)
    cur = np.empty(len2 + 1, dtype=np.int32)
    for i, ch in enumerate(s1):
        cur[0] = i + 1
        sub = prev[:-1] + (a2 != np.uint32(ord(ch)))
        ins = prev[1:] + 1
        np.minimum(sub, ins, out=cur[1:])
        # deletion needs a sequential scan; numpy minimum.accumulate trick:
        dele = np.minimum.accumulate(cur[1:] - np.arange(1, len2 + 1, dtype=np.int32))
        np.minimum(cur[1:], dele + np.arange(2, len2 + 2, dtype=np.int32) - 1, out=cur[1:])
        prev, cur = cur, prev
    dist = int(prev[len2])
    return 1.0 - dist / max(len1, len2)


def jaccard(h1: np.ndarray, h2: np.ndarray) -> float:
    """Exact Jaccard of two deduped uint64 hash sets."""
    n1, n2 = len(h1), len(h2)
    if n1 == 0 and n2 == 0:
        return 1.0
    if n1 == 0 or n2 == 0:
        return 0.0
    inter = len(np.intersect1d(h1, h2, assume_unique=True))
    return inter / (n1 + n2 - inter)


def jaccard_sorted(h1: np.ndarray, h2: np.ndarray) -> float:
    """Exact Jaccard of two deduped SORTED uint64 hash sets.

    Single ``searchsorted`` merge of the smaller into the larger —
    cheaper than :func:`jaccard`'s concat+sort when inputs are already
    sorted (they are: shingle sets come out of ``np.unique``).
    """
    n1, n2 = len(h1), len(h2)
    if n1 == 0 and n2 == 0:
        return 1.0
    if n1 == 0 or n2 == 0:
        return 0.0
    if n1 < n2:
        h1, h2 = h2, h1
    idx = np.searchsorted(h1, h2)
    valid = idx < h1.size
    inter = int(np.count_nonzero(h1[idx[valid]] == h2[valid]))
    return inter / (n1 + n2 - inter)


def cosine(v1: np.ndarray, v2: np.ndarray) -> float:
    """Cosine of two L2-normalized float vectors (safe on zero vectors)."""
    d = float(np.dot(v1, v2))
    # inputs are pre-normalized; still guard against drift
    return max(-1.0, min(1.0, d))
