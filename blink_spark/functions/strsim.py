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


def _pad_codepoints(strings: list[str], pad: int) -> tuple[np.ndarray, np.ndarray]:
    """Encode a batch of strings into one padded ``(N, Lmax)`` uint32 matrix.

    ``pad`` must be a codepoint that cannot appear in the data (we use
    distinct sentinels per side so padding never equals padding).
    """
    n = len(strings)
    lens = np.fromiter((len(s) for s in strings), count=n, dtype=np.int64)
    lmax = int(lens.max()) if n else 0
    out = np.full((n, max(lmax, 1)), pad, dtype=np.uint32)
    for i, s in enumerate(strings):
        if s:
            out[i, : lens[i]] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return out, lens


_PAD_A = 0x10FFFE  # non-character codepoints — never appear in real text,
_PAD_B = 0x10FFFF  # and differ from each other so pad never matches pad


def levenshtein_ratio_batch(a: list[str], b: list[str], max_len: int = 512) -> np.ndarray:
    """Batched :func:`levenshtein_ratio`: one masked DP across ALL pairs at
    once — each DP step is a few numpy ops over an ``(N, L2max)`` matrix
    instead of per-pair Python. Identical output to the scalar function
    (asserted in tests).

    Pairs are processed longest-first in bounded chunks so the iteration
    count of a chunk tracks its own longest string, not the batch's.
    """
    n = len(a)
    out = np.zeros(n)
    if n == 0:
        return out
    a = [s[:max_len] for s in a]
    b = [s[:max_len] for s in b]
    la = np.fromiter((len(s) for s in a), count=n, dtype=np.int64)
    lb = np.fromiter((len(s) for s in b), count=n, dtype=np.int64)
    eq = np.fromiter((x == y for x, y in zip(a, b)), count=n, dtype=bool)
    out[eq] = 1.0  # includes both-empty
    todo = np.nonzero(~eq & (la > 0) & (lb > 0))[0]
    # out stays 0.0 where exactly one side is empty
    if len(todo) == 0:
        return out
    # per-pair swap so side1 is the longer (distance is symmetric); then
    # sort longest-first so chunk iteration counts shrink monotonically
    swap = la[todo] < lb[todo]
    s1 = [b[i] if sw else a[i] for i, sw in zip(todo, swap)]
    s2 = [a[i] if sw else b[i] for i, sw in zip(todo, swap)]
    order = np.argsort(-np.fromiter((len(s) for s in s1), count=len(s1), dtype=np.int64), kind="stable")
    s1 = [s1[i] for i in order]
    s2 = [s2[i] for i in order]
    dest = todo[order]
    chunk = 2048
    for c0 in range(0, len(s1), chunk):
        c1 = min(c0 + chunk, len(s1))
        A, l1 = _pad_codepoints(s1[c0:c1], _PAD_A)
        B, l2 = _pad_codepoints(s2[c0:c1], _PAD_B)
        m, l2max = B.shape
        prev = np.broadcast_to(np.arange(l2max + 1, dtype=np.int32), (m, l2max + 1)).copy()
        cur = np.empty_like(prev)
        ar1 = np.arange(1, l2max + 1, dtype=np.int32)
        for i in range(A.shape[1]):
            active = i < l1
            cur[:, 0] = i + 1
            np.minimum(prev[:, :-1] + (B != A[:, i : i + 1]), prev[:, 1:] + 1, out=cur[:, 1:])
            # deletion term via the minimum.accumulate identity (see scalar)
            dele = np.minimum.accumulate(cur[:, 1:] - ar1, axis=1)
            np.minimum(cur[:, 1:], dele + ar1, out=cur[:, 1:])
            # rows already past their own length keep their final DP row
            np.copyto(prev, cur, where=active[:, None])
        dist = prev[np.arange(m), l2]
        out[dest[c0:c1]] = 1.0 - dist / l1
    return out


def jaro_winkler_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Batched :func:`jaro_winkler`: the greedy window-match loop runs once
    over character positions with all pairs advanced in lockstep (masked
    numpy), instead of once per pair. Identical output to the scalar
    function (asserted in tests)."""
    n = len(a)
    out = np.zeros(n)
    if n == 0:
        return out
    la = np.fromiter((len(s) for s in a), count=n, dtype=np.int64)
    lb = np.fromiter((len(s) for s in b), count=n, dtype=np.int64)
    eq = np.fromiter((x == y for x, y in zip(a, b)), count=n, dtype=bool)
    out[eq] = 1.0
    todo = np.nonzero(~eq & (la > 0) & (lb > 0))[0]
    if len(todo) == 0:
        return out
    A, l1 = _pad_codepoints([a[i] for i in todo], _PAD_A)
    B, l2 = _pad_codepoints([b[i] for i in todo], _PAD_B)
    m = len(todo)
    l1max, l2max = A.shape[1], B.shape[1]
    mw = np.maximum(np.maximum(l1, l2) // 2 - 1, 0)
    j_idx = np.arange(l2max)
    used = np.zeros((m, l2max), dtype=bool)
    match_j = np.full((m, l1max), -1, dtype=np.int64)
    rows = np.arange(m)
    for i in range(l1max):
        elig = (
            (B == A[:, i : i + 1])
            & ~used
            & (j_idx[None, :] >= (i - mw)[:, None])
            & (j_idx[None, :] < (i + mw + 1)[:, None])
        )
        j_first = elig.argmax(axis=1)
        has = elig[rows, j_first]
        used[rows[has], j_first[has]] = True
        match_j[has, i] = j_first[has]
    matched = match_j >= 0
    mcount = matched.sum(axis=1)
    # transpositions: s1's matched chars in i order vs s2's matched chars in
    # j order — compact both sides left with a stable argsort on the masks
    order_i = np.argsort(~matched, axis=1, kind="stable")
    s1_comp = np.take_along_axis(np.where(matched, A[:, :l1max], 0), order_i, axis=1)
    sorted_j = np.sort(np.where(matched, match_j, np.iinfo(np.int64).max), axis=1)
    s2_comp = np.where(
        sorted_j < l2max, B[rows[:, None], np.minimum(sorted_j, l2max - 1)], 0
    )
    pos = np.arange(l1max)[None, :]
    t = ((s1_comp != s2_comp) & (pos < mcount[:, None])).sum(axis=1) // 2
    mc = mcount.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j_sim = np.where(mcount > 0, (mc / l1 + mc / l2 + (mc - t) / np.maximum(mc, 1)) / 3.0, 0.0)
    # Winkler prefix boost (≤4 leading equal chars) only above 0.7
    pl = min(4, l1max, l2max)
    pre_eq = (A[:, :pl] == B[:, :pl]) & (np.arange(pl)[None, :] < np.minimum(l1, l2)[:, None])
    prefix = np.cumprod(pre_eq, axis=1).sum(axis=1) if pl else np.zeros(m, dtype=np.int64)
    jw = np.where(j_sim > 0.7, j_sim + prefix * 0.1 * (1.0 - j_sim), j_sim)
    out[todo] = jw
    return out


def jaccard_sorted_batch(sets_a: list[np.ndarray], sets_b: list[np.ndarray]) -> np.ndarray:
    """Batched exact Jaccard over pairs of deduped hash sets.

    One lexsort over the whole batch's elements tagged with their pair id;
    cross-side duplicates (each side is a set, so any within-pair duplicate
    is one-per-side) count the intersection — no per-pair Python. Inputs
    need not be sorted; equality is all that is used.
    """
    n = len(sets_a)
    if n == 0:
        return np.zeros(0)
    sa = np.fromiter((len(s) for s in sets_a), count=n, dtype=np.int64)
    sb = np.fromiter((len(s) for s in sets_b), count=n, dtype=np.int64)
    inter = np.zeros(n, dtype=np.int64)
    if sa.sum() and sb.sum():
        # asarray(int64) is a no-copy view for int64/uint64 ndarray inputs
        # and tolerates plain lists (including empty ones, which would
        # otherwise concatenate as float64)
        keys = np.concatenate(
            [np.asarray(s, dtype=np.int64).view(np.int64) for s in sets_a]
            + [np.asarray(s, dtype=np.int64).view(np.int64) for s in sets_b]
        )
        pids = np.concatenate([np.repeat(np.arange(n), sa), np.repeat(np.arange(n), sb)])
        order = np.lexsort((keys, pids))
        k, p = keys[order], pids[order]
        dup = (k[1:] == k[:-1]) & (p[1:] == p[:-1])
        inter = np.bincount(p[1:][dup], minlength=n)
    union = sa + sb - inter
    return np.where(
        (sa == 0) & (sb == 0), 1.0, np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    )


def cosine(v1: np.ndarray, v2: np.ndarray) -> float:
    """Cosine of two L2-normalized float vectors (safe on zero vectors)."""
    d = float(np.dot(v1, v2))
    # inputs are pre-normalized; still guard against drift
    return max(-1.0, min(1.0, d))
