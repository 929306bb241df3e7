"""Unit tests for the deterministic hashing kernels (no Spark needed)."""

import numpy as np
import pytest

from blink_spark.functions import hashing as H
from blink_spark.functions import strsim


def test_stable_hash64_deterministic():
    a = H.stable_hash64(["foo", "bar", "foo"])
    b = H.stable_hash64(["foo", "bar", "foo"])
    assert (a == b).all()
    assert a[0] == a[2] != a[1]
    assert a.dtype == np.uint64


def test_token_shingles_short_text():
    assert len(H.token_shingles(["a"], k=3)) == 1
    assert len(H.token_shingles([], k=3)) == 0
    s = H.token_shingles("a b c d e".split(), k=3)
    assert len(s) == 3  # abc bcd cde
    assert (np.sort(s) == s).all()  # np.unique sorts


def test_minhash_jaccard_estimate():
    """MinHash signature agreement ≈ true Jaccard (within sampling error)."""
    rng = np.random.RandomState(7)
    base = rng.randint(0, 2**63, size=1000).astype(np.uint64)
    # build two sets with known overlap 800/1200 = 2/3
    s1 = np.unique(base)
    s2 = np.unique(np.concatenate([base[:800], rng.randint(0, 2**63, size=400).astype(np.uint64)]))
    true_j = len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))
    mh = H.MinHasher(num_perm=256, seed=1)
    sigs = mh.signatures([s1, s2])
    est = float((sigs[0] == sigs[1]).mean())
    assert abs(est - true_j) < 0.08


def test_minhash_deterministic_across_batching():
    rng = np.random.RandomState(3)
    sets = [np.unique(rng.randint(0, 2**62, size=rng.randint(1, 50)).astype(np.uint64)) for _ in range(20)]
    mh = H.MinHasher(num_perm=64, seed=42)
    all_at_once = mh.signatures(sets)
    one_by_one = np.vstack([mh.signatures([s]) for s in sets])
    assert (all_at_once == one_by_one).all()
    # tiny chunk size → different internal chunking, same output
    chunked = mh.signatures(sets, chunk=17)
    assert (all_at_once == chunked).all()


def test_minhash_empty_set_never_collides():
    mh = H.MinHasher(num_perm=32, seed=42)
    sigs = mh.signatures([np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)])
    keys = mh.band_keys(sigs, bands=8)
    # all-max signatures produce equal keys; pipeline guards by empty-doc filter,
    # here we just assert the signature is the documented sentinel
    assert (sigs == np.iinfo(np.uint64).max).all()
    assert keys.shape == (2, 8)


def test_band_keys_identical_iff_band_matches():
    mh = H.MinHasher(num_perm=64, seed=42)
    rng = np.random.RandomState(5)
    s = np.unique(rng.randint(0, 2**62, size=500).astype(np.uint64))
    sigs = mh.signatures([s, s])
    k = mh.band_keys(sigs, bands=16)
    assert (k[0] == k[1]).all()


def test_simhash_similar_texts_close():
    t1 = "the quick brown fox jumps over the lazy dog many times today"
    t2 = "the quick brown fox jumped over the lazy dog many times today"
    t3 = "completely different content about spark query optimization plans"
    hs = H.simhash64([H.char_ngrams_hashed(t, 3) for t in (t1, t2, t3)])
    def hamming(a, b):
        return bin(int(a) ^ int(b) & 0xFFFFFFFFFFFFFFFF).count("1")
    u = hs.view(np.uint64)
    assert hamming(u[0], u[1]) < hamming(u[0], u[2])


def test_hashed_ngram_vector_normalized_and_deterministic():
    v1 = H.hashed_ngram_vector("hello world", dim=128)
    v2 = H.hashed_ngram_vector("hello world", dim=128)
    assert np.allclose(v1, v2)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5
    assert H.hashed_ngram_vector("", dim=128).sum() == 0


# ---- string similarity ----------------------------------------------------

def test_jaro_winkler_known_values():
    assert strsim.jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-3)
    assert strsim.jaro("DWAYNE", "DUANE") == pytest.approx(0.8222, abs=1e-3)
    assert strsim.jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-3)
    assert strsim.jaro_winkler("same", "same") == 1.0
    assert strsim.jaro_winkler("", "x") == 0.0


def test_levenshtein_known_values():
    assert strsim.levenshtein_ratio("kitten", "sitting") == pytest.approx(1 - 3 / 7)
    assert strsim.levenshtein_ratio("abc", "abc") == 1.0
    assert strsim.levenshtein_ratio("", "abc") == 0.0
    assert strsim.levenshtein_ratio("abc", "xyz") == 0.0
    # symmetry
    assert strsim.levenshtein_ratio("sunday", "saturday") == strsim.levenshtein_ratio("saturday", "sunday")


def test_jaccard():
    a = np.array([1, 2, 3], dtype=np.uint64)
    b = np.array([2, 3, 4], dtype=np.uint64)
    assert strsim.jaccard(a, b) == pytest.approx(0.5)
    assert strsim.jaccard(a, a) == 1.0
    assert strsim.jaccard(np.empty(0, np.uint64), a) == 0.0


def test_jaccard_sorted_matches_jaccard():
    rng = np.random.RandomState(11)
    for _ in range(50):
        a = np.unique(rng.randint(0, 1000, size=rng.randint(0, 80)).astype(np.uint64))
        b = np.unique(rng.randint(0, 1000, size=rng.randint(0, 80)).astype(np.uint64))
        assert strsim.jaccard_sorted(a, b) == pytest.approx(strsim.jaccard(a, b))


def test_token_shingles_batch_matches_single():
    lists = [["a", "b", "c", "d"], [], ["x"], ["p", "q", "r"], ["a", "b", "c", "d", "e"]]
    batch = H.token_shingles_batch(lists, k=3)
    for lst, got in zip(lists, batch):
        assert (got == H.token_shingles(lst, k=3)).all()


def test_vectors_from_hashes_matches_single():
    texts = ["hello world", "", "spark engine blocking"]
    grams = [H.char_ngrams_hashed(t, 3) for t in texts]
    batch = H.vectors_from_hashes(grams, dim=64)
    for t, row in zip(texts, batch):
        assert np.allclose(row, H.hashed_ngram_vector(t, dim=64))


# ---- batched strsim kernels: exact equivalence with the scalar versions ----

def _rand_strings(rng, n, alpha="abcdef gh", max_len=40):
    out = []
    for _ in range(n):
        k = rng.randint(0, max_len)
        out.append("".join(rng.choice(list(alpha)) for _ in range(k)))
    return out


def test_levenshtein_batch_matches_scalar():
    import random

    rng = random.Random(3)
    a = _rand_strings(rng, 200) + ["", "abc", "same", "", "x" * 600]
    b = _rand_strings(rng, 200) + ["abc", "", "same", "", "x" * 599 + "y"]
    got = strsim.levenshtein_ratio_batch(a, b)
    for i, (x, y) in enumerate(zip(a, b)):
        assert got[i] == pytest.approx(strsim.levenshtein_ratio(x, y)), (i, x, y)


def test_jaro_winkler_batch_matches_scalar():
    import random

    rng = random.Random(4)
    a = _rand_strings(rng, 300) + ["MARTHA", "DIXON", "", "x", "same"]
    b = _rand_strings(rng, 300) + ["MARHTA", "DICKSONX", "x", "", "same"]
    got = strsim.jaro_winkler_batch(a, b)
    for i, (x, y) in enumerate(zip(a, b)):
        assert got[i] == pytest.approx(strsim.jaro_winkler(x, y)), (i, x, y)


def test_jaccard_batch_matches_scalar():
    rng = np.random.RandomState(5)
    sets_a, sets_b = [], []
    for _ in range(200):
        pool = rng.randint(0, 50, size=rng.randint(0, 30)).astype(np.uint64)
        sets_a.append(np.unique(pool))
        pool2 = rng.randint(0, 50, size=rng.randint(0, 30)).astype(np.uint64)
        sets_b.append(np.unique(pool2))
    sets_a += [np.empty(0, np.uint64), np.empty(0, np.uint64)]
    sets_b += [np.empty(0, np.uint64), np.unique(rng.randint(0, 9, 5).astype(np.uint64))]
    # values above 2**63 exercise the uint64 ↔ int64 wrap (Arrow round-trip)
    big = np.uint64(1) << np.uint64(63)
    sets_a.append(np.unique(np.array([big, big + np.uint64(7), np.uint64(3)], dtype=np.uint64)))
    sets_b.append(np.unique(np.array([big, np.uint64(3), np.uint64(9)], dtype=np.uint64)))
    got = strsim.jaccard_sorted_batch(sets_a, sets_b)
    for i, (x, y) in enumerate(zip(sets_a, sets_b)):
        assert got[i] == pytest.approx(strsim.jaccard_sorted(x, y)), i


def test_char_ngrams_batch_matches_scalar():
    texts = ["hello world", "", "ab", "abc", "x", "hello world again and again", "\x00weird\x00"]
    got = H.char_ngrams_hashed_batch(texts, n=3)
    for t, g in zip(texts, got):
        exp = H.char_ngrams_hashed(t, n=3)
        assert np.array_equal(g, exp), t


def test_token_shingles_batch_matches_scalar():
    import random

    rng = random.Random(9)
    lists = [
        ["tok%d" % rng.randint(0, 30) for _ in range(rng.randint(0, 25))] for _ in range(120)
    ] + [[], ["a"], ["a", "b"], ["a", "b", "c"], ["dup", "dup", "dup", "dup"]]
    got = H.token_shingles_batch(lists, k=3)
    for lst, g in zip(lists, got):
        exp = H.token_shingles(lst, k=3)
        assert np.array_equal(g, exp), lst
