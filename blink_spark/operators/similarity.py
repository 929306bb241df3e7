"""Similarity search over embedding columns: brute-force and LSH-bucketed top-k.

The Spark-native analog of the reference's FAISS retrieval
(``blink/indexer/faiss_indexer.py:47-141``, IVF variant
``elq/index/faiss_indexer.py:70-91``): the exact path is a pruned
cross join + per-query top-k window (what ``IndexFlatIP`` computes), the
scale path pre-buckets by random-hyperplane signs (what ``IndexHNSWFlat``/
``IndexIVFFlat`` approximate). Chunked partial-top-k-then-re-topk
(``elq/main_dense.py:306-334``) comes free from Spark's partition-wise
execution + TakeOrderedAndProject.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cosine_cols(va, vb):
    dot = F.aggregate(F.zip_with(va, vb, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    na, nb = norm(va), norm(vb)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    ``queries`` defaults to the corpus itself (self-join, excluding self).
    Plan shape: cross join → window top-k; Catalyst executes the rank filter
    as per-partition partial top-k, so the full |Q|×|N| score matrix is
    never materialized wider than a partition.
    """
    corpus = embeddings.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("vn"))
    q = (queries or embeddings).select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("vq"))
    scored = (
        q.crossJoin(corpus)
        .where(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", _cosine_cols(F.col("vq"), F.col("vn")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def chunked_topk_merge(
    embeddings: DataFrame,
    k: int = 5,
    n_chunks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """§2.6 memory-adaptive chunked top-k merge (``elq/main_dense.py:306-334``
    splits the full-corpus score matrix into chunks, takes top-k WITHIN each
    chunk, concatenates the per-chunk winners, and re-top-ks them) — the
    pattern that lets a scorer whose full score matrix cannot fit in memory
    run chunk-at-a-time.

    Spark-first shape: the candidate side gets a deterministic hash chunk
    id; stage 1 is a windowed top-k PER (query, chunk) — Catalyst executes
    the rank filter as a WindowGroupLimit partial per partition, so at most
    ``k`` survivors per (query, chunk) leave any task — and stage 2 re-ranks
    the ≤ ``n_chunks·k`` winners per query. With ties broken by ascending
    neighbor id at BOTH stages the merge is lossless: the output equals the
    one-shot global top-k exactly (asserted vs :func:`brute_force_topk` in
    tests, and value-checked against the global-top-k SQL oracle by the
    ``tk_chunked_topk_merge`` registry row).
    """
    corpus = embeddings.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("vn"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_chunks)).alias("chunk_id"),
    )
    q = (
        embeddings.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("vq"))
    )
    scored = (
        q.crossJoin(corpus)
        .where(F.col("query_id") != F.col("nbr_id"))
        .select(
            "query_id", "chunk_id", "nbr_id", _cosine_cols(F.col("vq"), F.col("vn")).alias("cosine")
        )
    )
    w_chunk = Window.partitionBy("query_id", "chunk_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    winners = scored.withColumn("crank", F.row_number().over(w_chunk)).where(
        F.col("crank") <= k
    )
    w_global = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        winners.withColumn("rank", F.row_number().over(w_global))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("buckets", T.ArrayType(T.LongType())),
    ]
)


def hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket keys: ``n_tables`` independent sign
    signatures of ``n_planes`` bits each (vectorized numpy over Arrow batches).

    Two vectors share a table's bucket with prob ``(1 - θ/π)^n_planes`` —
    the standard cosine-LSH guarantee.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if len(pdf) == 0:  # Arrow can hand over zero-row batches; no
                # planes are derivable (or needed) from them
                yield pd.DataFrame({"vec_id": pd.Series([], dtype="int64"), "buckets": []})
                continue
            vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if planes is None:
                rng = np.random.RandomState(seed)
                planes = rng.standard_normal((n_tables, n_planes, vecs.shape[1]))
            keys = []
            proj = np.einsum("tpd,nd->tnp", planes, vecs)  # (T, N, P)
            bits = (proj > 0).astype(np.uint64)
            weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))[None, None, :]
            sig = (bits * weights).sum(axis=2, dtype=np.uint64)  # (T, N)
            table_tag = (np.arange(n_tables, dtype=np.uint64) << np.uint64(48))[:, None]
            sig = (sig + table_tag).astype(np.int64)  # bucket ids disjoint per table
            keys = sig.T.tolist()
            yield pd.DataFrame({"vec_id": pdf[id_col], "buckets": keys})

    return embeddings.select(id_col, vec_col).mapInPandas(gen, schema=_BUCKET_SCHEMA)


def lsh_topk_neighbors(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 6,
    seed: int = 42,
    max_bucket: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    caches: list | None = None,
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-bucket equi-join then exact
    re-scoring within buckets — the IVF-style scale path.

    At 100 TB the cross join in :func:`brute_force_topk` is infeasible;
    this replaces it with |bucket|-local joins. ``max_bucket`` caps hot
    buckets (same skew guard as ER blocking). The bucket-key table feeds
    three subplans (size agg + both join sides), so it is persisted —
    pass ``caches`` to collect the handle for release (same convention as
    ``blocking.candidate_pairs``).
    """
    keyed = (
        hyperplane_buckets(
            embeddings, n_planes=n_planes, n_tables=n_tables, seed=seed, id_col=id_col, vec_col=vec_col
        )
        .select("vec_id", F.explode("buckets").alias("bucket"))
        .persist()
    )
    if caches is not None:
        caches.append(keyed)
    sizes = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    kept = keyed.join(F.broadcast(sizes.where(F.col("n") > max_bucket)), "bucket", "left_anti")

    vecs = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v"))
    a = kept.select("bucket", F.col("vec_id").alias("query_id"))
    b = kept.select("bucket", F.col("vec_id").alias("nbr_id"))
    pairs = (
        a.join(b, "bucket")
        .where(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id")
        .dropDuplicates()
    )
    scored = (
        pairs.join(vecs.withColumnsRenamed({"vid": "query_id", "v": "vq"}), "query_id")
        .join(vecs.withColumnsRenamed({"vid": "nbr_id", "v": "vn"}), "nbr_id")
        .select("query_id", "nbr_id", _cosine_cols(F.col("vq"), F.col("vn")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_lists: int = 64,
    seed: int = 42,
    sample_size: int = 4096,
    n_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train an IVF coarse quantizer: k-means centroids from a deterministic
    hash sample of the corpus.

    The FAISS-analog split (``elq/index/faiss_indexer.py:70-91``
    ``DenseIVFFlatIndexer`` trains ``IndexIVFFlat``, then adds the full
    corpus; NB the reference trains on the FULL data — the bounded-sample
    training below is THIS implementation's scale choice, since collecting
    100 TB to one node is not an option): the quantizer is a MODEL, not
    data — ``sample_size`` vectors are collected to the driver (bounded,
    e.g. 4096 × dim doubles ≈ a few MB at any corpus scale), centroids are
    fit with seeded Lloyd iterations in numpy, and the resulting
    (n_lists, dim) array is broadcast into the assignment UDF.
    The sample is a deterministic hash filter, not ``limit()`` — stable
    across partitionings and re-runs.

    Vectors are L2-normalized before clustering so the quantizer partitions
    by direction (we search by cosine); centroids are re-normalized per
    iteration (spherical k-means).
    """
    total = embeddings.count()
    frac_mod = max(1, total // max(sample_size, 1))
    sample = (
        embeddings.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(frac_mod)) == 0)
        .select(F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy("_id")
        .limit(sample_size)
        .collect()
    )
    X = np.array([r["_v"] for r in sample], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n_lists = min(n_lists, len(X))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=n_lists, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine == dot on unit vectors
        for j in range(n_lists):
            m = assign == j
            if m.any():
                c = X[m].mean(axis=0)
                C[j] = c / max(float(np.linalg.norm(c)), 1e-12)
    return C


def _ivf_assign(df: DataFrame, C: np.ndarray, nprobe: int, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec) → (id, array of nprobe nearest-centroid list ids) via one
    vectorized Arrow pass; ``nprobe=1`` is the corpus-side assignment."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("lists", T.ArrayType(T.IntegerType()))]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": pd.Series([], dtype="int64"), "lists": []})
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = V @ C.T  # (N, n_lists)
            n = min(nprobe, sims.shape[1])
            top = np.argpartition(-sims, n - 1, axis=1)[:, :n]
            # order the probes best-first (argpartition is unordered)
            row = np.arange(len(V))[:, None]
            top = top[row, np.argsort(-sims[row, top], axis=1)]
            yield pd.DataFrame({"vec_id": pdf[id_col], "lists": top.astype(np.int32).tolist()})

    return df.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def ivf_topk_neighbors(
    embeddings: DataFrame,
    k: int = 5,
    n_lists: int = 64,
    nprobe: int = 4,
    seed: int = 42,
    sample_size: int = 4096,
    max_list: int = 20000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    caches: list | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF: coarse-quantizer buckets then exact
    re-scoring inside the ``nprobe`` probed lists — the second scale path
    next to :func:`lsh_topk_neighbors` (the two trade differently: IVF
    adapts to the data distribution, LSH needs no training pass).

    Plan shape at 100 TB: one driver-side model fit on a bounded sample →
    ONE Arrow map pass computing each vector's ``nprobe`` best lists,
    shared by both join sides (the corpus-side ``nprobe=1`` assignment is
    exactly ``lists[0]`` because probes come out ordered best-first, so a
    separate corpus pass would rescan the embeddings for the same answer)
    → equi-join on list id → windowed top-k. No cross join anywhere;
    ``max_list`` caps degenerate lists the same way ``max_bucket`` caps
    hot LSH buckets.
    """
    C = train_ivf_centroids(
        embeddings, n_lists=n_lists, seed=seed, sample_size=sample_size, id_col=id_col, vec_col=vec_col
    )
    assign = _ivf_assign(embeddings, C, nprobe, id_col, vec_col)
    if caches is not None:
        # persisted ONLY when the caller hands us a release list: the frame
        # feeds three consumers (size census, corpus join side, query probe
        # side), but a persist nobody unpersists would leak into the
        # session's CacheManager for its lifetime (callers without `caches`
        # trade recomputes of the Arrow pass for that).
        assign = assign.persist()
        caches.append(assign)
    corpus_assign = assign.select(
        F.col("vec_id").alias("nbr_id"), F.element_at("lists", 1).alias("list_id")
    )
    sizes = corpus_assign.groupBy("list_id").agg(F.count(F.lit(1)).alias("n"))
    kept = corpus_assign.join(
        F.broadcast(sizes.where(F.col("n") > max_list)), "list_id", "left_anti"
    )
    probes = assign.select(
        F.col("vec_id").alias("query_id"), F.explode("lists").alias("list_id")
    )
    vecs = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v"))
    scored = (
        probes.join(kept, "list_id")
        .where(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id")
        .dropDuplicates()
        .join(vecs.withColumnsRenamed({"vid": "query_id", "v": "vq"}), "query_id")
        .join(vecs.withColumnsRenamed({"vid": "nbr_id", "v": "vn"}), "nbr_id")
        .select("query_id", "nbr_id", _cosine_cols(F.col("vq"), F.col("vn")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def ann_recall_vs_exact(embeddings: DataFrame, k: int = 5, **lsh_kw) -> float:
    """Recall@k of the LSH path against the brute-force oracle (eval helper)."""
    exact = brute_force_topk(embeddings, k=k).select("query_id", "nbr_id")
    approx = lsh_topk_neighbors(embeddings, k=k, **lsh_kw).select("query_id", "nbr_id")
    n_exact = exact.count()
    hit = exact.join(approx, ["query_id", "nbr_id"], "left_semi").count()
    return hit / n_exact if n_exact else 1.0
