"""Span/selection operators: greedy overlap pruning, joint-score combine,
top-k-with-threshold-and-fallback.

Reference analogs (SURVEY.md §2.5 / §2.9):

* W4 — greedy overlap pruning: sort candidate spans by score descending,
  accept a span iff it does not overlap an already-accepted one
  (``elq/main_dense.py:451-466``). Inherently sequential *within* a group,
  embarrassingly parallel *across* groups → ``applyInPandas`` per group.
* U10 — joint probability combine ``log_softmax(cand) + log(sigmoid(m))``
  (``elq/main_dense.py:355``) — pure column expressions over a window.
* W3 — top-k + threshold with a keep-at-least-one fallback
  (``elq/biencoder/biencoder.py:318-363``): window top-k, filter by
  threshold, but always retain the rank-1 row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PRUNE_SCHEMA = T.StructType(
    [
        T.StructField("group_id", T.LongType()),
        T.StructField("span_id", T.LongType()),
        T.StructField("start", T.DoubleType()),
        T.StructField("end", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def greedy_overlap_prune(spans: DataFrame) -> DataFrame:
    """Per-group greedy non-overlap selection (W4, ``elq/main_dense.py:451-466``).

    Input columns: ``group_id, span_id, start, end, score``. Within each
    group, spans are visited by (score desc, span_id asc — deterministic
    tie-break) and kept iff they do not overlap any previously kept span
    (half-open intervals: overlap iff ``a.start < b.end and b.start < a.end``).

    Sequential per group by nature (each acceptance depends on prior
    acceptances), so it runs as one pandas kernel per group via
    ``applyInPandas`` — groups shuffle-partition across executors, which is
    the only parallelism the algorithm admits.
    """

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["score", "span_id"], ascending=[False, True])
        kept_idx = []
        kept_bounds: list[tuple[float, float]] = []
        for row in pdf.itertuples(index=True):
            s, e = float(row.start), float(row.end)
            if all(not (s < ke and ks < e) for ks, ke in kept_bounds):
                kept_idx.append(row.Index)
                kept_bounds.append((s, e))
        return pdf.loc[kept_idx, ["group_id", "span_id", "start", "end", "score"]]

    cols = ["group_id", "span_id", "start", "end", "score"]
    return spans.select(*cols).groupBy("group_id").applyInPandas(prune, schema=_PRUNE_SCHEMA)


def joint_score(
    df: DataFrame,
    group_col: str = "group_id",
    logit_col: str = "logit",
    threshold: float | None = None,
) -> DataFrame:
    """U10/U11: ``log_softmax(logit) over group + log(sigmoid(logit))``,
    optionally thresholded (``elq/main_dense.py:355,432-449``).

    Numerically-stable log-softmax via the max-subtraction identity; all
    JVM-side window/column expressions — no Python.
    """
    w = Window.partitionBy(group_col)
    mx = F.max(logit_col).over(w)
    shifted = F.col(logit_col) - mx
    lse = F.log(F.sum(F.exp(shifted)).over(w))  # log Σ exp(l - max)
    log_softmax = shifted - lse
    log_sigmoid = -F.log1p(F.exp(-F.col(logit_col)))
    out = df.withColumn("joint", log_softmax + log_sigmoid)
    if threshold is not None:
        out = out.where(F.col("joint") > F.lit(threshold))
    return out


def enumerate_scored_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 10,
    k: int = 5,
) -> DataFrame:
    """U8: enumerate every (start, end) token span up to ``max_len`` tokens,
    score it ``start_lp[start] + end_lp[end] + Σ inside_lp[start..end]``, and
    keep the top-``k`` per document.

    Reference analog: ``MentionScoresHead.forward``
    (`elq/biencoder/biencoder.py:64-126`) scores all bounded-length spans with
    exactly this decomposition (its inside term is a cumsum difference), and
    ``filter_by_mention_size`` (`:128-142`) is the ``max_len`` cap. The
    reference's per-token log-probs come from a trained head; a SQL engine has
    no trained head, so this operator takes deterministic per-token surrogates
    (length- and first-character-derived, documented in the entry) — the
    OPERATOR under test is the span enumeration + cumsum scoring, not the
    model.

    Scale shape: one ``posexplode`` per doc, one partitioned running-sum
    window (per-doc ordering, no global window), a ``max_len``-way offset
    explode, and a composite equi-join on ``(doc, end_idx)`` — volume is
    ``max_len × n_tokens``, strictly linear; no range join, no cartesian.
    The surrogate scores are dyadic rationals (/4, /8, /16), so every sum is
    exact in binary floating point and the top-k boundary is reproducible
    bit-for-bit on any engine or partitioning.
    """
    from blink_spark.functions.text import tokens

    toks = docs.select(
        id_col, F.posexplode(tokens(F.col(text_col))).alias("idx", "tok")
    ).where(F.length("tok") > 0)
    scored = toks.select(
        id_col,
        "idx",
        (F.length("tok") / F.lit(4.0)).alias("start_lp"),
        (F.ascii(F.col("tok")) / F.lit(8.0)).alias("end_lp"),
        (-F.length("tok") / F.lit(16.0)).alias("inside_lp"),
    )
    w = Window.partitionBy(id_col).orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    cum = scored.withColumn("cum_end", F.sum("inside_lp").over(w))
    starts = (
        cum.select(
            id_col,
            F.col("idx").alias("start_idx"),
            "start_lp",
            (F.col("cum_end") - F.col("inside_lp")).alias("cum_before"),
        )
        .withColumn(
            "end_idx",
            F.explode(F.sequence(F.col("start_idx"), F.col("start_idx") + F.lit(max_len - 1))),
        )
    )
    ends = cum.select(id_col, F.col("idx").alias("end_idx"), "end_lp", "cum_end")
    spans = starts.join(ends, [id_col, "end_idx"]).withColumn(
        "raw", F.col("start_lp") + F.col("end_lp") + (F.col("cum_end") - F.col("cum_before"))
    )
    rank_w = Window.partitionBy(id_col).orderBy(F.desc("raw"), F.asc("start_idx"), F.asc("end_idx"))
    return (
        spans.withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") <= k)
        .select(id_col, "start_idx", "end_idx", F.round("raw", 6).alias("span_score"))
    )


def span_embedding_pool(
    emb: DataFrame,
    start_col: str = "start_idx",
    len_col: str = "span_len",
    vec_col: str = "embedding",
) -> DataFrame:
    """U9: pool the embedding slice ``[start, start+len)`` of each row —
    mean pooling plus the first/last boundary values.

    Reference analog: ``GetContextEmbedsHead.forward``
    (`elq/biencoder/biencoder.py:177-219`) averages token embeddings within
    span bounds (its first/last-concat variant motivates the boundary
    columns); the gather-by-bounds kernel is
    ``batched_span_select`` (`elq/common/allennlp_span_utils.py`). Here the
    "sequence" being pooled is the row's embedding array and ``start``/
    ``len`` are 0-based column expressions already present on the row.

    The mean is computed in fixed-point milliunits (each element is
    ``round(x*1000)`` summed as a LONG, divided once at the end): integer
    sums are associative, so the pooled value is independent of fold order
    and bit-identical across engines and partitionings — float folds are
    not. All array expressions (``slice``/``aggregate``/``element_at``),
    zero shuffles, zero Python.
    """
    start = F.col(start_col)
    ln = F.col(len_col)
    sliced = F.slice(F.col(vec_col), start + F.lit(1), ln)
    total_milli = F.aggregate(
        sliced,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.round(x.cast("double") * 1000).cast("long"),
    )
    return emb.withColumns(
        {
            "mean_pool": F.round(total_milli / (F.lit(1000.0) * ln), 6),
            "first_val": F.round(F.element_at(F.col(vec_col), start + F.lit(1)).cast("double"), 6),
            "last_val": F.round(F.element_at(F.col(vec_col), (start + ln).cast("int")).cast("double"), 6),
        }
    )


def topk_threshold_fallback(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    k: int,
    threshold: float,
) -> DataFrame:
    """W3: top-k per group, filtered by ``order_col ≥ threshold``, but the
    rank-1 row always survives (``prune_ctxt_mentions`` keep-at-least-one
    fallback, ``elq/biencoder/biencoder.py:318-363``)."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.asc(tiebreak_col))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") <= k) & ((F.col(order_col) >= threshold) | (F.col("rn") == 1)))
    )
