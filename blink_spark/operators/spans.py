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
