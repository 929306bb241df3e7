"""Stage 2 — pairwise scoring of blocked candidate pairs.

The precision stage: the Spark-native analog of the reference's
cross-encoder rerank (``blink/crossencoder/crossencoder.py:135-144``) in the
cheap-scorer form the yc-song fork itself introduces (MLP over precomputed
embedding pairs, ``blink/crossencoder/mlp.py:98-140``): a fixed blend of

* exact token-shingle Jaccard           (set overlap of stage-1 shingles)
* Levenshtein ratio over bounded heads  (banded numpy DP)
* Jaro-Winkler over bounded heads
* cosine over hashed n-gram vectors     (the embedding-pair score)
* turn-count agreement                  (structural prior)

scored in ONE vectorized pandas UDF per Arrow batch (no per-row Python
dispatch overhead beyond the per-pair numpy kernels), then thresholded —
the reference's threshold-as-pruning (``elq/main_dense.py:432-449``).

Scale notes: candidate pairs join the (conv_id-keyed) feature table twice —
sort-merge joins on the same key, no driver collect; the scorer sees only
bounded columns (heads capped at 512 chars, shingle sets, 256-d vectors),
never the full conversation text.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blink_spark.functions import strsim


@dataclass
class ScoringConfig:
    w_jaccard: float = 0.34
    w_lev: float = 0.22
    w_jw: float = 0.10
    w_cosine: float = 0.26
    w_turns: float = 0.08
    threshold: float = 0.60


_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("conv_a", T.StringType()),
        T.StructField("conv_b", T.StringType()),
        T.StructField("jaccard", T.DoubleType()),
        T.StructField("lev_ratio", T.DoubleType()),
        T.StructField("jaro_winkler", T.DoubleType()),
        T.StructField("cosine", T.DoubleType()),
        T.StructField("turn_agree", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def pair_features(pairs: DataFrame, features: DataFrame) -> DataFrame:
    """Attach both sides' precomputed features to each candidate pair."""
    fa = features.select(
        F.col("conv_id").alias("conv_a"),
        F.col("doc_head").alias("head_a"),
        F.col("shingles").alias("shingles_a"),
        F.col("vec").alias("vec_a"),
        F.col("n_turns").alias("turns_a"),
    )
    fb = features.select(
        F.col("conv_id").alias("conv_b"),
        F.col("doc_head").alias("head_b"),
        F.col("shingles").alias("shingles_b"),
        F.col("vec").alias("vec_b"),
        F.col("n_turns").alias("turns_b"),
    )
    return pairs.join(fa, "conv_a").join(fb, "conv_b")


def score_pairs(pairs_with_features: DataFrame, cfg: ScoringConfig | None = None) -> DataFrame:
    """Vectorized pair scorer → per-feature columns + blended ``score``.

    Two-tier evaluation (decision-equivalent to the full blend at the
    configured threshold — the within-stage-2 echo of BLINK's cheap-retrieve
    / expensive-rank split):

    * cheap features first (Jaccard over precomputed shingle sets, cosine
      over precomputed vectors, turn agreement) → ``core`` score;
    * the expensive edit-distance features (Levenshtein ratio over 512-char
      heads, Jaro-Winkler) run ONLY when the cheap features cannot decide
      the thresholded outcome on their own:
        full_blend ≥ w_core·core           (lev = jw = 0 lower bound)
        full_blend ≤ w_core·core + w_exp   (lev = jw = 1 upper bound)
      so core ≥ τ/w_core accepts and core < (τ−w_exp)/w_core rejects
      without computing them. Gated rows report NaN for lev/jw and a
      decision-safe score bound. Gating depends only on the pair's own
      features — deterministic at any parallelism.
    """
    cfg = cfg or ScoringConfig()
    w_exp = cfg.w_lev + cfg.w_jw
    w_core_total = cfg.w_jaccard + cfg.w_cosine + cfg.w_turns
    hi_core = cfg.threshold / w_core_total                 # accept without lev/jw
    lo_core = (cfg.threshold - w_exp) / w_core_total       # reject without lev/jw

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            jac = np.empty(n)
            cos = np.empty(n)
            ta = pdf["turns_a"].to_numpy(dtype=np.float64)
            tb = pdf["turns_b"].to_numpy(dtype=np.float64)
            turn_agree = np.minimum(ta, tb) / np.maximum(np.maximum(ta, tb), 1.0)
            for i in range(n):
                sa = np.asarray(pdf["shingles_a"].iat[i], dtype=np.int64).view(np.uint64)
                sb = np.asarray(pdf["shingles_b"].iat[i], dtype=np.int64).view(np.uint64)
                jac[i] = strsim.jaccard(sa, sb)
                va = np.asarray(pdf["vec_a"].iat[i], dtype=np.float32)
                vb = np.asarray(pdf["vec_b"].iat[i], dtype=np.float32)
                cos[i] = strsim.cosine(va, vb)
            core = cfg.w_jaccard * jac + cfg.w_cosine * cos + cfg.w_turns * turn_agree
            core_n = core / w_core_total
            need_exp = (core_n >= lo_core) & (core_n < hi_core)

            lev = np.full(n, np.nan)
            jw = np.full(n, np.nan)
            for i in np.nonzero(need_exp)[0]:
                ha, hb = pdf["head_a"].iat[i] or "", pdf["head_b"].iat[i] or ""
                lev[i] = strsim.levenshtein_ratio(ha, hb)
                jw[i] = strsim.jaro_winkler(ha[:64], hb[:64])

            score = np.where(
                need_exp,
                core + cfg.w_lev * np.nan_to_num(lev) + cfg.w_jw * np.nan_to_num(jw),
                # decision-safe bounds: accepted rows ≥ τ, rejected rows < τ
                np.where(core_n >= hi_core, core + w_exp, core),
            )
            yield pd.DataFrame(
                {
                    "conv_a": pdf["conv_a"],
                    "conv_b": pdf["conv_b"],
                    "jaccard": jac,
                    "lev_ratio": lev,
                    "jaro_winkler": jw,
                    "cosine": cos,
                    "turn_agree": turn_agree,
                    "score": score,
                }
            )

    return pairs_with_features.mapInPandas(gen, schema=_SCORE_SCHEMA)


def match_edges(scored: DataFrame, cfg: ScoringConfig | None = None) -> DataFrame:
    """Threshold scored pairs → match-edge DataFrame for stage 3."""
    cfg = cfg or ScoringConfig()
    return scored.where(F.col("score") >= F.lit(cfg.threshold)).select("conv_a", "conv_b", "score")
