"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship ER pipeline on a deterministic synthetic
transcript corpus (shape per BASELINE.json input_hint) sized for sf0.001;
``queries``/``oracle_sql`` expose the operator parity registry in
:mod:`blink_spark.queries` — one entry per implemented operator family from
SURVEY.md §2 plus the training-data-pipeline operators (dedup, similarity,
text stats, multimodal plumbing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blink_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: end-to-end ER (block → score → cluster) over a
    deterministic synthetic transcript corpus; returns cluster assignments."""
    return Q.er_flagship_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
