"""Stage 3 — transitive clustering: large-star / small-star connected components.

The reference's final stage assigns each mention its argmax entity
(``blink/main_dense.py:541-586``), implicitly clustering mentions that share
an entity. In record linkage the match-edge graph must instead be closed
transitively; we use the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
public algorithm), expressed purely as DataFrame group-bys — no GraphFrames
dependency, no driver-side graph.

Properties needed at 10^12-node scale and encoded here:
* every round is a single groupBy per direction (shuffle on node id);
* convergence in O(log²) rounds (vs O(diameter) for naive label
  propagation — long duplicate chains would kill the naive version);
* ``localCheckpoint`` every round truncates the logical-plan lineage,
  otherwise the iterative joins blow up Catalyst analysis time;
* deterministic: min-id tie-breaking over a total order (works on any
  orderable id type, including strings) → identical clusters at any
  parallelism level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor to the neighborhood minimum.

    Join formulation — the per-node minimum is a partial-aggregatable
    ``min`` joined back to the neighbor list, NEVER a ``collect_set``: a
    materialized neighborhood array for a high-degree node (a mega-cluster
    representative at 10^12 scale) would exceed executor memory, while the
    min/join shape handles any degree and lets AQE split skewed keys.
    """
    nbrs = edges.select(F.col("u"), F.col("v")).union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mn")).select("u", F.least("mn", F.col("u")).alias("m"))
    out = (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).dropDuplicates(["u", "v"])


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's ≤-neighborhood, connect all members to the minimum.

    Same join shape as :func:`_large_star` (no neighborhood arrays).
    """
    # orient edges large→small
    oriented = edges.select(
        F.greatest("u", "v").alias("u"),
        F.least("u", "v").alias("v"),
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))  # m < u always
    out = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("node"), F.col("m"))
        .union(mins.select(F.col("u").alias("node"), F.col("m")))
        .where(F.col("node") != F.col("m"))
    )
    return out.select(F.col("node").alias("u"), F.col("m").alias("v")).dropDuplicates(["u", "v"])


def _edge_digest(edges: DataFrame) -> tuple[int, int]:
    """(count, order-independent hash-sum) — cheap fixpoint detector."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Edges ``(conv_a, conv_b)`` → assignments ``(conv_id, cluster_id)``.

    ``cluster_id`` is the lexicographic minimum conv_id of the component —
    deterministic and stable across runs/parallelism. Nodes appearing only
    as singletons are absent (callers ``coalesce`` to self; see
    :meth:`blink_spark.pipeline.ERPipeline.run`).
    """
    cur = (
        edges.select(F.col("conv_a").alias("u"), F.col("conv_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .localCheckpoint()
    )
    prev_digest = None
    for _ in range(max_iter):
        cur = _small_star(_large_star(cur)).localCheckpoint()
        digest = _edge_digest(cur)
        if digest == prev_digest:
            break
        prev_digest = digest
    # at fixpoint every edge is (node, component_min)
    assignments = (
        cur.select(F.col("u").alias("conv_id"), F.col("v").alias("cluster_id"))
        .union(cur.select(F.col("v").alias("conv_id"), F.col("v").alias("cluster_id")))
        .groupBy("conv_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    return assignments
