"""Incremental ER — delta blocking, scoring, and cluster-state update.

At 10^12 turns the full pipeline never re-runs from scratch: new
conversations arrive continuously and must be resolved against the existing
corpus without touching old×old pairs. The reference's analog is its
prediction cache + resume (``blink/main_dense.py:454-476``: cached entity
encodings are reused, only new mentions are encoded and scored); here the
cached state is the stage-1 feature table plus the current cluster
assignment, and the delta work is

* featurize ONLY the new conversations (same kernel as the batch pipeline);
* generate candidate pairs with at least one NEW side — the self-join runs
  new×(new ∪ old) on the union key table, never old×old, so the cost is
  O(|Δ| · blocked-degree), not O(|corpus|²);
* score with the same two-pass scorer;
* update clusters by running connected components over the delta match
  edges UNION the old assignment's star edges (conv_id → cluster_id).

The star-edge trick is what makes the update exact: the old assignment is
itself a spanning forest of the old match graph, so
``CC(E_Δ ∪ star(A_old)) == CC(E_old ∪ E_Δ)`` — components merge correctly
when a new conversation bridges two old clusters, and min-id labels come
out identical to a full-batch run. Asserted by the batch≡incremental
equality test (tests/test_incremental.py).

Honest caveat (order dependence of the skew cap): block-size caps are
computed on the UNION key table, same as a full batch run over the whole
corpus. A pair whose ONLY shared keys were below the cap in an early state
but become hot later would be found by the early incremental run and not
by a from-scratch batch run (and vice versa for the ``min_shared_minhash_
bands`` count when a hot key is dropped). True near-dups share many keys,
so this affects pathological corpora, not planted-duplicate workloads —
but it is why the equality test uses the same cap regime on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blink_spark.operators import blocking, clustering, scoring
from blink_spark.pipeline import PipelineConfig


@dataclass
class IncrementalResult:
    features: DataFrame      # union feature table (old ∪ new)
    features_new: DataFrame  # features of the delta conversations only
    pairs: DataFrame         # delta candidate pairs (≥1 new side)
    edges: DataFrame         # delta match edges
    assignments: DataFrame   # full updated assignment (every conv_id)
    metrics: dict
    caches: list

    def unpersist(self, blocking: bool = False) -> None:
        for df in self.caches:
            df.unpersist(blocking)
        self.caches.clear()


def delta_candidate_pairs(
    features_old: DataFrame,
    features_new: DataFrame,
    cfg: blocking.BlockingConfig | None = None,
    caches: list | None = None,
) -> DataFrame:
    """Candidate pairs with at least one new side, never old×old.

    Mirrors :func:`blocking.candidate_pairs` exactly (same cap, same
    shared-band aggregation, same SimHash Hamming verify) with one change:
    the left join side carries only NEW conversations, and new×new rows are
    kept once via ``conv_a < conv_b`` while new×old rows are kept in both
    orientations' canonical form — each shared key contributes exactly one
    row per pair, so the shared-band counts match the batch plan's.
    """
    cfg = cfg or blocking.BlockingConfig()
    keys_new = blocking.block_keys(features_new).withColumn("is_new", F.lit(True))
    keys_old = blocking.block_keys(features_old).withColumn("is_new", F.lit(False))
    keys_all = keys_new.unionByName(keys_old)

    # skew cap over the UNION key table — the same block sizes a full batch
    # over the whole corpus would see
    kept, _ = blocking.cap_blocks(keys_all, cfg.max_block_size)
    kept = kept.persist()
    if caches is not None:
        caches.append(kept)

    a = kept.where("is_new").select(
        "modality", "key", F.col("conv_id").alias("conv_n"), F.col("sig").alias("sig_n")
    )
    # prune the (old ∪ new) join side to keys the DELTA actually carries
    # BEFORE the pair join shuffles it: only keys present on the new side
    # can produce a pair, yet without the prune the equi-join would shuffle
    # every old key row — at 10^12 turns with a micro-batch delta, almost
    # all of the shuffle for rows that match nothing. The broadcast semi on
    # the delta's distinct key set rides the same smallness assumption the
    # SNM leg's broadcast of new_ids already makes (a micro-batch is small
    # by definition; ~tens of band keys per delta conv ≈ MBs). Pruning
    # AFTER cap_blocks keeps the cap census batch-identical, and pruning
    # by the UNCAPPED new key set is a superset of `a`'s keys — lossless.
    new_key_set = keys_new.select("modality", "key").dropDuplicates()
    b = (
        kept.join(F.broadcast(new_key_set), ["modality", "key"], "left_semi")
        .select(
            "modality", "key", F.col("conv_id").alias("conv_o"), F.col("sig").alias("sig_o"), "is_new"
        )
    )
    joined = a.join(b, on=["modality", "key"]).where(
        # new×new once (ordered); new×old in every orientation — the
        # (least, greatest) canonicalization below makes the pair unique
        (~F.col("is_new") & (F.col("conv_n") != F.col("conv_o")))
        | (F.col("is_new") & (F.col("conv_n") < F.col("conv_o")))
    )
    hamming_ok = (F.col("modality") != "simhash") | (
        F.bit_count(F.col("sig_n").bitwiseXOR(F.col("sig_o"))) <= cfg.sim_max_hamming
    )
    shared = (
        joined.where(hamming_ok)
        .select(
            F.least("conv_n", "conv_o").alias("conv_a"),
            F.greatest("conv_n", "conv_o").alias("conv_b"),
            "modality",
        )
        .groupBy("conv_a", "conv_b")
        .agg(
            F.sum(F.when(F.col("modality") == "minhash", 1).otherwise(0)).alias("mh_shared"),
            F.max(F.when(F.col("modality") == "simhash", 1).otherwise(0)).alias("sh_hit"),
        )
    )
    pairs = shared.where(
        (F.col("sh_hit") == 1) | (F.col("mh_shared") >= cfg.min_shared_minhash_bands)
    ).select("conv_a", "conv_b")
    if cfg.snm_window >= 2:
        # SNM delta leg: rank the UNION corpus (same ordering a full batch
        # would see) but keep only pairs with ≥1 new side. Old×old pairs
        # within the new ranking's window were within the OLD ranking's
        # window too (inserting rows can only push old rows further apart),
        # so the old batch already considered them — dropping them here
        # preserves never-old×old without losing batch-visible pairs.
        feats_all = features_new.select("conv_id", "doc_head").unionByName(
            features_old.select("conv_id", "doc_head")
        )
        snm = blocking.snm_pairs_from_features(feats_all, cfg)
        new_ids = features_new.select("conv_id")
        snm_delta = snm.join(
            F.broadcast(new_ids.withColumnRenamed("conv_id", "conv_a")), "conv_a", "left_semi"
        ).unionByName(
            snm.join(
                F.broadcast(new_ids.withColumnRenamed("conv_id", "conv_b")), "conv_b", "left_semi"
            )
        )
        pairs = pairs.unionByName(snm_delta).dropDuplicates()
    return pairs


def star_edges(assignments: DataFrame) -> DataFrame:
    """Old assignment → spanning-forest edges (conv_id, cluster_id).

    Self-assigned singletons carry no edge (they re-enter CC via the
    singleton coalesce, exactly like the batch pipeline).
    """
    return assignments.where(F.col("conv_id") != F.col("cluster_id")).select(
        F.col("conv_id").alias("conv_a"), F.col("cluster_id").alias("conv_b")
    )


def incremental_update(
    new_transcripts: DataFrame,
    features_old: DataFrame,
    assignments_old: DataFrame,
    config: PipelineConfig | None = None,
) -> IncrementalResult:
    """Resolve a batch of NEW conversations against existing cluster state.

    Returns the union feature table, the delta pairs/edges, and the full
    updated assignment. The caller owns persistence of the returned state
    tables (checkpoint/Iceberg in production; see
    :func:`incremental_er_stream` for the streaming wiring).
    """
    config = config or PipelineConfig()
    caches: list[DataFrame] = []

    docs_new = blocking.conversation_docs(new_transcripts)
    features_new = blocking.compute_features(docs_new, config.blocking).persist()
    caches.append(features_new)

    pairs = delta_candidate_pairs(features_old, features_new, config.blocking, caches=caches)
    features_all = features_old.unionByName(features_new)
    scored = scoring.score_pairs(pairs, features_all, config.scoring, caches=caches)
    edges = scoring.match_edges(scored, config.scoring)

    # CC runs on the TOUCHED subgraph only: a delta edge can change the
    # component of exactly the clusters its endpoints belong to, so star
    # edges are pulled in for those clusters alone and every other
    # assignment passes through untouched. A full-batch CC would label the
    # untouched components identically (no new member, same min-id), so
    # this stays exact while the iterative stage's input drops from
    # O(|corpus|) star edges per batch to O(|touched|) — the difference
    # between a delta update and re-clustering the world at 10^12 turns.
    delta_e = edges.select("conv_a", "conv_b")
    endpoints = (
        delta_e.select(F.col("conv_a").alias("conv_id"))
        .unionByName(delta_e.select(F.col("conv_b").alias("conv_id")))
        .distinct()
    )
    touched_clusters = (
        assignments_old.join(endpoints, "conv_id", "left_semi").select("cluster_id").distinct()
    )
    touched_star = star_edges(
        assignments_old.join(touched_clusters, "cluster_id", "left_semi")
    )
    merged = clustering.connected_components(
        delta_e.unionByName(touched_star), max_iter=config.cc_max_iter
    )
    all_convs = features_all.select("conv_id")
    assignments = (
        all_convs.join(merged, "conv_id", "left")
        .join(
            assignments_old.withColumnRenamed("cluster_id", "_old_cid"), "conv_id", "left"
        )
        .select(
            "conv_id",
            F.coalesce("cluster_id", "_old_cid", F.col("conv_id")).alias("cluster_id"),
        )
    )
    return IncrementalResult(
        features=features_all,
        features_new=features_new,
        pairs=pairs,
        edges=edges,
        assignments=assignments,
        metrics={},
        caches=caches,
    )


def _hadoop_path(spark, path_str: str):
    """(FileSystem, Path) for ``path_str`` via the JVM Hadoop FS API — the
    same abstraction Spark itself reads/writes through, so version listing
    and pruning work on HDFS/object stores, not just the local sandbox FS."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def list_assignment_versions(spark, state_dir: str) -> list:
    """Committed assignment versions under ``state_dir/assignments``,
    ascending. A version counts only if its ``_SUCCESS`` marker exists —
    a crash mid-write leaves an incomplete ``v=<id>`` dir that readers
    simply never see (no torn state, no repair step)."""
    fs, root = _hadoop_path(spark, f"{state_dir}/assignments")
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("v="):
            continue
        try:
            vid = int(name[2:])
        except ValueError:
            continue
        ok = spark._jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        if fs.exists(ok):
            out.append(vid)
    return sorted(out)


def read_latest_assignments(spark, state_dir: str, before: int | None = None) -> DataFrame:
    """The newest committed assignment table (optionally restricted to
    versions ``< before`` — what a replayed batch must read so it never
    sees its own failed attempt's output). Empty-schema frame when no
    version exists yet."""
    versions = list_assignment_versions(spark, state_dir)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return spark.createDataFrame([], "conv_id string, cluster_id string")
    return spark.read.parquet(f"{state_dir}/assignments/v={versions[-1]}")


def process_er_batch(batch_df: DataFrame, batch_id: int, state_dir: str, config: PipelineConfig) -> None:
    """One foreachBatch step of :func:`incremental_er_stream`, module-level
    so tests can drive it directly (including replaying a batch_id, the
    crash-recovery path Structured Streaming takes after a mid-batch
    failure). Exactly-once state contract, with every read/write pair on
    DISJOINT paths:

    * features: read ``batch_id=*`` filtered to ``batch_id < current`` (a
      replayed batch must not see its own failed attempt's feature rows —
      without the filter the union feature table would carry every delta
      conv twice and the refreshed assignment would emit duplicate rows),
      write ``batch_id=<current>`` with overwrite (idempotent re-write of
      the batch's OWN partition dir, never one it read).
    * assignments: read the newest committed version ``v < current``
      (``_SUCCESS``-gated), write ``v=<current>``. Versioning — rather
      than overwriting one ``latest`` dir — matters at scale: overwrite
      deletes the target before the job's tasks run, and when the
      refreshed-assignment join reads the SAME dir as a sort-merge join
      (the old side is too big to broadcast precisely when the corpus is
      big), the tasks would read already-deleted files. Writing a new
      version never races its own input; older versions are pruned only
      AFTER the new one commits. Production form: an Iceberg snapshot
      commit — this directory scheme is the same idea on a plain FS.
    """
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    feats_schema = blocking._FEATURE_SCHEMA
    try:
        features_old = (
            spark.read.option("basePath", f"{state_dir}/features")
            .parquet(f"{state_dir}/features/batch_id=*")
            .where(F.col("batch_id") < F.lit(batch_id))
            .drop("batch_id")
        )
    except Exception:  # first batch: no feature dir yet
        features_old = spark.createDataFrame([], feats_schema)
    assignments_old = read_latest_assignments(spark, state_dir, before=batch_id)

    res = incremental_update(batch_df, features_old, assignments_old, config)
    res.features_new.write.mode("overwrite").parquet(
        f"{state_dir}/features/batch_id={batch_id}"
    )
    res.assignments.write.mode("overwrite").parquet(f"{state_dir}/assignments/v={batch_id}")
    res.unpersist()
    # prune superseded versions — best-effort, strictly after the new
    # version's _SUCCESS exists, and RETAINING the immediate predecessor:
    # the streaming engine commits this batch to its checkpoint only after
    # process() returns, so a crash right here replays batch_id, and that
    # replay must still find the newest version < batch_id (deleting it
    # would make the replay resolve against an empty/stale assignment —
    # caught by the replay test when pruning was first written too eagerly)
    versions = list_assignment_versions(spark, state_dir)
    prev = max((v for v in versions if v < batch_id), default=None)
    fs, _ = _hadoop_path(spark, f"{state_dir}/assignments")
    for v in versions:
        if prev is not None and v < prev:
            fs.delete(spark._jvm.org.apache.hadoop.fs.Path(f"{state_dir}/assignments/v={v}"), True)


def incremental_er_stream(
    transcripts_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    config: PipelineConfig | None = None,
):
    """Streaming incremental ER via ``foreachBatch``.

    Maintains two durable state tables under ``state_dir``:
    ``features/batch_id=<id>`` (append-per-batch, replay-idempotent) and
    ``assignments/v=<batch_id>`` (full refreshed assignment, one committed
    version per batch, superseded versions pruned after commit — see
    :func:`process_er_batch` for why versioning beats overwriting a single
    ``latest`` dir). Read the result with :func:`read_latest_assignments`.
    Production sinks would be Iceberg tables with MERGE / snapshot commits;
    the ``_SUCCESS``-gated version directories are the plain-FS analog.
    """
    config = config or PipelineConfig()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_er_batch(batch_df, int(batch_id), state_dir, config)

    return (
        transcripts_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
