"""Incremental ER: delta update ≡ full-batch run, plus the streaming surface."""

import pytest
from pyspark.sql import functions as F

from blink_spark import synth
from blink_spark.operators import blocking, incremental
from blink_spark.pipeline import ERPipeline


@pytest.fixture(scope="module")
def corpus(spark):
    t, labels = synth.transcripts_df(spark, synth.SynthConfig(n_conversations=90, seed=42))
    return t.persist(), labels


def _split(transcripts):
    """Deterministic conversation-level split (turns never straddle halves)."""
    old = transcripts.where(F.crc32("conv_id") % 2 == 0)
    new = transcripts.where(F.crc32("conv_id") % 2 == 1)
    return old, new


def _rows(df):
    return sorted((r["conv_id"], r["cluster_id"]) for r in df.collect())


def test_incremental_equals_batch(spark, corpus):
    """Phase-1 batch on half the corpus + delta update with the other half
    must reproduce the one-shot full-batch assignment exactly — the
    star-edge CC merge and the new×(new ∪ old) delta blocking are lossless."""
    transcripts, _ = corpus
    old_t, new_t = _split(transcripts)

    full = ERPipeline().run(spark, transcripts, compute_metrics=False)
    phase1 = ERPipeline().run(spark, old_t, compute_metrics=False)
    res = incremental.incremental_update(new_t, phase1.features, phase1.assignments)

    assert _rows(res.assignments) == _rows(full.assignments)
    res.unpersist()
    phase1.unpersist()
    full.unpersist()


def test_no_old_old_pairs(spark, corpus):
    """The delta plan never generates old×old candidate pairs."""
    transcripts, _ = corpus
    old_t, new_t = _split(transcripts)
    pipe = ERPipeline()
    feats_old = pipe.build_features(pipe.build_docs(old_t)).persist()
    feats_new = pipe.build_features(pipe.build_docs(new_t)).persist()
    new_ids = {r["conv_id"] for r in feats_new.select("conv_id").collect()}
    pairs = incremental.delta_candidate_pairs(feats_old, feats_new)
    for r in pairs.collect():
        assert r["conv_a"] in new_ids or r["conv_b"] in new_ids
    feats_old.unpersist()
    feats_new.unpersist()


def test_empty_delta_preserves_assignment(spark, corpus):
    """An empty micro-batch leaves the cluster state unchanged."""
    transcripts, _ = corpus
    old_t, _ = _split(transcripts)
    phase1 = ERPipeline().run(spark, old_t, compute_metrics=False)
    empty = spark.createDataFrame([], old_t.schema)
    res = incremental.incremental_update(empty, phase1.features, phase1.assignments)
    assert _rows(res.assignments) == _rows(phase1.assignments)
    res.unpersist()
    phase1.unpersist()


def test_bridge_conversation_merges_clusters(spark):
    """A new conversation that matches members of two existing clusters
    merges them into one (the star-edge union handles cross-cluster joins)."""
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    other = "one two three four five six seven eight nine ten " * 6
    rows = [
        ("a1", 0, base), ("a2", 0, base),          # cluster A (exact dups)
        ("b1", 0, other), ("b2", 0, other),        # cluster B
    ]
    old_t = spark.createDataFrame(
        [(c, i, t) for c, i, t in rows], "conv_id string, turn_idx int, text string"
    )
    phase1 = ERPipeline().run(spark, old_t, compute_metrics=False)
    clusters_before = {r["conv_id"]: r["cluster_id"] for r in phase1.assignments.collect()}
    assert clusters_before["a1"] != clusters_before["b1"]

    # the bridge doc contains both texts → matches members of A and B
    bridge = spark.createDataFrame(
        [("z_bridge", 0, base), ("z_bridge", 1, other)],
        "conv_id string, turn_idx int, text string",
    )
    res = incremental.incremental_update(bridge, phase1.features, phase1.assignments)
    after = {r["conv_id"]: r["cluster_id"] for r in res.assignments.collect()}
    merged_ids = {after[c] for c in ("a1", "a2", "b1", "b2", "z_bridge")}
    assert len(merged_ids) == 1, after
    res.unpersist()
    phase1.unpersist()


def test_streaming_incremental_er(spark, corpus, tmp_path):
    """End-to-end streaming: two file-batches through incremental_er_stream
    reproduce the one-shot batch assignment."""
    transcripts, _ = corpus
    old_t, new_t = _split(transcripts)
    src = str(tmp_path / "stream_src")
    # one file per half so a conversation never straddles micro-batches
    old_t.coalesce(1).write.mode("overwrite").parquet(src)
    new_t.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(synth.TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental.incremental_er_stream(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    got = incremental.read_latest_assignments(spark, str(tmp_path / "state"))
    full = ERPipeline().run(spark, transcripts, compute_metrics=False)
    assert _rows(got) == _rows(full.assignments)
    full.unpersist()


def test_er_batch_replay_idempotent(spark, corpus, tmp_path):
    """Crash-recovery path: replaying a batch_id (the foreachBatch retry
    Structured Streaming performs after a mid-batch failure) must not see
    its own failed attempt's output — the replayed batch reads only
    features with batch_id < its own and only assignment versions < its
    own, so the result is duplicate-free and identical to the first
    attempt. Pruning keeps the immediate predecessor version (the one a
    replay needs — the engine checkpoint-commits a batch only after
    process() returns) and deletes everything older."""
    from blink_spark.pipeline import PipelineConfig

    transcripts, _ = corpus
    thirds = [transcripts.where(F.crc32("conv_id") % 3 == i) for i in range(3)]
    state = str(tmp_path / "state")
    cfg = PipelineConfig()

    for i, part in enumerate(thirds):
        incremental.process_er_batch(part, i, state, cfg)
    # v=0 pruned after v=2 committed; v=1 retained for a batch-2 replay
    assert incremental.list_assignment_versions(spark, state) == [1, 2]
    first = _rows(incremental.read_latest_assignments(spark, state))

    # the retry: batch 2 runs again against state that already contains
    # batch 2's own feature partition and assignment version
    incremental.process_er_batch(thirds[2], 2, state, cfg)
    replayed = incremental.read_latest_assignments(spark, state)
    assert replayed.groupBy("conv_id").count().where("count > 1").count() == 0
    assert _rows(replayed) == first
    assert incremental.list_assignment_versions(spark, state) == [1, 2]

    # and the full streamed state equals the one-shot batch clustering
    full = ERPipeline().run(spark, transcripts, compute_metrics=False)
    assert _rows(replayed) == _rows(full.assignments)
    full.unpersist()
