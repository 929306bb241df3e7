"""Synthetic transcript corpus: determinism, schema, label consistency."""

import pandas as pd

from blink_spark import synth


def test_deterministic():
    cfg = synth.SynthConfig(n_conversations=40, seed=7)
    t1, l1 = synth.generate_pandas(cfg)
    t2, l2 = synth.generate_pandas(cfg)
    pd.testing.assert_frame_equal(t1, t2)
    pd.testing.assert_frame_equal(l1, l2)


def test_seed_changes_corpus():
    t1, _ = synth.generate_pandas(synth.SynthConfig(n_conversations=40, seed=7))
    t2, _ = synth.generate_pandas(synth.SynthConfig(n_conversations=40, seed=8))
    assert not t1.equals(t2)


def test_schema_and_shape():
    t, l = synth.generate_pandas(synth.SynthConfig(n_conversations=30, seed=1))
    assert list(t.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t["turn_idx"].min() == 0
    assert set(t["role"]) <= {"user", "assistant", "tool"}
    # every conversation has contiguous turn_idx from 0
    for cid, grp in t.groupby("conv_id"):
        idx = sorted(grp["turn_idx"])
        assert idx == list(range(len(idx)))


def test_labels_consistent_with_entity_encoding():
    _, l = synth.generate_pandas(synth.SynthConfig(n_conversations=50, seed=3))
    ent = lambda cid: cid.split("_")[0]
    pos = l[l.is_match == 1]
    neg = l[l.is_match == 0]
    assert len(pos) > 0 and len(neg) > 0
    assert (pos.conv_a.map(ent) == pos.conv_b.map(ent)).all()
    assert (neg.conv_a.map(ent) != neg.conv_b.map(ent)).all()
    # canonical ordering, no dups
    assert (l.conv_a < l.conv_b).all()
    assert not l.duplicated(["conv_a", "conv_b"]).any()
