"""Deterministic synthetic multi-turn transcript corpus with planted duplicates.

BASELINE.json's input_hint specifies the input table shape:

    transcripts(conv_id: string, turn_idx: int, role: string,
                text: string, tool: string, ts: timestamp)

No external data is allowed, so tests and benchmarks synthesize this table
deterministically (seeded numpy; same seed + same size → byte-identical
corpus regardless of parallelism).

The corpus plants *duplicate conversations*: each selected base conversation
gets 1..3 corrupted copies (typos, word drops/dups, turn truncation,
whitespace/case noise — the ER-noise analog of the reference's hard
zero-shot mention variation). The gold ``entity_id`` per conversation and a
``labeled_pairs(conv_a, conv_b, is_match)`` table drive the pairwise-F1
≥ 0.99 gate (reference analog: gold ``label_id`` per mention,
``blink/main_dense.py:179-203``).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

LABELS_SCHEMA = T.StructType(
    [
        T.StructField("conv_a", T.StringType(), False),
        T.StructField("conv_b", T.StringType(), False),
        T.StructField("is_match", T.IntegerType(), False),
    ]
)

_VOCAB = (
    "the quick brown fox jumps over lazy dog spark query plan shuffle join filter "
    "window agg table scan merge sort hash key row column batch stream data value "
    "please check error retry timeout config deploy cluster node task stage executor "
    "memory disk network file read write open close list find search index cache "
    "user agent tool call result answer question context token model train eval"
).split()

_TOOLS = ["search", "calculator", "browser", "python", "sql", "none"]
_ROLES = ["user", "assistant", "tool"]
_EPOCH = datetime(2026, 1, 1)


@dataclass
class SynthConfig:
    n_conversations: int = 200
    mean_turns: int = 8
    dup_fraction: float = 0.3  # fraction of base convs that get duplicates
    max_copies: int = 3
    seed: int = 42
    n_negative_pairs: int | None = None  # default: 3× positives


def _base_turn_text(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(rng.choice(_VOCAB, size=n_words))


def _corrupt_text(rng: np.random.Generator, text: str) -> str:
    """Apply 1-3 random cheap corruptions; keeps the text recognizably similar."""
    words = text.split()
    for _ in range(rng.integers(1, 4)):
        op = rng.integers(0, 5)
        if op == 0 and len(words) > 3:  # drop a word
            del words[rng.integers(0, len(words))]
        elif op == 1 and words:  # duplicate a word
            i = int(rng.integers(0, len(words)))
            words.insert(i, words[i])
        elif op == 2 and words:  # typo: swap two chars in a word
            i = int(rng.integers(0, len(words)))
            w = list(words[i])
            if len(w) > 2:
                j = int(rng.integers(0, len(w) - 1))
                w[j], w[j + 1] = w[j + 1], w[j]
                words[i] = "".join(w)
        elif op == 3 and words:  # case noise
            i = int(rng.integers(0, len(words)))
            words[i] = words[i].upper()
        else:  # whitespace noise (double space survives split/join? keep token dup)
            i = int(rng.integers(0, max(1, len(words))))
            words.insert(min(i, len(words)), words[min(i, len(words) - 1)] if words else "x")
    return " ".join(words)


def generate_pandas(cfg: SynthConfig) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Generate (transcripts, labeled_pairs) as pandas DataFrames.

    Deterministic in ``cfg`` alone. ``entity_id`` is encoded in conv_id as
    ``e{entity:06d}_c{copy}`` so tests can recover gold clusters trivially.
    """
    rng = np.random.default_rng(cfg.seed)
    rows = []
    conv_entities: dict[str, int] = {}

    for ent in range(cfg.n_conversations):
        n_turns = int(rng.integers(max(2, cfg.mean_turns - 3), cfg.mean_turns + 4))
        base_ts = _EPOCH + timedelta(minutes=int(rng.integers(0, 500_000)))
        base_turns = []
        for t in range(n_turns):
            role = _ROLES[t % 2] if rng.random() > 0.15 else "tool"
            tool = str(rng.choice(_TOOLS)) if role == "tool" else None
            n_words = int(rng.integers(4, 30))
            base_turns.append((t, role, _base_turn_text(rng, n_words), tool))

        is_dup = rng.random() < cfg.dup_fraction
        n_copies = int(rng.integers(1, cfg.max_copies + 1)) if is_dup else 0
        for copy in range(n_copies + 1):
            conv_id = f"e{ent:06d}_c{copy}"
            conv_entities[conv_id] = ent
            # copies may truncate the final turn (late-cut transcript)
            turns = base_turns
            if copy > 0 and rng.random() < 0.3 and len(base_turns) > 3:
                turns = base_turns[:-1]
            for t, role, text, tool in turns:
                out_text = text if copy == 0 else _corrupt_text(rng, text)
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": t,
                        "role": role,
                        "text": out_text,
                        "tool": tool,
                        "ts": base_ts + timedelta(seconds=30 * t + copy),
                    }
                )

    transcripts = pd.DataFrame(rows)

    # labeled pairs: all positive pairs within an entity + sampled negatives
    by_ent: dict[int, list[str]] = {}
    for cid, ent in conv_entities.items():
        by_ent.setdefault(ent, []).append(cid)
    pos = []
    for ent, cids in by_ent.items():
        cids = sorted(cids)
        for i in range(len(cids)):
            for j in range(i + 1, len(cids)):
                pos.append((cids[i], cids[j], 1))
    n_neg = cfg.n_negative_pairs if cfg.n_negative_pairs is not None else 3 * max(1, len(pos))
    all_cids = sorted(conv_entities)
    neg = []
    seen = set()
    while len(neg) < n_neg:
        a, b = rng.choice(len(all_cids), size=2, replace=False)
        ca, cb = all_cids[min(a, b)], all_cids[max(a, b)]
        if conv_entities[ca] == conv_entities[cb] or (ca, cb) in seen:
            continue
        seen.add((ca, cb))
        neg.append((ca, cb, 0))
    labels = pd.DataFrame(pos + neg, columns=["conv_a", "conv_b", "is_match"])
    return transcripts, labels


def transcripts_df(spark: SparkSession, cfg: SynthConfig | None = None) -> tuple[DataFrame, DataFrame]:
    """Spark DataFrames (transcripts, labeled_pairs) for a config."""
    cfg = cfg or SynthConfig()
    tp, lp = generate_pandas(cfg)
    t = spark.createDataFrame(tp, schema=TRANSCRIPT_SCHEMA)
    l = spark.createDataFrame(lp, schema=LABELS_SCHEMA)
    return t, l


def scale_config(sf: float, seed: int = 42) -> SynthConfig:
    """Map a TPC-H-ish scale factor to a corpus size (sf0.1 → 20k convs ≈ 160k turns)."""
    return SynthConfig(n_conversations=max(50, int(200_000 * sf)), seed=seed)


def sf_from_dir(sf_dir: str) -> float:
    """Parse the scale factor out of a `/root/testdata/sf0.01`-style path."""
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return float(name.removeprefix("sf")) if name.startswith("sf") else 0.01
