"""Span operators (greedy prune vs single-threaded oracle) and text-format
sources (TSV/CoNLL round-trips)."""

import os
import sys

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark.operators import spans
from blink_spark.sources import fixtures, text_formats

SF_DIR = "/root/testdata/sf0.001"


def _greedy_oracle(rows):
    """Single-threaded reference implementation of W4 greedy overlap prune."""
    out = []
    by_group = {}
    for g, sid, s, e, sc in rows:
        by_group.setdefault(g, []).append((sid, s, e, sc))
    for g, items in by_group.items():
        items.sort(key=lambda r: (-r[3], r[0]))
        kept = []
        for sid, s, e, sc in items:
            if all(not (s < ke and ks < e) for _, ks, ke, _ in kept):
                kept.append((sid, s, e, sc))
        out.extend((g, sid) for sid, *_ in kept)
    return sorted(out)


def test_greedy_overlap_prune_matches_oracle(spark):
    rows = [
        # group 1: overlapping chain — greedy by score keeps 10 and 30
        (1, 10, 0.0, 5.0, 9.0),
        (1, 20, 4.0, 9.0, 8.0),   # overlaps 10 → dropped
        (1, 30, 5.0, 8.0, 7.0),   # touches 10 at boundary (half-open) → kept
        # group 2: tie on score — span_id breaks the tie deterministically
        (2, 1, 0.0, 4.0, 5.0),
        (2, 2, 3.0, 6.0, 5.0),
        # group 3: singleton
        (3, 7, 1.0, 2.0, 0.5),
    ]
    df = spark.createDataFrame(rows, "group_id long, span_id long, start double, end double, score double")
    got = sorted((r.group_id, r.span_id) for r in spans.greedy_overlap_prune(df).collect())
    assert got == _greedy_oracle(rows)
    assert got == [(1, 10), (1, 30), (2, 1), (3, 7)]


def test_greedy_prune_partition_invariance(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (g, i, float(s := rnd.randint(0, 50)), float(s + rnd.randint(1, 10)), round(rnd.random(), 6))
        for g in range(20)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "group_id long, span_id long, start double, end double, score double")
    a = sorted(map(tuple, spans.greedy_overlap_prune(df.repartition(2)).collect()))
    b = sorted(map(tuple, spans.greedy_overlap_prune(df.repartition(17)).collect()))
    assert a == b
    assert sorted((r[0], r[1]) for r in a) == _greedy_oracle(rows)


def test_joint_score_log_softmax_sums_to_one(spark):
    import math

    df = spark.createDataFrame(
        [(1, 1, 0.2), (1, 2, 1.5), (1, 3, -0.7), (2, 4, 0.0)],
        "user_id long, event_id long, logit double",
    )
    out = spans.joint_score(df, group_col="user_id", logit_col="logit").collect()
    # joint - log_sigmoid == log_softmax; per group the softmax probs sum to 1
    by_group = {}
    for r in out:
        ls = r.joint + math.log1p(math.exp(-r.logit))  # remove log-sigmoid term
        by_group.setdefault(r.user_id, []).append(math.exp(ls))
    for g, probs in by_group.items():
        assert abs(sum(probs) - 1.0) < 1e-9, (g, probs)


def test_solr_escape_reference_semantics(spark):
    from blink_spark.functions.text import solr_escape

    cases = [
        # whole-string bare operators lowercase as-is
        ("OR", "or"),
        ("AND", "and"),
        # interior / leading / trailing bare operators
        ("foo AND bar", "foo and bar"),
        ("OR leading", "or leading"),
        ("trailing OR", "trailing or"),
        # every Lucene metacharacter gets a backslash
        ('a+b:c (x) "y"~2 / [z]', 'a\\+b\\:c \\(x\\) \\"y\\"\\~2 \\/ \\[z\\]'),
        # lowering runs before escaping; plain text is untouched
        ("find:this AND that", "find\\:this and that"),
        ("plain words only", "plain words only"),
        # ANDROID / ORBIT are not bare operators
        ("ANDROID ORBIT", "ANDROID ORBIT"),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], "i long, q string")
    got = {r.i: r.e for r in df.select("i", solr_escape(F.col("q")).alias("e")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_enumerate_scored_spans_hand_computed(spark):
    # tokens of "ab c": ['ab', 'c'] → start_lp = len/4, end_lp = ascii/8,
    # inside_lp = -len/16 (all dyadic → exact float arithmetic)
    df = spark.createDataFrame([(7, "ab c")], "doc_id long, text string")
    rows = {
        (r.start_idx, r.end_idx): r.span_score
        for r in spans.enumerate_scored_spans(df).collect()
    }
    assert rows == {
        (0, 1): 0.5 + 99 / 8.0 - 0.1875,  # 12.6875
        (1, 1): 0.25 + 99 / 8.0 - 0.0625,  # 12.5625
        (0, 0): 0.5 + 97 / 8.0 - 0.125,  # 12.5
    }


def test_enumerate_scored_spans_caps(spark):
    text = " ".join(["tok"] * 12)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = spans.enumerate_scored_spans(df, max_len=3, k=100).collect()
    # 12 + 11 + 10 spans of lengths 1..3, none longer than max_len
    assert len(out) == 33
    assert max(r.end_idx - r.start_idx + 1 for r in out) == 3
    topk = spans.enumerate_scored_spans(df, max_len=3, k=4).collect()
    assert len(topk) == 4


def test_span_embedding_pool_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, 1, 2, [1.0, 2.0, 4.0, 8.0])],
        "vec_id long, start_idx int, span_len int, embedding array<float>",
    )
    r = spans.span_embedding_pool(df).collect()[0]
    assert r.mean_pool == 3.0  # mean of [2.0, 4.0]
    assert r.first_val == 2.0 and r.last_val == 4.0


def test_tsv_fixture_roundtrip(spark):
    path = fixtures.tsv_fixture(SF_DIR)
    df = text_formats.read_tsv_positional(spark, path, ["doc_id", "lang", "head"])
    n_lines = sum(1 for _ in open(path))
    assert df.count() == n_lines
    assert df.where(F.col("doc_id").cast("long").isNull()).count() == 0


def test_conll_parse_spans(spark):
    path = fixtures.conll_fixture(SF_DIR)
    toks = text_formats.parse_conll(spark, path)
    mentions = text_formats.conll_mentions(toks)

    # oracle: parse the file single-threaded
    exp_docs, exp_mentions = 0, 0
    n_tok = 0
    for line in open(path):
        line = line.rstrip("\n")
        if line.startswith("-DOCSTART-"):
            exp_docs += 1
        elif line.strip():
            n_tok += 1
            if line.split("\t")[1] == "B":
                exp_mentions += 1
    assert toks.select("doc_id").distinct().count() == exp_docs
    assert toks.count() == n_tok
    assert mentions.count() == exp_mentions
    # every B followed by I yields a two-token mention: end - start ∈ {0, 1}
    bad = mentions.where(~(F.col("end") - F.col("start")).isin(0, 1)).count()
    assert bad == 0
    # mention text is space-joined tokens in order
    m = mentions.orderBy("doc_id", "mention_id").first()
    assert isinstance(m.mention, str) and len(m.mention) > 0


def test_conll_orphan_i_tokens_ignored(spark, tmp_path):
    """An I-tagged token with no preceding B in its doc is an orphan run —
    the reference's stateful parse skips it; no phantom mention −1."""
    path = str(tmp_path / "orphan.conll")
    with open(path, "w") as f:
        f.write(
            "-DOCSTART- (0)\n"
            "stray\tI\n"      # orphan I before any B → no mention
            "alpha\tO\n"
            "Bob\tB\n"
            "Smith\tI\n"
            "\n"
            "-DOCSTART- (1)\n"
            "lone\tI\n"       # doc that is ONLY an orphan I run
            "\n"
        )
    toks = text_formats.parse_conll(spark, path)
    mentions = text_formats.conll_mentions(toks)
    rows = sorted(map(tuple, mentions.select("doc_id", "mention_id", "mention").collect()))
    assert rows == [(0, 0, "Bob Smith")]
    # the orphan tokens are still scanned, just unassigned
    assert toks.where(F.col("token") == "stray").count() == 1
    assert toks.where(F.col("token") == "stray").first().mention_id is None


def test_jsonl_roundtrip(spark, tmp_path):
    """S14: JSONL writer/reader round-trip (`blink/utils.py:110-117`)."""
    df = spark.createDataFrame(
        [(1, "alpha", 2.5), (2, "beta", None)], "id long, name string, score double"
    )
    path = str(tmp_path / "out.jsonl")
    df.write.mode("overwrite").json(path)
    back = spark.read.json(path, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_sentence_split(spark):
    df = spark.createDataFrame(
        [(1, "Hello there. How are you? Fine!"), (2, "no terminal punct")],
        "doc_id long, text string",
    )
    out = text_formats.split_sentences(df).collect()
    got = {(r.doc_id, r.sent_idx): r.sentence for r in out}
    assert got[(1, 0)] == "Hello there."
    assert got[(1, 1)] == "How are you?"
    assert got[(1, 2)] == "Fine!"
    assert got[(2, 0)] == "no terminal punct"


def test_sqlite_scan_roundtrip(spark, tmp_path):
    """S11: SQLite → parquet-export scan returns exactly the db's rows."""
    import sqlite3

    from blink_spark.sources import sqlite_scan

    db = str(tmp_path / "m.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE mapping (id INTEGER, title TEXT, wikidata_id TEXT)")
    rows = [(i, f"title {i}", f"Q{i * 7}") for i in range(250)] + [(999, None, None)]
    con.executemany("INSERT INTO mapping VALUES (?, ?, ?)", rows)
    con.commit()
    con.close()
    df = sqlite_scan.read_sqlite(spark, db, "mapping", cache_dir=str(tmp_path / "cache"))
    got = sorted(map(tuple, df.collect()))
    assert got == sorted(rows)
    # cache hit: same db stats → no re-export (same DataFrame content)
    again = sqlite_scan.read_sqlite(spark, db, "mapping", cache_dir=str(tmp_path / "cache"))
    assert again.count() == len(rows)


def test_doc_block_parse(spark, tmp_path):
    """S7: block reassembly — orphan lines before any tag are dropped,
    blank lines skipped, intro = first non-blank content line."""
    path = str(tmp_path / "blocks.txt")
    with open(path, "w") as f:
        f.write(
            "orphan line before any doc\n"
            '<doc id="7" url="u">\n'
            "\n"
            "first paragraph of seven\n"
            "second paragraph\n"
            "</doc>\n"
            '<doc id="9" url="u">\n'
            "only paragraph of nine\n"
            "</doc>\n"
        )
    blocks = text_formats.parse_doc_blocks(spark, path)
    got = sorted(map(tuple, blocks.select("doc_id", "content_idx", "line").collect()))
    assert got == [
        (7, 0, "first paragraph of seven"),
        (7, 1, "second paragraph"),
        (9, 0, "only paragraph of nine"),
    ]
    intros = {r.doc_id: r.intro for r in text_formats.doc_intros(blocks).collect()}
    assert intros == {7: "first paragraph of seven", 9: "only paragraph of nine"}
