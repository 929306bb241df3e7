"""Operator parity registry: SURVEY.md §2 operators as (spark query, DuckDB oracle) pairs.

Each entry is one implemented operator family from the survey, expressed as
an idiomatic DataFrame query over the driver's sf-scaled parquet tables plus
an equivalent ANSI-SQL string for the DuckDB oracle (views pre-registered:
region nation customer supplier part orders lineitem events documents
embeddings). Computed columns are aliased identically on both sides; doubles
are rounded to fixed precision before comparison.

Non-SQL-expressible operators (MinHash/SimHash kernels, the ER pipeline,
LSH buckets, multimodal UDFs) register a query with ``oracle=None`` —
the driver records a rows-only check for those; their real verification is
tests/ (kernel unit tests + union-find / brute-force oracles).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blink_spark.functions.text import (
    canonicalize,
    context_quota_window,
    solr_escape,
    token_ngrams_from_tokens,
    tokens,
    word_window,
)
from blink_spark.operators import blocking, dedup, multimodal, similarity, spans, textstats

_CANON_SQL = "trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"
_TOKENS_SQL = f"string_split({_CANON_SQL.format(c='text')}, ' ')"
_GRAMS_SQL = (
    "list_distinct(CASE WHEN len(t) >= 3 THEN "
    "list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) "
    "ELSE [array_to_string(t, ' ')] END)"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _fixture_path(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Per-run scratch path for sink round-trip entries. Keyed by the Spark
    applicationId so two concurrent sessions at the same sf never share a
    sink path (one reading while the other overwrites gave flaky results
    with the old sf-only key)."""
    import os as _os

    app = spark.sparkContext.applicationId
    return f"/tmp/blink_fixtures/{app}/{_os.path.basename(sf_dir.rstrip('/'))}_{name}"


# Streaming entries additionally key their scratch dir by an invocation
# counter: their source dirs and STATEFUL checkpoints must not be shared
# across two calls in one session (a reused availableNow checkpoint would
# treat the second call's rewritten source files as NEW micro-batches and
# double-process). Batch sink entries don't need this — mode("overwrite")
# already makes them call-idempotent.
_STREAM_CALL = __import__("itertools").count()


def _finalize(df: DataFrame, caches: list) -> DataFrame:
    """Materialize a small result via ``localCheckpoint`` and release the
    stage caches it depended on.

    The driver's correctness runner executes every registry query in ONE
    SparkSession; pipeline-style entries persist multi-consumer
    intermediates, and without an explicit release those would pile up
    across the session (deterministic release beats waiting on the
    ContextCleaner's GC-driven cleanup). The result must be materialized
    BEFORE the caches go away — ``localCheckpoint`` is eager, runs the plan
    once, and the caller's later collect reads the checkpointed partitions.

    Trade-off, stated explicitly: the checkpoint RDD itself (one RESULT per
    pipeline-style query, MEMORY_AND_DISK) is released only when the
    returned DataFrame is GC'd (ContextCleaner). That is deliberate — the
    results here are driver-scale (≤ ~10^4 rows at correctness sf), so a
    handful of lingering result partitions is noise, while the STAGE caches
    released above are the sf-scaled ones that would actually accumulate.
    A runner that wants full determinism can unpersist the returned
    DataFrame after collecting it.
    """
    out = df.localCheckpoint()
    for c in caches:
        c.unpersist()
    caches.clear()
    return out


# Constant-oracle VALUES tables for seeded/deterministic entries (generated
# by scripts/gen_const_oracles.py — regression pins, not independent truth;
# independent correctness for those entries lives in tests/).
try:
    from blink_spark.const_oracles import CONST_ORACLES
except ImportError:  # before first generation
    CONST_ORACLES = {}


_FLAGSHIP_CACHE: dict = {}


def _flagship_run(spark: SparkSession, n_conversations: int = 120, seed: int = 42):
    """Memoized flagship corpus + pipeline run shared by the er_* entries.

    The correctness runner executes every registry entry in one session;
    without memoization each er_* entry re-synthesizes the corpus and
    re-runs the full pipeline (5 runs if all five are checked in a round).
    One run per (session, corpus) instead: results are localCheckpoint-ed
    (eager, plan-free) and stage caches released immediately.
    Returns (transcripts, labels, assignments, pairs).
    """
    key = (spark.sparkContext.applicationId, n_conversations, seed)
    if key not in _FLAGSHIP_CACHE:
        from blink_spark import synth
        from blink_spark.pipeline import ERPipeline

        t, labels = synth.transcripts_df(
            spark, synth.SynthConfig(n_conversations=n_conversations, seed=seed)
        )
        res = ERPipeline().run(spark, t, compute_metrics=False)
        out = (
            t.localCheckpoint(),
            labels.localCheckpoint(),
            res.assignments.localCheckpoint(),
            res.pairs.localCheckpoint(),
        )
        res.unpersist()
        _FLAGSHIP_CACHE.clear()  # at most one corpus cached per session
        _FLAGSHIP_CACHE[key] = out
    return _FLAGSHIP_CACHE[key]


# each value: (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Scans / projections / filters (SURVEY §2.1–2.2)
# ---------------------------------------------------------------------------

@q(
    "s1_catalog_scan",
    """SELECT CAST(regexp_extract(source, 'src(\\d+)', 1) AS BIGINT) AS src_id,
              COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY 1""",
)
def s1_catalog_scan(spark, sf_dir):
    """S1: JSONL catalog scan + id extraction (`blink/main_dense.py:99-151`) →
    regexp_extract + cast + agg."""
    return (
        _t(spark, sf_dir, "documents")
        .select(F.regexp_extract("source", r"src(\d+)", 1).cast("long").alias("src_id"), "n_chars")
        .groupBy("src_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@q(
    "s5_tsv_positional_scan",
    """SELECT doc_id, lang,
              string_split(substring(replace(replace(text, chr(9), ' '),
                                             chr(10), ' '), 1, 60), ' ')[1] AS first_tok
       FROM (SELECT doc_id, lang, text FROM documents ORDER BY doc_id LIMIT 200)""",
)
def s5_tsv_positional_scan(spark, sf_dir):
    """S5: headerless positional TSV scan (`dataset.py:18-69`) over a
    deterministic fixture derived from `documents`; parses positional
    fields + a split/element_at projection. The oracle recomputes the
    fixture's rows straight from the documents view, so the TSV
    write→parse round trip is value-checked, not just row-counted."""
    from blink_spark.sources import fixtures, text_formats

    path = fixtures.tsv_fixture(sf_dir)
    df = text_formats.read_tsv_positional(spark, path, ["doc_id", "lang", "head"])
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.element_at(F.split("head", " "), 1).alias("first_tok"),
    )


@q(
    "s6_conll_scan",
    """WITH d AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 50),
        o AS (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS cdoc, text FROM d),
        t AS (SELECT cdoc,
                     CASE WHEN trim(regexp_replace(text, '\\s+', ' ', 'g')) = ''
                          THEN CAST([] AS VARCHAR[])
                          ELSE string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')[1:40]
                     END AS toks
              FROM o),
        m AS (SELECT cdoc, toks,
                     unnest(generate_series(0, CAST(floor((len(toks) - 1) / 7.0) AS INT))) AS mid
              FROM t WHERE len(toks) > 0)
       SELECT cdoc AS doc_id, CAST(mid AS BIGINT) AS mention_id,
              CAST(mid * 7 AS INT) AS start,
              CAST(CASE WHEN mid * 7 + 2 <= len(toks) THEN mid * 7 + 1
                        ELSE mid * 7 END AS INT) AS "end",
              CASE WHEN mid * 7 + 2 <= len(toks)
                   THEN toks[mid * 7 + 1] || ' ' || toks[mid * 7 + 2]
                   ELSE toks[mid * 7 + 1] END AS mention
       FROM m""",
)
def s6_conll_scan(spark, sf_dir):
    """S6: CoNLL token-stream scan with -DOCSTART- boundaries and B/I
    mention assembly (`dataset.py:73-138`) — running-sum window functions
    instead of a per-line Python state machine. The oracle reconstructs the
    deterministic fixture's mention spans (every 7th token opens a B, the
    next continues with I) straight from the documents view, so the whole
    stateful parse is value-checked."""
    from blink_spark.sources import fixtures, text_formats

    path = fixtures.conll_fixture(sf_dir)
    toks = text_formats.parse_conll(spark, path)
    return text_formats.conll_mentions(toks)


@q(
    "s2_mention_scan_remap",
    """WITH cat AS (SELECT source, MIN(doc_id) AS entity_id
                   FROM documents GROUP BY source HAVING COUNT(*) >= 3)
       SELECT d.doc_id, lower(substring(d.text, 1, 40)) AS mention,
              d.source AS label, c.entity_id
       FROM documents d JOIN cat c ON d.source = c.source""",
)
def s2_mention_scan_remap(spark, sf_dir):
    """S2 + P2: mention scan with lowercase normalization, label remapped
    through a KB catalog, mentions with no KB entry dropped
    (`blink/main_dense.py:173-207` ``__load_test`` — "LOWERCASE
    EVERYTHING", `kb2id` remap, `continue` on missing labels). The catalog
    is sources with ≥3 docs (entity_id = min doc_id), broadcast like any
    dimension; the inner join IS the drop-missing filter."""
    d = _t(spark, sf_dir, "documents")
    cat = (
        d.groupBy("source")
        .agg(F.min("doc_id").alias("entity_id"), F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 3)
        .drop("n")
    )
    return (
        d.select("doc_id", F.lower(F.substring("text", 1, 40)).alias("mention"), F.col("source").alias("label"))
        .join(F.broadcast(cat.withColumnRenamed("source", "label")), "label")
        .select("doc_id", "mention", "label", "entity_id")
    )


@q(
    "s3_jsonl_limit_scan",
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
       FROM documents ORDER BY doc_id LIMIT 120""",
)
def s3_jsonl_limit_scan(spark, sf_dir):
    """S3: generic JSONL reader with a debug row-limit
    (`blink/candidate_ranking/utils.py:24-36` — ``read_dataset`` caps at
    200 rows in debug mode). The JSONL fixture derives deterministically
    from `documents`; the limit is taken after an explicit ordering so it
    is the same 120 rows on every engine."""
    from blink_spark.sources import fixtures

    path = fixtures.jsonl_fixture(sf_dir)
    df = spark.read.schema("doc_id long, lang string, n_chars long").json(path)
    return df.orderBy("doc_id").limit(120)


@q(
    "s7_doc_block_reassembly",
    """WITH d AS (SELECT doc_id,
                        replace(replace(text, chr(9), ' '), chr(10), ' ') AS c
                 FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 200)),
        p AS (SELECT doc_id, substring(c, 1, 60) AS l1, substring(c, 61, 60) AS l2 FROM d)
       SELECT doc_id, CASE WHEN trim(l1) <> '' THEN l1 ELSE l2 END AS intro
       FROM p WHERE trim(l1) <> '' OR trim(l2) <> ''""",
)
def s7_doc_block_reassembly(spark, sf_dir):
    """S7: wiki-extractor ``<doc id=..>`` block reassembly keeping the
    intro paragraph (`process_wiki_extractor_output.py:51-93`): block ids
    carried forward relationally (`last(..., ignorenulls)` window), first
    content line kept — checked against an oracle that recomputes the
    fixture's content from the documents view."""
    from blink_spark.sources import fixtures, text_formats

    path = fixtures.docblock_fixture(sf_dir)
    blocks = text_formats.parse_doc_blocks(spark, path)
    return text_formats.doc_intros(blocks)


@q(
    "p12_alias_emoji_filter",
    f"""WITH a AS (
          SELECT doc_id, unnest([t[1], ':)', t[2], '!!', '<3']) AS alias
          FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents))
       SELECT doc_id, COUNT(*) AS n_kept,
              string_agg(alias, ',' ORDER BY alias) AS kept
       FROM a
       WHERE alias IS NOT NULL AND regexp_matches(alias, '^[a-z0-9]+$')
       GROUP BY doc_id""",
)
def p12_alias_emoji_filter(spark, sf_dir):
    """P12: alias emoji/symbol filter (`data_ingestion.py:84-90`,
    `blink/candidate_data_fetcher.py:28-32` drop emoji aliases): each doc
    gets a deterministic alias list salted with symbol junk; only
    plain-alphanumeric aliases survive the regex filter."""
    d = _t(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    aliases = F.array(
        F.element_at(t, 1), F.lit(":)"), F.element_at(t, 2), F.lit("!!"), F.lit("<3")
    )
    return (
        d.select("doc_id", F.explode(aliases).alias("alias"))
        .where(F.col("alias").isNotNull() & F.col("alias").rlike("^[a-z0-9]+$"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(F.array_sort(F.collect_list("alias")), ",").alias("kept"),
        )
    )


@q(
    "s11_sqlite_scan",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
              CAST(n_chars AS BIGINT) AS n_chars
       FROM documents WHERE n_chars >= 200""",
)
def s11_sqlite_scan(spark, sf_dir):
    """S11: SQLite index scan (`generate_wiki2wikidata_mappings.py:35-56`)
    via the export-to-parquet route (`sources/sqlite_scan.py`) — the db
    fixture is derived deterministically from `documents`, so the oracle
    recomputes the same rows from the documents view (a genuine
    db → engine round-trip check)."""
    from blink_spark.sources import fixtures, sqlite_scan

    db = fixtures.sqlite_fixture(sf_dir)
    df = sqlite_scan.read_sqlite(spark, db, "mapping")
    return df.where(F.col("n_chars") >= 200).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
    )


@q(
    "s17_sentence_split",
    """WITH s AS (SELECT doc_id,
                        list_filter(list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'),
                                                   x -> trim(x)), x -> x <> '') AS arr
                 FROM documents)
       SELECT doc_id,
              CAST(unnest(generate_series(1, len(arr))) - 1 AS INTEGER) AS sent_idx,
              unnest(arr) AS sentence
       FROM s""",
)
def s17_sentence_split(spark, sf_dir):
    """S17: sentence segmentation scan (`blink/utils.py:15-30`)."""
    from blink_spark.sources import text_formats

    return text_formats.split_sentences(_t(spark, sf_dir, "documents"))


@q(
    "p1_normalize",
    f"SELECT doc_id, {_CANON_SQL.format(c='text')} AS canon_text FROM documents",
)
def p1_normalize(spark, sf_dir):
    """P1: lowercase-everything normalization (`blink/main_dense.py:84-94`)."""
    return _t(spark, sf_dir, "documents").select("doc_id", canonicalize(F.col("text")).alias("canon_text"))


@q(
    "p2_label_in_kb_filter",
    """SELECT doc_id, label_id FROM (
         SELECT doc_id, doc_id * 7 % 3000 AS label_id FROM documents)
       WHERE label_id IN (SELECT p_partkey FROM part)""",
)
def p2_label_in_kb_filter(spark, sf_dir):
    """P2 direct (previously covered by composition via so4): drop mentions
    whose gold label has no row in the entity catalog —
    `blink/main_dense.py:182-197` `continue`s past samples whose label_id
    is missing from the loaded KB dicts. Mentions = documents with a
    derived gold label; catalog = the part dimension's key set; the
    membership test is ONE broadcast left_semi join (no row is ever
    widened with catalog columns, and the catalog ships once per executor
    like the reference's in-memory title2id dict)."""
    docs = _t(spark, sf_dir, "documents").select(
        # the *7 spreads derived labels past the catalog's key range at
        # every sf, so the membership filter actually rejects rows at the
        # driver's check scale instead of passing everything through
        "doc_id", (F.col("doc_id") * 7 % 3000).alias("label_id")
    )
    kb = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("label_id"))
    return docs.join(F.broadcast(kb), "label_id", "left_semi").select("doc_id", "label_id")


@q(
    "p3_min_token_filter",
    f"""SELECT doc_id, n_tokens FROM (
          SELECT doc_id,
                 CASE WHEN length({_CANON_SQL.format(c='text')}) = 0 THEN 0
                      ELSE len({_TOKENS_SQL}) END AS n_tokens
          FROM documents) WHERE n_tokens >= 60""",
)
def p3_min_token_filter(spark, sf_dir):
    """P3: min-token filter (`data_ingestion.py:119-127`)."""
    return (
        textstats.token_stats(_t(spark, sf_dir, "documents"))
        .where(F.col("n_tokens") >= 60)
        .select("doc_id", "n_tokens")
    )


@q(
    "p4_keyword_filter",
    """SELECT doc_id, lang FROM documents
       WHERE lower(text) NOT LIKE '%window%' AND lang <> 'en'""",
)
def p4_keyword_filter(spark, sf_dir):
    """P4: disambiguation-page-style keyword/field filter (`data_ingestion.py:131-155`)."""
    d = _t(spark, sf_dir, "documents")
    return d.where(~F.lower("text").contains("window") & (F.col("lang") != "en")).select("doc_id", "lang")


@q(
    "p8_context_window",
    f"""SELECT doc_id,
              array_to_string(t[-5:], ' ') || ' ' || array_to_string(t[1:5], ' ') AS ctx
       FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)""",
)
def p8_context_window(spark, sf_dir):
    """P8: last-k/first-k word context truncation (`candidate_retrieval/utils.py:198-208`)."""
    return _t(spark, sf_dir, "documents").select("doc_id", word_window(F.col("text"), 5, 5).alias("ctx"))


@q(
    "p9_lag_lead",
    """SELECT event_id,
              lag(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
              lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
       FROM events""",
)
def p9_lag_lead(spark, sf_dir):
    """P9/W5: prev/next context via lag/lead (`candidate_retrieval/utils.py:221-250`)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@q(
    "p10_context_quota_fit",
    f"""WITH base AS (
          SELECT doc_id,
                 t[2 : 1 + CAST(doc_id % 8 AS INT)] AS l,
                 t[10:11] AS m,
                 t[12:17] AS r
          FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)),
        q1 AS (SELECT doc_id, l, m, r, len(l) AS la, len(r) AS ra,
                      CAST(floor((8 - len(m)) / 2.0) AS INT) - 1 AS lq0
               FROM base),
        q2 AS (SELECT *, 8 - len(m) - lq0 - 2 AS rq0 FROM q1),
        q3 AS (SELECT *,
                      CASE WHEN la <= lq0 AND ra > rq0 THEN rq0 + lq0 - la ELSE rq0 END AS rq,
                      CASE WHEN la > lq0 AND ra <= rq0 THEN lq0 + rq0 - ra ELSE lq0 END AS lq
               FROM q2),
        q4 AS (SELECT doc_id, l, m, r,
                      GREATEST(LEAST(la, lq), 0) AS take_l,
                      GREATEST(LEAST(ra, rq), 0) AS take_r
               FROM q3),
        fit AS (SELECT doc_id,
                       (CASE WHEN take_l > 0 THEN l[len(l) - take_l + 1 : len(l)]
                             ELSE CAST([] AS VARCHAR[]) END)
                       || m || r[1:take_r] AS ctx_arr
                FROM q4)
       SELECT doc_id, array_to_string(ctx_arr, ' ') AS ctx,
              CAST(len(ctx_arr) AS BIGINT) AS n_ctx
       FROM fit""",
)
def p10_context_quota_fit(spark, sf_dir):
    """P10: token-window truncation with left/right quota redistribution
    (`blink/biencoder/data_process.py:26-69`, quota logic `:45-57`) as pure
    column expressions. Left context length varies with ``doc_id % 8`` so
    both redistribution branches (short-left → extend right, short-right →
    extend left) and the no-op branch are all exercised in one run."""
    d = _t(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    parts = d.select(
        "doc_id",
        F.slice(t, 2, (F.col("doc_id") % 8).cast("int")).alias("l"),
        F.slice(t, 10, 2).alias("m"),
        F.slice(t, 12, 6).alias("r"),
    )
    fit = context_quota_window(F.col("l"), F.col("m"), F.col("r"), max_tokens=8)
    return parts.select(
        "doc_id", F.array_join(fit, " ").alias("ctx"), F.size(fit).cast("long").alias("n_ctx")
    )


@q(
    "s9_link_extraction_chain",
    f"""WITH h AS (
          SELECT '<doc><a href="' || t[1] || '%20' || lang || '">t</a> <a href="'
                 || lang || '_' || source || '">s</a></doc>' AS html
          FROM (SELECT lang, source, {_TOKENS_SQL} AS t FROM documents)),
        raw AS (SELECT unnest(regexp_extract_all(html, '<a href="([^"]+)"', 1)) AS raw FROM h),
        norm AS (SELECT upper(substring(x, 1, 1)) || substring(x, 2) AS target
                 FROM (SELECT replace(replace(raw, '%20', ' '), '_', ' ') AS x FROM raw))
       SELECT target, COUNT(*) AS n_links FROM norm GROUP BY target""",
)
def s9_link_extraction_chain(spark, sf_dir):
    """S9 → J8 chain: hyperlink extraction with unquote-style normalization
    feeding the incoming-link count join
    (`blink/candidate_retrieval/process_wiki_extractor_output_links.py:53-119`
    regex fallback + urllib unquote `:86-88`; count agg `enrich_data.py:79-140`).

    A deterministic html column is synthesized from each document (one
    %20-quoted href + one underscore href), links come back out via
    ``regexp_extract_all``, are unquoted / de-underscored / capitalized
    like the reference, then counted per target."""
    d = _t(spark, sf_dir, "documents")
    first_tok = F.element_at(tokens(F.col("text")), 1)
    html = F.concat(
        F.lit('<doc><a href="'),
        first_tok,
        F.lit("%20"),
        F.col("lang"),
        F.lit('">t</a> <a href="'),
        F.col("lang"),
        F.lit("_"),
        F.col("source"),
        F.lit('">s</a></doc>'),
    )
    raw = d.select(html.alias("html")).select(
        F.explode(F.regexp_extract_all(F.col("html"), F.lit('<a href="([^"]+)"'), 1)).alias("raw")
    )
    x = F.regexp_replace(F.regexp_replace(F.col("raw"), "%20", " "), "_", " ")
    target = F.concat(F.upper(F.substring("x", 1, 1)), F.substring("x", 2, 1 << 20))
    return (
        raw.select(x.alias("x"))
        .select(target.alias("target"))
        .groupBy("target")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


@q(
    "s10_nested_json",
    """WITH j AS (
         SELECT event_id,
                '{"meta":{"type":"' || event_type || '","id":' || CAST(event_id AS VARCHAR) ||
                CASE WHEN event_id % 3 <> 0
                     THEN '},"sitelinks":{"enwiki":{"title":"u' || CAST(user_id AS VARCHAR) || '"}}}'
                     ELSE '}}' END AS js
         FROM events)
       SELECT event_id,
              json_extract_string(js, '$.meta.type') AS type,
              COALESCE(json_extract_string(js, '$.sitelinks.enwiki.title'),
                       'fallback_' || json_extract_string(js, '$.meta.type')) AS title
       FROM j""",
)
def s10_nested_json(spark, sf_dir):
    """S10: deep nested-JSON navigation with defaults
    (`blink/candidate_retrieval/process_wikidata.py:48-99`, nested
    ``sitelinks.enwiki`` access with fallbacks `:66-86`): a two-level JSON
    document (every third row missing the ``sitelinks`` branch) parsed
    with an explicit ``from_json`` struct schema, navigated two levels
    deep, with a coalesce default on the missing branch."""
    e = _t(spark, sf_dir, "events")
    js = F.concat(
        F.lit('{"meta":{"type":"'),
        F.col("event_type"),
        F.lit('","id":'),
        F.col("event_id").cast("string"),
        F.when(
            F.col("event_id") % 3 != 0,
            F.concat(
                F.lit('},"sitelinks":{"enwiki":{"title":"u'),
                F.col("user_id").cast("string"),
                F.lit('"}}}'),
            ),
        ).otherwise(F.lit("}}")),
    )
    schema = "meta struct<type:string,id:bigint>, sitelinks struct<enwiki:struct<title:string>>"
    p = e.select("event_id", F.from_json(js, schema).alias("o"))
    return p.select(
        "event_id",
        F.col("o.meta.type").alias("type"),
        F.coalesce(
            F.col("o.sitelinks.enwiki.title"), F.concat(F.lit("fallback_"), F.col("o.meta.type"))
        ).alias("title"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

@q(
    "j1_broadcast_dim_join",
    """SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
              ROUND(SUM(o.o_totalprice), 2) AS total
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY 1""",
)
def j1_broadcast_dim_join(spark, sf_dir):
    """J1: broadcast hash join to a dimension (`blink/main_dense.py:154-170`)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@q(
    "j6_fallback_join",
    """SELECT c.c_custkey AS custkey, COALESCE(n.n_name, r.r_name) AS resolved_name
       FROM customer c
       LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey AND n.n_nationkey < 20
       LEFT JOIN region r ON (c.c_nationkey % 5) = r.r_regionkey""",
)
def j6_fallback_join(spark, sf_dir):
    """J6: two-key fallback join with coalesce (`link_wikipedia_and_wikidata.py:76-114`)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(n, (c.c_nationkey == n.n_nationkey) & (n.n_nationkey < 20), "left")
        .join(r, (c.c_nationkey % 5) == r.r_regionkey, "left")
        .select(F.col("c_custkey").alias("custkey"), F.coalesce("n_name", "r_name").alias("resolved_name"))
    )


@q(
    "j8_link_count_join",
    """SELECT c.c_custkey AS custkey, c.c_name AS name, e.n_events
       FROM (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) e
       JOIN customer c ON c.c_custkey = e.user_id""",
)
def j8_link_count_join(spark, sf_dir):
    """J8: link-count aggregation join (`enrich_data.py:79-140`)."""
    e = _t(spark, sf_dir, "events").groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    c = _t(spark, sf_dir, "customer")
    return e.join(c, e.user_id == c.c_custkey).select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"), "n_events"
    )


_J4_MAX_DF = 64  # hot-gram cap: grams in more docs than this are dropped


@q(
    "j4_token_blocking_join",
    f"""WITH g0 AS (
          SELECT doc_id, unnest(grams) AS gram FROM (
            SELECT doc_id, {_GRAMS_SQL} AS grams
            FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents))),
        keep AS (SELECT gram FROM g0 GROUP BY gram HAVING COUNT(*) <= {_J4_MAX_DF}),
        g AS (SELECT g0.doc_id, g0.gram FROM g0 JOIN keep USING (gram))
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
       GROUP BY 1, 2 HAVING COUNT(*) >= 5""",
)
def j4_token_blocking_join(spark, sf_dir):
    """J4: token-blocking equi-join, the BM25-retrieval analog
    (`blink/candidate_generation.py:68-115`): explode shingles ⋈ shingles,
    count shared keys per pair.

    Hot grams (document frequency > ``_J4_MAX_DF``) are dropped before the
    self-join — the same `cap_blocks` guard as the real blocking path
    (`operators/blocking.py`): a single boilerplate gram shared by B docs
    would otherwise emit B² join rows, the ER scale killer. The oracle
    applies the identical cap.
    """
    d = _t(spark, sf_dir, "documents")
    g = d.select("doc_id", tokens(F.col("text")).alias("t")).select(
        "doc_id", F.explode(F.array_distinct(token_ngrams_from_tokens(F.col("t"), 3))).alias("gram")
    )
    hot = g.groupBy("gram").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") > _J4_MAX_DF)
    g = g.join(F.broadcast(hot.select("gram")), "gram", "left_anti")
    a = g.select(F.col("doc_id").alias("doc_a"), "gram")
    b = g.select(F.col("doc_id").alias("doc_b"), "gram")
    return (
        a.join(b, "gram")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= 5)
    )


_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_MAX_DF = 64  # hot-token guard, same role as _J4_MAX_DF


_BIGRAMS_SQL = (
    "CASE WHEN len(t) >= 2 THEN "
    "list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1]) "
    "ELSE [array_to_string(t, ' ')] END"
)


@q(
    "j4_bm25_scored_topk",
    f"""WITH tok AS (
          SELECT doc_id, unnest(g) AS tok
          FROM (SELECT doc_id, {_BIGRAMS_SQL} AS g
                FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents))),
        tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok2 GROUP BY 1, 2),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY 1),
        stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
        idf AS (SELECT tok, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf, avgdl
                FROM (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
                      HAVING COUNT(*) <= {_BM25_MAX_DF}), stats),
        q AS (SELECT query_id, tok FROM (
                SELECT doc_id AS query_id, unnest(list_sort(list_distinct(g))[1:6]) AS tok
                FROM (SELECT doc_id, {_BIGRAMS_SQL} AS g
                      FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
                            WHERE doc_id % 20 = 0)))
              WHERE tok <> ''),
        scored AS (
          SELECT q.query_id, tf.doc_id AS cand_id,
                 SUM(idf.idf * tf.tf * (1 + {_BM25_K1}) /
                     (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / idf.avgdl))) AS s
          FROM q JOIN idf ON q.tok = idf.tok
                 JOIN tf ON tf.tok = q.tok
                 JOIN dl ON dl.doc_id = tf.doc_id
          WHERE tf.doc_id <> q.query_id
          GROUP BY 1, 2),
        boosted AS (
          SELECT s.query_id, s.cand_id, s.s + 0.1 * ln(1 + d.n_chars) AS score
          FROM scored s JOIN documents d ON d.doc_id = s.cand_id)
       SELECT query_id, cand_id, ROUND(score, 3) AS score, rank FROM (
         SELECT query_id, cand_id, score,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY ROUND(score, 3) DESC, cand_id) AS rank
         FROM boosted) WHERE rank <= 5""",
)
def j4_bm25_scored_topk(spark, sf_dir):
    """J4 (scored form): BM25-weighted token-retrieval join with popularity
    boost + top-k window — the real shape of the reference's Solr retrieval
    (`blink/main_solr.py:126-143` edismax template with
    ``bf=log(sum(num_incoming_links,1))``;
    `candidate_retrieval/candidate_generators.py:59-116`).

    Query docs (every 20th) retrieve candidates by their 6 smallest
    distinct terms; terms are token BIGRAMS (unigrams are non-selective on
    a small-vocabulary corpus — the phrase-field analog of the template's
    ``aliases:"{}"`` leg); candidate score = Σ BM25(idf, tf, dl/avgdl) over
    shared terms + ``0.1·ln(1+n_chars)`` popularity boost (n_chars stands
    in for ``num_incoming_links``). Terms with document frequency above
    ``_BM25_MAX_DF`` are excluded — the hot-key guard AND the standard
    stop-word treatment at scale. Ranking uses the score rounded to 3
    decimals with candidate-id tie-break so both engines order
    identically.
    """
    d = _t(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", tokens(F.col("text")).alias("t"))
        .select("doc_id", F.explode(token_ngrams_from_tokens(F.col("t"), 2)).alias("tok"))
        .where(F.col("tok") != "")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    idf = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= _BM25_MAX_DF)
        .crossJoin(F.broadcast(stats))
        .select(
            "tok",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias("idf"),
            "avgdl",
        )
    )
    qtok = (
        d.where(F.col("doc_id") % 20 == 0)
        .select(F.col("doc_id").alias("query_id"), tokens(F.col("text")).alias("t"))
        .select(
            "query_id",
            F.explode(
                F.slice(F.array_sort(F.array_distinct(token_ngrams_from_tokens(F.col("t"), 2))), 1, 6)
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    bm25_term = F.col("idf") * (F.col("tf") * (1 + _BM25_K1)) / (
        F.col("tf") + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        qtok.join(F.broadcast(idf), "tok")
        .join(tf, "tok")
        .where(F.col("doc_id") != F.col("query_id"))
        .join(dl, "doc_id")
        .groupBy("query_id", F.col("doc_id").alias("cand_id"))
        .agg(F.sum(bm25_term).alias("s"))
    )
    boosted = scored.join(d.select(F.col("doc_id").alias("cand_id"), "n_chars"), "cand_id").select(
        "query_id", "cand_id", (F.col("s") + 0.1 * F.log1p("n_chars")).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round(F.col("score"), 3)), F.asc("cand_id"))
    return (
        boosted.select(
            "query_id", "cand_id", F.round("score", 3).alias("score"), F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= 5)
    )


@q(
    "j5_prior_fallback_join",
    f"""WITH m AS (SELECT doc_id, t[1] AS mention_key
                  FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)),
         d0 AS (SELECT t[1] AS tok, COUNT(*) AS prior
                FROM (SELECT {_TOKENS_SQL} AS t FROM documents) GROUP BY 1),
         d AS (SELECT CASE WHEN prior % 2 = 0
                           THEN upper(substring(tok, 1, 1)) || substring(tok, 2)
                           ELSE tok END AS dict_key, prior FROM d0)
       SELECT m.doc_id, m.mention_key,
              COALESCE(e.prior, f.prior, 0) AS resolved_prior
       FROM m
       LEFT JOIN d e ON m.mention_key = e.dict_key
       LEFT JOIN d f ON upper(substring(m.mention_key, 1, 1)) || substring(m.mention_key, 2) = f.dict_key""",
)
def j5_prior_fallback_join(spark, sf_dir):
    """J5: p_e_m dictionary-prior join with exact → title-case fallback
    cascade + coalesce (`blink/candidate_retrieval/dataset.py:322-347`).
    The dictionary keys are deliberately mixed-case (half title-cased) so
    both cascade legs are exercised; broadcast joins on the small dict."""
    d = _t(spark, sf_dir, "documents")
    first_tok = F.element_at(tokens(F.col("text")), 1)
    m = d.select("doc_id", first_tok.alias("mention_key"))
    d0 = d.select(first_tok.alias("tok")).groupBy("tok").agg(F.count(F.lit(1)).alias("prior"))
    tc = F.concat(F.upper(F.substring("tok", 1, 1)), F.substring("tok", 2, 1 << 20))
    dic = d0.select(
        F.when(F.col("prior") % 2 == 0, tc).otherwise(F.col("tok")).alias("dict_key"), "prior"
    )
    e = F.broadcast(dic.withColumnsRenamed({"prior": "p_exact"}))
    f_ = F.broadcast(dic.withColumnsRenamed({"prior": "p_title"}))
    m_tc = F.concat(F.upper(F.substring("mention_key", 1, 1)), F.substring("mention_key", 2, 1 << 20))
    return (
        m.join(e, m.mention_key == e.dict_key, "left")
        .drop("dict_key")
        .join(f_, m_tc == f_.dict_key, "left")
        .select(
            "doc_id",
            "mention_key",
            F.coalesce("p_exact", "p_title", F.lit(0)).alias("resolved_prior"),
        )
    )


@q(
    "j5_ranked_candidates",
    f"""WITH base AS (SELECT doc_id, t[1] AS k, t[2] AS entity
                     FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)),
        cnt AS (SELECT k, entity, COUNT(*) AS c FROM base
                WHERE entity IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT k, SUM(c) AS tc FROM cnt GROUP BY 1),
        r AS (SELECT cnt.k, entity,
                     CAST(ROUND(CAST(c AS DOUBLE) / tc, 4) AS VARCHAR) AS prob,
                     row_number() OVER (PARTITION BY cnt.k ORDER BY c DESC, entity) AS rn
              FROM cnt JOIN tot ON cnt.k = tot.k),
        lists AS (SELECT k, string_agg(entity || ':' || prob, ';' ORDER BY rn) AS candidates
                  FROM r WHERE rn <= 3 GROUP BY k)
       SELECT b.doc_id, b.k AS mention_key, COALESCE(l.candidates, '') AS candidates
       FROM (SELECT doc_id, t[1] AS k
             FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)) b
       LEFT JOIN lists l ON b.k = l.k""",
)
def j5_ranked_candidates(spark, sf_dir):
    """J5 (ranked form): the p_e_m dictionary join returning a RANKED
    candidate list per mention with frequency tie-break
    (`blink/candidate_retrieval/dataset.py:322-347` — candidates arrive as
    (entity, prob) lists sorted by prior).

    The dictionary maps each document's first token to its second-token
    "entities" with empirical priors; each mention resolves to the top-3
    (prob desc, entity asc) serialized ``entity:prob;...`` — an ordered
    list in one hash-stable string column (the underlying
    ``collect_list(struct)`` + ``array_sort`` is the array<struct> form).
    Frequency ranking uses the integer count, so cross-engine float
    ordering cannot flip ranks."""
    d = _t(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    base = d.select("doc_id", F.element_at(t, 1).alias("k"), F.element_at(t, 2).alias("entity"))
    cnt = base.where(F.col("entity").isNotNull()).groupBy("k", "entity").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cnt.groupBy("k").agg(F.sum("c").alias("tc"))
    w = Window.partitionBy("k").orderBy(F.desc("c"), F.asc("entity"))
    r = (
        cnt.join(tot, "k")
        .select(
            "k",
            "entity",
            F.round(F.col("c") / F.col("tc"), 4).cast("string").alias("prob"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )
    lists = r.groupBy("k").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "entity", "prob"))),
                lambda s: F.concat(s["entity"], F.lit(":"), s["prob"]),
            ),
            ";",
        ).alias("candidates")
    )
    m = d.select("doc_id", F.element_at(t, 1).alias("k"))
    return m.join(F.broadcast(lists), "k", "left").select(
        "doc_id",
        F.col("k").alias("mention_key"),
        F.coalesce("candidates", F.lit("")).alias("candidates"),
    )


@q(
    "j7_containment_selfjoin",
    f"""WITH d AS (SELECT doc_id, source, {_CANON_SQL.format(c='text')} AS c FROM documents)
       SELECT a.doc_id, COUNT(*) AS n_contained
       FROM d a JOIN d b
         ON a.source = b.source AND a.doc_id <> b.doc_id
        AND instr(a.c, substring(b.c, 1, 30)) > 0
       GROUP BY 1""",
)
def j7_containment_selfjoin(spark, sf_dir):
    """J7: within-block self-join with substring-containment predicate
    (coref-candidate join, `dataset.py:153-187`): block on `source`, theta
    predicate inside the block — the same block-then-theta shape as the
    ER pair scorer."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", canonicalize(F.col("text")).alias("c"))
    a = d.select(F.col("doc_id"), F.col("source"), F.col("c").alias("ca"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("source"), F.substring("c", 1, 30).alias("head_b"))
    return (
        a.join(b, "source")
        .where((F.col("doc_id") != F.col("doc_b")) & (F.instr(F.col("ca"), F.col("head_b")) > 0))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contained"))
    )


@q(
    "j10_array_position",
    f"""SELECT doc_id, CAST(COALESCE(list_position({_TOKENS_SQL}, 'spark'), 0) AS BIGINT) AS gold_pos
       FROM documents""",
)
def j10_array_position(spark, sf_dir):
    """J10: gold-position-in-candidates scan (`crossencoder/data_process.py:59-63`)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.array_position(tokens(F.col("text")), "spark").alias("gold_pos")
    )


@q(
    "j12_interval_overlap_join",
    """SELECT a.event_id AS a_id, b.event_id AS b_id
       FROM events a JOIN events b
         ON a.user_id = b.user_id
        AND a.event_type = 'click' AND b.event_type = 'view'
        AND a.value < b.value + 10 AND b.value < a.value + 10""",
)
def j12_interval_overlap_join(spark, sf_dir):
    """J12: weak-match interval-overlap join (`elq/vcg_utils/measures.py:9-88`)."""
    e = _t(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("a_id"), F.col("user_id").alias("u"), F.col("value").alias("va")
    )
    b = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("b_id"), F.col("user_id").alias("u"), F.col("value").alias("vb")
    )
    return (
        a.join(b, "u")
        .where((F.col("va") < F.col("vb") + 10) & (F.col("vb") < F.col("va") + 10))
        .select("a_id", "b_id")
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------

_GOLD_POS_SQL = f"SELECT CAST(COALESCE(list_position({_TOKENS_SQL}, 'spark'), 0) AS BIGINT) AS pos FROM documents"


@q(
    "a1_recall_at_k",
    f"""SELECT ROUND(AVG(CASE WHEN pos BETWEEN 1 AND 1  THEN 1.0 ELSE 0.0 END), 4) AS r_at_1,
              ROUND(AVG(CASE WHEN pos BETWEEN 1 AND 5  THEN 1.0 ELSE 0.0 END), 4) AS r_at_5,
              ROUND(AVG(CASE WHEN pos BETWEEN 1 AND 20 THEN 1.0 ELSE 0.0 END), 4) AS r_at_20
       FROM ({_GOLD_POS_SQL})""",
)
def a1_recall_at_k(spark, sf_dir):
    """A1: recall@k curve (`blink/main_dense.py:459-477`)."""
    pos = _t(spark, sf_dir, "documents").select(
        F.array_position(tokens(F.col("text")), "spark").alias("pos")
    )
    hit = lambda k: F.round(F.avg(F.when(F.col("pos").between(1, k), 1.0).otherwise(0.0)), 4)
    return pos.agg(hit(1).alias("r_at_1"), hit(5).alias("r_at_5"), hit(20).alias("r_at_20"))


@q(
    "a2_a5_rank_histogram",
    f"""SELECT CAST(SUM(CASE WHEN pos BETWEEN 1 AND 1  THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
              CAST(SUM(CASE WHEN pos BETWEEN 1 AND 4  THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_4,
              CAST(SUM(CASE WHEN pos BETWEEN 1 AND 8  THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_8,
              CAST(SUM(CASE WHEN pos BETWEEN 1 AND 16 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_16,
              COUNT(*) AS total
       FROM ({_GOLD_POS_SQL})""",
)
def a2_a5_rank_histogram(spark, sf_dir):
    """A2/A5: rank-threshold hit histogram (`zeshel_utils.py:70-99`,
    precision@k counts `candidate_ranking/utils.py:63-83`) — one pass of
    conditional sums."""
    pos = _t(spark, sf_dir, "documents").select(
        F.array_position(tokens(F.col("text")), "spark").alias("pos")
    )
    hits = lambda k: F.sum(F.when(F.col("pos").between(1, k), 1).otherwise(0)).cast("long")
    return pos.agg(
        hits(1).alias("hits_at_1"),
        hits(4).alias("hits_at_4"),
        hits(8).alias("hits_at_8"),
        hits(16).alias("hits_at_16"),
        F.count(F.lit(1)).alias("total"),
    )


@q(
    "a3_a4_accuracy",
    """WITH r AS (SELECT user_id, event_type,
                        row_number() OVER (PARTITION BY user_id
                                           ORDER BY value DESC, event_id) AS rn
                 FROM events),
        p AS (SELECT user_id,
                     MAX(CASE WHEN rn = 1 AND event_type = 'error' THEN 1 ELSE 0 END) AS pred_correct,
                     MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_gold
              FROM r GROUP BY user_id)
       SELECT ROUND(CAST(SUM(pred_correct) AS DOUBLE) / NULLIF(SUM(has_gold), 0), 4) AS norm_acc,
              ROUND(CAST(SUM(pred_correct) AS DOUBLE) / COUNT(*), 4) AS unnorm_acc
       FROM p""",
)
def a3_a4_accuracy(spark, sf_dir):
    """A3/A4: normalized accuracy (argmax == gold among rows whose gold was
    retrieved) and unnormalized accuracy (× retained/total)
    (`blink/main_dense.py:562-577`). Demo task: is each user's max-value
    event an 'error' event, for users that have any."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    r = e.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
    p = r.groupBy("user_id").agg(
        F.max(F.when((F.col("rn") == 1) & (F.col("event_type") == "error"), 1).otherwise(0)).alias("pc"),
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("hg"),
    )
    return p.agg(
        F.round(F.sum("pc").cast("double") / F.nullif(F.sum("hg"), F.lit(0)), 4).alias("norm_acc"),
        F.round(F.sum("pc").cast("double") / F.count(F.lit(1)), 4).alias("unnorm_acc"),
    )


@q(
    "a6_rollup_by_group",
    """SELECT COALESCE(lang, 'ALL') AS lang, COUNT(*) AS n_docs,
              ROUND(AVG(n_chars), 2) AS avg_chars
       FROM documents GROUP BY ROLLUP(lang)""",
)
def a6_rollup_by_group(spark, sf_dir):
    """A6: per-dataset recall rollup with overall row (`evaluator.py:29-90`)."""
    return (
        _t(spark, sf_dir, "documents")
        .rollup("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.round(F.avg("n_chars"), 2).alias("avg_chars"))
        .select(F.coalesce("lang", F.lit("ALL")).alias("lang"), "n_docs", "avg_chars")
    )


@q(
    "a7_cumulative_histogram",
    """SELECT event_type, n,
              CAST(SUM(n) OVER (ORDER BY event_type) AS BIGINT) AS cum
       FROM (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1)""",
)
def a7_cumulative_histogram(spark, sf_dir):
    """A7: cumulative recall-by-rank (`evaluator.py:92-124`)."""
    h = _t(spark, sf_dir, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return h.select("event_type", "n", F.sum("n").over(Window.orderBy("event_type")).alias("cum"))


@q(
    "a8_prf1",
    """SELECT tp, fp, fn,
              ROUND(tp / NULLIF(tp + fp, 0), 4) AS precision,
              ROUND(tp / NULLIF(tp + fn, 0), 4) AS recall,
              ROUND(2.0 * tp / NULLIF(2.0 * tp + fp + fn, 0), 4) AS f1
       FROM (SELECT
               CAST(SUM(CASE WHEN value > 50 AND event_id % 3 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS tp,
               CAST(SUM(CASE WHEN value > 50 AND event_id % 3 <> 0 THEN 1 ELSE 0 END) AS DOUBLE) AS fp,
               CAST(SUM(CASE WHEN value <= 50 AND event_id % 3 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS fn
             FROM events)""",
)
def a8_prf1(spark, sf_dir):
    """A8: micro P/R/F1 (`elq/main_dense.py:591-602`) — the pairwise-F1 gate shape."""
    e = _t(spark, sf_dir, "events")
    pred = F.col("value") > 50
    gold = F.col("event_id") % 3 == 0
    agg = e.agg(
        F.sum(F.when(pred & gold, 1).otherwise(0)).cast("double").alias("tp"),
        F.sum(F.when(pred & ~gold, 1).otherwise(0)).cast("double").alias("fp"),
        F.sum(F.when(~pred & gold, 1).otherwise(0)).cast("double").alias("fn"),
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 4).alias("precision"),
        F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 4).alias("recall"),
        F.round(2 * F.col("tp") / F.nullif(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0)), 4).alias("f1"),
    )


@q(
    "a9_macro_micro",
    """SELECT (SELECT ROUND(AVG(a), 4) FROM
                (SELECT AVG(value) AS a FROM events GROUP BY event_type)) AS macro_avg,
              (SELECT ROUND(AVG(value), 4) FROM events) AS micro_avg""",
)
def a9_macro_micro(spark, sf_dir):
    """A9: macro-vs-micro two-level aggregation (`train_cross.py:159-169`)."""
    e = _t(spark, sf_dir, "events")
    macro = (
        e.groupBy("event_type").agg(F.avg("value").alias("a")).agg(F.round(F.avg("a"), 4).alias("macro_avg"))
    )
    micro = e.agg(F.round(F.avg("value"), 4).alias("micro_avg"))
    return macro.crossJoin(micro)


@q(
    "a10_mrr",
    f"""SELECT ROUND(AVG(1.0 / pos), 6) AS mrr FROM ({_GOLD_POS_SQL}) WHERE pos > 0""",
)
def a10_mrr(spark, sf_dir):
    """A10: mean reciprocal rank (`train_cross.py:336,378`)."""
    pos = _t(spark, sf_dir, "documents").select(
        F.array_position(tokens(F.col("text")), "spark").alias("pos")
    )
    return pos.where(F.col("pos") > 0).agg(F.round(F.avg(F.lit(1.0) / F.col("pos")), 6).alias("mrr"))


@q(
    "a12_dedup_stats",
    f"""SELECT COUNT(*) AS n_docs,
              COUNT(DISTINCT md5({_CANON_SQL.format(c='text')})) AS n_distinct
       FROM documents""",
)
def a12_dedup_stats(spark, sf_dir):
    """A12: dedup-by-key uniqueness check (`blink/main_dense.py:137`)."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(canonicalize(F.col("text")))).alias("n_distinct"),
    )


@q(
    "a13_group_collect",
    """SELECT user_id, array_to_string(list_sort(list(event_type)), ',') AS types
       FROM events GROUP BY user_id""",
)
def a13_group_collect(spark, sf_dir):
    """A13: group-collect per key (`blink/utils.py:84-100`) — sorted for determinism."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("event_type"))).alias("types"))
    )


@q(
    "a11_match_rate_counters",
    """SELECT CAST(SUM(CASE WHEN n.n_name IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS by_nation,
              CAST(SUM(CASE WHEN n.n_name IS NULL AND r.r_name IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS by_region_fallback,
              CAST(SUM(CASE WHEN n.n_name IS NULL AND r.r_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unmatched,
              COUNT(*) AS total
       FROM customer c
       LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey AND n.n_nationkey < 20
       LEFT JOIN region r ON (c.c_nationkey % 5) = r.r_regionkey""",
)
def a11_match_rate_counters(spark, sf_dir):
    """A11: per-strategy match-rate counters over a fallback join
    (`enrich_data.py:74-140` counts by-title vs by-id matches) — these are
    the lineage counters the checkpoint layer also records."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = c.join(n, (c.c_nationkey == n.n_nationkey) & (n.n_nationkey < 20), "left").join(
        r, (c.c_nationkey % 5) == r.r_regionkey, "left"
    )
    return j.agg(
        F.sum(F.when(F.col("n_name").isNotNull(), 1).otherwise(0)).cast("long").alias("by_nation"),
        F.sum(F.when(F.col("n_name").isNull() & F.col("r_name").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("by_region_fallback"),
        F.sum(F.when(F.col("n_name").isNull() & F.col("r_name").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("unmatched"),
        F.count(F.lit(1)).alias("total"),
    )


# ---------------------------------------------------------------------------
# Temporal operators over the events stream table (batch form of the
# engine's incremental semantics; SURVEY §2.10 — the reference is batch-only,
# these are the training-pipeline analogs of streaming windows/sessions)
# ---------------------------------------------------------------------------

@q(
    "t1_time_window_agg",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
              COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
       FROM events GROUP BY 1, 2""",
)
def t1_time_window_agg(spark, sf_dir):
    """Tumbling time-window aggregation (`F.window` — identical code runs
    under Structured Streaming with a watermark; here batch over `events`)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@q(
    "t2_sessionization",
    """WITH g AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_s
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT user_id, ts,
                     CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS session_id
              FROM g)
       SELECT user_id, session_id, COUNT(*) AS n_events,
              MIN(ts) AS session_start, MAX(ts) AS session_end
       FROM s GROUP BY 1, 2""",
)
def t2_sessionization(spark, sf_dir):
    """Sessionization: 30-minute-gap session windows via lag + running sum —
    the batch equivalent of a streaming session window
    (`applyInPandasWithState` would carry the same state incrementally)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    g = e.select(
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_s"),
    )
    ws = Window.partitionBy("user_id").orderBy("ts")
    s = g.select("user_id", "ts", F.sum("new_s").over(ws).alias("session_id"))
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# Windows / top-k / set ops (SURVEY §2.5–2.7)
# ---------------------------------------------------------------------------

@q(
    "w1_topk_per_group",
    """SELECT event_type, event_id, value, rn FROM (
         SELECT event_type, event_id, value,
                row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
         FROM events) WHERE rn <= 3""",
)
def w1_topk_per_group(spark, sf_dir):
    """W1: top-k per query (`blink/main_dense.py:253`) — window row_number ≤ k."""
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        _t(spark, sf_dir, "events")
        .select("event_type", "event_id", "value", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@q(
    "w2_rank_argsort",
    """SELECT o_orderpriority AS priority, o_orderkey AS orderkey, rn FROM (
         SELECT o_orderpriority, o_orderkey,
                row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 5""",
)
def w2_rank_argsort(spark, sf_dir):
    """W2: full argsort of scores (`blink/main_dense.py:282,541-560`) pruned to top-5."""
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderkey").alias("orderkey"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 5)
    )


@q(
    "w3_topk_threshold_fallback",
    """SELECT user_id, event_id, value, rn FROM (
         SELECT user_id, event_id, value,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id) AS rn
         FROM events) WHERE rn <= 3 AND (value >= 50 OR rn = 1)""",
)
def w3_topk_threshold_fallback(spark, sf_dir):
    """W3: top-k + threshold with keep-at-least-one fallback
    (`prune_ctxt_mentions`, `elq/biencoder/biencoder.py:318-363`)."""
    return spans.topk_threshold_fallback(
        _t(spark, sf_dir, "events").select("user_id", "event_id", "value"),
        group_col="user_id",
        order_col="value",
        tiebreak_col="event_id",
        k=3,
        threshold=50.0,
    )


@q(
    "w4_greedy_overlap_prune",
    """WITH RECURSIVE spans AS (
         SELECT user_id AS group_id, event_id AS span_id,
                CAST(value AS DOUBLE) AS start, CAST(value + 5.0 AS DOUBLE) AS "end",
                CAST(value AS DOUBLE) AS score,
                row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
         FROM events),
       mx AS (SELECT group_id, MAX(rn) AS mr FROM spans GROUP BY group_id),
       g AS (
         SELECT s.group_id, CAST(1 AS BIGINT) AS rn,
                [s.span_id] AS kept, [s.start] AS ks, [s."end"] AS ke
         FROM spans s WHERE s.rn = 1
         UNION ALL
         SELECT group_id, rn,
                CASE WHEN ok THEN list_append(kept, span_id) ELSE kept END,
                CASE WHEN ok THEN list_append(ks, start) ELSE ks END,
                CASE WHEN ok THEN list_append(ke, "end") ELSE ke END
         FROM (
           SELECT g.group_id, g.rn + 1 AS rn, g.kept, g.ks, g.ke,
                  s.span_id, s.start, s."end",
                  len(list_filter(generate_series(1, len(g.ks)),
                                  i -> s.start < g.ke[i] AND g.ks[i] < s."end")) = 0 AS ok
           FROM g JOIN spans s ON s.group_id = g.group_id AND s.rn = g.rn + 1)),
       final AS (
         SELECT g.group_id, unnest(g.kept) AS kid
         FROM g JOIN mx ON g.group_id = mx.group_id AND g.rn = mx.mr)
       SELECT s.group_id, s.span_id, s.start, s."end", s.score
       FROM final f JOIN spans s ON s.group_id = f.group_id AND s.span_id = f.kid""",
)
def w4_greedy_overlap_prune(spark, sf_dir):
    """W4: greedy overlap pruning (`elq/main_dense.py:451-466`) via
    applyInPandas per group — spans are [value, value+5) intervals per user.
    The inherently-sequential greedy is reproduced in the oracle as a
    DuckDB RECURSIVE CTE stepping rank-by-rank per group with the accepted
    intervals carried as list columns; a single-threaded pandas oracle in
    tests/test_spans_sources.py checks the kernel independently."""
    e = _t(spark, sf_dir, "events")
    sp = e.select(
        F.col("user_id").alias("group_id"),
        F.col("event_id").alias("span_id"),
        F.col("value").alias("start"),
        (F.col("value") + 5.0).alias("end"),
        F.col("value").alias("score"),
    )
    return spans.greedy_overlap_prune(sp)


@q(
    "w6_ordered_collect",
    """SELECT user_id,
              array_to_string((list(event_id ORDER BY ts, event_id))[1:5], ',') AS first5
       FROM events GROUP BY user_id""",
)
def w6_ordered_collect(spark, sf_dir):
    """W6: sort-mentions-within-example (`elq/biencoder/data_process.py:202-248`):
    collect_list of structs + array_sort gives a deterministic ordered list
    regardless of partitioning; here the first 5 event ids per user by time."""
    e = _t(spark, sf_dir, "events")
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id")))
    return e.groupBy("user_id").agg(
        F.array_join(
            F.slice(F.transform(ordered, lambda s: s["event_id"].cast("string")), 1, 5), ","
        ).alias("first5")
    )


@q(
    "u10_joint_score_threshold",
    """WITH l AS (SELECT user_id, event_id, value / 100.0 AS logit FROM events),
        m AS (SELECT user_id, event_id, logit,
                     max(logit) OVER (PARTITION BY user_id) AS mx FROM l),
        s AS (SELECT user_id, event_id, logit, mx,
                     sum(exp(logit - mx)) OVER (PARTITION BY user_id) AS denom
              FROM m)
       SELECT user_id, event_id,
              ROUND((logit - mx) - ln(denom) - ln(1 + exp(-logit)), 4) AS joint
       FROM s
       WHERE (logit - mx) - ln(denom) - ln(1 + exp(-logit)) > -5.0""",
)
def u10_joint_score_threshold(spark, sf_dir):
    """U10/U11: joint score = log_softmax(candidate logit over group) +
    log sigmoid(logit), thresholded (`elq/main_dense.py:355,432-449`)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", (F.col("value") / 100.0).alias("logit")
    )
    out = spans.joint_score(e, group_col="user_id", logit_col="logit", threshold=-5.0)
    return out.select("user_id", "event_id", F.round("joint", 4).alias("joint"))


@q(
    "u8_span_enumeration",
    f"""WITH toks0 AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
        toks AS (SELECT doc_id,
                        CAST(unnest(generate_series(1, len(t))) AS INT) - 1 AS idx,
                        unnest(t) AS tok
                 FROM toks0),
        scored AS (SELECT doc_id, idx,
                          length(tok) / 4.0 AS start_lp,
                          ascii(substr(tok, 1, 1)) / 8.0 AS end_lp,
                          -length(tok) / 16.0 AS inside_lp
                   FROM toks WHERE length(tok) > 0),
        cum AS (SELECT doc_id, idx, start_lp, end_lp, inside_lp,
                       sum(inside_lp) OVER (PARTITION BY doc_id ORDER BY idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
                FROM scored),
        sp AS (SELECT s.doc_id, s.idx AS start_idx, e.idx AS end_idx,
                      s.start_lp + e.end_lp + (e.cum_end - (s.cum_end - s.inside_lp)) AS raw
               FROM cum s JOIN cum e
                 ON s.doc_id = e.doc_id AND e.idx >= s.idx AND e.idx < s.idx + 10),
        ranked AS (SELECT doc_id, start_idx, end_idx, raw,
                          row_number() OVER (PARTITION BY doc_id
                              ORDER BY raw DESC, start_idx, end_idx) AS rn
                   FROM sp)
       SELECT doc_id, start_idx, end_idx, ROUND(raw, 6) AS span_score
       FROM ranked WHERE rn <= 5""",
)
def u8_span_enumeration(spark, sf_dir):
    """U8 direct (previously ∅ "not needed for transcripts"): enumerate all
    token spans ≤ 10 long, score start_lp + end_lp + Σ inside_lp via the
    cumsum-difference identity, top-5 per document —
    `MentionScoresHead.forward` `elq/biencoder/biencoder.py:64-126` +
    `filter_by_mention_size` `:128-142`. The per-token log-probs are
    deterministic dyadic surrogates (length/4, ascii/8, -length/16 — exact
    in binary fp, so the top-k boundary is engine- and order-independent);
    the operator under test is the enumeration + scoring, not a model."""
    return spans.enumerate_scored_spans(
        _t(spark, sf_dir, "documents"), id_col="doc_id", text_col="text", max_len=10, k=5
    )


@q(
    "u9_span_embedding_pool",
    """WITH s AS (SELECT vec_id,
                         CAST(vec_id % 32 AS INT) AS start_idx,
                         CAST(1 + vec_id % 7 AS INT) AS span_len,
                         embedding
                  FROM embeddings)
       SELECT vec_id, start_idx, span_len,
              ROUND(list_sum(list_transform(embedding[start_idx + 1 : start_idx + span_len],
                                            x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
                    / (1000.0 * span_len), 6) AS mean_pool,
              ROUND(CAST(embedding[start_idx + 1] AS DOUBLE), 6) AS first_val,
              ROUND(CAST(embedding[start_idx + span_len] AS DOUBLE), 6) AS last_val
       FROM s""",
)
def u9_span_embedding_pool(spark, sf_dir):
    """U9 direct (previously ∅): mean-pool an embedding slice by span bounds
    plus first/last boundary values — `GetContextEmbedsHead.forward`
    `elq/biencoder/biencoder.py:177-219` (average pooling; the first/last
    columns mirror its concat variant) over `batched_span_select`-style
    bounds. Spans are derived deterministically from vec_id (start =
    vec_id % 32, len = 1 + vec_id % 7, always inside the 64-dim vector);
    the mean is fixed-point (milliunit LONG sum) so it is fold-order
    independent — see span_embedding_pool's docstring."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("vec_id") % 32).cast("int").alias("start_idx"),
        (1 + F.col("vec_id") % 7).cast("int").alias("span_len"),
        "embedding",
    )
    return spans.span_embedding_pool(e).select(
        "vec_id", "start_idx", "span_len", "mean_pool", "first_val", "last_val"
    )


@q(
    "p7_solr_escape",
    r"""WITH qs AS (SELECT doc_id,
                          'title:"' || substr(text, 1, 30) || '" AND ('
                              || lang || ' OR ' || source || ')' AS query
                   FROM documents),
        low AS (SELECT doc_id, query,
                       regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(regexp_replace(query,
                           '(\s)OR(\s)', '\1or\2', 'g'),
                           '^OR(\s)', 'or\1'),
                           '(\s)OR$', '\1or'),
                           '(\s)AND(\s)', '\1and\2', 'g'),
                           '^AND(\s)', 'and\1'),
                           '(\s)AND$', '\1and') AS lowered
                FROM qs)
       SELECT doc_id,
              CASE WHEN query IN ('OR', 'AND') THEN lower(query)
                   ELSE regexp_replace(lowered,
                        '([&|+\-!(){}\[\]/^"~*?:])', '\\\1', 'g')
              END AS solr_query
       FROM low""",
)
def p7_solr_escape(spark, sf_dir):
    """P7 direct (previously ∅ "no query language"): Lucene/Solr query
    escaping — lowercase bare OR/AND, backslash-escape metacharacters
    (`blink/candidate_retrieval/utils.py:18-30`,
    `blink/candidate_generation.py:123-136`). The query string is built
    from each document the way the reference builds retrieval queries from
    mention + context fields, so every row exercises ':', '"', '(', ')'
    and a bare interior AND/OR. Pure regexp_replace — one codegen stage,
    no UDF, no shuffle."""
    d = _t(spark, sf_dir, "documents")
    query = F.concat(
        F.lit('title:"'),
        F.substring("text", 1, 30),
        F.lit('" AND ('),
        F.col("lang"),
        F.lit(" OR "),
        F.col("source"),
        F.lit(")"),
    )
    return d.select("doc_id", solr_escape(query).alias("solr_query"))


@q(
    "w8_best_epoch",
    """SELECT o_custkey AS custkey, o_orderkey AS orderkey FROM (
         SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         FROM orders) WHERE rn = 1""",
)
def w8_best_epoch(spark, sf_dir):
    """W8: best-epoch/running-argmax selection (`train_biencoder.py:278-282`)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("custkey"), F.col("o_orderkey").alias("orderkey"), F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@q(
    "so1_union",
    """SELECT doc_id FROM documents WHERE lang = 'en'
       UNION
       SELECT doc_id FROM documents WHERE n_chars > 400""",
)
def so1_union(spark, sf_dir):
    """SO1: union of result sets (`perform_and_evaluate...py:115-117`)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.where(F.col("lang") == "en").select("doc_id")
        .union(d.where(F.col("n_chars") > 400).select("doc_id"))
        .distinct()
    )


@q(
    "so2_partition_union",
    """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY lang""",
)
def so2_partition_union(spark, sf_dir):
    """SO2: union of per-chunk results (`scripts/merge_candidates.py:24-36`
    concatenates per-process encode chunks): two disjoint half-scans
    unioned must equal the whole table — "a table IS the union of its
    partitions", verified by aggregating the union against the whole-view
    oracle."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    chunks = d.where(F.col("doc_id") % 2 == 0).unionByName(d.where(F.col("doc_id") % 2 != 0))
    return chunks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").cast("long").alias("total_chars")
    )


@q(
    "so3_except_anti",
    """SELECT c_custkey FROM customer
       EXCEPT
       SELECT o_custkey FROM orders""",
)
def so3_except_anti(spark, sf_dir):
    """SO3: except / anti-join removal (`data_ingestion.py:136-152`)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.select("c_custkey").join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti").distinct()


@q(
    "so4_semi_membership",
    """SELECT event_id, user_id FROM events
       WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)""",
)
def so4_semi_membership(spark, sf_dir):
    """SO4: set-membership semi join (`dataset.py:145-157`)."""
    e = _t(spark, sf_dir, "events")
    rich = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("user_id")
    )
    return e.join(rich, "user_id", "left_semi").select("event_id", "user_id")


# ---------------------------------------------------------------------------
# Scalar function bundles (SURVEY §2.8)
# ---------------------------------------------------------------------------

@q(
    "f_string_bundle",
    f"""SELECT doc_id,
              upper(substring(c, 1, 12)) AS head_upper,
              t[3] AS tok3,
              length(regexp_replace(c, '[aeiou]', '', 'g')) AS n_consonant_chars,
              lang || '|' || source AS tag
       FROM (SELECT doc_id, lang, source, {_CANON_SQL.format(c='text')} AS c,
                    {_TOKENS_SQL} AS t FROM documents)""",
)
def f_string_bundle(spark, sf_dir):
    """§2.8 string family: lower/substr/split/regexp_replace/concat."""
    d = _t(spark, sf_dir, "documents")
    c = canonicalize(F.col("text"))
    return d.select(
        "doc_id",
        F.upper(F.substring(c, 1, 12)).alias("head_upper"),
        F.element_at(tokens(F.col("text")), 3).alias("tok3"),
        F.length(F.regexp_replace(c, "[aeiou]", "")).alias("n_consonant_chars"),
        F.concat_ws("|", "lang", "source").alias("tag"),
    )


@q(
    "f_math_bundle",
    """SELECT l_orderkey, l_linenumber,
              ROUND(ln(1 + l_quantity), 4) AS log_qty,
              ROUND(sqrt(l_extendedprice), 4) AS sqrt_price,
              CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct
       FROM lineitem""",
)
def f_math_bundle(spark, sf_dir):
    """§2.8 math family: log1p/sqrt/floor (`main_solr.py:140-142` boost analog)."""
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.log1p("l_quantity"), 4).alias("log_qty"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("sqrt_price"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
    )


@q(
    "f_json_bundle",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
       FROM events""",
)
def f_json_bundle(spark, sf_dir):
    """§2.8 json family: per-row JSON field extraction (`process_wikidata.py:56-86`)."""
    return _t(spark, sf_dir, "events").select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


@q(
    "skew_salted_agg",
    """SELECT event_type,
              ROUND(SUM(value), 2) AS total,
              CAST(COUNT(*) AS BIGINT) AS n,
              ROUND(MAX(value), 2) AS mx
       FROM events GROUP BY event_type""",
)
def skew_salted_agg(spark, sf_dir):
    """Skew utility as a checked query: the two-phase salted aggregation
    (`operators/skew.py::salted_aggregate` — salt → partial → merge, the
    classic hot-key decomposition north_rule asks for) must produce results
    identical to a plain GROUP BY, which is exactly what the oracle is."""
    from blink_spark.operators import skew

    e = _t(spark, sf_dir, "events")
    out = skew.salted_aggregate(
        e.select("event_type", "value"),
        group_cols=["event_type"],
        aggs={"total": ("value", "sum"), "n": ("value", "count"), "mx": ("value", "max")},
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.round("total", 2).alias("total"),
        F.col("n").cast("long").alias("n"),
        F.round("mx", 2).alias("mx"),
    )


@q(
    "f_array_bundle",
    f"""SELECT doc_id,
              array_to_string(t[3:4], ' ') AS mid2,
              t[5] AS tok5,
              array_to_string(list_sort(t[1:4]), ' ') AS sorted_head,
              CAST(len(list_distinct(t)) AS INT) AS n_distinct,
              list_contains(t, 'spark') AS has_spark,
              array_to_string(
                list_transform(generate_series(1, least(len(t[1:3]), len(t[4:6]))),
                               i -> t[1:3][i] || '~' || t[4:6][i]), ',') AS zipped
       FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)""",
)
def f_array_bundle(spark, sf_dir):
    """§2.8 array family as a dedicated entry: slice / element_at /
    array_sort / array_distinct / array_contains / zip_with (the
    reference's token-list slicing, parallel-array zips and re-sorts —
    `data_process.py:57`, `main_dense.py:543-560`,
    `elq/biencoder/data_process.py:202-221`)."""
    d = _t(spark, sf_dir, "documents")
    out = d.select("doc_id", tokens(F.col("text")).alias("t"))
    s1, s2 = F.slice("t", 1, 3), F.slice("t", 4, 3)
    return out.select(
        "doc_id",
        F.array_join(F.slice("t", 3, 2), " ").alias("mid2"),
        F.element_at("t", 5).alias("tok5"),
        F.array_join(F.array_sort(F.slice("t", 1, 4)), " ").alias("sorted_head"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        F.array_contains("t", "spark").alias("has_spark"),
        F.array_join(F.zip_with(s1, s2, lambda x, y: F.concat(x, F.lit("~"), y)), ",").alias(
            "zipped"
        ),
    )


@q(
    "p5_p6_gold_filter",
    f"""SELECT doc_id,
              CAST(list_position({_TOKENS_SQL}, 'spark') AS BIGINT) AS gold_pos
       FROM documents
       WHERE COALESCE(list_position({_TOKENS_SQL}, 'spark'), 0) > 0
         AND source IS NOT NULL""",
)
def p5_p6_gold_filter(spark, sf_dir):
    """P5 + P6: drop rows whose gold is not among the retrieved candidates
    (`filter_crossencoder_tensor_input`,
    `blink/crossencoder/data_process.py:89-112`) and null-key noise rows
    (`blink/candidate_generation.py:112-115`) — authored BEFORE any
    expensive stage so the filter pushes down by construction."""
    d = _t(spark, sf_dir, "documents")
    pos = F.array_position(tokens(F.col("text")), "spark")
    return (
        d.select("doc_id", "source", pos.alias("gold_pos"))
        .where((F.col("gold_pos") > 0) & F.col("source").isNotNull())
        .select("doc_id", "gold_pos")
    )


@q(
    "p11_entity_text_projection",
    """SELECT doc_id,
              substring(source || ' [unused2] ' || text, 1, 80) AS entity_text
       FROM documents""",
)
def p11_entity_text_projection(spark, sf_dir):
    """P11: entity text projection ``title [unused2] description`` bounded
    to a max length (`get_candidate_representation`,
    `blink/biencoder/data_process.py:72-97`)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring(F.concat_ws(" [unused2] ", "source", "text"), 1, 80).alias("entity_text"),
    )


@q(
    "s14_jsonl_writer_roundtrip",
    """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY lang""",
)
def s14_jsonl_writer_roundtrip(spark, sf_dir):
    """S14: JSONL writer (`write_dicts_as_json_per_line`,
    `blink/utils.py:110-117`) checked as a write→read round trip: the
    table is written as JSONL, read back with an explicit schema, and
    aggregated — the oracle computes the same aggregate from the source
    view, so any writer/reader corruption breaks the match."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = _fixture_path(spark, sf_dir, "s14_roundtrip.jsonl")
    d.write.mode("overwrite").json(path)
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").cast("long").alias("total_chars")
    )


@q(
    "s15_chunked_sink_merge",
    """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs
       FROM documents GROUP BY source""",
)
def s15_chunked_sink_merge(spark, sf_dir):
    """S15: chunked sink + merge (`scripts/generate_candidates.py:131-152`
    writes index-range chunks, `merge_candidates.py:24-36` concatenates):
    in Spark the chunks are partition directories and the merge is reading
    the table — written ``partitionBy(lang)``, read back as the union of
    chunks, aggregated against the source-view oracle."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    path = _fixture_path(spark, sf_dir, "s15_chunks.parquet")
    d.write.partitionBy("lang").mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.countDistinct("lang").alias("n_langs")
    )


# ---------------------------------------------------------------------------
# Dedup / text-analysis / similarity (training-data pipeline operators)
# ---------------------------------------------------------------------------

@q(
    "dedup_exact",
    f"""WITH k AS (SELECT doc_id, md5({_CANON_SQL.format(c='text')}) AS k FROM documents),
         g AS (SELECT k, MIN(doc_id) AS canon_id, COUNT(*) AS group_size FROM k GROUP BY k)
       SELECT doc_id, canon_id, group_size FROM k JOIN g USING (k)""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by canonical-text hash."""
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


@q(
    "dedup_ngram_jaccard",
    f"""WITH g AS (SELECT doc_id, source, {_GRAMS_SQL} AS g
                  FROM (SELECT doc_id, source, {_TOKENS_SQL} AS t FROM documents))
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              ROUND(CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 1.0
                         ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                              / len(list_distinct(a.g || b.g)) END, 4) AS jaccard
       FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    """N-gram Jaccard similarity over source-blocked candidate pairs."""
    d = _t(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("s"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("s"))
    pairs = a.join(b, "s").where(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b")
    j = dedup.ngram_jaccard_pairs(d, pairs, threshold=-1.0)
    return j.select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))


@q(
    "dedup_embedding_neardup",
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) AS cosine
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) >= 0.4""",
)
def dedup_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (brute-force correctness leg;
    the LSH-bucketed scale leg is sim_lsh_topk)."""
    out = dedup.embedding_neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


@q("dedup_simhash_pairs", CONST_ORACLES.get("dedup_simhash_pairs"))
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash banded near-dup pairs. Upgraded r4 from rows-only to
    value-checked: the output is integer-only (doc ids + Hamming distance)
    and deterministic, so the sf0.01 result is pinned as a VALUES regression
    oracle (valid ONLY at sf0.01 — the sf the driver checks; tests run this
    entry there too). Exact Hamming verified JVM-side via bit_count; kernel
    tested in tests/test_hashing.py."""
    caches: list = []
    out = dedup.simhash_dedup_pairs(_t(spark, sf_dir, "documents"), max_hamming=10, caches=caches)
    return _finalize(out, caches)


@q(
    "dedup_minhash_clusters",
    # Exact ground-truth oracle: all-pairs exact trigram Jaccard >= 0.5 →
    # transitive closure (recursive CTE) → canon = component minimum. The
    # Spark path is approximate (LSH candidates → exact verify → CC), but at
    # this banding (128 perms / 32 bands, r=4) a true pair at j=0.5 collides
    # with prob 1-(1-j^4)^32 ≈ 0.87 per pair and near-dup clusters are far
    # above threshold, so LSH recall is 1.0 on this corpus and the outputs
    # are identical (verified at sf0.001 and sf0.01). canon uses the
    # LEXICOGRAPHIC min because connected_components orders string-cast ids.
    f"""WITH RECURSIVE g AS (SELECT doc_id, {_GRAMS_SQL} AS g
           FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)),
       p AS (
         SELECT a.doc_id AS ai, b.doc_id AS bi
         FROM g a JOIN g b ON a.doc_id < b.doc_id
         WHERE CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 1.0
                    ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                         / len(list_distinct(a.g || b.g)) END >= 0.5
       ),
       e AS (SELECT ai AS a, bi AS b FROM p UNION ALL SELECT bi, ai FROM p),
       reach(s, t) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT r.s, e.b FROM reach r JOIN e ON e.a = r.t
       )
       SELECT s AS doc_id, CAST(MIN(CAST(t AS VARCHAR)) AS BIGINT) AS canon_id
       FROM reach GROUP BY s""",
)
def dedup_minhash_clusters(spark, sf_dir):
    """MinHash-LSH near-dup clusters over documents, checked against an
    exact all-pairs ground-truth oracle (brute-force Jaccard + transitive
    closure in SQL) — the strongest check an approximate dedup can get:
    the banded-LSH path must reproduce the exact clusters end to end."""
    caches: list = []
    out = dedup.minhash_dedup_clusters(
        _t(spark, sf_dir, "documents"), jaccard_threshold=0.5, caches=caches
    )
    return _finalize(out, caches)


@q(
    "text_token_stats",
    f"""SELECT doc_id,
              CASE WHEN length(c) = 0 THEN 0 ELSE len(string_split(c, ' ')) END AS n_tokens,
              length(c) AS n_chars
       FROM (SELECT doc_id, {_CANON_SQL.format(c='text')} AS c FROM documents)""",
)
def text_token_stats(spark, sf_dir):
    """Token counting (S8 analog: `process_wiki_extractor_output_full.py:52-94`)."""
    return textstats.token_stats(_t(spark, sf_dir, "documents"))


@q(
    "text_quality",
    f"""SELECT doc_id,
              n_tokens,
              ROUND(punct_ratio, 4) AS punct_ratio,
              ROUND(stopword_ratio, 4) AS stopword_ratio,
              ROUND(alpha_ratio, 4) AS alpha_ratio,
              ROUND(mean_word_len, 4) AS mean_word_len,
              ROUND(0.35 * (1.0 - punct_ratio)
                    + 0.25 * least(stopword_ratio * 4.0, 1.0)
                    + 0.2 * alpha_ratio
                    + 0.2 * least(n_tokens / 100.0, 1.0), 4) AS quality
       FROM (
         SELECT doc_id, n_tokens,
                CASE WHEN n_chars = 0 THEN 0.0
                     ELSE CAST(n_chars - length(regexp_replace(c, '[^\\w\\s]', '', 'g')) AS DOUBLE) / n_chars END AS punct_ratio,
                CASE WHEN n_tokens = 0 THEN 0.0
                     ELSE CAST(len(list_filter(t, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE) / n_tokens END AS stopword_ratio,
                CASE WHEN n_chars = 0 THEN 0.0
                     ELSE CAST(length(regexp_replace(c, '[^a-z]', '', 'g')) AS DOUBLE) / n_chars END AS alpha_ratio,
                CASE WHEN n_tokens = 0 THEN 0.0
                     ELSE CAST(length(regexp_replace(c, '\\s', '', 'g')) AS DOUBLE) / n_tokens END AS mean_word_len
         FROM (SELECT doc_id, c, length(c) AS n_chars,
                      CASE WHEN length(c) = 0 THEN 0 ELSE len(string_split(c, ' ')) END AS n_tokens,
                      string_split(c, ' ') AS t
               FROM (SELECT doc_id, {_CANON_SQL.format(c='text')} AS c FROM documents)))""",
)
def text_quality(spark, sf_dir):
    """Document quality scoring: length/punct/stopword/alpha signals."""
    return textstats.quality_scores(_t(spark, sf_dir, "documents"))


@q(
    "text_langid",
    f"""SELECT doc_id,
              CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                   WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
                   WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                   WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                   ELSE 'de' END AS lang_pred
       FROM (
         SELECT doc_id,
                len(list_filter(t, x -> x IN ('der','die','und','das','ist'))) AS h_de,
                len(list_filter(t, x -> x IN ('the','and','of','to','is')))    AS h_en,
                len(list_filter(t, x -> x IN ('el','la','de','que','los')))    AS h_es,
                len(list_filter(t, x -> x IN ('le','la','les','des','est')))   AS h_fr
         FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents))""",
)
def text_langid(spark, sf_dir):
    """Heuristic marker-word language ID (ties broken toward lexicographically
    larger language code, mirroring the struct-max in functions/text.py)."""
    return textstats.language_id(_t(spark, sf_dir, "documents"))


@q(
    "text_fingerprint",
    f"SELECT doc_id, md5({_CANON_SQL.format(c='text')}) AS fp_md5 FROM documents",
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting (md5 leg; the xxhash64 leg has no DuckDB
    equivalent and is covered by tests)."""
    return textstats.fingerprints(_t(spark, sf_dir, "documents")).select("doc_id", "fp_md5")


@q(
    "sim_bruteforce_topk",
    """SELECT query_id, nbr_id, ROUND(cosine, 4) AS cosine, rank FROM (
         SELECT a.vec_id AS query_id, b.vec_id AS nbr_id,
                list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])) AS cosine,
                row_number() OVER (PARTITION BY a.vec_id
                                   ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                                   CAST(b.embedding AS DOUBLE[])) DESC,
                                            b.vec_id) AS rank
         FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
       WHERE rank <= 3""",
)
def sim_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-k neighbor join (J2 analog: `biencoder.py:148-177`)."""
    out = similarity.brute_force_topk(_t(spark, sf_dir, "embeddings"), k=3)
    return out.select("query_id", "nbr_id", F.round("cosine", 4).alias("cosine"), "rank")


@q(
    "tk_chunked_topk_merge",
    """SELECT query_id, nbr_id, ROUND(cosine, 4) AS cosine, rank FROM (
         SELECT a.vec_id AS query_id, b.vec_id AS nbr_id,
                list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])) AS cosine,
                row_number() OVER (PARTITION BY a.vec_id
                                   ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                                   CAST(b.embedding AS DOUBLE[])) DESC,
                                            b.vec_id) AS rank
         FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
       WHERE rank <= 3""",
)
def tk_chunked_topk_merge(spark, sf_dir):
    """§2.6 direct (previously covered by composition): memory-adaptive
    chunked top-k merge — `elq/main_dense.py:306-334` splits the candidate
    score matrix into chunks, takes top-k within each chunk, and re-top-ks
    the concatenated winners. The Spark plan (hash chunk id → per-(query,
    chunk) WindowGroupLimit → global re-rank of ≤ n_chunks·k winners) must
    be LOSSLESS, so the oracle is the one-shot GLOBAL top-k SQL — a
    two-phase merge that dropped a true neighbor would hash-mismatch."""
    out = similarity.chunked_topk_merge(_t(spark, sf_dir, "embeddings"), k=3, n_chunks=4)
    return out.select("query_id", "nbr_id", F.round("cosine", 4).alias("cosine"), "rank")


@q("sim_lsh_topk", CONST_ORACLES.get("sim_lsh_topk"))
def sim_lsh_topk(spark, sf_dir):
    """Approximate LSH-bucketed top-k. Upgraded r4 from rows-only to
    value-checked: seeded hyperplanes + nbr_id tie-break make the output
    deterministic, so the sf0.01 result (the scale the driver checks) is
    pinned as a VALUES regression oracle — generated from the sf0.01 corpus
    by scripts/gen_const_oracles.py, valid ONLY at that sf (tests run this
    entry at sf0.01 for the same reason). Independent correctness stays in
    tests/test_operators.py (recall ≥ 0.8 vs the brute-force oracle)."""
    caches: list = []
    out = similarity.lsh_topk_neighbors(
        _t(spark, sf_dir, "embeddings"), k=3, n_tables=8, n_planes=10, caches=caches
    )
    return _finalize(
        out.select("query_id", "nbr_id", F.round("cosine", 3).alias("cosine"), "rank"), caches
    )


# ---------------------------------------------------------------------------
# ER pipeline + multimodal (non-SQL-expressible; rows-only driver checks)
# ---------------------------------------------------------------------------

@q("er_flagship_clusters", CONST_ORACLES.get("er_flagship_clusters"))
def er_flagship_clusters(spark, sf_dir):
    """Flagship: full block→score→cluster ER run over a deterministic
    synthetic transcript corpus; returns (conv_id, cluster_id, cluster_size).
    Corpus + pipeline run memoized across the er_* entries (_flagship_run)."""
    _, _, assignments, _ = _flagship_run(spark)
    sizes = assignments.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return assignments.join(sizes, "cluster_id").select("conv_id", "cluster_id", "cluster_size")


@q("er_f1_metrics", CONST_ORACLES.get("er_f1_metrics"))
def er_f1_metrics(spark, sf_dir):
    """The BASELINE.json gate as a queryable row: pairwise P/R/F1 of the
    flagship ER run against the planted labels (expect F1 = 1.0)."""
    from blink_spark import metrics

    _, labels, assignments, pairs = _flagship_run(spark)
    m = metrics.pairwise_f1(assignments, labels)
    br = metrics.blocking_recall(pairs, labels)
    return spark.createDataFrame(
        [
            (
                float(m["precision"]),
                float(m["recall"]),
                float(m["f1"]),
                int(m["tp"]),
                int(m["gold_pos"]),
                float(br["blocking_recall"]),
            )
        ],
        "precision double, recall double, f1 double, tp long, gold_pairs long, blocking_recall double",
    )


@q(
    "er_snm_candidate_pairs",
    r"""WITH ranked AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (
                   ORDER BY lang,
                            substr(lower(regexp_replace(text, '\s+', ' ', 'g')), 1, 24),
                            doc_id
                 ) AS rn
          FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(b.rn - a.rn AS BIGINT) AS dist
        FROM ranked a JOIN ranked b ON b.rn > a.rn AND b.rn <= a.rn + 4""",
)
def er_snm_candidate_pairs(spark, sf_dir):
    """NEW r4 — sorted-neighborhood blocking (Hernández & Stolfo '95), the
    sort-based blocking family next to the hash-based MinHash-LSH/SimHash
    modalities: sort by (lang, normalized 24-char text prefix, doc_id),
    emit all pairs within rank distance < 5. The Spark side never uses a
    single-partition global window — `blocking.global_rank` is a range
    exchange + partitioned row_number + broadcast prefix-sum offsets
    (PLANS.md §7c) — while the oracle can afford DuckDB's plain
    ROW_NUMBER + range self-join, so the two compute the same pair set by
    entirely different plans: a real cross-engine check, not a pin."""
    d = _t(spark, sf_dir, "documents")
    key = F.substring(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")), 1, 24)
    return blocking.sorted_neighborhood_pairs(
        d, [F.col("lang"), key], id_col="doc_id", window=5
    )


@q(
    "er_snm_multikey_pairs",
    r"""WITH r0 AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (
                   ORDER BY lang,
                            substr(lower(regexp_replace(text, '\s+', ' ', 'g')), 1, 24),
                            doc_id
                 ) AS rn
          FROM documents
        ),
        r1 AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY source, n_chars, doc_id) AS rn
          FROM documents
        ),
        unioned AS (
          SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
                 GREATEST(a.doc_id, b.doc_id) AS id_b, 0 AS p
          FROM r0 a JOIN r0 b ON b.rn > a.rn AND b.rn <= a.rn + 4
          UNION ALL
          SELECT LEAST(a.doc_id, b.doc_id), GREATEST(a.doc_id, b.doc_id), 1
          FROM r1 a JOIN r1 b ON b.rn > a.rn AND b.rn <= a.rn + 4
        )
        SELECT id_a, id_b, CAST(COUNT(DISTINCT p) AS BIGINT) AS n_passes
        FROM unioned GROUP BY id_a, id_b""",
)
def er_snm_multikey_pairs(spark, sf_dir):
    """NEW r5 — multi-pass sorted-neighborhood blocking (Hernández &
    Stolfo '95 §4): two independent sort keys — (lang, normalized text
    prefix) and (source, n_chars) — each slid with window 5, pair sets
    canonicalized and unioned with a per-pair pass count. The standard SNM
    recall fix: a key that scatters a true match (typo in the leading
    chars) is covered by the other pass. Cross-engine like the single-key
    entry: Spark's scale-safe global_rank plan vs DuckDB's plain
    ROW_NUMBER + range self-join."""
    d = _t(spark, sf_dir, "documents")
    key = F.substring(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")), 1, 24)
    return blocking.sorted_neighborhood_pairs_multikey(
        d,
        [[F.col("lang"), key], [F.col("source"), F.col("n_chars")]],
        id_col="doc_id",
        window=5,
    )


@q(
    "er_blocking_quality",
    f"""WITH g AS (SELECT doc_id, {_GRAMS_SQL} AS g
                  FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)),
        gold AS (
          SELECT a.doc_id AS _a, b.doc_id AS _b
          FROM g a JOIN g b ON a.doc_id < b.doc_id
          WHERE CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 1.0
                     ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                          / len(list_distinct(a.g || b.g)) END >= 0.5),
        ranked AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (
                   ORDER BY lang,
                            substr(lower(regexp_replace(text, '\\s+', ' ', 'g')), 1, 24),
                            doc_id) AS rn
          FROM documents),
        cand AS (
          SELECT LEAST(a.doc_id, b.doc_id) AS _a, GREATEST(a.doc_id, b.doc_id) AS _b
          FROM ranked a JOIN ranked b ON b.rn > a.rn AND b.rn <= a.rn + 4),
        c AS (SELECT COUNT(*) AS n_candidates FROM cand),
        gg AS (SELECT COUNT(*) AS gold_pairs FROM gold),
        t AS (SELECT COUNT(*) AS tp FROM gold
              WHERE EXISTS (SELECT 1 FROM cand
                            WHERE cand._a = gold._a AND cand._b = gold._b)),
        n AS (SELECT COUNT(*) AS n_records FROM documents)
      SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
             CAST(gold_pairs AS BIGINT) AS gold_pairs,
             CAST(tp AS BIGINT) AS tp,
             CASE WHEN n_records > 1
                  THEN 1.0 - CAST(n_candidates AS DOUBLE)
                             / CAST(n_records * (n_records - 1) // 2 AS DOUBLE)
                  ELSE 1.0 END AS reduction_ratio,
             CASE WHEN gold_pairs > 0
                  THEN CAST(tp AS DOUBLE) / gold_pairs ELSE 1.0 END AS pairs_completeness,
             CASE WHEN n_candidates > 0
                  THEN CAST(tp AS DOUBLE) / n_candidates ELSE 1.0 END AS pairs_quality
      FROM c, gg, t, n""",
)
def er_blocking_quality(spark, sf_dir):
    """LATE r5 — the standard blocking-evaluation trio (Christen, *Data
    Matching* 2012, ch. 7) as a driver-checkable row: reduction ratio /
    pairs completeness / pairs quality of the SNM window-5 candidate set
    against an EXACT trigram-Jaccard ≥ 0.5 gold sweep over ``documents``.
    The gold side is a brute-force all-pairs leg — feasible only at eval
    sf, the same labeled-oracle convention as ``dedup_embedding_neardup``
    and ``sim_bruteforce_topk``; the metric itself
    (:func:`blink_spark.metrics.blocking_quality`) is three counts + one
    semi join and scale-safe. Cross-engine: Spark's ``global_rank`` SNM
    plan + JVM set-algebra Jaccard vs DuckDB's ROW_NUMBER range self-join
    + list algebra."""
    from blink_spark import metrics

    d = _t(spark, sf_dir, "documents")
    n = d.count()
    ids = d.select("doc_id")
    all_pairs = ids.select(F.col("doc_id").alias("doc_a")).join(
        ids.select(F.col("doc_id").alias("doc_b")), F.col("doc_a") < F.col("doc_b")
    )
    gold = dedup.ngram_jaccard_pairs(d, all_pairs, threshold=0.5).select(
        F.col("doc_a").alias("conv_a"), F.col("doc_b").alias("conv_b")
    )
    key = F.substring(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")), 1, 24)
    cand = blocking.sorted_neighborhood_pairs(
        d, [F.col("lang"), key], id_col="doc_id", window=5
    ).select(
        F.least("id_a", "id_b").alias("conv_a"), F.greatest("id_a", "id_b").alias("conv_b")
    )
    return metrics.blocking_quality(cand, gold, n)


@q(
    "er_b3_metrics",
    f"""WITH RECURSIVE
        pred AS (SELECT doc_id, md5({_CANON_SQL.format(c='text')}) AS pc FROM documents),
        g AS (SELECT doc_id, {_GRAMS_SQL} AS g
              FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)),
        p AS (
          SELECT a.doc_id AS ai, b.doc_id AS bi
          FROM g a JOIN g b ON a.doc_id < b.doc_id
          WHERE CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 1.0
                     ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                          / len(list_distinct(a.g || b.g)) END >= 0.5),
        e AS (SELECT ai AS a, bi AS b FROM p UNION ALL SELECT bi, ai FROM p),
        reach(s, t) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT r.s, e.b FROM reach r JOIN e ON e.a = r.t),
        gold AS (SELECT s AS doc_id, MIN(CAST(t AS VARCHAR)) AS gc
                 FROM reach GROUP BY s),
        bb AS (SELECT pred.doc_id, pc, gc FROM pred JOIN gold USING (doc_id)),
        cells AS (SELECT pc, gc, COUNT(*) AS c FROM bb GROUP BY pc, gc),
        ps AS (SELECT pc, COUNT(*) AS np FROM bb GROUP BY pc),
        gs AS (SELECT gc, COUNT(*) AS ng FROM bb GROUP BY gc),
        agg AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n_records,
                 SUM(CAST(c * c AS DOUBLE) / np) AS psum,
                 SUM(CAST(c * c AS DOUBLE) / ng) AS gsum
          FROM cells JOIN ps USING (pc) JOIN gs USING (gc))
      SELECT n_records,
             ROUND(psum / n_records, 6) AS b3_precision,
             ROUND(gsum / n_records, 6) AS b3_recall,
             ROUND(2.0 * (psum / n_records) * (gsum / n_records)
                   / (psum / n_records + gsum / n_records), 6) AS b3_f1
      FROM agg""",
)
def er_b3_metrics(spark, sf_dir):
    """LATE r5 — B³ precision/recall/F1 (Bagga & Baldwin '98), the
    record-averaged cluster metric next to pairwise F1 (pairwise
    over-weights big clusters at s·(s−1)/2 pairs each; B³ weighs every
    record once). Scored clustering = EXACT dedup groups (canonical-text
    hash, a deliberately stricter clustering than near-dup truth, so the
    metrics are non-trivial: precision 1.0 — exact groups never cross a
    near-dup boundary — and recall < 1 measuring how much of the near-dup
    structure exact dedup misses); truth = trigram-Jaccard ≥ 0.5
    transitive closure (the er_docs ground-truth family, here over raw
    text). :func:`blink_spark.metrics.b_cubed` computes the metric as ONE
    groupBy over (pred, gold) intersection cells + two size joins — no
    per-record work; the all-pairs gold sweep is confined to this eval
    leg, same convention as er_blocking_quality. Ratios are ROUND(6) on
    both engines: the cell sums are float additions whose ordering Spark
    and DuckDB don't share (repo precedent: dedup_ngram_jaccard)."""
    from blink_spark import metrics
    from blink_spark.operators import clustering

    d = _t(spark, sf_dir, "documents")
    pred = dedup.exact_dedup(d).select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.col("canon_id").cast("string").alias("cluster_id"),
    )
    ids = d.select("doc_id")
    all_pairs = ids.select(F.col("doc_id").alias("doc_a")).join(
        ids.select(F.col("doc_id").alias("doc_b")), F.col("doc_a") < F.col("doc_b")
    )
    gold_edges = dedup.ngram_jaccard_pairs(d, all_pairs, threshold=0.5).select(
        F.col("doc_a").cast("string").alias("conv_a"),
        F.col("doc_b").cast("string").alias("conv_b"),
    )
    merged = clustering.connected_components(gold_edges)
    gold = (
        d.select(F.col("doc_id").cast("string").alias("conv_id"))
        .join(merged, "conv_id", "left")
        .select("conv_id", F.coalesce("cluster_id", F.col("conv_id")).alias("cluster_id"))
    )
    m = metrics.b_cubed(pred, gold)
    return m.select(
        "n_records",
        F.round("b3_precision", 6).alias("b3_precision"),
        F.round("b3_recall", 6).alias("b3_recall"),
        F.round("b3_f1", 6).alias("b3_f1"),
    )


@q("er_candidate_pairs", CONST_ORACLES.get("er_candidate_pairs"))
def er_candidate_pairs(spark, sf_dir):
    """Stage-1 blocking output: candidate pairs for the synthetic corpus.

    The run is deterministic by design (seeded corpus, seeded MinHash
    permutations, seeded band keys — asserted in tests), so the expected
    pair set is pinned as a constant VALUES oracle
    (scripts/gen_const_oracles.py) — upgrading this entry from rows-only to
    value-checked per round-2 review."""
    _, _, _, pairs = _flagship_run(spark)
    return pairs.select(
        F.col("conv_a").cast("string").alias("conv_a"),
        F.col("conv_b").cast("string").alias("conv_b"),
    )


_DERIVED_DOC_SQL = _CANON_SQL.format(c="replace(text, '. ', ' ␞ ')")
_DERIVED_GRAMS_SQL = (
    "list_distinct(CASE WHEN len(t) >= 3 THEN "
    "list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) "
    "ELSE [array_to_string(t, ' ')] END)"
)


@q(
    "er_docs_clusters",
    # Exact ground-truth oracle for the WHOLE block→score→cluster pipeline.
    # The Spark side sentence-splits each document into conversation turns;
    # conversation_docs then re-joins turns (sorted by turn_idx) with ' ␞ ',
    # so the pipeline's canonical doc equals canonicalize(replace(text,
    # '. ', ' ␞ ')) — SQL-expressible. Ground truth = transitive closure of
    # exact trigram Jaccard >= 0.5 over those derived docs (the corpus has
    # clean margins: planted near-dups sit far above any sane decision
    # boundary, unrelated docs far below, so the pipeline's blended-score
    # threshold reproduces the exact clustering — verified identical at
    # sf0.001 and sf0.01). cluster_id is the LEXICOGRAPHIC min doc_id
    # (connected_components orders string ids).
    f"""WITH RECURSIVE g AS (
         SELECT doc_id, {_DERIVED_GRAMS_SQL} AS g
         FROM (SELECT doc_id, string_split({_DERIVED_DOC_SQL}, ' ') AS t FROM documents)),
       p AS (
         SELECT a.doc_id AS ai, b.doc_id AS bi
         FROM g a JOIN g b ON a.doc_id < b.doc_id
         WHERE CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 1.0
                    ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                         / len(list_distinct(a.g || b.g)) END >= 0.5
       ),
       e AS (SELECT ai AS a, bi AS b FROM p UNION ALL SELECT bi, ai FROM p),
       reach(s, t) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT r.s, e.b FROM reach r JOIN e ON e.a = r.t
       )
       SELECT s AS doc_id, CAST(MIN(CAST(t AS VARCHAR)) AS BIGINT) AS cluster_id
       FROM reach GROUP BY s""",
)
def er_docs_clusters(spark, sf_dir):
    """End-to-end ER pipeline over transcripts derived from the shared
    documents table (sentence-split → multi-turn conversations), value-
    checked against an independent exact all-pairs + transitive-closure
    oracle in SQL. Complements `er_flagship_clusters` (planted-label synth
    corpus, rows-only): here every stage — feature UDF, LSH banding, block
    caps, two-pass scorer, large-star/small-star CC — must reproduce the
    brute-force ground truth exactly."""
    from blink_spark.pipeline import ERPipeline

    docs = _t(spark, sf_dir, "documents")
    transcripts = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.posexplode(F.split(F.col("text"), r"\. ")).alias("turn_idx", "text"),
    )
    res = ERPipeline().run(spark, transcripts, compute_metrics=False)
    out = res.assignments.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )
    return _finalize(out, res.caches)


@q(
    "er_incremental_clusters",
    # Same exact ground truth as er_docs_clusters: the incremental path
    # (phase-1 batch on half the corpus, delta update with the other half —
    # new×(new ∪ old) blocking + star-edge CC merge, never old×old) must
    # land on the identical clustering. Batch ≡ incremental is asserted
    # generally in tests/test_incremental.py; this row checks it against
    # the independent SQL oracle on the shared documents view.
    f"""WITH RECURSIVE g AS (
         SELECT doc_id, {_DERIVED_GRAMS_SQL} AS g
         FROM (SELECT doc_id, string_split({_DERIVED_DOC_SQL}, ' ') AS t FROM documents)),
       p AS (
         SELECT a.doc_id AS ai, b.doc_id AS bi
         FROM g a JOIN g b ON a.doc_id < b.doc_id
         WHERE CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 1.0
                    ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                         / len(list_distinct(a.g || b.g)) END >= 0.5
       ),
       e AS (SELECT ai AS a, bi AS b FROM p UNION ALL SELECT bi, ai FROM p),
       reach(s, t) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT r.s, e.b FROM reach r JOIN e ON e.a = r.t
       )
       SELECT s AS doc_id, CAST(MIN(CAST(t AS VARCHAR)) AS BIGINT) AS cluster_id
       FROM reach GROUP BY s""",
)
def er_incremental_clusters(spark, sf_dir):
    """Incremental ER over the documents-derived transcript corpus: batch
    phase on the even-doc_id half, delta update with the odd half, checked
    against the exact all-pairs ground truth (see `er_docs_clusters`)."""
    from blink_spark.operators import incremental
    from blink_spark.pipeline import ERPipeline

    docs = _t(spark, sf_dir, "documents")
    transcripts = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.posexplode(F.split(F.col("text"), r"\. ")).alias("turn_idx", "text"),
    )
    old_t = transcripts.where(F.col("conv_id").cast("long") % 2 == 0)
    new_t = transcripts.where(F.col("conv_id").cast("long") % 2 == 1)
    phase1 = ERPipeline().run(spark, old_t, compute_metrics=False)
    res = incremental.incremental_update(new_t, phase1.features, phase1.assignments)
    out = res.assignments.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )
    return _finalize(out, phase1.caches + res.caches)


@q(
    "er_streaming_clusters",
    # Identical exact ground truth as er_docs_clusters/er_incremental_
    # clusters: the STREAMING path (corpus arrives as micro-batches through
    # incremental_er_stream's foreachBatch — each batch is a delta
    # incremental_update against durable feature/assignment state starting
    # EMPTY) must land on the same clustering as one batch run, because the
    # star-edge CC merge is exact and delta blocking finds each pair when
    # its later member arrives, regardless of batch order.
    f"""WITH RECURSIVE g AS (
         SELECT doc_id, {_DERIVED_GRAMS_SQL} AS g
         FROM (SELECT doc_id, string_split({_DERIVED_DOC_SQL}, ' ') AS t FROM documents)),
       p AS (
         SELECT a.doc_id AS ai, b.doc_id AS bi
         FROM g a JOIN g b ON a.doc_id < b.doc_id
         WHERE CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 1.0
                    ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                         / len(list_distinct(a.g || b.g)) END >= 0.5
       ),
       e AS (SELECT ai AS a, bi AS b FROM p UNION ALL SELECT bi, ai FROM p),
       reach(s, t) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT r.s, e.b FROM reach r JOIN e ON e.a = r.t
       )
       SELECT s AS doc_id, CAST(MIN(CAST(t AS VARCHAR)) AS BIGINT) AS cluster_id
       FROM reach GROUP BY s""",
)
def er_streaming_clusters(spark, sf_dir):
    """NEW r5 — STREAMING entity resolution, driver-checked against the
    exact all-pairs + transitive-closure SQL ground truth: the documents-
    derived transcript corpus is split into 3 parquet files and streamed
    through `incremental.incremental_er_stream` (file source,
    ``maxFilesPerTrigger=1`` → 3 real micro-batches; ``foreachBatch`` runs
    a delta `incremental_update` per batch against durable state that
    starts EMPTY, with idempotent per-batch feature appends and a
    versioned assignment refresh). The final committed assignment version
    must equal the one-shot batch clustering — micro-batch ≡ incremental
    ≡ batch."""
    from blink_spark.operators import incremental

    base = _fixture_path(spark, sf_dir, f"er_stream_call{next(_STREAM_CALL)}")
    src, state, ckpt = f"{base}/src", f"{base}/state", f"{base}/ckpt"

    docs = _t(spark, sf_dir, "documents")
    transcripts = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.posexplode(F.split(F.col("text"), r"\. ")).alias("turn_idx", "text"),
    )
    # 3 arrival waves by doc_id — each wave ONE parquet file so
    # maxFilesPerTrigger=1 yields exactly 3 micro-batches
    for wave in range(3):
        transcripts.where(F.col("conv_id").cast("long") % 3 == wave).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(transcripts.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    sq = incremental.incremental_er_stream(stream, state_dir=state, checkpoint_dir=ckpt)
    sq.awaitTermination()
    return incremental.read_latest_assignments(spark, state).select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


@q("multimodal_features", CONST_ORACLES.get("multimodal_features"))
def multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction plumbing (stubbed decoder)."""
    media = multimodal.synth_media(spark, n=64, seed=42)
    return multimodal.extract_features(media).select("media_id", "kind", "n_bytes")


@q("multimodal_audio_features", CONST_ORACLES.get("multimodal_audio_features"))
def multimodal_audio_features(spark, sf_dir):
    """REAL audio decode path: WAV container → PCM samples → duration /
    RMS / zero-crossing / FFT band energies (stdlib wave + numpy, no
    external codec). Known-signal correctness (sine RMS = A/√2, ZCR = 2f/sr,
    band-energy peak) is asserted in tests/test_operators.py."""
    media = multimodal.synth_media(spark, n=64, seed=42)
    out = multimodal.audio_features(media)
    return out.select(
        "media_id",
        "sample_rate",
        F.round("duration_ms", 1).alias("duration_ms"),
        # floats pinned at 3 dp (not 4): the pins are regression oracles
        # embedding numpy/Spark float output, and a value near a rounding
        # boundary can flip the last decimal under a different
        # numpy/BLAS/Spark build — one fewer digit keeps the pin stable
        # across library upgrades (ADVICE r3)
        F.round("rms", 3).alias("rms"),
        F.round("zero_crossing_rate", 3).alias("zcr"),
    )


@q("multimodal_frame_plan", CONST_ORACLES.get("multimodal_frame_plan"))
def multimodal_frame_plan(spark, sf_dir):
    """REAL video frame extraction (upgraded r5 from a metadata-only plan):
    MJPEG-in-AVI payloads are decoded frame-by-frame (RIFF walk +
    decode_jpeg per 00dc chunk) and per-frame features come from the
    ACTUAL pixels — mean/std luma + a motion proxy. Inter-frame-codec rows
    (video/mp4 stand-ins) are excluded by mime: they are the scoped
    NotImplementedError path. Known-pixel per-frame correctness is
    asserted in tests/test_operators.py; the metadata fan-out plan stays
    available as multimodal.frame_sample_plan."""
    media = multimodal.synth_media(spark, n=64, seed=42)
    out = multimodal.video_frame_features(
        media.where(F.col("meta.mime") == "video/x-msvideo"), every_ms=1000
    )
    f3 = lambda c: F.round(c, 3)
    return out.select(
        "media_id",
        "frame_idx",
        "frame_ts_ms",
        "width",
        "height",
        f3("mean_luma").alias("mean_luma"),
        f3("std_luma").alias("std_luma"),
        f3("motion").alias("motion"),
    )


@q("multimodal_image_features", CONST_ORACLES.get("multimodal_image_features"))
def multimodal_image_features(spark, sf_dir):
    """REAL image decode path: BMP/PPM/PGM/PNG container → pixels → per-channel
    mean/std + grayscale histogram (pure numpy, no codec — the image analog
    of the stdlib-wave audio path). Known-pixel correctness (constant color,
    exact gradient) is asserted in tests/test_operators.py; the deterministic
    synth corpus output is pinned as a constant VALUES oracle."""
    media = multimodal.synth_media(spark, n=64, seed=42)
    out = multimodal.image_features(media)
    # 3 dp, not 4: regression-pin stability across library builds (ADVICE r3)
    f3 = lambda c: F.round(c, 3)
    return out.select(
        "media_id",
        "width",
        "height",
        f3(F.element_at("mean_rgb", 1)).alias("mean_r"),
        f3(F.element_at("mean_rgb", 2)).alias("mean_g"),
        f3(F.element_at("mean_rgb", 3)).alias("mean_b"),
        f3(F.element_at("std_rgb", 1)).alias("std_r"),
        F.array_join(
            F.transform("luma_hist", lambda x: F.round(x, 3).cast("string")), ","
        ).alias("hist"),
    )


def _planted_embedding_corpus(spark):
    """Deterministic ANN test corpus: 60 seeded base directions × 3 jittered
    variants, unit-normalized — each variant's true top-2 neighbors are its
    siblings. Shared by the planted LSH and IVF entries."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.standard_normal((60, 16))
    rows = []
    for i in range(60):
        for v in range(3):
            vec = base[i] + 0.05 * rng.standard_normal(16)
            vec = vec / np.linalg.norm(vec)
            rows.append((i * 3 + v, [float(x) for x in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@q("sim_lsh_planted_topk", CONST_ORACLES.get("sim_lsh_planted_topk"))
def sim_lsh_planted_topk(spark, sf_dir):
    """J3 upgraded to value-checked: LSH top-k over a PLANTED deterministic
    corpus whose expected output is pinned as a constant VALUES oracle — the
    seeded hyperplanes make the run bit-deterministic (asserted in tests).
    Recall vs the exact brute force stays separately asserted in
    tests/test_operators.py; the sf-scaled leg is `sim_lsh_topk`."""
    emb = _planted_embedding_corpus(spark)
    caches: list = []
    out = similarity.lsh_topk_neighbors(
        emb, k=3, n_planes=8, n_tables=6, seed=11, caches=caches
    )
    return _finalize(
        out.select("query_id", "nbr_id", F.round("cosine", 3).alias("cosine"), "rank"), caches
    )


@q("sim_ivf_planted_topk", CONST_ORACLES.get("sim_ivf_planted_topk"))
def sim_ivf_planted_topk(spark, sf_dir):
    """NEW r4 — the IVF scale path next to LSH (FAISS ``IndexIVFFlat``
    analog, `elq/index/faiss_indexer.py:70-91` ``DenseIVFFlatIndexer``;
    the reference trains on the full corpus — the bounded deterministic
    hash-sample training is this engine's scale adaptation): spherical-k-means
    coarse quantizer trained on a deterministic hash sample, corpus assigned
    to its nearest list, queries probe their ``nprobe`` best lists, exact
    cosine re-scoring inside probed lists only. Deterministic end to end
    (seeded init, fixed Lloyd iterations, nbr_id tie-breaks) → pinned VALUES
    oracle; recall vs brute force asserted in tests/test_operators.py."""
    emb = _planted_embedding_corpus(spark)
    caches: list = []
    out = similarity.ivf_topk_neighbors(
        emb, k=3, n_lists=8, nprobe=3, seed=13, sample_size=256, caches=caches
    )
    return _finalize(
        out.select("query_id", "nbr_id", F.round("cosine", 3).alias("cosine"), "rank"), caches
    )


@q("sim_ivf_topk", CONST_ORACLES.get("sim_ivf_topk"))
def sim_ivf_topk(spark, sf_dir):
    """IVF top-k over the sf-scaled embeddings table; deterministic (see
    `sim_ivf_planted_topk`), so the sf0.01 output is pinned like
    `sim_lsh_topk`'s (valid ONLY at sf0.01; tests run this entry there)."""
    caches: list = []
    out = similarity.ivf_topk_neighbors(
        _t(spark, sf_dir, "embeddings"), k=3, n_lists=32, nprobe=4, caches=caches
    )
    return _finalize(
        out.select("query_id", "nbr_id", F.round("cosine", 3).alias("cosine"), "rank"), caches
    )


@q(
    "s13_blocking_index_sink",
    f"""WITH g AS (
          SELECT doc_id, unnest(grams) AS gram FROM (
            SELECT doc_id, {_GRAMS_SQL} AS grams
            FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)))
       SELECT CAST(floor(doc_id / 50) AS BIGINT) AS batch_id,
              COUNT(*) AS n_keys, COUNT(DISTINCT gram) AS n_distinct_grams,
              COUNT(DISTINCT doc_id) AS n_docs
       FROM g GROUP BY 1""",
)
def s13_blocking_index_sink(spark, sf_dir):
    """S13: bulk index-ingestion sink analog
    (`blink/candidate_retrieval/data_ingestion.py:157-183` commits documents
    to Solr in fixed-size batches): the engine's "index" is the materialized
    blocking-key table, written batch-partitioned (one partition directory
    per ingest batch of 50 docs), re-read as a table, and aggregated per
    batch against a source-view oracle — the sink round trip is
    value-checked like `s15_chunked_sink_merge`."""
    d = _t(spark, sf_dir, "documents")
    keys = d.select("doc_id", tokens(F.col("text")).alias("t")).select(
        "doc_id", F.explode(F.array_distinct(token_ngrams_from_tokens(F.col("t"), 3))).alias("gram")
    )
    idx = keys.withColumn("batch_id", F.floor(F.col("doc_id") / 50).cast("long"))
    path = _fixture_path(spark, sf_dir, "s13_index.parquet")
    idx.write.partitionBy("batch_id").mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy(F.col("batch_id").cast("long").alias("batch_id")).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.countDistinct("gram").alias("n_distinct_grams"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@q(
    "s12_checkpoint_resume",
    """SELECT 'stage1_filtered' AS stage, COUNT(*) AS n_rows,
              FALSE AS resumed_first_pass, TRUE AS resumed_reentry
       FROM documents WHERE n_chars >= 200
       UNION ALL
       SELECT 'stage2_lang_agg' AS stage, COUNT(DISTINCT lang) AS n_rows,
              FALSE AS resumed_first_pass, TRUE AS resumed_reentry
       FROM documents WHERE n_chars >= 200""",
)
def s12_checkpoint_resume(spark, sf_dir):
    """S12/S16: per-stage checkpoint + resume, made driver-checkable
    (reference analog: npy prediction caches reread on restart,
    `elq/main_dense.py:571-588,756-779`; per-stage pickle dumps,
    `blink/candidate_retrieval/process_wikidata.py:103`). A two-stage
    pipeline runs through :class:`CheckpointManager`; a SECOND manager over
    the same base dir simulates process re-entry and must serve BOTH stages
    from their committed checkpoints — its compute callables raise if ever
    invoked, so a broken resume path turns this driver row red instead of
    silently recomputing. Returns per-stage lineage row counts + resumed
    flags, checked against a source-view oracle."""
    import uuid as _uuid

    from blink_spark.checkpoint import CheckpointManager

    base = _fixture_path(spark, sf_dir, f"s12_ckpt_{_uuid.uuid4().hex[:8]}")
    docs = _t(spark, sf_dir, "documents")

    cm1 = CheckpointManager(spark, base, run_id="run0")
    s1 = cm1.stage("stage1_filtered", lambda: docs.where(F.col("n_chars") >= 200))
    cm1.stage(
        "stage2_lang_agg", lambda: s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    )

    def _must_not_run():
        raise RuntimeError("resume failed: a committed stage was recomputed on re-entry")

    cm2 = CheckpointManager(spark, base, run_id="run0")
    cm2.stage("stage1_filtered", _must_not_run)
    cm2.stage("stage2_lang_agg", _must_not_run)

    rows = [
        (
            name,
            int(cm2.lineage(name)["rows"]),
            name in cm1.stages_resumed,
            name in cm2.stages_resumed,
        )
        for name in ("stage1_filtered", "stage2_lang_agg")
    ]
    return spark.createDataFrame(
        rows, "stage string, n_rows bigint, resumed_first_pass boolean, resumed_reentry boolean"
    )


@q(
    "t1_streaming_agg",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
              COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
       FROM events GROUP BY 1, 2""",
)
def t1_streaming_agg(spark, sf_dir):
    """§2.10 upgraded from test-only to driver-checked: the SAME windowed
    aggregation as `t1_time_window_agg` executed as an ACTUAL Structured
    Streaming query — file source over the events table split into multiple
    files with ``maxFilesPerTrigger=1`` so the ``availableNow`` trigger
    processes several micro-batches (real incremental state), complete-mode
    aggregation, and the idempotent ``foreachBatch`` sink (every batch
    overwrites ONE output dir, so a replay rewrites instead of duplicating —
    the same discipline as streaming.incremental_features). The sink table
    is read back and returned, so the driver compares a stream-produced
    result against the batch SQL oracle."""
    base = _fixture_path(spark, sf_dir, f"t1_stream_call{next(_STREAM_CALL)}")
    src, sink, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    e = _t(spark, sf_dir, "events")
    e.repartition(4).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(e.schema).option("maxFilesPerTrigger", 1).parquet(src)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )

    def sink_batch(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(sink)

    sq = (
        agg.writeStream.foreachBatch(sink_batch)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return spark.read.parquet(sink)


# ---------------------------------------------------------------------------
# Driver-window ordering. The correctness runner checks the FIRST 50 registry
# entries in insertion order, so insertion order is a per-round rotation
# policy (tracked in PARITY.md): entries that have never had a driver row go
# first — above all the flagship end-to-end oracles — and entries already
# green in BOTH previous rounds rotate to the back. Definition order above
# stays grouped by operator family for readability; this list is the only
# place ordering is decided.
# ---------------------------------------------------------------------------

# r5 window budget: 9 new + 1 missed-r4 (u10 sat at position 51 — the r4
# list was one over budget, caught in review) + 5 r4 first-timers + 2
# r4-upgraded pins + 4 canaries + 29 rotated back in = 50. The two lists
# are separate so the length is asserted structurally, not counted by hand.
_DRIVER_WINDOW = [
    # -- new in round 5 (never driver-checked) --------------------------------
    "u8_span_enumeration",
    "u9_span_embedding_pool",
    "p7_solr_escape",
    "er_blocking_quality",
    "er_b3_metrics",
    "er_snm_multikey_pairs",
    "er_streaming_clusters",
    "p2_label_in_kb_filter",
    "tk_chunked_topk_merge",
    # -- missed r4 by the off-by-one (documented as in-window, was 51st) ------
    "u10_joint_score_threshold",
    # -- r4 first-timers: second driver row -----------------------------------
    "s12_checkpoint_resume",
    "t1_streaming_agg",
    "sim_ivf_planted_topk",
    "sim_ivf_topk",
    "er_snm_candidate_pairs",
    # -- upgraded r4 (rows-only → sf0.01 value pins): second value row --------
    "sim_lsh_topk",
    "dedup_simhash_pairs",
    # -- flagship canaries, pinned in EVERY window (exact ground-truth
    #    oracles for the end-to-end pipeline) + the triple-green join canary --
    "er_docs_clusters",
    "er_incremental_clusters",
    "dedup_minhash_clusters",
    "j1_broadcast_dim_join",
    # -- rotated back in after one round out (ledger: PARITY.md). multimodal_
    #    frame_plan upgraded to REAL per-frame video features this round
    #    (regenerated pin), so its row is a fresh check, not a repeat --------
    "w8_best_epoch",
    "so1_union",
    "so3_except_anti",
    "p5_p6_gold_filter",
    "p11_entity_text_projection",
    "s14_jsonl_writer_roundtrip",
    "s15_chunked_sink_merge",
    "multimodal_features",
    "multimodal_audio_features",
    "multimodal_frame_plan",
    "so4_semi_membership",
    "f_string_bundle",
    "f_math_bundle",
    "f_json_bundle",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_embedding_neardup",
    "text_token_stats",
    "text_quality",
    "s1_catalog_scan",
    "s5_tsv_positional_scan",
    "s6_conll_scan",
    "s2_mention_scan_remap",
    "s3_jsonl_limit_scan",
    "s7_doc_block_reassembly",
    "p12_alias_emoji_filter",
    "s11_sqlite_scan",
    "p10_context_quota_fit",
    "s9_link_extraction_chain",
]

# Rotated out for r5 (every entry below is double-green across r1–r4 with
# code and oracle unchanged; the r4 window greened the whole block —
# w4/so2 displaced late-r5 by the two new direct P2/§2.6 entries, which
# per the rotation policy go first as never-checked).
_DRIVER_REST = [
    # a7/t2 displaced by the two late-r5 metric entries (er_blocking_quality,
    # er_b3_metrics) and s10/j4/j5 by the three direct span/escape entries
    # (u8/u9/p7 — never-checked goes first per the rotation policy); all
    # five are double-green (r2+r3) with code and oracle unchanged
    "a7_cumulative_histogram",
    "t2_sessionization",
    "s10_nested_json",
    "j4_bm25_scored_topk",
    "j5_ranked_candidates",
    "w4_greedy_overlap_prune",
    "so2_partition_union",
    "er_flagship_clusters",
    "er_candidate_pairs",
    "er_f1_metrics",
    "sim_bruteforce_topk",
    "sim_lsh_planted_topk",
    "multimodal_image_features",
    "s13_blocking_index_sink",
    "skew_salted_agg",
    "text_langid",
    "text_fingerprint",
    "f_array_bundle",
    "s17_sentence_split",
    "p1_normalize",
    "p3_min_token_filter",
    "p4_keyword_filter",
    "p8_context_window",
    "p9_lag_lead",
    "j6_fallback_join",
    "j8_link_count_join",
    "j4_token_blocking_join",
    "j5_prior_fallback_join",
    "j7_containment_selfjoin",
    "j10_array_position",
    "j12_interval_overlap_join",
    "a1_recall_at_k",
    "a2_a5_rank_histogram",
    "a3_a4_accuracy",
    "a6_rollup_by_group",
    "a8_prf1",
    "a9_macro_micro",
    "a10_mrr",
    "a12_dedup_stats",
    "a13_group_collect",
    "a11_match_rate_counters",
    "t1_time_window_agg",
    "w1_topk_per_group",
    "w2_rank_argsort",
    "w3_topk_threshold_fallback",
    "w6_ordered_collect",
]

assert len(_DRIVER_WINDOW) == 50, (
    f"driver window must be exactly 50 entries, got {len(_DRIVER_WINDOW)} "
    "(the correctness runner reads the first 50; r4 shipped 51 and silently "
    "dropped u10 — this assert makes that impossible to repeat)"
)
_DRIVER_ORDER = _DRIVER_WINDOW + _DRIVER_REST

_extra = set(REGISTRY) - set(_DRIVER_ORDER)
_missing = set(_DRIVER_ORDER) - set(REGISTRY)
assert not _extra and not _missing, (
    f"_DRIVER_ORDER out of sync: unordered={sorted(_extra)} unknown={sorted(_missing)}"
)
assert len(_DRIVER_ORDER) == len(set(_DRIVER_ORDER)), "duplicate entry in _DRIVER_ORDER"
REGISTRY = {name: REGISTRY[name] for name in _DRIVER_ORDER}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
