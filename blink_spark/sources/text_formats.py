"""Text-format scans: positional TSV, CoNLL token streams, sentence split.

Reference analogs (SURVEY.md §2.1):

* S5 — TSV/CSV positional scan (``blink/candidate_retrieval/dataset.py:18-69``):
  tab-split with positional fields → explicit-schema csv read + ``split`` /
  ``element_at`` projections.
* S6 — CoNLL token-stream scan (``dataset.py:73-138``): ``-DOCSTART-`` doc
  boundaries and B/I mention spans. The reference parses statefully line by
  line; here the state is *reconstructed relationally*: doc ids are running
  sums of boundary markers over the line order, mention ids are running sums
  of B-tags — two window functions, no per-row Python. This is the idiomatic
  Spark shape for any "stateful" line format whose state is a running count.
* S17 — sentence splitter (``blink/utils.py:15-30``) → regexp split + explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_tsv_positional(spark: SparkSession, path: str, field_names: list[str]) -> DataFrame:
    """S5: read a headerless TSV with positional fields, all-string schema.

    Mirrors ``read_csv_file``'s ``comps[0]..comps[-1]`` access — the schema
    is convention, not metadata; missing trailing fields become NULL.
    """
    schema = T.StructType([T.StructField(n, T.StringType()) for n in field_names])
    return spark.read.option("sep", "\t").schema(schema).csv(path)


def numbered_lines(spark: SparkSession, path: str) -> DataFrame:
    """Read a text file as ``(line_no, line)`` with a stable global order.

    Line numbers come from splitting ``wholetext`` per file — correct for
    any file count (each file is one row → one task); at 100 TB the input
    would be sharded into many files, each parsed independently, with
    ``(file, line_no)`` as the global order — exactly how the reference's
    per-file sequential parse shards across processes.
    """
    whole = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    return whole.select(
        "file",
        F.posexplode(F.split(F.col("value"), "\n")).alias("line_no", "line"),
    )


def parse_conll(spark: SparkSession, path: str) -> DataFrame:
    """S6: CoNLL scan → ``(doc_id, token_idx, token, tag, mention_id)``.

    Stateful semantics expressed relationally:
    * ``doc_id``   = running count of ``-DOCSTART-`` markers up to this line;
    * ``mention_id`` = running count of B-tags within the doc (NULL for O).
    Both are single window sums over ``(file, line_no)`` — the whole parse
    is two shuffles, independent of document count.
    """
    lines = numbered_lines(spark, path)
    w = Window.partitionBy("file").orderBy("line_no")
    is_doc = F.col("line").startswith("-DOCSTART-").cast("int")
    parsed = (
        lines.withColumn("doc_id", F.sum(is_doc).over(w) - 1)
        .where((~F.col("line").startswith("-DOCSTART-")) & (F.trim("line") != ""))
        .withColumn("token", F.split("line", "\t").getItem(0))
        .withColumn("tag", F.coalesce(F.split("line", "\t").getItem(1), F.lit("O")))
    )
    w_doc = Window.partitionBy("file", "doc_id").orderBy("line_no")
    out = (
        parsed.withColumn("token_idx", F.row_number().over(w_doc) - 1)
        .withColumn("b_count", F.sum((F.col("tag") == "B").cast("int")).over(w_doc))
        .select(
            "doc_id",
            "token_idx",
            "token",
            "tag",
            # b_count > 0 guard: an I-tagged token before any B tag in the
            # doc is an orphan run — the reference's stateful parse ignores
            # I without a preceding B, so it must NOT fabricate mention −1
            F.when((F.col("tag") != "O") & (F.col("b_count") > 0), F.col("b_count") - 1).alias(
                "mention_id"
            ),
        )
    )
    return out


def conll_mentions(tokens: DataFrame) -> DataFrame:
    """Assemble B/I token runs into mention spans
    (``dataset.py:73-138``'s accumulation loop as one groupBy)."""
    return (
        tokens.where(F.col("mention_id").isNotNull())
        .groupBy("doc_id", "mention_id")
        .agg(
            F.min("token_idx").alias("start"),
            F.max("token_idx").alias("end"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token_idx", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("mention"),
        )
    )


def parse_doc_blocks(spark: SparkSession, path: str) -> DataFrame:
    """S7: wiki-extractor-style ``<doc id=...>`` block reassembly
    (`blink/candidate_retrieval/process_wiki_extractor_output.py:51-93`).

    Returns ``(doc_id, content_idx, line)`` for content lines (tag lines
    stripped). Same relational-state shape as :func:`parse_conll`: the
    block id is carried forward from each opening tag with
    ``last(..., ignorenulls)`` over the line order — no per-row Python.
    """
    lines = numbered_lines(spark, path)
    w = Window.partitionBy("file").orderBy("line_no")
    tag_id = F.regexp_extract("line", r'<doc id="(\d+)"', 1)
    opened = F.when(tag_id != "", tag_id.cast("long"))
    content = (
        lines.withColumn("doc_id", F.last(opened, ignorenulls=True).over(w))
        .where(
            F.col("doc_id").isNotNull()
            & ~F.col("line").startswith("<doc ")
            & (F.col("line") != "</doc>")
            & (F.trim("line") != "")
        )
    )
    w_doc = Window.partitionBy("file", "doc_id").orderBy("line_no")
    return content.select(
        "doc_id", (F.row_number().over(w_doc) - 1).alias("content_idx"), "line"
    )


def doc_intros(blocks: DataFrame) -> DataFrame:
    """Keep each doc's FIRST paragraph (the reference keeps the intro,
    `process_wiki_extractor_output.py:79-88`)."""
    return blocks.where(F.col("content_idx") == 0).select("doc_id", F.col("line").alias("intro"))


def split_sentences(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """S17: sentence segmentation → ``(doc_id, sent_idx, sentence)``.

    Terminal-punctuation segmentation via ``regexp_extract_all`` — the
    built-in-functions analog of the reference's optional
    ``segtok.split_multi``. (Extraction, not split-with-lookbehind, so the
    same pattern is RE2-safe for the DuckDB oracle.)
    """
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[^.!?]+[.!?]*"), 0),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(sents).alias("sent_idx", "sentence")
    )
