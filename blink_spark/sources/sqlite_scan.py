"""S11 — SQLite index scan (`blink/candidate_retrieval/
generate_wiki2wikidata_mappings.py:35-56`: ``SELECT wikipedia_title,
wikidata_id FROM mapping`` loaded into a dict).

Two Spark-first routes, per SURVEY.md §2.1 S11:

* **Cluster path** — :func:`read_jdbc`: a thin ``spark.read.jdbc`` wrapper
  with partitioned reads (``partitionColumn``/bounds), so a big mapping
  table scans in parallel. Requires the sqlite (or any) JDBC driver jar on
  the cluster classpath; this sandbox ships none, so the wrapper is
  exercised only for its argument plumbing.
* **Export path** — :func:`read_sqlite`: one-time stdlib-``sqlite3`` →
  Arrow → parquet export (cached, keyed by the db file's mtime/size), then
  ``spark.read.parquet``. This is the "one-time export to Parquet" design
  the survey names, and it is the honest sandbox route: the export runs
  once on the driver (a SQLite file is a single-machine artifact anyway —
  the reference reads it single-threaded too), after which all Spark reads
  are parallel columnar scans.
"""

from __future__ import annotations

import os
import sqlite3

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Partitioned JDBC scan (the multi-executor route when a driver jar is
    on the classpath). Without a partition column the scan is one task —
    always pass one for tables worth parallelizing."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def export_sqlite_to_parquet(
    db_path: str, table: str, out_path: str, chunk_rows: int = 200_000
) -> str:
    """One-time SQLite → parquet export via stdlib sqlite3 + Arrow.

    Streams in ``chunk_rows`` batches (bounded driver memory) into a single
    parquet file; atomic rename so readers never see a partial export.
    """
    tmp = out_path + ".tmp"
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(f"SELECT * FROM {table}")  # noqa: S608 — table name is caller-owned
        cols = [d[0] for d in cur.description]
        writer = None
        while True:
            rows = cur.fetchmany(chunk_rows)
            if not rows:
                break
            batch = pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)})
            if writer is None:
                writer = pq.ParquetWriter(tmp, batch.schema)
            writer.write_table(batch)
        if writer is None:  # empty table: still emit schema-only parquet
            empty = pa.table({c: pa.array([], type=pa.null()) for c in cols})
            pq.write_table(empty, tmp)
        else:
            writer.close()
    finally:
        con.close()
    os.replace(tmp, out_path)
    return out_path


def read_sqlite(
    spark: SparkSession, db_path: str, table: str, cache_dir: str = "/tmp/blink_sqlite_cache"
) -> DataFrame:
    """S11 scan via the export path: parquet-cached per (db mtime, size) so
    repeat reads skip the export; the Spark side is a plain parallel
    parquet scan with full pushdown."""
    st = os.stat(db_path)
    key = f"{os.path.basename(db_path)}.{table}.{st.st_mtime_ns}.{st.st_size}.parquet"
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, key)
    if not os.path.exists(out):
        export_sqlite_to_parquet(db_path, table, out)
    return spark.read.parquet(out)
