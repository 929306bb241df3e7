"""Driver-contract conformance: every oracle query matches DuckDB at sf0.001.

Mirrors the driver's comparison (row count + column names + order-insensitive
values) so oracle breakage is caught before the round gate runs at sf0.01.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
# Entries whose oracle is a constant VALUES pin generated from the sf0.01
# corpus (scripts/gen_const_oracles.py PINNED_AT_SF): the pin is only valid
# at that sf, so their Spark side runs there — the same sf the driver's
# correctness gate uses.
SF_PINNED_DIRS = {
    "sim_lsh_topk": "/root/testdata/sf0.01",
    "sim_ivf_topk": "/root/testdata/sf0.01",
    "dedup_simhash_pairs": "/root/testdata/sf0.01",
}
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert qs, "queries() is empty"
    assert set(os_) <= set(qs)
    # a healthy majority must have strict oracles
    assert len(os_) >= 0.7 * len(qs)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_parity(spark, ddb, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_PINNED_DIRS.get(name, SF_DIR))
    spark_cols = sorted(sdf.columns)
    spark_rows = _norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])

    res = ddb.execute(entrymod.oracle_sql()[name])
    duck_cols = sorted(d[0] for d in res.description)
    duck_rows = _norm_rows([d[0] for d in res.description], res.fetchall())

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"
    assert len(spark_rows) == len(duck_rows), f"{name}: rows {len(spark_rows)} != {len(duck_rows)}"
    mismatches = [i for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b]
    assert not mismatches, f"{name}: first mismatch {spark_rows[mismatches[0]]} != {duck_rows[mismatches[0]]}"


def test_rows_only_queries_run(spark):
    """Queries without oracles still run and return a stable schema."""
    qs = entrymod.queries()
    for name in sorted(set(qs) - set(entrymod.oracle_sql())):
        if name == "er_flagship_clusters":
            continue  # covered by test_entry_smoke (expensive)
        df = qs[name](spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"conv_id", "cluster_id", "cluster_size"}


def test_pipeline_registry_entries_release_caches(spark):
    """The pipeline-style registry entries persist multi-consumer
    intermediates; after the query returns (result localCheckpoint-ed),
    no NEW cached RDDs may remain — the correctness runner executes all
    registry queries in one long-lived session."""
    jsc = spark.sparkContext._jsc  # JavaSparkContext → java.util.Map below

    def persistent():
        m = jsc.getPersistentRDDs()
        return {int(k): m.get(k).toString() for k in m.keySet().toArray()}

    before = set(persistent())
    qs = entrymod.queries()
    df = qs["er_candidate_pairs"](spark, SF_DIR)
    assert df.count() >= 0
    # the returned result's own localCheckpoint RDD is allowed to linger
    # (released when df goes out of scope); persisted STAGE caches are not
    leaked = {
        k: v
        for k, v in persistent().items()
        if k not in before and "localCheckpoint" not in v
    }
    assert not leaked, f"leaked caches: {leaked}"
