"""Strict driver-scale parity sweep: every oracle query vs DuckDB at sf0.01.

The per-round gate (CORRECTNESS_r{N}.json) runs at sf0.01 and hashes values
after sorting columns by name — stricter than tests/test_entry.py's rounded
compare at sf0.001. This script reproduces that check as closely as we can:
exact cell equality first, then a 1e-9-relative fallback reported separately
so near-misses are visible before the round gate runs.

Usage: python scripts/parity_sweep.py [sf_dir] [name_filter ...]
"""

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from blink_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _exact(v):
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return v


def _sort_key(row):
    """None-safe ordering: None is unorderable against non-None in Python,
    so sort on (is-None, value) per cell. The key stays value-based (no type
    names) so equal values of different numeric types sort identically on
    both engines — cross-engine type drift is the TYPE check's job, and a
    type-aware key would misalign the row zip before it runs."""
    return tuple((v is None, v if v is not None else 0) for v in row)


def _close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(_close(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(n for n in oracles if not only or n in only)
    n_exact = n_approx = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            assert len(set(scols)) == len(scols), f"duplicate spark columns: {scols}"
            sorder = sorted(range(len(scols)), key=lambda i: scols[i])
            srows = sorted(
                (tuple(_exact(r[i]) for i in sorder) for r in (tuple(x) for x in sdf.collect())),
                key=_sort_key,
            )
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            assert len(set(dcols)) == len(dcols), f"duplicate oracle columns: {dcols}"
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            drows = sorted(
                (tuple(_exact(r[i]) for i in dorder) for r in res.fetchall()), key=_sort_key
            )
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:200]}")
            continue
        dt = time.time() - t0
        if sorted(scols) != sorted(dcols):
            n_fail += 1
            print(f"FAIL  {name}: cols {sorted(scols)} != {sorted(dcols)}")
        elif len(srows) != len(drows):
            n_fail += 1
            print(f"FAIL  {name}: rows {len(srows)} != {len(drows)}")
        elif srows == drows:
            # type-strict pass too: driver hashes typed values
            tmism = [
                (a, b)
                for ra, rb in zip(srows, drows)
                for a, b in zip(ra, rb)
                if type(a) is not type(b)
            ]
            if tmism:
                n_approx += 1
                print(f"TYPE  {name}: equal values, first type diff {tmism[0]!r} ({dt:.1f}s)")
            else:
                n_exact += 1
                print(f"exact {name} ({len(srows)} rows, {dt:.1f}s)")
        else:
            bad = [(a, b) for a, b in zip(srows, drows) if a != b]
            if all(_close(a, b) for a, b in bad):
                n_approx += 1
                print(f"CLOSE {name}: {len(bad)} rows differ only in float ulps, first {bad[0]} ({dt:.1f}s)")
            else:
                n_fail += 1
                first = next((p for p in bad if not _close(*p)), bad[0])
                print(f"FAIL  {name}: {len(bad)} rows differ, first real diff {first}")
    print(f"\n{n_exact} exact, {n_approx} close/typed, {n_fail} fail of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
