"""Per-query profiling: wall seconds + Spark job count + stage count.

Usage: python scripts/profile_queries.py [name_substring ...]

Job/stage counts come from the status tracker with a per-query job
group, so driver round-trips (collects inside operators) are visible —
at bench scale each sequential job costs ~0.1-0.3 s of pure DAG/
scheduling latency, which is exactly what the heavy-tail queries pay.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rakam_api_collector_spark.session import get_spark


def main() -> int:
    pats = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as mod
    qs = mod.queries()
    if pats:
        qs = {k: v for k, v in qs.items() if any(p in k for p in pats)}

    spark = get_spark("profile_queries")
    sc = spark.sparkContext
    # warm like bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from rakam_api_collector_spark.tables import TABLES, load_table
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    import pandas as _pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    def _warm_fn(s):
        return s
    _warm = pandas_udf(_warm_fn, "long")
    spark.range(0, 1000, 1, 32).select(_warm("id")).collect()

    tracker = sc.statusTracker()
    rows = []
    for name in sorted(qs):
        sc.range(0, 100_000_000, 1, 32).count()  # freq ramp
        group = f"prof_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {e}", file=sys.stderr)
            dt = float("nan")
        sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(group)
        n_stages = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info:
                n_stages += len(info.stageIds)
        rows.append((name, dt, len(jobs), n_stages))
        spark.catalog.clearCache()
        import gc
        gc.collect()

    print(f"\n{'query':34s} {'sec':>8s} {'jobs':>5s} {'stages':>7s}")
    for name, dt, nj, ns in sorted(rows, key=lambda r: -(r[1] or 0)):
        print(f"{name:34s} {dt:8.3f} {nj:5d} {ns:7d}")
    total = sum(r[1] for r in rows if r[1] == r[1])
    print(f"total {total:.2f} s over {len(rows)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
