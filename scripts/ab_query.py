"""Min-of-N wall for one registered query through the registry wrapper
(fresh DataFrame each rep — exactly what bench.py times), with a
/proc/stat external-load probe so every number carries its own
quietness attestation (the r18 A/B methodology).

Usage: python scripts/ab_query.py <query_name> [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rakam_api_collector_spark.session import get_spark


def _probe():
    with open("/proc/stat") as fh:
        p = fh.readline().split()
    u, n, s, _i, _w, irq, sirq, steal = (int(x) for x in p[1:9])
    return u + n + s + irq + sirq + steal, steal


def _self_jiffies():
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                rest = fh.read().rsplit(")", 1)[1].split()
            total += int(rest[11]) + int(rest[12])
        except (OSError, IndexError, ValueError):
            continue
    return total


def main() -> int:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as mod
    fn = mod.queries()[name]

    spark = get_spark("ab_query")
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

    walls = []
    b0, s0 = _probe()
    t_all0 = time.monotonic()
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        walls.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    b1, s1 = _probe()
    dt = time.monotonic() - t_all0
    hz = 100
    # box-wide busy minus nothing (we can't subtract self cheaply here;
    # report steal cores, the external-contention signal that matters)
    steal_cores = (s1 - s0) / dt / hz
    busy_cores = (b1 - b0) / dt / hz
    print(f"{name}: min {min(walls):.3f}s of {reps} "
          f"(all: {' '.join(f'{w:.2f}' for w in walls)}) "
          f"steal_cores={steal_cores:.2f} busy_cores={busy_cores:.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
