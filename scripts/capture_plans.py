"""Capture .explain('formatted') for registered queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [name_substring ...]

Writes plans/<tag>/<query>_<suffix>.txt where suffix is the 2nd argv
token after the tag if it equals 'before' or 'after' — simpler: tag is
e.g. 'r18' and the suffix is given via PLAN_SUFFIX env (default
'before').
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r18"
    pats = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as mod
    qs = mod.queries()
    if pats:
        qs = {k: v for k, v in qs.items()
              if any(p in k for p in pats)}

    from rakam_api_collector_spark.session import get_spark
    spark = get_spark("capture_plans")
    out_dir = os.path.join("plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
