"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir and
compares it against ``oracle_sql()`` via DuckDB: row count, column-name
set, and order-insensitive value comparison (columns sorted by name,
rows sorted, values stringified). Exit code 1 if anything mismatches.

Usage: python scripts/check_correctness.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb

from rakam_api_collector_spark.session import get_spark
from rakam_api_collector_spark.tables import TABLES


def _canon_val(v):
    # Type-tag non-float scalars: the driver hashes Arrow-rendered values, so
    # a DuckDB HUGEINT (arrow decimal128) must NOT compare equal to a Spark
    # BIGINT even when both stringify to "26". Floats stay untagged (float32
    # vs float64 is a representation, not a semantic, difference).
    if v is None:
        return "null"
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, list):
        return "[" + ", ".join(_canon_val(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def canon(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    out = [tuple(_canon_val(r[i]) for i in order) for r in rows]
    return cols_sorted, sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import __spark_entry__ as mod
    qs, oracles = mod.queries(), mod.oracle_sql()

    spark = get_spark("correctness_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_noracle = 0
    for name, fn in sorted(qs.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            spark.catalog.clearCache()   # queries are independent
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows) "
                  f"[{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            res = con.sql(oracles[name])
            dcols = list(res.columns)
            # Fetch through Arrow, like the driver, so HUGEINT/DECIMAL column
            # types survive to the comparison instead of collapsing to int.
            tbl = res.fetch_arrow_table()
            drows = [tuple(d[c] for c in dcols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        sc, sr = canon(scols, srows)
        dc, dr = canon(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: schema {sc} vs oracle {dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount {len(sr)} vs oracle {len(dr)}")
            n_fail += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
