"""100×-shape rehearsal — the 5 most expensive registered queries run
END-TO-END against a MATERIALIZED sf0.1×16 dataset (~10M-row lineitem).

The scaling study (scaling_study.py) amplifies in-plan to isolate
operator compute; this harness instead writes a real ×16 parquet
directory and runs the REGISTERED queries unchanged against it — so
every fixed-overhead assumption a query makes (driver-side collects
stay bounded, PQ/centroid training fits, gates behave, scan machinery)
is exercised exactly as the driver would exercise it at the next order
of magnitude. Replica id-shifts keep the fixture semantics intact:

- lineitem: plain ×16 row replication (dq41 aggregates by linestatus —
  quantile values are replication-invariant, so results stay sane).
- embeddings: vec_id + 10M per extra replica; replica 0 is identity so
  vec_id<5 query sets and vec_id<500 gates keep their rows while the
  corpus (llm49's encode/ADC side) really grows ×16.
- documents: doc_id + 10M per extra replica (10M % 4 == 0 keeps the
  %4-tail semantics); llm50's corpus-wide hot tail now sits at ~80k
  sites — the registered query's own hot-hash regime at ×16.

Usage: python scripts/rehearsal_x16.py [out_dir]   (default /tmp/sfx16)
Prints one JSON line per query (2 runs each; warm wall is the
steady-state number) and a summary line. Paste into STRESS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from rakam_api_collector_spark.session import get_spark
from rakam_api_collector_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
K = 16
SHIFT = 10_000_000
REHEARSED = ["llm49_ivf_pq_recall", "dq41_approx_quantile",
        "llm17_incremental_dedup", "llm46_semantic_dedup",
        "llm50_dup_span_removal",
        # r14 additions: the two registered queries whose operators
        # changed since the r10 certification — llm09 (the r13
        # hot-bucket guard rewrite: map-side group count + driver
        # emptiness probe, broadcast split only on floods) and llm31
        # (the r13 TakeOrderedAndProject top-k) — re-certify their
        # bounded-collect/driver-fit assumptions at ×16
        "llm09_minhash_lsh", "llm31_vocab_coverage"]


def materialize(spark, out: str) -> None:
    reps = F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("_rep")

    li = load_table(spark, SF_DIR, "lineitem")
    (li.select("*", reps).drop("_rep")
     .write.mode("overwrite").parquet(f"{out}/lineitem.parquet"))

    emb = load_table(spark, SF_DIR, "embeddings")
    (emb.select("*", reps)
     .select((F.col("vec_id") + F.col("_rep") * SHIFT).alias("vec_id"),
             "embedding")
     .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))

    docs = load_table(spark, SF_DIR, "documents")
    (docs.select("*", reps)
     .select((F.col("doc_id") + F.col("_rep") * SHIFT).alias("doc_id"),
             *[c for c in docs.columns if c != "doc_id"])
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx16"
    spark = get_spark("rehearsal_x16")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{out}/documents.parquet"):
        t0 = time.perf_counter()
        materialize(spark, out)
        print(json.dumps({"materialize_sec":
                          round(time.perf_counter() - t0, 1)}),
              flush=True)

    from rakam_api_collector_spark.queries import QUERIES
    total = 0.0
    for name in REHEARSED:
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = len(QUERIES[name](spark, out).collect())
            walls.append(round(time.perf_counter() - t0, 2))
        total += walls[-1]
        print(json.dumps({"query": name, "rows": n,
                          "wall_sec_runs": walls,
                          "warm_wall_sec": walls[-1]}), flush=True)
    print(json.dumps({"metric": "rehearsal_x16_total_warm_sec",
                      "value": round(total, 2),
                      "loadavg": round(os.getloadavg()[0], 1)}),
          flush=True)
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
