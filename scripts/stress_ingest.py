"""Ingestion stress harness — the KafkaStressTest.java:52-137 shape.

Synthesizes the reference's stress workload (default: 30,000 events per
batch across 100 collections with ~19 mixed-type fields, 10% of records
late by up to 30 days) and runs it through the batch envelope-ingest
path end-to-end (route → parse → infer → evolve → typed project →
late-split → parquet sinks), printing ONE JSON line with records/sec.

Usage: python scripts/stress_ingest.py [n_records] [n_collections]
"""

from __future__ import annotations

import json
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from rakam_api_collector_spark.ingest.batch import ingest_batch
from rakam_api_collector_spark.ingest.catalog import Catalog
from rakam_api_collector_spark.session import get_spark
from rakam_api_collector_spark.sinks import write_collections
from rakam_api_collector_spark.streaming.latesplit import split_late

BASE_MS = 1704067200000   # 2024-01-01T00:00:00Z
DAY_MS = 86_400_000


def make_envelopes(n: int, n_collections: int, late_frac: float = 0.10,
                   seed: int = 7) -> list[str]:
    """~19 mixed-type fields per record (KafkaStressTest.java:107-137's
    field mix: strings, longs, doubles, bools, arrays, maps, time)."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        late = rng.random() < late_frac
        ts = BASE_MS + (30 * DAY_MS) - (
            rng.randint(1, 30) * DAY_MS if late else rng.randint(0, DAY_MS))
        rec = {
            "_project": "stress",
            "_collection": f"coll_{i % n_collections}",
            "_user": f"user_{rng.randint(0, 5000)}",
            "_time": ts,
            **{f"str_{j}": rng.choice(["a", "bb", "ccc", None])
               for j in range(5)},
            **{f"num_{j}": rng.random() * 100 for j in range(5)},
            **{f"int_{j}": rng.randint(0, 10**6) for j in range(3)},
            "flag": rng.random() > 0.5,
            "tags": [rng.choice("xyz") for _ in range(3)],
            "attrs": {"k1": rng.random(), "k2": rng.random()},
            "note": "n" * rng.randint(1, 120),     # exercises truncation
        }
        out.append(json.dumps({"id": i, "metadata": {}, "data": rec}))
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    n_coll = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    spark = get_spark("stress_ingest")
    envelopes = make_envelopes(n, n_coll)
    raw = spark.createDataFrame([(e,) for e in envelopes], "value: string")
    raw = raw.repartition(32).cache()
    raw.count()

    out_dir = tempfile.mkdtemp(prefix="stress_tables_")
    catalog = Catalog()
    t0 = time.perf_counter()
    # late split runs ONCE on the raw batch (pipeline order, ST3) — the
    # per-batch promote counts are one aggregate, not one per collection
    from pyspark.sql import functions as F
    timed = raw.withColumn(
        "_event_time",
        F.timestamp_millis(F.get_json_object("value", "$.data._time")
                           .cast("long")))
    rt, hist = split_late(timed, time_col="_event_time",
                          outdated_day_index=1, now="2024-01-31")
    tables = ingest_batch(spark, rt.select("value"), "fabric", catalog,
                          shard_time="2024-02-01 00:00:00")
    write_collections(tables, out_dir, coalesce_to=2)
    tables.unpersist()
    wall = time.perf_counter() - t0

    n_tables = len(tables)
    # R1 fan-out rule, asserted: all collections here evolve to the same
    # schema, so typed projection built ONE group plan — plans scale
    # with #distinct schemas, not #collections.
    n_schema_groups = len(tables.groups)
    assert n_schema_groups == 1, \
        f"expected 1 schema group, got {n_schema_groups}"
    shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps({
        "metric": "ingest_records_per_sec",
        "value": round(n / wall, 1),
        "unit": "records/sec",
        "records": n,
        "collections": n_tables,
        "schema_groups": n_schema_groups,
        "wall_sec": round(wall, 2),
    }))


if __name__ == "__main__":
    main()
