"""kafka_py fetch scaling — the Kafka twin of
``stress_kinesis_partitioned.py``: a FIXED record volume spread over a
growing partition count drains through ``format("kafka_py")`` (one
input partition per topic-partition, fetch on executors) in ~flat
wall — more partitions = more parallel readers over the same bytes.

Each drain is a real checkpointed StreamingQuery (availableNow)
against the file-backed broker emulator, writing parquet — the whole
consumption path, not a bare fetch loop.

Usage: python scripts/stress_kafka_partitions.py [n_records]
(default 64000). Prints one JSON line per partition count.
Paste into STRESS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from rakam_api_collector_spark.session import get_spark
from rakam_api_collector_spark.sources.kafka import register_kafka_py
from rakam_api_collector_spark.sources.kafka_local import LocalKafkaBroker

PARTITION_COUNTS = (4, 16, 32)
PAYLOAD = b'{"event": "click", "value": 42, "pad": "' + b"x" * 160 + b'"}'


def build_topic(work: str, n_parts: int, n_records: int) -> str:
    d = os.path.join(work, f"kafka{n_parts}")
    b = LocalKafkaBroker(d)
    b.create_topic("events", partitions=n_parts)
    batch = []
    for i in range(n_records):
        batch.append({"Value": PAYLOAD, "Partition": i % n_parts})
        if len(batch) == 5000:
            b.produce("events", batch)
            batch = []
    if batch:
        b.produce("events", batch)
    return d


def drain(spark, kdir: str, work: str) -> tuple[float, int]:
    tag = os.path.basename(kdir)
    out = os.path.join(work, f"out_{tag}")
    ckpt = os.path.join(work, f"ckpt_{tag}")
    t0 = time.perf_counter()
    q = (spark.readStream.format("kafka_py")
         .option("endpoint", f"local:{kdir}")
         .option("subscribe", "events")
         .option("startingOffsets", "earliest")
         .load()
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    if not q.awaitTermination(300):
        # never count/delete under a live query: a timed-out drain is
        # a failed cell, not a number
        q.stop()
        q.awaitTermination(60)
        raise RuntimeError(f"drain of {tag} exceeded 300s")
    wall = time.perf_counter() - t0
    n = spark.read.parquet(out).count()
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return wall, n


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000
    work = tempfile.mkdtemp(prefix="kafkastress_")
    spark = get_spark("stress_kafka_partitions")
    spark.sparkContext.setLogLevel("ERROR")
    register_kafka_py(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()   # warm JVM
    try:
        for n_parts in PARTITION_COUNTS:
            kdir = build_topic(work, n_parts, n_records)
            best = float("inf")
            for _ in range(2):                     # min-of-2 vs noise
                wall, n = drain(spark, kdir, work)
                assert n == n_records, (n_parts, n)
                best = min(best, wall)
            print(json.dumps({
                "partitions": n_parts, "records": n_records,
                "wall_sec": round(best, 2),
                "records_per_sec": round(n_records / best, 0),
            }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
