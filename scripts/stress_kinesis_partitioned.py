"""Executor-parallel Kinesis fetch scaling — the partitioned-mode
evidence cell: a FIXED record volume spread over a growing shard count
drains through ``readerMode=partitioned`` in ~flat wall (one input
partition per shard, GetRecords on executors, so more shards = more
parallelism over the same bytes), while the driver-side Simple reader
serializes every shard's fetch through the planning worker.

Each drain is a real checkpointed StreamingQuery (availableNow) against
the file-backed emulator, writing parquet — the whole consumption path,
not a bare GetRecords loop.

Usage: python scripts/stress_kinesis_partitioned.py [n_records]
(default 64000). Prints one JSON line per (mode, shards) cell.
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
from rakam_api_collector_spark.sources.kinesis import register
from rakam_api_collector_spark.sources.kinesis_local import \
    LocalKinesisClient

SHARD_COUNTS = (4, 16, 32)
PAYLOAD = b'{"event": "click", "value": 42, "pad": "' + b"x" * 160 + b'"}'


def build_stream(work: str, n_shards: int, n_records: int) -> str:
    d = os.path.join(work, f"kin{n_shards}")
    cl = LocalKinesisClient(d)
    cl.create_stream("events", ShardCount=n_shards)
    sids = [f"shardId-{i:012d}" for i in range(n_shards)]
    batch = []
    for i in range(n_records):
        batch.append({"Data": PAYLOAD, "PartitionKey": f"k{i}",
                      "ShardId": sids[i % n_shards]})
        if len(batch) == 1000:
            cl.put_records("events", batch)
            batch = []
    if batch:
        cl.put_records("events", batch)
    return d


def drain(spark, kin_dir: str, work: str,
          mode: str) -> tuple[float, int]:
    out = os.path.join(work, f"out_{mode}_{os.path.basename(kin_dir)}")
    ckpt = os.path.join(work, f"ckpt_{mode}_{os.path.basename(kin_dir)}")
    reader = (spark.readStream.format("kinesis_py")
              .option("streamName", "events")
              .option("endpoint", f"local:{kin_dir}"))
    if mode == "partitioned":
        reader = (reader.option("readerMode", "partitioned")
                  .option("settleMarginMs", "0"))
    else:
        # one batch, like the partitioned window: no per-batch cap
        reader = reader.option("maxRecordsPerShard", str(2 ** 31 - 1))
    time.sleep(0.01)
    t0 = time.perf_counter()
    (reader.load()
     .writeStream.format("parquet")
     .option("path", out).option("checkpointLocation", ckpt)
     .trigger(availableNow=True).start().awaitTermination(300))
    wall = time.perf_counter() - t0
    n = spark.read.parquet(out).count()
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return wall, n


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000
    work = tempfile.mkdtemp(prefix="kinstress_")
    spark = get_spark("stress_kinesis_partitioned")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()   # warm JVM
    try:
        for n_shards in SHARD_COUNTS:
            kin = build_stream(work, n_shards, n_records)
            for mode in ("partitioned", "simple"):
                best = float("inf")
                for _ in range(2):                 # min-of-2 vs noise
                    wall, n = drain(spark, kin, work, mode)
                    assert n == n_records, (mode, n_shards, n)
                    best = min(best, wall)
                print(json.dumps({
                    "mode": mode, "shards": n_shards,
                    "records": n_records,
                    "wall_sec": round(best, 2),
                    "records_per_sec": round(n_records / best, 0),
                }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
