"""Slack-zone read amplification of the partitioned Kinesis reader.

The default ``stopSlackMs`` (window length clamped to [1 s, 5 s] —
kinesis.py read()) protects against approximately-monotone arrival
stamps by reading PAST the window end before stopping; those
slack-zone records are fetched, filtered out, and fetched again as
in-window records in a later batch. The documented bound is therefore
``amplification ≈ 1 + slack/window``: a 250 ms window (slack floored
at 1 s) re-reads each record ~5×, a 1 s window ~2×, a 15 s window
(slack capped at 5 s) ~1.33×. This cell MEASURES it: a constant-rate
producer feeds a live partitioned-mode query at each trigger window
while the emulator's ``fetch_stats_dir`` knob counts every record the
wire served; amplification = fetched / delivered.

Usage: python scripts/stress_kinesis_slack.py [rate_per_sec] [run_sec]
(defaults 400, 24). Prints one JSON line per window cell.
Paste into STRESS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, ".")

from rakam_api_collector_spark.session import get_spark
from rakam_api_collector_spark.sources.kinesis import register
from rakam_api_collector_spark.sources.kinesis_local import \
    LocalKinesisClient

WINDOWS_MS = (250, 1000, 15000)
N_SHARDS = 2
PAYLOAD = b'{"event": "click", "value": 42, "pad": "' + b"x" * 120 + b'"}'


def produce_constant_rate(cl: LocalKinesisClient, stop: threading.Event,
                          rate: int) -> list[int]:
    """Emit ~rate records/sec in 100 ms bursts until stop is set."""
    sids = [f"shardId-{i:012d}" for i in range(N_SHARDS)]
    sent = [0]
    per_tick = max(1, rate // 10)
    while not stop.is_set():
        t0 = time.perf_counter()
        batch = [{"Data": PAYLOAD, "PartitionKey": f"k{sent[0] + j}",
                  "ShardId": sids[(sent[0] + j) % N_SHARDS]}
                 for j in range(per_tick)]
        cl.put_records("events", batch)
        sent[0] += per_tick
        time.sleep(max(0.0, 0.1 - (time.perf_counter() - t0)))
    return sent


def run_cell(spark, work: str, window_ms: int, rate: int,
             run_sec: float) -> dict:
    d = os.path.join(work, f"kin{window_ms}")
    stats = os.path.join(work, f"stats{window_ms}")
    os.makedirs(stats)
    cl = LocalKinesisClient(d)
    cl.create_stream("events", ShardCount=N_SHARDS)
    out = os.path.join(work, f"out{window_ms}")
    ckpt = os.path.join(work, f"ckpt{window_ms}")

    stop = threading.Event()
    sent_box: list[int] = []
    producer = threading.Thread(
        target=lambda: sent_box.extend(
            produce_constant_rate(cl, stop, rate)))
    producer.start()
    q = (spark.readStream.format("kinesis_py")
         .option("streamName", "events")
         .option("endpoint", f"local:{d}")
         .option("readerMode", "partitioned")
         .option("settleMarginMs", "0")
         .option("localFetchStatsDir", stats)
         .load()
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(processingTime=f"{window_ms} milliseconds")
         .start())
    time.sleep(run_sec)
    stop.set()
    producer.join()
    time.sleep(max(2.0, 3 * window_ms / 1000.0))  # let the tail drain
    q.stop()

    delivered = spark.read.parquet(out).count()
    fetched = 0
    for f in os.listdir(stats):
        with open(os.path.join(stats, f)) as fh:
            for line in fh:
                try:
                    fetched += json.loads(line)["n"]
                except ValueError:
                    pass
    from rakam_api_collector_spark.sources.kinesis import \
        default_stop_slack_ms
    slack = default_stop_slack_ms(window_ms)
    cell = {
        "window_ms": window_ms,
        "produced": sent_box[0] if sent_box else None,
        "delivered": delivered,
        "fetched": fetched,
        "amplification": round(fetched / max(delivered, 1), 2),
        "documented_bound": round(1 + slack / window_ms, 2),
    }
    for p in (out, ckpt, d, stats):
        shutil.rmtree(p, ignore_errors=True)
    return cell


def main() -> None:
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    run_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 24.0
    spark = get_spark("stress_kinesis_slack")
    register(spark)
    work = tempfile.mkdtemp(prefix="kin_slack_")
    try:
        for w in WINDOWS_MS:
            print(json.dumps(run_cell(spark, work, w, rate, run_sec)),
                  flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
