"""Watermarked window aggregation + stream-stream interval join
(streaming/windows.py): batch/stream parity, late-data drop, and
bounded-state join semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from rakam_api_collector_spark.streaming.windows import (
    interval_join, windowed_counts)


def _ts(h, m=0):
    return datetime(2020, 6, 1, h, m)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double")


def test_batch_stream_parity_tumbling(spark, tmp_path):
    rows = [(_ts(10, 5), "click", 1.0), (_ts(10, 40), "click", 2.0),
            (_ts(11, 10), "click", 4.0), (_ts(10, 20), "view", 8.0)]
    static = windowed_counts(_events(spark, rows))

    src = tmp_path / "src"
    _events(spark, rows).coalesce(1).write.parquet(str(src))
    stream = (spark.readStream.schema(
                  "ts timestamp, event_type string, value double")
              .parquet(str(src)))
    q = (windowed_counts(stream).writeStream
         .format("memory").queryName("wc_parity")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    key = lambda r: (r.event_type, r.w_start, r.n, r.val_sum)
    got = sorted(map(key, spark.table("wc_parity").collect()))
    want = sorted(map(key, static.collect()))
    assert got == want and len(want) == 3


def _write_one_parquet(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows]),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    pq.write_table(tbl, str(path))


def test_append_mode_drops_late_event(spark, tmp_path):
    """The watermark advances at batch END, so the drop needs three
    batches: b1 seeds, b2 moves the watermark to 13:00, b3 delivers a
    10:30 straggler (dropped) — the 10:00 window finalizes without it.
    The reference would route that straggler to the historical worker
    (streaming/latesplit.py); here append mode just drops it."""
    src = tmp_path / "src"
    src.mkdir()
    _write_one_parquet(src / "f1.parquet", [(_ts(10, 5), "click", 1.0)])

    stream = (spark.readStream.schema(
                  "ts timestamp, event_type string, value double")
              .parquet(str(src)))
    q = (windowed_counts(stream).writeStream
         .format("memory").queryName("wc_late")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()                      # b1: watermark -> 8:05
    _write_one_parquet(src / "f2.parquet", [(_ts(15, 0), "click", 1.0)])
    q.processAllAvailable()                      # b2: watermark -> 13:00
    _write_one_parquet(src / "f3.parquet",
                       [(_ts(10, 30), "click", 99.0)])  # < 13:00: dropped
    q.processAllAvailable()
    _write_one_parquet(src / "f4.parquet", [(_ts(18, 0), "view", 0.0)])
    q.processAllAvailable()                      # flush finalized windows
    q.stop()

    rows = {(r.event_type, r.w_start): r for r in
            spark.table("wc_late").collect()}
    clicks_10 = rows[("click", _ts(10))]
    assert clicks_10.n == 1               # late 10:30 row was dropped
    assert clicks_10.val_sum == 1.0


def test_interval_join_batch_semantics(spark):
    imps = spark.createDataFrame(
        [("u1", _ts(10, 0)), ("u2", _ts(10, 0))],
        "user_id string, ts timestamp")
    clicks = spark.createDataFrame(
        [("u1", _ts(10, 30)),     # within 1h -> joins
         ("u1", _ts(12, 0)),      # outside   -> no
         ("u3", _ts(10, 10))],    # no imp    -> no
        "user_id string, cts timestamp")
    out = interval_join(imps, clicks, key="user_id",
                        left_time="ts", right_time="cts")
    got = [(r["user_id"], r["cts"]) for r in
           out.select(F.col("l.user_id"), "cts").collect()]
    assert got == [("u1", _ts(10, 30))]


def test_interval_join_streams_end_to_end(spark, tmp_path):
    imps = spark.createDataFrame(
        [("u1", _ts(10, 0)), ("u2", _ts(11, 0))],
        "user_id string, ts timestamp")
    clicks = spark.createDataFrame(
        [("u1", _ts(10, 45)), ("u2", _ts(12, 30))],
        "user_id string, cts timestamp")
    imps.coalesce(1).write.parquet(str(tmp_path / "imps"))
    clicks.coalesce(1).write.parquet(str(tmp_path / "clicks"))

    si = (spark.readStream.schema("user_id string, ts timestamp")
          .parquet(str(tmp_path / "imps")))
    sc = (spark.readStream.schema("user_id string, cts timestamp")
          .parquet(str(tmp_path / "clicks")))
    q = (interval_join(si, sc, key="user_id",
                       left_time="ts", right_time="cts")
         .select(F.col("l.user_id").alias("user_id"), "ts", "cts")
         .writeStream.format("memory").queryName("ij")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sorted((r.user_id, r.cts) for r in spark.table("ij").collect())
    assert got == [("u1", _ts(10, 45))]   # u2's click is outside 1h
