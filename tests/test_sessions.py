"""Streaming sessionization (applyInPandasWithState): gap-close on a
later event, event-time-timeout close via the watermark, and parity
with the batch sessionize logic."""

from __future__ import annotations

from datetime import datetime, timedelta

from rakam_api_collector_spark.streaming.sessions import sessionize_stream

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _mk(user, minutes, eid):
    return (user, T0 + timedelta(minutes=minutes), eid)


def test_streaming_sessionize(spark, tmp_path):
    src = tmp_path / "in"
    schema = "user_id long, ts timestamp, event_id long"
    # file1: u1 two events 10 min apart (one open session)
    f1 = spark.createDataFrame([_mk(1, 0, 10), _mk(1, 10, 11)], schema)
    # file2: u1 after a 110-min gap (closes session 1), u2 far ahead
    #        (drives the watermark past session-2's timeout)
    f2 = spark.createDataFrame([_mk(1, 120, 12), _mk(2, 240, 20)], schema)
    # file3: a later straggler so one more micro-batch runs and fires
    #        u1's event-time timer (watermark from file2 = 240-30 = 210
    #        > u1 session-2 last(120) + gap(30))
    f3 = spark.createDataFrame([_mk(3, 300, 30)], schema)
    for i, f in enumerate([f1, f2, f3]):
        f.coalesce(1).write.parquet(str(src / f"f{i}"))

    sessions = []

    def sink(batch_df, batch_id):
        sessions.extend((r.user_id, r.session_start, r.n_events,
                         r.first_event, r.last_event)
                        for r in batch_df.collect())

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))
    q = (sessionize_stream(stream, gap_sec=1800, watermark="30 minutes")
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = sorted(sessions)
    # u1 session 1 closed by the gap: events 10,11
    assert (1, T0, 2, 10, 11) in got
    # u1 session 2 closed by event-time timeout: single event 12
    assert (1, T0 + timedelta(minutes=120), 1, 12, 12) in got
    # u2/u3 sessions are still open — never emitted
    assert all(s[0] == 1 for s in got)


def test_gap_inside_one_batch(spark, tmp_path):
    src = tmp_path / "in"
    schema = "user_id long, ts timestamp, event_id long"
    rows = [_mk(7, 0, 1), _mk(7, 5, 2), _mk(7, 90, 3), _mk(7, 95, 4)]
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.parquet(str(src / "f0"))

    out = []

    def sink(batch_df, batch_id):
        out.extend((r.n_events, r.first_event, r.last_event)
                   for r in batch_df.collect())

    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (sessionize_stream(stream, gap_sec=1800, watermark="30 minutes")
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # the intra-batch 85-min gap closed session (1,2); (3,4) stays open
    assert out == [(2, 1, 2)]
