"""Streaming sessionization — custom stateful operator via
``applyInPandasWithState``.

The one operator family Structured Streaming's built-ins can't express
(session windows with per-key custom state and emit-on-close) runs the
documented escape hatch: per-key Arrow-batched state. Semantics match
the batch form in queries/relational.py:dq35_sessionize — events of one
user belong to one session while consecutive gaps stay ≤ ``gap_sec``;
a session is emitted once it CLOSES (a later event opens a new one, or
the event-time watermark passes last_ts + gap).

Scale shape: state is one fixed-size row per live user (6 scalars),
partitioned by user hash across executors by the streaming state store;
each micro-batch shuffles only that batch's events on user_id. This is
the applyInPandasWithState contract the Spark docs give for arbitrary
stateful processing; RocksDB state-store provider keeps per-executor
state off-heap exactly as the TTL-dedup path does (pipeline.py ST6).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("n_events", LongType()),
    StructField("first_event", LongType()),
    StructField("last_event", LongType()),
])

# (session_start_us, last_ts_us, n_events, first_event, last_event)
_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("first_id", LongType()),
    StructField("last_id", LongType()),
])


def _sessionize_fn(gap_sec: int):
    gap_us = gap_sec * 1_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        def emit(s):
            closed.append((user_id,
                           pd.Timestamp(s[0], unit="us"),
                           s[2], s[3], s[4]))

        cur = list(state.get) if state.exists else None
        if state.hasTimedOut:
            if cur:
                emit(cur)
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows["_us"] = rows["ts"].astype("int64") // 1_000
            rows = rows.sort_values(["_us", "event_id"])
            for us, eid in zip(rows["_us"], rows["event_id"]):
                us, eid = int(us), int(eid)
                if cur is None:
                    cur = [us, us, 1, eid, eid]
                elif us - cur[1] > gap_us:
                    emit(cur)
                    cur = [us, us, 1, eid, eid]
                else:
                    cur[1] = us
                    cur[2] += 1
                    cur[4] = eid
            state.update(tuple(cur))
            # close by event time once the watermark passes last + gap;
            # a batch of late rows could put that in the past, which
            # Spark rejects — clamp to just above the current watermark
            timeout_ms = cur[1] // 1000 + gap_sec * 1000
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(closed, columns=[f.name for f in
                                                SESSION_SCHEMA.fields])

    return fn


def sessionize_stream(events: DataFrame, gap_sec: int = 1800,
                      watermark: str = "30 minutes") -> DataFrame:
    """events (streaming): (user_id long, ts timestamp, event_id long)
    → closed sessions (SESSION_SCHEMA), emitted in the micro-batch where
    they close."""
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn(gap_sec), SESSION_SCHEMA, _STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
