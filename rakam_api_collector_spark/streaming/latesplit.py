"""Event-time late-data split + backfill re-promotion (ST3/ST4).

The reference classifies each record's event-time *day* against
``[today - outdated.day.index, today]`` — inside → real-time path,
outside → historical topic (KafkaRealTimeWorker.java:294-328,356-367).
One heuristic softens it: an old day carrying > 1000 records AND > 25%
of the batch is a bulk backfill and stays real-time
(KafkaRealTimeWorker.java:370-384).

Pure DataFrame logic so the same function serves the batch path and
``foreachBatch``: per-day counts are a tiny aggregate broadcast back —
no second shuffle of the data, just one scan + one broadcast-join.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROMOTE_MIN_RECORDS = 1000   # KafkaRealTimeWorker.java:371
PROMOTE_MIN_FRACTION = 0.25  # KafkaRealTimeWorker.java:372


def split_late(df: DataFrame, time_col: str = "_time",
               outdated_day_index: int = 1,
               now: dt.datetime | str | None = None,
               promote_min_records: int = PROMOTE_MIN_RECORDS,
               promote_min_fraction: float = PROMOTE_MIN_FRACTION,
               ) -> tuple[DataFrame, DataFrame]:
    """Return (realtime, historical). Null event times go historical
    (the reference can't classify them either — they'd fail the day
    window). ``now`` pins the reference's wall-clock for tests."""
    day = F.to_date(F.col(time_col))
    today = F.to_date(F.lit(now)) if now is not None else F.current_date()
    fresh = day.isNotNull() & (day >= F.date_sub(today, outdated_day_index)) \
        & (day <= today)

    total = df.count()   # batch-local, same as the reference's buffer size
    promoted = (df.groupBy(day.alias("_d"))
                .agg(F.count("*").alias("_n"))
                .filter((F.col("_n") > promote_min_records)
                        & (F.col("_n") > promote_min_fraction * total))
                .select("_d", F.lit(True).alias("_promoted")))

    tagged = df.withColumn("_d", day).join(
        F.broadcast(promoted), on="_d", how="left")
    keep = fresh | F.col("_promoted").isNotNull()
    realtime = tagged.filter(keep).drop("_d", "_promoted")
    historical = tagged.filter(~keep | keep.isNull()).drop("_d", "_promoted")
    return realtime, historical
