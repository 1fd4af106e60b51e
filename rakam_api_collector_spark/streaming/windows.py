"""Watermarked window aggregation and stream-stream joins — the
Structured Streaming surface for event-time analytics over the ingested
stream.

The reference aggregates only at flush boundaries (micro-batch
counters, committer.py analogs); event-time windows with late-data
handling are what Spark adds on top. Both operators here are
batch/stream agnostic: applied to a static frame they compute the same
answer (tested), applied to a readStream they run incrementally with
state eviction governed by the watermark — which is what makes them
viable on an unbounded 100 TB/day stream: state is bounded by
(watermark delay × key cardinality), not by history.

Plan shape: a streaming window agg is ONE stateful exchange on
(keys, window); the stream-stream join keeps both sides' state within
their watermarks and joins on (key AND time-range) — Spark prunes each
side's state buffer to the range the other side can still match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, *, time_col: str = "ts",
                    keys: tuple[str, ...] = ("event_type",),
                    window: str = "1 hour", slide: str | None = None,
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time counts + value
    sums per key. In append-mode streaming a window emits exactly once,
    when the watermark passes its end; events later than the watermark
    are dropped — the reference's outdated-day split routes such rows
    to the historical worker instead (streaming/latesplit.py), so a
    pipeline uses BOTH: this for the hot path, the split for replay."""
    w = F.window(F.col(time_col), window, slide or window)
    return (events.withWatermark(time_col, watermark)
            .groupBy(*[F.col(k) for k in keys], w.alias("w"))
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(18,6)"))
                 .cast("double").alias("val_sum"))
            .select(*keys,
                    F.col("w.start").alias("w_start"),
                    F.col("w.end").alias("w_end"), "n", "val_sum"))


def interval_join(left: DataFrame, right: DataFrame, *, key: str,
                  left_time: str, right_time: str,
                  within: str = "1 hour",
                  watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join: right rows within ``[t_left,
    t_left + within]`` of a matching-key left row (the
    impression→click attribution shape). Watermarks on BOTH sides
    bound the state buffers; the time-range predicate lets Spark evict
    left state once right's watermark passes t_left + within."""
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    return (left.withWatermark(left_time, watermark).alias("l")
            .join(right.withWatermark(right_time, watermark).alias("r"),
                  (F.col(f"l.{key}") == F.col(f"r.{key}"))
                  & (rt >= lt)
                  & (rt <= lt + F.expr(f"INTERVAL {within}")),
                  "inner"))
