"""Temporal operators: as-of (nearest-prior) join, bucketed band join.

Spark has no ASOF JOIN; the naive encoding (range join + keep latest)
explodes to |left| × |right-rows-before| intermediate pairs. This
implementation is the scale-correct composition: tag both sides, union,
and run ONE window pass per key ordered by time — each input row is
touched once, the only shuffle is the partitionBy(key) exchange, and
peak state per task is one row of carried right-side values (the
running `last(..., ignorenulls=True)`), independent of how many right
rows precede a left row.

Reference parity: the reference engine has no as-of operator (it is an
ingestion engine); this extends the query surface for the time-series /
feature-backfill shapes a training-data pipeline needs (e.g. "attach
the latest profile snapshot at event time"). Semantics match DuckDB's
``ASOF LEFT JOIN ... ON l.key = r.key AND r.ts <= l.ts`` (backward,
inclusive), which is the oracle used in dq31.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              ts_col: str, value_cols: list[str],
              direction: str = "backward",
              strict: bool = False,
              tie_cols: list[str] | None = None) -> DataFrame:
    """Left as-of join: every left row, plus ``value_cols`` from the
    right row with the greatest ``ts_col`` ≤ left's (per ``key_cols``);
    unmatched left rows keep nulls. ``direction="forward"`` matches the
    smallest right ts ≥ left's instead. ``strict=True`` excludes equal
    timestamps.

    Right-side ``value_cols`` must not collide with left column names
    (alias before calling). Rows of the right side sharing (key, ts)
    should be pre-deduplicated — which one wins is otherwise unspecified
    (last in union order), as in other engines — UNLESS ``tie_cols``
    names right-side columns (⊆ ``value_cols``): then the row with the
    greatest ``tie_cols`` value among equal-(key, ts) right rows wins,
    equivalent to pre-deduplicating with ``row_number() over (partition
    by key, ts order by tie desc)`` but WITHOUT that window's separate
    (key, ts) exchange+sort — the tie-break rides the one as-of window
    (r18, guide §2.2: dq31 dropped an Exchange this way; all carried
    ``value_cols`` come from the same winning row because every right
    row is non-null in all of them and ``last(ignorenulls)`` lands on
    the ordering's final right row)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if tie_cols and not set(tie_cols) <= set(value_cols):
        raise ValueError(f"tie_cols must be right-side value_cols "
                         f"(got {tie_cols} vs {value_cols})")

    lcols = left.columns
    l_tag = left.select(
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in value_cols],
        F.lit(1).alias("_side"))
    r_tag = right.select(
        *[F.col(c) if c in (ts_col, *key_cols)
          else F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols],
        *value_cols,
        F.lit(0).alias("_side"))
    u = l_tag.unionByName(r_tag)

    # backward: right rows sort before left at equal ts (inclusive) —
    # strict flips the tie order so an equal-ts right row is not yet
    # visible. forward mirrors with a reversed frame.
    tie = F.asc("_side") if not strict else F.desc("_side")
    # among equal-(key, ts) right rows the LAST in order is the one
    # last(ignorenulls) carries, so ascending tie_cols ⇒ greatest wins;
    # left rows are all-null in tie_cols and already separated by _side
    order_tail = [F.asc(c) for c in (tie_cols or [])]
    if direction == "backward":
        w = (Window.partitionBy(*key_cols)
             .orderBy(F.asc(ts_col), tie, *order_tail)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        w = (Window.partitionBy(*key_cols)
             .orderBy(F.desc(ts_col), tie, *order_tail)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    carried = [F.last(c, ignorenulls=True).over(w).alias(c)
               for c in value_cols]
    return (u.select(*lcols, "_side", *carried)
            .filter(F.col("_side") == 1)
            .drop("_side"))


def band_join(fact: DataFrame, intervals: DataFrame, value_col: str,
              lo_col: str, hi_col: str, bucket_width: float,
              how: str = "inner") -> DataFrame:
    """Bucketed range (band) join: ``fact`` rows matched to ``intervals``
    rows where ``lo <= value < hi``, as a hash equi-join instead of a
    nested-loop predicate scan.

    Each interval is exploded onto the coarse buckets it covers
    (``floor(lo/w) .. floor(hi/w)``, a superset — the residual BETWEEN
    filters exact), and each fact row computes ONE bucket key. The
    interval×bucket table broadcasts; the join is a map-side
    BroadcastHashJoin probing |covering buckets| per fact row via hash,
    where a BroadcastNestedLoopJoin evaluates the range predicate
    against EVERY interval. Cost is O(|fact| + |intervals|·span/w)
    rather than O(|fact|·|intervals|) — the difference between a
    10-band demo and a 100k-interval dimension at 100 TB. Pick
    ``bucket_width`` near the median interval width so most intervals
    cover 1-2 buckets.

    Intervals are half-open [lo, hi). Fact rows whose value matches no
    interval are dropped for ``how="inner"``, kept with null interval
    columns for ``how="left"``."""
    iv = intervals.withColumn(
        "_band_bucket",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / bucket_width),
            F.floor(F.col(hi_col) / bucket_width))))
    f = fact.withColumn(
        "_band_bucket", F.floor(F.col(value_col) / bucket_width))
    in_band = ((F.col(value_col) >= F.col(lo_col))
               & (F.col(value_col) < F.col(hi_col)))
    if how == "inner":
        return (f.join(F.broadcast(iv), "_band_bucket")
                .filter(in_band).drop("_band_bucket"))
    if how != "left":
        raise ValueError(f"how must be inner|left: {how}")
    return (f.join(F.broadcast(iv),
                   (f["_band_bucket"] == iv["_band_bucket"]) & in_band,
                   "left")
            .drop("_band_bucket"))
