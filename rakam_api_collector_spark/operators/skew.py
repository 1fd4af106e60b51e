"""Skew-mitigation operators: salted two-phase aggregation.

AQE's skew-join splitting handles joins, but a groupBy on a heavily
skewed key (one collection receiving 90% of events — the reference's
live shape, where per-collection batches are exactly such hot keys,
MiddlewareBuffer.java's largest-first flush exists because of it) still
sends every hot-key row to one reducer. Salting splits each hot key
across ``salt`` reducers in phase 1 and merges the ``salt`` partial
rows in phase 2: the second shuffle moves |keys| × salt rows (tiny),
the first is balanced.

Aggregates must be algebraic (decomposable into partial + merge):
count→sum, sum→sum, min→min, max→max — the same contract as Spark's own
partial aggregation. For most workloads Spark's built-in map-side
partial aggregation already absorbs skew (each task pre-aggregates to
one row per key); salting matters when per-task key cardinality is too
high for the hash-map fast path or when combining with high-cardinality
sub-keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key_cols: list[str],
               aggs: dict[str, tuple[Column, Column]],
               salt: int = 16) -> DataFrame:
    """Two-phase aggregation with a random salt on the grouping key.

    ``aggs`` maps output name → (phase-1 aggregate over input rows,
    phase-2 merge aggregate over the phase-1 column of the same name),
    e.g. ``{"n": (F.count("*"), F.sum("n")), "mx": (F.max("x"),
    F.max("mx"))}``. The salt column is uniform random — correctness
    does not depend on its distribution, only balance does."""
    p1 = (df.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
          .groupBy(*key_cols, "_salt")
          .agg(*[a1.alias(name) for name, (a1, _) in aggs.items()]))
    return (p1.groupBy(*key_cols)
            .agg(*[a2.alias(name) for name, (_, a2) in aggs.items()]))
