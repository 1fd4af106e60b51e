"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    """Apply session confs the engine needs on a driver-provided session
    (session.py sets these when we own the builder)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # naive timestamp[us] parquet must scan as TIMESTAMP, not NTZ
    # (unix_millis / long casts reject NTZ; oracle is UTC-naive).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-shaped hash aggregation on sf0.001."""
    from rakam_api_collector_spark.queries.relational import dq08_hash_agg
    return dq08_hash_agg(_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7 Phase 4."""
    from rakam_api_collector_spark.queries import QUERIES

    def wrap(fn):
        return lambda spark, sf_dir: fn(_configure(spark), sf_dir)

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys match ``queries()``.
    Queries absent here get the driver's weaker rows-only check."""
    from rakam_api_collector_spark.queries import ORACLE
    return dict(ORACLE)
