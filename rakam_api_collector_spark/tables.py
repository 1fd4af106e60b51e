"""Table loaders for the driver-provided parquet fixtures (TESTDATA.md).

The reference's "metadata scan" (connector/MetadataDao.java:92-110 —
``tables ⋈ columns`` against MySQL) becomes a catalog lookup: parquet
footers carry the schema, Spark's catalog carries the views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst prunes columns / pushes filters.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects. With
    ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) the
    column scans as epoch-nanos BIGINT; ``ts div 1000`` floors to micros,
    matching DuckDB's own nanos→micros truncation exactly (the fixture has
    no sub-micro precision, so this is lossless).
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # Belt-and-braces: if a driver-owned session left NTZ inference
        # on, normalize to session-TZ TIMESTAMP (UTC) so epoch math
        # (unix_millis, long casts) works and semantics match the oracle.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame, *key: str) -> DataFrame:
    """Redistribute a scan whose INPUT LAYOUT under-parallelizes the
    session (guide §2.5 "input skew: one huge unsplittable file …
    repartition immediately after the read"): the local fixtures are
    single-row-group parquet files, so every scan — and all narrow
    work above it (tokenize, shingle, Python decode, partial
    aggregation) — runs as ONE task regardless of cores. Hash-
    repartition on a stable key fans that work out.

    Adaptive, not a local[32] constant: when the scan already carries
    at least half the session's default parallelism — the 100 TB case,
    where a table is thousands of row groups — this returns the input
    unchanged, so no extra exchange ever rides a well-laid-out input.
    The partition count is ``defaultParallelism`` (scales with the
    session), and partitioning is HASH on a data key (never
    round-robin): the row→partition mapping is a pure function of the
    data, so retries/speculation reproduce it (SPARK-38388 class of
    bugs cannot apply) and results stay deterministic.

    Use only where the downstream per-row work dominates the one
    narrow exchange this adds — CPU-heavy pipelines, not sub-100 ms
    projections.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= max(target // 2, 1):
        return df
    return df.repartition(target, *[F.col(k) for k in key])


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
