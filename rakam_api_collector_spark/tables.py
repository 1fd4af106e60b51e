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


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
