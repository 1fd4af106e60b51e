"""Table loaders for the driver-provided parquet fixtures (TESTDATA.md).

The reference's "metadata scan" (connector/MetadataDao.java:92-110 —
``tables ⋈ columns`` against MySQL) becomes a catalog lookup: parquet
footers carry the schema, Spark's catalog carries the views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst prunes columns / pushes filters."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
