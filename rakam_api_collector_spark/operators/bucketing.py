"""Bucketed-table co-located joins: the repeated-join answer at 100 TB.

A fact-to-fact join (orders ⋈ lineitem, events ⋈ sessions) shuffles
BOTH sides every time it runs. When the same join key is hit daily,
the scalable answer is to pay the shuffle once at write time:
``bucketBy(key)`` + ``sortBy(key)`` persists each side pre-partitioned
and pre-sorted, and every subsequent join plans as a zero-exchange
SortMergeJoin — scan, zip, done. (This is S3/R3 taken one step
further: the reference's day-partitioned historical index prunes
FILES; bucketing prunes the SHUFFLE.)

Requirements Spark imposes (and this module encodes):
- both sides bucketed on the join key with the SAME bucket count
  (or an integer multiple, with ``spark.sql.bucketing.coalesceBucketsInJoin``);
- ``saveAsTable`` (catalog-backed) — plain ``parquet(path)`` writes
  lose the bucket spec;
- bucket pruning additionally applies key-equality filters to single
  buckets (scan 1/N of the data for a point lookup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, *,
                   num_buckets: int = 8, path: str | None = None,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` bucketed (and bucket-sorted) on ``key`` as a
    catalog table. Sorting makes the later SortMergeJoin sort-free as
    well — the scan is already in join order."""
    w = df.write.mode(mode).bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def cobucketed_join(spark: SparkSession, left_table: str,
                    right_table: str, key: str,
                    how: str = "inner") -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. The plan
    contains NO Exchange on either side (pinned in
    tests/test_bucketing.py) — both scans are already hash-distributed
    by the bucket spec."""
    return spark.table(left_table).join(spark.table(right_table),
                                        key, how)
