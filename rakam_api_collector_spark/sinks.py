"""Sinks: columnar table writes + gzip NDJSON envelope export (§2.12).

K1 (Raptor ORC page sink → RaptorDatabaseHandler.java:312-339) becomes a
partitioned columnar write: parquet (default) or ORC with snappy, shard
sizing via ``maxRecordsPerFile`` (the 1M-row shard cap analog,
InMemoryOrcStorageManager.java:77,141-143). Zone-map min/max stats are
parquet/ORC footer stats — free.

K2 (S3 gzip NDJSON sink → S3DatabaseHandler.java:141-299) becomes
``to_json`` envelope rows written as gzip text; object sizing via
``maxRecordsPerFile``, UUID part filenames are Spark-native (F7).

K5 (metadata writer) is the Catalog — add-only evolution recorded at
ingest time; reads re-order to catalog order with null back-fill, which
is exactly the reference's metastore-ordered remap
(FabricJsonDeserializer.java:266-301).

Transactional positioning: the reference's Raptor sink registers shards
in a MySQL transaction (RaptorDatabaseHandler.java:312-339) so
concurrent writers can't double-commit. Here, streaming exactly-once
comes from Structured Streaming's epoch-committed file sink
(checkpointLocation, ST7) — equivalent single-writer guarantees. For
the multi-writer / crash-visibility half, ``manifest.ManifestedTable``
implements the same protocol on plain parquet: private batch dirs, a
version-file commit (atomic create-if-absent as compare-and-swap,
optimistic-concurrency retries), idempotent batch ids, orphan
invisibility, transactional compaction, and version-retention GC. On a cluster a transactional table format
(Delta/Iceberg, ``.format("delta")`` is a drop-in) implements the full
version of the same idea.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rakam_api_collector_spark.ingest.catalog import Catalog

SHARD_MAX_ROWS = 1_000_000   # reference maxShardRows envelope (§6)


class DatabaseHandler(Protocol):
    """K4 sink plugin SPI (DatabaseHandler.java:13-30): the three-method
    contract every target implements — schema read, add-only evolution,
    batch insert. ``insert`` returns a zero-arg commit callable (the
    ``Inserter.commit()`` analog), so the committer can buffer multiple
    batches per table and commit once (TargetConnectorCommitter.java:
    58-68), under commit_with_retry (ST9)."""

    def get_columns(self, project: str, collection: str
                    ) -> list[T.StructField] | None: ...

    def add_columns(self, project: str, collection: str,
                    fields: list[T.StructField]) -> list[T.StructField]: ...

    def insert(self, project: str, collection: str, df: DataFrame): ...


class ParquetDatabaseHandler:
    """K1-analog plugin: catalog-backed parquet/ORC tables via
    write_collections (the default target, CustomDatabaseHandler.java's
    role filled by the columnar sink)."""

    def __init__(self, catalog: Catalog, base: str,
                 fmt: str = "parquet") -> None:
        self.catalog = catalog
        self.base = base
        self.fmt = fmt

    def get_columns(self, project, collection):
        return self.catalog.get_columns(project, collection)

    def add_columns(self, project, collection, fields):
        if self.catalog.get_columns(project, collection) is None:
            return self.catalog.create_table(project, collection, fields)
        return self.catalog.add_columns(project, collection, fields)

    def insert(self, project, collection, df):
        def commit() -> None:
            write_collections({(project, collection): df}, self.base,
                              fmt=self.fmt)
        return commit


class ManifestedDatabaseHandler(ParquetDatabaseHandler):
    """K1/K4 plugin with Raptor-transaction commit semantics: same
    catalog behavior as ParquetDatabaseHandler (subclassed — one
    add-only-evolution implementation), but the commit callable is
    ``ManifestedTable.write`` — private batch dir plus atomic manifest
    publish, idempotent per (collection, batch_id). Pass a
    namespaced streaming epoch as ``batch_id`` inside ``foreachBatch``
    to get exactly-once visibility under at-least-once retries."""

    def insert(self, project, collection, df, batch_id=None):
        from rakam_api_collector_spark.manifest import ManifestedTable

        table = ManifestedTable(self.base, project, collection)

        def commit() -> None:
            table.write(df, batch_id=batch_id, fmt=self.fmt)
        return commit


def table_path(base: str, project: str, collection: str) -> str:
    return f"{base}/{project}/{collection}"


def write_collections(tables: dict[tuple[str, str], DataFrame], base: str,
                      fmt: str = "parquet", partition_by_day: bool = True,
                      max_records_per_file: int = SHARD_MAX_ROWS,
                      max_concurrent: int = 16,
                      coalesce_to: int | None = None) -> None:
    """Append each typed collection batch to its table directory,
    day-partitioned on _time (R3's day index becomes physical layout —
    partition pruning replaces the historical day→indexes map).

    Writes launch concurrently from a thread pool: the Spark scheduler
    overlaps the independent jobs, so 100 collections cost ~the longest
    write, not the sum — the reference's async per-table committer
    (TargetConnectorCommitter.java:41-76) by other means. Thread count
    mirrors its IO_OPS_RATE-style cap."""
    from concurrent.futures import ThreadPoolExecutor

    def write_one(item):
        (project, collection), df = item
        out = df
        if coalesce_to:
            # many-small-collections micro-batches: N tasks × M day
            # partitions explodes into tiny files without this; large
            # per-collection batches should leave it unset and let
            # maxRecordsPerFile size the shards. repartition (NOT
            # coalesce): coalesce would pull the upstream typed
            # projection into coalesce_to tasks, serializing the
            # expensive conversion; the exchange keeps it wide.
            out = out.repartition(coalesce_to)
        if partition_by_day and "_time" in df.columns:
            out = out.withColumn("_day", F.to_date("_time"))
        writer = (out.write.mode("append").format(fmt)
                  .option("compression", "snappy")
                  .option("maxRecordsPerFile", max_records_per_file))
        if partition_by_day and "_time" in df.columns:
            writer = writer.partitionBy("_day")
        writer.save(table_path(base, project, collection))

    if len(tables) <= 1:
        for item in tables.items():
            write_one(item)
        return
    with ThreadPoolExecutor(min(max_concurrent, len(tables))) as pool:
        # list() propagates the first failure (commit must not be silent)
        list(pool.map(write_one, tables.items()))


def write_collections_grouped(result, base: str, fmt: str = "parquet",
                              partition_by_day: bool = True,
                              max_records_per_file: int = SHARD_MAX_ROWS,
                              writer_tasks: int | None = 0,
                              ) -> None:
    """Write an ``IngestResult`` as ONE job per (project, schema-group)
    instead of one per collection: the group frame (which carries
    ``_collection``) writes with dynamic partitioning on
    ``(_collection, _day)`` under ``base/project/``.

    At 100 same-shape collections per micro-batch this is 1 write job
    vs 100 — job-scheduling and commit overhead scale with #distinct
    schemas. The directory layout becomes Hive-partition style
    (``base/project/_collection=x/_day=y``); ``read_collection_grouped``
    reads it back with partition pruning, so a per-collection read
    still scans only that collection's files. Choose this layout for
    many-small-collections streams; the per-table layout
    (``write_collections``) when downstream consumers expect
    ``base/project/collection`` directories.

    ``writer_tasks`` picks the shuffle that feeds the dynamic-
    partition write. Without any shuffle every task opens a writer
    per (_collection, _day) combo it sees — T tasks × P combos file
    handles and T×P output files. The choice of shuffle is a regime
    question (r10 measurement):

    - ``writer_tasks=N>0`` → ``repartition(N, keys)``: N-way write
      fan-out regardless of byte size. This is the MICRO-BATCH
      regime: a 30k-row batch is far below AQE's advisory partition
      size, so a rebalance hint coalesces it to ONE post-shuffle
      task that writes all ~100 partition dirs serially (measured
      1 task / 2.4-4.1 s vs 32 tasks / 0.8-1.0 s — the whole
      grouped-layout streaming-budget miss of r8/r9).
    - ``writer_tasks=None`` → the AQE ``rebalance`` hint: size-
      targeted partitions that SPLIT a skewed combo across tasks.
      This is the BULK regime (backfill/compaction) where combos
      carry enough bytes that advisory sizing engages and a
      straggling hot combo matters more than task count.
    - ``writer_tasks=0`` (default) → ``repartition(
      defaultParallelism, keys)`` — the micro-batch regime with the
      session's core count.

    Either way each combo lands in a bounded number of tasks, so
    files scale with #combos and maxRecordsPerFile, not #tasks."""
    for project, _collections, df in result.groups:
        out = df
        if partition_by_day and "_time" in df.columns:
            out = out.withColumn("_day", F.to_date("_time"))
            parts = ["_collection", "_day"]
        else:
            parts = ["_collection"]
        out = _grouped_writer_frame(out, parts, writer_tasks)
        (out.write.mode("append").format(fmt)
         .option("compression", "snappy")
         .option("maxRecordsPerFile", max_records_per_file)
         .partitionBy(*parts)
         .save(f"{base}/{project}"))


def _grouped_writer_frame(out: DataFrame, parts: list[str],
                          writer_tasks: int | None) -> DataFrame:
    """The shuffle that feeds the grouped dynamic-partition write,
    exposed so tests can pin its plan shape (test_plans.py): the
    micro-batch regime MUST be a fixed-N hash repartition on the
    partition keys — AQE never coalesces a user repartition with an
    explicit numPartitions — while the bulk regime opts in to the AQE
    rebalance hint, whose advisory sizing WOULD coalesce a 30k-row
    micro-batch into one serial writer task (the r8/r9 budget miss)."""
    if writer_tasks is None:
        return out.hint("rebalance", *parts)
    n = (writer_tasks or
         out.sparkSession.sparkContext.defaultParallelism)
    return out.repartition(n, *parts)


def read_collection_grouped(spark: SparkSession, base: str, project: str,
                            collection: str, catalog: Catalog) -> DataFrame:
    """Read one collection from the grouped (Hive-partitioned) layout:
    the ``_collection`` filter prunes to that partition's files before
    any row is read (pinned in tests/test_sinks.py). Columns re-project
    to catalog order with null-fill, as in ``read_collection``."""
    df = (spark.read.option("mergeSchema", "true")
          .option("basePath", f"{base}/{project}")
          .parquet(f"{base}/{project}")
          .filter(F.col("_collection") == collection))
    cols = catalog.get_columns(project, collection) or []
    exprs = []
    for f in cols:
        if f.name in df.columns:
            exprs.append(F.col(f.name))
        else:
            exprs.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*exprs)


def read_collection(spark: SparkSession, base: str, project: str,
                    collection: str, catalog: Catalog) -> DataFrame:
    """Read a collection re-projected to the catalog's authoritative
    order; columns added after older files were written null-fill
    (add-only evolution made this a pure metadata operation)."""
    df = (spark.read.option("mergeSchema", "true")
          .parquet(table_path(base, project, collection)))
    cols = catalog.get_columns(project, collection) or []
    exprs = []
    for f in cols:
        if f.name in df.columns:
            exprs.append(F.col(f.name))
        else:
            exprs.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*exprs)


def write_ndjson_envelope(df: DataFrame, project: str, collection: str,
                          path: str,
                          max_records_per_file: int = SHARD_MAX_ROWS) -> None:
    """Gzip NDJSON export with the reference envelope
    ``{"_time":…, "$schema": project, "$table": collection, "_user":…,
    "properties": {non-null user fields}}`` (S3DatabaseHandler.java:149-221).
    ``to_json`` drops null fields, reproducing the non-null-only
    properties map (and F6's duplicate-key elimination — Spark maps are
    already unique)."""
    user_cols = [c for c in df.columns
                 if c not in ("_time", "_user", "_shard_time")]
    envelope = F.to_json(F.struct(
        F.date_format("_time", "yyyy-MM-dd'T'HH:mm:ss.SSS").alias("_time"),
        F.lit(project).alias("$schema"),
        F.lit(collection).alias("$table"),
        F.col("_user").alias("_user"),
        F.struct(*[F.col(c) for c in user_cols]).alias("properties"),
    ))
    (df.select(envelope.alias("value"))
       .write.mode("append")
       .option("compression", "gzip")
       .option("maxRecordsPerFile", max_records_per_file)
       .text(path))
