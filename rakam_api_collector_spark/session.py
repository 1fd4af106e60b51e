"""SparkSession factory tuned for the engine.

Replaces the reference's hand-rolled runtime (ServiceStarter.java:58-115
bootstrap, MemoryTracker.java heap accounting, BasicMemoryBuffer
flushing) with Spark's unified memory manager + AQE. Every knob here is
chosen for the 100 TB design point and merely *scaled down* for local
runs:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting
  and dynamic join-strategy selection replace the reference's manual
  largest-first flush ordering (MiddlewareBuffer.java:70-104).
- shuffle.partitions sized to cores locally; on a real cluster AQE's
  advisory partition size (64 MB) governs, so the same code scales.
- Arrow enabled: every Python-side operator uses vectorized
  (pandas_udf / mapInPandas) transfer, never row-at-a-time pickling.
- session timezone pinned to UTC so event-time semantics are stable
  across engines (the DuckDB oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def fair_scheduler_conf() -> dict[str, str]:
    """Session confs that fence the shard organizer into a low-weight
    FAIR pool (the packaged ``fairscheduler.xml``: default 8 :
    manifest-maintenance 1). ``manifest.run_maintenance`` tags every
    sweep worker thread with the pool name unconditionally — inert
    under the default FIFO scheduler, binding the moment a session is
    built with these confs (``get_spark(extra_conf=
    fair_scheduler_conf())``), so a compaction wave may soak idle
    cores but yields slots to trigger-interval batches on demand.
    Scheduler mode is fixed at SparkContext creation — these cannot be
    applied to a live session."""
    here = os.path.dirname(os.path.abspath(__file__))
    return {
        "spark.scheduler.mode": "FAIR",
        "spark.scheduler.allocation.file":
            os.path.join(here, "fairscheduler.xml"),
    }


def get_spark(app_name: str = "rakam_api_collector_spark",
              cpus: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ANSI mode stays at the Spark 4 default (true): the engine exposes
    permissive behavior explicitly via try_cast / try_* functions where
    the reference had catch→null semantics (FabricJsonDeserializer.java
    :313-495), instead of globally weakening arithmetic.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # parallelism: match cores locally; AQE coalesces at runtime so
        # the same setting is safe at cluster scale.
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce to the advisory size, not to parallelism: the Spark
        # docs' recommended setting — post-shuffle stages get as few
        # tasks as the data needs (1 at bench scale, thousands at 100 TB)
        # instead of always fanning out to shuffle.partitions.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # object-store-style deployment: no data-local executors exist,
        # so never hold task slots waiting for locality.
        .config("spark.locality.wait", "0")
        # dims (region/nation/supplier/...) must broadcast; 64 MB gives
        # headroom at sf0.1 while staying executor-safe at scale.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # fixture events.parquet uses TIMESTAMP(NANOS); scan as BIGINT
        # nanos and convert in tables.load_table (Spark has no nanos type).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # fixtures also appear as naive timestamp[us] (isAdjustedToUTC=
        # false); read those as session-TZ TIMESTAMP, not TIMESTAMP_NTZ —
        # NTZ rejects unix_millis/long casts and the DuckDB oracle treats
        # naive parquet timestamps as plain TIMESTAMP anyway (UTC session).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # write timestamps as TIMESTAMP_MICROS, not the deprecated
        # INT96: INT96 column chunks carry NO min/max statistics, which
        # kills both parquet row-group predicate pushdown and the
        # manifest's timestamp zone maps (a time-ranged read would scan
        # every batch); micros is also what every other engine (DuckDB,
        # Trino, Iceberg) reads natively.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # files: 128 MB split target — the parquet scan granularity that
        # keeps 100 TB ≈ 800k tasks, the sweet spot for 1000 executors.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # lets Python DataSources (datasource.py's format("manifest"))
        # receive pushFilters() — zone-map pruning at the source
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # a long-lived session compiles one generated class per distinct
        # plan; the JVM default 240 MB code cache fills and flips hot
        # paths back to the interpreter in bursts — the standard Spark
        # tuning for codegen-heavy drivers.
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=512m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
