"""Manifest-committed tables: a transactional-metadata analog for K1.

The reference's Raptor sink registers every flushed shard inside a MySQL
transaction (``RaptorDatabaseHandler.java:312-339`` — shard UUIDs, row
counts, and table version move atomically), so a crashed writer leaves
no half-visible data and concurrent writers cannot double-commit.
Structured Streaming's epoch-committed file sink gives the same
guarantee for a SINGLE writer; this module adds the multi-writer /
crash-visibility half on plain parquet, the same protocol simplified
that Delta/Iceberg implement in full:

1. Each batch writes its files under a private directory
   ``<table>/_batches/<batch_id>/`` — invisible to readers.
2. The commit point is ONE atomic rename: a manifest JSON (batch id,
   row count, format, timestamp) moves from a temp name into
   ``<table>/_manifests/<batch_id>.json``.
3. Readers list the manifest directory and read ONLY manifested batch
   directories. Orphans from crashed writers are never seen (and can be
   GC'd by comparing ``_batches/`` against ``_manifests/``).

Caller-supplied ``batch_id`` doubles as an idempotency key: a retried
write with the same id overwrites its own batch dir and re-publishes
the same manifest — exactly-once visibility under at-least-once
execution (the same rule the dead-letter spool uses per epoch).
Concurrent writers use distinct ids and never touch each other's files;
"commit" is the POSIX-atomic rename, standing in for Raptor's MySQL
transaction. On an object store without atomic rename, step 2 becomes a
conditional put (If-None-Match) — same protocol, different primitive.

Scale notes: one manifest per micro-batch is metadata-tiny, but a
long-lived table accumulates batch directories; the deployment answer
is periodic compaction (rewrite N manifested batches as one, publish
the compacted manifest, then drop the old ones) — the analog of
Raptor's shard organizer. Readers union per-batch scans, so day
partition pruning still applies inside every batch directory.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ManifestedTable:
    """Atomically-committed parquet/ORC table at ``base/project/collection``."""

    def __init__(self, base: str, project: str, collection: str) -> None:
        self.table_dir = f"{base}/{project}/{collection}"
        self.batches_dir = f"{self.table_dir}/_batches"
        self.manifests_dir = f"{self.table_dir}/_manifests"

    # -- write --------------------------------------------------------------

    def write(self, df: DataFrame, batch_id: str | None = None,
              fmt: str = "parquet", partition_by_day: bool = True) -> str:
        """Write one batch and commit it via atomic manifest publish.
        Returns the batch id. Re-running with the same ``batch_id``
        (an at-least-once retry) replaces the batch instead of
        duplicating it."""
        bid = batch_id or uuid.uuid4().hex
        if "/" in bid or bid.startswith("."):
            raise ValueError(f"invalid batch_id: {bid!r}")
        out = df
        if partition_by_day and "_time" in df.columns:
            out = out.withColumn("_day", F.to_date("_time"))
        writer = out.write.mode("overwrite").format(fmt)
        if partition_by_day and "_day" in out.columns:
            writer = writer.partitionBy("_day")
        writer.save(f"{self.batches_dir}/{bid}")

        manifest = {
            "batch": bid,
            "rows": out.count(),
            "format": fmt,
            "committed_at": time.time(),
        }
        os.makedirs(self.manifests_dir, exist_ok=True)
        tmp = f"{self.manifests_dir}/.tmp-{bid}-{uuid.uuid4().hex}.json"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        # THE commit point: on POSIX rename is atomic and replaces any
        # prior manifest for the same batch id (idempotent retry)
        os.rename(tmp, f"{self.manifests_dir}/{bid}.json")
        return bid

    # -- read ---------------------------------------------------------------

    def committed(self) -> list[dict]:
        """Manifests of committed batches, oldest first."""
        try:
            names = sorted(n for n in os.listdir(self.manifests_dir)
                           if n.endswith(".json") and not n.startswith("."))
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            with open(f"{self.manifests_dir}/{n}") as f:
                out.append(json.load(f))
        return out

    def read(self, spark: SparkSession) -> DataFrame:
        """Union of all COMMITTED batches — uncommitted/orphaned batch
        directories are invisible, the Raptor-transaction reader
        guarantee. Raises if nothing is committed (no schema to give)."""
        manifests = self.committed()
        if not manifests:
            raise FileNotFoundError(
                f"no committed batches under {self.table_dir}")
        dfs = []
        for m in manifests:
            path = f"{self.batches_dir}/{m['batch']}"
            dfs.append(spark.read.option("basePath", path)
                       .format(m["format"]).load(path))
        df = dfs[0]
        for d in dfs[1:]:
            df = df.unionByName(d, allowMissingColumns=True)
        return df

    def orphans(self) -> list[str]:
        """Batch dirs with no manifest — crashed writers, GC candidates."""
        try:
            dirs = set(os.listdir(self.batches_dir))
        except FileNotFoundError:
            return []
        committed = {m["batch"] for m in self.committed()}
        return sorted(d for d in dirs if d not in committed)
