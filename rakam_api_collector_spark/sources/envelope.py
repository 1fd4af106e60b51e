"""Custom Python DataSource for the gzip NDJSON envelope format (K4).

The reference's plugin surface is the ``DatabaseHandler`` SPI
(DatabaseHandler.java:13-30, CustomDatabaseHandler.java:16-45); on the
source side, PySpark's DataSource API is the modern equivalent plugin
point. This source reads back what the K2 sink
(sinks.write_ndjson_envelope → S3DatabaseHandler.java:141-299 analog)
writes: gzip-compressed NDJSON lines shaped
``{"_time": …, "$schema": project, "$table": collection, "_user": …,
"properties": {…}}``.

One input partition per file — a spool of N objects scans as N parallel
tasks. ``properties`` stays a raw JSON string so the source is
schema-free; route it through ingest_batch for typed evolution.

Usage::

    spark.dataSource.register(EnvelopeDataSource)
    df = (spark.read.format("rakam_envelope")
          .option("path", "/spool/dir").load())
"""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = ("_time string, project string, collection string, "
          "_user string, properties string")


class EnvelopeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rakam_envelope"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "EnvelopeReader":
        return EnvelopeReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class EnvelopeReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("rakam_envelope requires option 'path'")
        self._path = path

    def partitions(self):
        pattern = os.path.join(self._path, "**", "*")
        files = [f for f in glob.glob(pattern, recursive=True)
                 if os.path.isfile(f) and not
                 os.path.basename(f).startswith(("_", "."))]
        return [_FilePartition(f) for f in sorted(files)] \
            or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        opener = gzip.open if partition.path.endswith(".gz") else open
        with opener(partition.path, "rt", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue        # poison-pill: log-and-skip (ST11)
                yield (rec.get("_time"), rec.get("$schema"),
                       rec.get("$table"), rec.get("_user"),
                       json.dumps(rec.get("properties", {})))
