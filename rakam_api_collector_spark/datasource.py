"""``format("manifest")`` — a Python DataSource over manifest tables.

`manifest.py` gives K1's columnar sink the Raptor-transaction reader
guarantee (`RaptorDatabaseHandler.java:312-339`: only registered shards
are visible) through an explicit ``ManifestedTable.read(spark)`` call.
This module surfaces the same snapshot through Spark's own reader API
(PySpark 4's ``pyspark.sql.datasource``), so a manifest table composes
with everything that takes a format string::

    spark.dataSource.register(ManifestDataSource)
    df = (spark.read.format("manifest")
          .option("path", f"{base}/{project}/{collection}").load())
    stream = spark.readStream.format("manifest").option("path", p).load()

Batch semantics (``ManifestReader``):

- The reader plans against ONE committed version (``versionAsOf``
  time-travels) resolved at planning time on the driver — a concurrent
  commit mid-query cannot tear the snapshot, because the file list is
  frozen into the input partitions.
- ``pushFilters`` translates equality/range/In filters on top-level
  columns into the manifest's zone-map prune bounds, skipping whole
  batch directories and then individual files (the Raptor per-shard
  min/max analog + Delta-style file skipping) WITHOUT opening them.
  Every filter is also returned as residual, so Spark re-applies the
  exact predicate — pruning stays a scan-list optimization, never a
  correctness filter (`_stats_overlap`'s contract).
- One input partition per data file: Spark's parallelism follows the
  physical layout, so a range-clustered table scans its ~1 matching
  file on as many executors as there are survivors.
- Evolved schemas union add-only (`_check_evolution` guarantees shared
  columns agree): each file's Arrow batches are aligned to the
  snapshot-wide schema, missing columns null-filled, hive partition
  values (``_day=...``) re-materialized from the path.

Streaming semantics (``ManifestStreamReader``): **the manifest version
number IS the streaming offset.** ``latestOffset`` is one metadata
read; a micro-batch's partitions are the version-diff's fresh batches
(`changes_since` rules: a compaction's output batch is moved data, not
new data, and is skipped; a batch REWRITTEN by upsert/delete_where
reappears in full, so consumers are idempotent on the batch id —
the same at-least-once contract the epoch-keyed sink writes assume).
A cursor older than gc retention raises rather than silently skipping.

Write semantics (``ManifestWriter`` / ``ManifestStreamWriter``): the
plugin-SPI write half (K4) as a two-phase commit — tasks stream Arrow
batches into private parquet files and report per-file footer zone
maps; the driver-side ``commit`` publishes one manifest entry through
the same OCC version CAS as every other writer (in-commit add-only
evolution check included). ``mode("overwrite")`` is an atomic
truncate-and-load; a streaming epoch commits as batch
``epoch-<batchId>``, so replays replace rather than duplicate. The
native ``ManifestedTable.write`` sink remains the preferred path for
day-partitioned, range-clustered bulk loads.

Cluster note: executors import this module (ship the package via
``--py-files``/pex as usual); data files are read with pyarrow through
whatever filesystem ``path`` points at — local here, an fsspec/Arrow
filesystem on an object store.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from rakam_api_collector_spark.manifest import (
    LocalMetadataStore,
    ManifestedTable,
    _stats_overlap,
)


def _table_from_options(options) -> ManifestedTable:
    path = options.get("path")
    if not path:
        raise ValueError(
            "format('manifest') requires .option('path', "
            "'<base>/<project>/<collection>') — the ManifestedTable dir")
    path = path.rstrip("/")
    parts = path.rsplit("/", 2)
    if len(parts) < 3:
        raise ValueError(f"manifest path too shallow: {path!r} "
                         "(need <base>/<project>/<collection>)")
    return ManifestedTable(parts[0], parts[1], parts[2],
                           meta=LocalMetadataStore())


def _union_schema(manifests: list[dict]) -> StructType:
    """Snapshot-wide schema: add-only merge in commit order (shared
    names carry identical types by the in-commit evolution check)."""
    fields: list = []
    seen: set[str] = set()
    for m in manifests:
        sch = m.get("schema")
        if sch is None:
            raise ValueError(
                "batch %r predates manifest-stored schemas; re-commit "
                "or read via ManifestedTable.read" % m.get("batch"))
        for f in StructType.fromJson(sch).fields:
            if f.name not in seen:
                seen.add(f.name)
                fields.append(f)
    return StructType(fields)


@dataclass
class _FileSlice(InputPartition):
    """One data file (or, for stats-less formats, one batch dir)."""

    target: str                     # absolute file or directory path
    fmt: str = "parquet"
    # hive partition values parsed from the file's relative path
    part_values: dict = field(default_factory=dict)


def _hive_values(rel: str) -> dict:
    """``_day=2024-03-01/part-0.parquet`` -> {"_day": "2024-03-01"}."""
    from urllib.parse import unquote

    out = {}
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            out[k] = None if v == "__HIVE_DEFAULT_PARTITION__" \
                else unquote(v)
    return out


def _slices_of(table: ManifestedTable, manifests: list[dict],
               prune: dict | None) -> list[_FileSlice]:
    """The frozen scan list: batch-level zone-map pruning, then
    file-level (a manifest-listed file set is authoritative — see
    ``ManifestedTable._read_batches``, kept in lockstep), then one
    slice per file."""
    slices: list[_FileSlice] = []
    for m in manifests:
        if prune and not _stats_overlap(m.get("stats") or {}, prune):
            continue
        base = f"{table.batches_dir}/{ManifestedTable._dir_of(m)}"
        files = m.get("files")
        if files is not None:
            for f in files:
                if prune and not _stats_overlap(f["stats"], prune):
                    continue
                slices.append(_FileSlice(
                    target=os.path.join(base, f["path"]),
                    fmt=m["format"],
                    part_values=_hive_values(f["path"])))
        else:
            # stats-less batch (ORC, or >max_files): walk it whole
            suffix = ".parquet" if m["format"] == "parquet" else ".orc"
            for root, _, names in os.walk(base):
                for fn in names:
                    if not fn.endswith(suffix):
                        continue
                    full = os.path.join(root, fn)
                    slices.append(_FileSlice(
                        target=full, fmt=m["format"],
                        part_values=_hive_values(
                            os.path.relpath(full, base))))
    return slices


def _read_slice(part: _FileSlice, schema: StructType) -> Iterator:
    """Arrow batches aligned to the snapshot schema: cast present
    columns, materialize hive partition values, null-fill evolved
    columns the file predates."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)

    def aligned(batch: "pa.RecordBatch") -> "pa.RecordBatch":
        n = batch.num_rows
        cols = []
        names = set(batch.schema.names)
        for f in target:
            if f.name in names:
                cols.append(batch.column(f.name).cast(f.type))
            elif f.name in part.part_values:
                v = _parse_part(part.part_values[f.name], f.type)
                cols.append(pa.array([v] * n, type=f.type))
            else:
                cols.append(pa.nulls(n, type=f.type))
        return pa.RecordBatch.from_arrays(cols, schema=target)

    if part.fmt == "parquet":
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(part.target)
        want = [c for c in pf.schema_arrow.names
                if c in {f.name for f in target}]
        for batch in pf.iter_batches(columns=want):
            yield aligned(batch)
    else:
        import pyarrow.orc as orc

        tbl = orc.read_table(part.target)
        for batch in tbl.to_batches():
            yield aligned(batch)


def _parse_part(v: str | None, typ) -> object:
    import pyarrow.types as pt

    if v is None:
        return None
    if pt.is_date(typ):
        return _dt.date.fromisoformat(v)
    if pt.is_integer(typ):
        return int(v)
    if pt.is_floating(typ):
        return float(v)
    return v


def _prune_from_filters(pushed: list[Filter]) -> dict | None:
    """AND-intersect supported filters into {col: (lo, hi)} zone-map
    bounds. Strict comparisons prune with their inclusive superset —
    safe, because every filter is ALSO evaluated by Spark."""
    bounds: dict[str, list] = {}

    def tighten(col: tuple, lo, hi):
        if len(col) != 1:       # nested fields have no zone maps
            return
        # NAIVE datetime literals are ambiguous here: stats canon is
        # UTC-instant, but this runs in the planning worker where no
        # session exists to resolve the session time zone from (the
        # read(prune=) path normalizes; this path must not guess).
        # tz-AWARE datetimes normalize safely inside _canon_stat.
        if any(isinstance(b, _dt.datetime) and b.tzinfo is None
               for b in (lo, hi)):
            return
        cur = bounds.setdefault(col[0], [None, None])
        if lo is not None and (cur[0] is None or lo > cur[0]):
            cur[0] = lo
        if hi is not None and (cur[1] is None or hi < cur[1]):
            cur[1] = hi

    for f in pushed:
        if isinstance(f, (EqualTo, EqualNullSafe)):
            tighten(f.attribute, f.value, f.value)
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            tighten(f.attribute, f.value, None)
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            tighten(f.attribute, None, f.value)
        elif isinstance(f, In) and f.value:
            try:
                tighten(f.attribute, min(f.value), max(f.value))
            except TypeError:
                pass            # mixed/uncomparable literals
    out = {c: (lo, hi) for c, (lo, hi) in bounds.items()
           if lo is not None or hi is not None}
    return out or None


def _version_as_of(table, v) -> int:
    """``versionAsOf`` option → version number: None = current head,
    digits = that version, anything else = a TAG name (manifest.tag,
    the Delta/Iceberg named-snapshot read through the same option),
    resolved at plan time either way. Only PLAIN digits parse as a
    version — mirroring tag()'s ``name.isdigit()`` rejection exactly,
    so every creatable tag (including '-3': negative versions are
    never valid) reads back through this option."""
    if v is None:
        return table.current_version()
    if str(v).isdigit():
        return int(v)
    return table._resolve_version(str(v))


class ManifestReader(DataSourceReader):
    def __init__(self, options, schema: StructType) -> None:
        self._schema = schema
        table = _table_from_options(options)
        version = _version_as_of(table, options.get("versionasof"))
        if version not in table._version_numbers():
            raise FileNotFoundError(
                f"version {version} not committed (or gc-pruned) under "
                f"{table.table_dir}")
        # freeze the snapshot at plan time; partitions() only slices it
        self._table = table
        self._manifests = table._read_version(version)["batches"]
        self._prune: dict | None = None

    def partitions(self):
        return _slices_of(self._table, self._manifests, self._prune)

    def read(self, partition: _FileSlice):
        return _read_slice(partition, self._schema)


class ManifestPushdownReader(ManifestReader):
    """The default reader. Spark refuses any reader defining
    pushFilters while ``spark.sql.python.filterPushdown.enabled`` is
    off (the repo's ``session.get_spark`` turns it on) — a foreign
    session either enables it, as Spark's own error instructs, or opts
    down to the plain reader with ``.option("pushdown", "false")``.
    The split exists because this code runs in Spark's PLANNING WORKER
    process, where no SparkSession exists to sniff the conf from."""

    def pushFilters(self, filters: list[Filter]):
        prune = _prune_from_filters(filters)
        if prune:
            self._prune = prune
        return filters          # all residual: pruning is advisory


class ManifestStreamReader(DataSourceStreamReader):
    """Micro-batches are manifest version diffs; the offset is the
    version number (cf. Delta's streaming source over _delta_log)."""

    def __init__(self, options, schema: StructType) -> None:
        self._schema = schema
        self._options = options
        table = _table_from_options(options)
        self._table = table
        start = (options.get("startingversion") or "0").lower()
        self._start = table.current_version() if start == "latest" \
            else int(start)

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": self._table.current_version()}

    def partitions(self, start: dict, end: dict):
        sv, ev = start["version"], end["version"]
        if sv == ev:
            return []
        # the per-transition walk (appended_between docstring): an
        # endpoint diff would lose batches a compaction folded in
        # before this micro-batch observed them
        return _slices_of(self._table,
                          self._table.appended_between(sv, ev), None)

    def read(self, partition: _FileSlice):
        return _read_slice(partition, self._schema)

    def commit(self, end: dict) -> None:
        pass                    # offsets live in the query checkpoint


@dataclass
class _WroteFile(WriterCommitMessage):
    """Per-task result: one parquet file (or none for empty tasks)."""

    name: str | None = None
    rows: int = 0
    stats: dict = field(default_factory=dict)


class ManifestWriter(DataSourceArrowWriter):
    """The write half of the plugin SPI (K4,
    `CustomDatabaseHandler.java:16-45` — addPage on workers, commit as
    one transaction): a textbook two-phase commit on the manifest
    protocol. Each task streams its Arrow batches into ONE parquet
    file inside the batch's private directory and reports (file, rows,
    footer zone map) as its commit message — per-file stats are
    computed WHERE THE DATA IS, in parallel on the executors, instead
    of the driver's post-hoc footer walk. ``commit`` then folds the
    messages into a manifest entry and publishes it with the same OCC
    version CAS (and in-commit add-only evolution check) every other
    writer uses; a failed/aborted attempt leaves only invisible files.
    Empty tasks write nothing — the entry's file list is authoritative
    for readers, so attempt garbage and zero-row files never scan.

    ``mode("overwrite")`` swaps the WHOLE live set for this batch in
    one version (atomic truncate-and-load); ``mode("append")`` adds or
    idempotently replaces its ``batchId``."""

    def __init__(self, options, schema: StructType,
                 overwrite: bool) -> None:
        self._schema_json = schema.json()
        self._table_dir = _table_from_options(options).table_dir
        self._bid = options.get("batchid") or f"ds-{uuid.uuid4().hex}"
        if "/" in self._bid or self._bid.startswith("."):
            raise ValueError(f"invalid batchId: {self._bid!r}")
        self._pdir = f"{self._bid}--{uuid.uuid4().hex[:8]}"
        self._overwrite = overwrite
        self._compression = options.get("compression") or "snappy"

    # -- executors ----------------------------------------------------------

    @property
    def _dir(self) -> str:
        return f"{self._table_dir}/_batches/{self._pdir}"

    def write(self, iterator) -> _WroteFile:
        import pyarrow.parquet as pq

        from rakam_api_collector_spark.manifest import _one_file_stats

        writer = None
        rows = 0
        name = f"part-{uuid.uuid4().hex}.parquet"
        full = os.path.join(self._dir, name)
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            if writer is None:
                os.makedirs(self._dir, exist_ok=True)
                writer = pq.ParquetWriter(
                    full, batch.schema, compression=self._compression)
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is None:
            return _WroteFile()             # empty task: no file
        writer.close()
        return _WroteFile(
            name=name, rows=rows,
            stats=_one_file_stats(pq.ParquetFile(full).metadata))

    # -- driver -------------------------------------------------------------

    def _entry(self, messages) -> dict:
        files = [{"path": m.name, "stats": m.stats}
                 for m in messages if m is not None and m.name]
        entry = {"batch": self._bid, "dir": self._pdir,
                 "rows": sum(m.rows for m in messages if m is not None),
                 "format": "parquet",
                 "schema": json.loads(self._schema_json),
                 "files": files}
        if files:
            common = set(files[0]["stats"])
            for f in files[1:]:
                common &= set(f["stats"])
            stats = {c: [min(f["stats"][c][0] for f in files),
                         max(f["stats"][c][1] for f in files)]
                     for c in common}
            if stats:
                entry["stats"] = stats
        return entry

    def _publish(self, entry: dict) -> None:
        base, project, collection = self._table_dir.rsplit("/", 2)
        table = ManifestedTable(base, project, collection)
        fields = entry["schema"]["fields"]

        def mutate(live):
            table._check_evolution(live, fields, replacing=self._bid)
            if self._overwrite:
                return [entry]
            return [b for b in live if b["batch"] != self._bid] + [entry]

        table._commit(mutate)

    def commit(self, messages) -> None:
        self._publish(self._entry(messages))

    def abort(self, messages) -> None:
        # best-effort tidy; an un-published dir is invisible anyway
        # and gc() collects it as an orphan
        import shutil

        shutil.rmtree(self._dir, ignore_errors=True)


class ManifestStreamWriter(ManifestWriter, DataSourceStreamArrowWriter):
    """Streaming sink: the epoch id keys the batch
    (``epoch-<batchId>``), so a replayed micro-batch REPLACES its
    previous commit — exactly-once visibility under at-least-once
    execution, the same rule as the foreachBatch sink path. All of an
    epoch's attempts share one physical dir (tasks cannot learn a
    fresh attempt id), which is why the manifest's file list is
    authoritative: a dead attempt's files are never listed, never
    scanned, and go when the dir's last referencing version is gc'd.
    High-volume day-partitioned streams should prefer the native
    ``ManifestedTable.write`` sink; this surface is the plugin-SPI
    parity path."""

    def __init__(self, options, schema: StructType,
                 overwrite: bool) -> None:
        super().__init__(options, schema, overwrite)
        self._prefix = options.get("batchprefix") or "epoch"

    def _epoch_names(self, batch_id: int) -> None:
        self._bid = f"{self._prefix}-{batch_id}"
        self._pdir = f"{self._bid}--stream"

    def write(self, iterator) -> _WroteFile:
        from pyspark import TaskContext

        epoch = TaskContext.get().getLocalProperty("streaming.sql.batchId")
        if epoch is None:
            raise RuntimeError("streaming.sql.batchId local property "
                               "missing — not inside a micro-batch?")
        self._epoch_names(int(epoch))
        return super().write(iterator)

    def commit(self, messages, batchId: int) -> None:
        self._epoch_names(batchId)
        self._publish(self._entry(messages))

    def abort(self, messages, batchId: int) -> None:
        pass        # shared epoch dir: unlisted files are invisible


class ManifestDataSource(DataSource):
    """``spark.dataSource.register(ManifestDataSource)`` once per
    session; then ``format("manifest")`` on read and readStream."""

    @classmethod
    def name(cls) -> str:
        return "manifest"

    def schema(self) -> StructType:
        table = _table_from_options(self.options)
        version = _version_as_of(table,
                                 self.options.get("versionasof"))
        manifests = table._read_version(version)["batches"] \
            if version in table._version_numbers() else []
        if not manifests:
            raise FileNotFoundError(
                f"no committed batches under {table.table_dir} "
                f"(version {version})")
        return _union_schema(manifests)

    def reader(self, schema: StructType) -> ManifestReader:
        plain = (self.options.get("pushdown") or "").lower() == "false"
        cls = ManifestReader if plain else ManifestPushdownReader
        return cls(self.options, schema)

    def streamReader(self, schema: StructType) -> ManifestStreamReader:
        return ManifestStreamReader(self.options, schema)

    def writer(self, schema: StructType,
               overwrite: bool) -> ManifestWriter:
        return ManifestWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> ManifestStreamWriter:
        return ManifestStreamWriter(self.options, schema, overwrite)


def register(spark) -> None:
    """Idempotent session registration."""
    spark.dataSource.register(ManifestDataSource)
