"""Per-collection schema catalog — the metastore analog (K5/S5).

The reference keeps authoritative table schemas in a MySQL metastore
(connector/MetadataDao.java:92-133): column order comes back from the
store, writers re-map blocks by name to that order
(FabricJsonDeserializer.java:266-301). Here the catalog is an in-memory
dict with optional JSON persistence; on a cluster it would be a Hive
metastore / Delta log, but the contract is identical: ``add_columns``
is append-only and the *returned* order is authoritative.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T


def _seed_fields(user_type: T.DataType | None = None) -> list[T.StructField]:
    """New tables auto-create with [_shard_time, _time, _user]
    (MessageEventTransformer.java:48-53; FieldNameConfig.java:21-25)."""
    return [
        T.StructField("_shard_time", T.TimestampType()),
        T.StructField("_time", T.TimestampType()),
        T.StructField("_user", user_type or T.StringType()),
    ]


class Catalog:
    """Append-only schema registry keyed by (project, collection)."""

    def __init__(self, path: str | None = None,
                 user_type: T.DataType | None = None,
                 meta_store=None) -> None:
        """``meta_store`` (r16) routes the registry JSON through the
        manifest MetadataStore seam — the reference keeps this state
        in MySQL; a cluster deployment keeps it on the object store
        (pass an ``ObjectMetadataStore``). Default POSIX; a URI path
        without an explicit store refuses loudly."""
        self._tables: dict[tuple[str, str], list[T.StructField]] = {}
        self._path = path
        self._user_type = user_type
        from rakam_api_collector_spark.manifest import resolve_meta_store
        self._meta = resolve_meta_store(path or "", meta_store,
                                        "catalog")
        raw = self._meta.read_if_exists(path) if path else None
        if raw is not None:
            for key, cols in json.loads(raw).items():
                p, c = key.split(".", 1)
                self._tables[(p, c)] = [
                    T.StructField(n, T._parse_datatype_string(d))
                    for n, d in cols]

    def tables(self) -> list[tuple[str, str]]:
        return sorted(self._tables)

    def get_columns(self, project: str, collection: str
                    ) -> list[T.StructField] | None:
        """Metadata scan (S5): authoritative ordered column list."""
        cols = self._tables.get((project, collection))
        return list(cols) if cols is not None else None

    def create_table(self, project: str, collection: str,
                     extra: list[T.StructField] | None = None
                     ) -> list[T.StructField]:
        cols = _seed_fields(self._user_type) + list(extra or [])
        self._tables[(project, collection)] = cols
        self._persist()
        return list(cols)

    def add_columns(self, project: str, collection: str,
                    new_fields: list[T.StructField]) -> list[T.StructField]:
        """Add-only evolution: unknown names appended, existing names kept
        with their original type (no widening —
        FabricJsonDeserializer.java:392-395). Returns the authoritative
        order; subclasses may reorder (the metastore is free to)."""
        cols = self._tables[(project, collection)]
        have = {f.name for f in cols}
        cols.extend(f for f in new_fields if f.name not in have)
        self._persist()
        return list(cols)

    def schema(self, project: str, collection: str) -> T.StructType:
        return T.StructType(self._tables[(project, collection)])

    def _persist(self) -> None:
        if not self._path:
            return
        blob = {f"{p}.{c}": [[f.name, f.dataType.simpleString()] for f in cols]
                for (p, c), cols in self._tables.items()}
        # atomic last-writer-wins object put (the add-only registry is
        # single-writer per pipeline, the reference's MySQL posture)
        self._meta.put(self._path, json.dumps(blob))
