"""Avro wire decode: stream records, bulk multi-collection objects (D3/D7/S4/P5).

The reference's Avro path is NOT the standard Avro object-container
format — it is raw Avro *binary record bodies* inside a custom framing
(magic byte + optional collection string), and the bulk path is a bare
concatenated stream ``project, (collection, colCount, recordCount,
records…)*`` (AvroMessageEventTransformer.java:87-137). No off-the-shelf
reader (including Spark's ``from_avro``) parses that framing, so decode
runs as an Arrow-batched ``mapInPandas`` stage over the raw binary
column — one Python pass per batch, vectorized transfer, no row objects.

Wire grammar implemented from the public Avro 1.x binary spec:
- long/int: zigzag varint; string/bytes: long length + bytes
- float/double: 4/8-byte little-endian IEEE
- boolean: 1 byte; null: zero bytes
- union: long branch index, then that branch's value
- array/map: blocks of (count, items…) terminated by count 0; a negative
  count means |count| items preceded by a long byte-size (skippable)

Schema conventions mirrored from the reference (AvroUtil.java:30-73):
every column is ``union[null, T]``; INT covers int/date, LONG covers
bigint/time/timestamp, plus STRING/DOUBLE/BOOLEAN/BYTES and single-level
ARRAY/MAP of nullable scalars. RECORD/FIXED are unsupported there and
here (AvroPageDatumReader.java:150-153).

Record framing (KafkaAvroMessageTransformer.java:41-54,
KinesisRecordProcessor.java:79-99):
- first byte 0/1: record body follows; collection from the partition key
- first byte 2: Avro string (collection), then the record body
- first byte 3: bulk pointer — 8-byte big-endian total size then an
  object-store key in UTF-8; the pointed-to object is the bulk stream

Trailing-missing-field tolerance: distributed writers may lag the
schema, so a record body that ends early null-fills the remaining
columns (AvroPageDatumReader.java:88-94); the bulk stream instead
prefixes each section with its column count (``setTemporarySchema``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- primitives

def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos   # zigzag


def _write_long(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    return buf[pos:pos + n], pos + n


def _read_str(buf: bytes, pos: int) -> tuple[str, int]:
    raw, pos = _read_bytes(buf, pos)
    return raw.decode("utf-8"), pos


# --------------------------------------------------------------- row decoder

_SCALAR_READERS = {
    "string": _read_str,
    "binary": _read_bytes,
    "long": _read_long,
    "integer": _read_long,
    "date": _read_long,          # epoch-day int on the wire
    "timestamp": _read_long,     # epoch-millis long (reference convention)
    "double": lambda b, p: (struct.unpack_from("<d", b, p)[0], p + 8),
    "float": lambda b, p: (struct.unpack_from("<f", b, p)[0], p + 4),
    "boolean": lambda b, p: (b[p] != 0, p + 1),
}


def _scalar_reader(dtype: T.DataType):
    return _SCALAR_READERS[dtype.typeName()]


def _read_nullable(buf: bytes, pos: int, read_value):
    branch, pos = _read_long(buf, pos)
    if branch == 0:              # union order is [null, T] (AvroUtil.java:39)
        return None, pos
    return read_value(buf, pos)


def _read_blocks(buf: bytes, pos: int, read_item):
    """Shared array/map block loop; negative counts carry a byte size."""
    items = []
    while True:
        n, pos = _read_long(buf, pos)
        if n == 0:
            return items, pos
        if n < 0:
            n = -n
            _, pos = _read_long(buf, pos)   # block byte size — not needed
        for _ in range(n):
            item, pos = read_item(buf, pos)
            items.append(item)


def _field_reader(dtype: T.DataType):
    """Reader for one nullable column of the reference's type universe."""
    if isinstance(dtype, T.ArrayType):
        elem = _scalar_reader(dtype.elementType)

        def read_array(buf, pos):
            return _read_blocks(
                buf, pos, lambda b, p: _read_nullable(b, p, elem))
        inner = read_array
    elif isinstance(dtype, T.MapType):
        val = _scalar_reader(dtype.valueType)

        def read_map(buf, pos):
            def entry(b, p):
                k, p = _read_str(b, p)
                v, p = _read_nullable(b, p, val)
                return (k, v), p
            entries, pos = _read_blocks(buf, pos, entry)
            return dict(entries), pos
        inner = read_map
    else:
        inner = _scalar_reader(dtype)
    return lambda buf, pos: _read_nullable(buf, pos, inner)


class AvroRowDecoder:
    """Decodes Avro binary record bodies against an ordered column list
    (each ``union[null, T]`` per the reference's schema generator)."""

    def __init__(self, fields: list[T.StructField]):
        self.fields = fields
        self._readers = [_field_reader(f.dataType) for f in fields]

    def decode(self, buf: bytes, pos: int = 0,
               n_cols: int | None = None) -> tuple[list, int]:
        """One record → value list (len == #fields). ``n_cols`` is the
        bulk path's prefix schema: only the first n_cols are on the wire
        (AvroPageDatumReader.java:196-212); with no prefix, hitting
        end-of-buffer null-fills the tail (java:88-94)."""
        limit = len(self._readers) if n_cols is None else n_cols
        out: list = []
        for reader in self._readers[:limit]:
            if pos >= len(buf) and n_cols is None:
                break
            val, pos = reader(buf, pos)
            out.append(val)
        out.extend([None] * (len(self._readers) - len(out)))
        return out, pos


# ------------------------------------------------------ framing / dispatch

TYPE_STREAM0, TYPE_STREAM1, TYPE_STREAM_WITH_COLLECTION, TYPE_BULK = 0, 1, 2, 3


def dispatch_record_type(df: DataFrame, value_col: str = "value",
                         source: str = "kafka") -> DataFrame:
    """P5 first-byte dispatch: tags each binary record 'stream' / 'bulk'
    / 'ignore' JVM-side so the two decode paths consume disjoint
    filtered frames.

    The two sources disagree on first-byte 1: Kafka treats 0/1 as
    stream-with-partition-key-collection, while the Kinesis processor
    logs type 1 as an obsolete bulk format and skips it
    (KinesisRecordProcessor.java:79-99) — ``source="kinesis"`` maps it
    to 'ignore' accordingly."""
    stream_types = ((TYPE_STREAM0, TYPE_STREAM_WITH_COLLECTION)
                    if source == "kinesis" else
                    (TYPE_STREAM0, TYPE_STREAM1,
                     TYPE_STREAM_WITH_COLLECTION))
    first = F.substring(F.col(value_col), 1, 1)
    return df.withColumn(
        "_record_kind",
        F.when(first.isin(*[F.lit(bytes([t])) for t in stream_types]),
               "stream")
         .when(first == F.lit(bytes([TYPE_BULK])), "bulk")
         .otherwise("ignore"))


def extract_stream_routing(df: DataFrame, get_columns, project: str,
                           default_collection: str | None = None,
                           value_col: str = "value",
                           source: str = "kafka") -> DataFrame:
    """D4 partial-parse router for the Avro wire (streaming-safe).

    Tags each framed binary record with ``(_kind, _collection, _user,
    _time_ms)`` WITHOUT a full decode: the catalog seeds every table
    with ``[_shard_time, _time, _user]`` (catalog._seed_fields,
    MessageEventTransformer.java:48-53), so the router decodes only the
    shortest prefix covering ``_time``/``_user`` — the Avro analog of
    the JSON path's get_json_object routing keys
    (KafkaDecoupleMessage.java:46-114). The framed bytes pass through
    untouched for the per-collection typed decode downstream.

    Unknown collections and undecodable frames tag ``_kind='corrupt'``
    (dropped by the typed decode, counted by the ST11 error monitor —
    the poison-pill accounting); unrecognized first bytes skip silently
    (the reference logs obsolete types and moves on,
    KinesisRecordProcessor.java:79-99). Bulk pointers (type 3) tag
    ``_kind='bulk'``; null routing keys are never deduped
    (AvroDuplicateHandler.java:93-97).

    ``get_columns`` must be picklable; it ships to executors at stream
    start, so the Avro path requires pre-registered schemas (the
    reference's metastore contract — AvroUtil.java:30-73 generates
    writer schemas from the store, never from the wire)."""
    stream_types = ((TYPE_STREAM0, TYPE_STREAM_WITH_COLLECTION)
                    if source == "kinesis" else
                    (TYPE_STREAM0, TYPE_STREAM1,
                     TYPE_STREAM_WITH_COLLECTION))
    out_schema = ("_kind string, _collection string, _user string, "
                  "_time_ms long, value binary")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        decoders: dict[str, tuple[AvroRowDecoder, int, int, int]] = {}

        def routing_decoder(coll):
            hit = decoders.get(coll)
            if hit is None:
                fields = get_columns(project, coll)
                if fields is None:
                    decoders[coll] = hit = (None, 0, 0, 0)
                else:
                    names = [f.name for f in fields]
                    iu = names.index("_user") if "_user" in names else -1
                    it = names.index("_time") if "_time" in names else -1
                    k = max(iu, it) + 1
                    decoders[coll] = hit = (AvroRowDecoder(fields[:k]),
                                            iu, it, k)
            return hit

        for pdf in batches:
            rows = []
            for raw in pdf["_v"]:
                buf = bytes(raw)
                try:
                    kind = buf[0]
                    if kind == TYPE_BULK:
                        rows.append(["bulk", None, None, None, buf])
                        continue
                    if kind not in stream_types:
                        continue
                    if kind == TYPE_STREAM_WITH_COLLECTION:
                        coll, pos = _read_str(buf, 1)
                    else:
                        coll, pos = default_collection, 1
                    dec, iu, it, k = routing_decoder(coll)
                    if dec is None:              # unknown collection
                        rows.append(["corrupt", None, None, None, buf])
                        continue
                    # n_cols unset → a body ending early null-fills
                    # (trailing-missing tolerance, java:88-94)
                    vals, _ = dec.decode(buf, pos)
                    user = vals[iu] if iu >= 0 else None
                    tms = vals[it] if it >= 0 else None
                    rows.append([
                        "stream", coll,
                        None if user is None else str(user),
                        None if tms is None else int(tms), buf])
                except (IndexError, UnicodeDecodeError, struct.error):
                    rows.append(["corrupt", None, None, None, buf])
            yield pd.DataFrame(
                rows, columns=["_kind", "_collection", "_user",
                               "_time_ms", "value"])

    return (df.select(F.col(value_col).alias("_v"))
            .mapInPandas(run, out_schema))


def parse_bulk_pointer(buf: bytes) -> tuple[int, str]:
    """Type-3 record: [1B type][8B big-endian size][UTF-8 object key]
    (AvroMessageEventTransformer.java:92-95)."""
    total_size = struct.unpack_from(">q", buf, 1)[0]
    return total_size, buf[9:].decode("utf-8")


def decode_stream_records(df: DataFrame, fields: list[T.StructField],
                          default_collection: str | None = None,
                          value_col: str = "value") -> DataFrame:
    """D3: decode framed stream records to typed columns. Output schema =
    (_collection string, *fields). Corrupt records are dropped — the
    log-and-skip poison-pill policy (ST11)."""
    decoder = AvroRowDecoder(fields)
    out_schema = T.StructType(
        [T.StructField("_collection", T.StringType())] + list(fields))
    names = [f.name for f in fields]

    # wire carries epoch-millis/epoch-day ints for time columns
    # (AvroUtil.java:59-62); convert to Arrow-native temporal values
    ts_cols = [f.name for f in fields
               if isinstance(f.dataType, T.TimestampType)]
    date_cols = [f.name for f in fields if isinstance(f.dataType, T.DateType)]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for raw in pdf["_v"]:
                buf = bytes(raw)
                try:
                    kind = buf[0]
                    if kind == TYPE_STREAM_WITH_COLLECTION:
                        coll, pos = _read_str(buf, 1)
                    elif kind in (TYPE_STREAM0, TYPE_STREAM1):
                        coll, pos = default_collection, 1
                    else:
                        continue
                    vals, _ = decoder.decode(buf, pos)
                    rows.append([coll] + vals)
                except (IndexError, UnicodeDecodeError, struct.error):
                    continue
            out = pd.DataFrame(rows, columns=["_collection"] + names)
            for c in ts_cols:
                out[c] = pd.to_datetime(out[c], unit="ms")
            for c in date_cols:
                out[c] = pd.to_datetime(out[c], unit="D").dt.date
            yield out

    return (df.select(F.col(value_col).alias("_v"))
            .mapInPandas(run, out_schema))


def decode_bulk_stream(buf: bytes, get_columns) -> Iterator[tuple[str, str, list]]:
    """D7/S4: generator over a bulk object's records.

    Wire: ``project, (collection, colCount, recordCount, records…)*``
    (AvroMessageEventTransformer.java:100-127). ``get_columns(project,
    collection) -> list[StructField] | None`` supplies each section's
    schema; colCount < len(schema) reads the prefix only, the rest
    null-fills. Yields (project, collection, values)."""
    project, pos = _read_str(buf, 0)
    while pos < len(buf):
        collection, pos = _read_str(buf, pos)
        fields = get_columns(project, collection)
        if fields is None:
            raise KeyError(f"unknown collection {project}.{collection}")
        decoder = AvroRowDecoder(fields)
        n_cols, pos = _read_long(buf, pos)
        n_cols = min(n_cols, len(fields))
        n_records, pos = _read_long(buf, pos)
        for _ in range(n_records):
            vals, pos = decoder.decode(buf, pos, n_cols=n_cols)
            yield project, collection, vals


# ----------------------------------------------------- distributed bulk scan

def read_bulk_objects(spark, path: str) -> DataFrame:
    """S4: load bulk objects as (path, content) — one Spark task per
    object via the binaryFile source. The reference streams each S3
    object on the worker thread (AvroMessageEventTransformer.java:90-99);
    here each ~256 MB object is an independent task, so a backfill of
    10⁵ objects fans out across the cluster instead of serializing."""
    return (spark.read.format("binaryFile").load(path)
            .select("path", "content"))


def bulk_collections(objects: DataFrame, get_columns
                     ) -> list[tuple[str, str]]:
    """Discovery pass: the distinct (project, collection) pairs present
    in a set of bulk objects. Avro binary carries no section
    byte-lengths, so walking past a section requires its schema —
    ``get_columns`` (picklable, as in decode_bulk_collection) supplies
    it. Runs on executors; only the distinct names reach the driver."""
    import pandas as pd

    def scan(batches: Iterator) -> Iterator:
        for pdf in batches:
            names: set[tuple[str, str]] = set()
            for raw in pdf["content"]:
                names.update((p, c) for p, c, _ in
                             decode_bulk_stream(bytes(raw), get_columns))
            out = sorted(names)
            yield pd.DataFrame({"project": [p for p, _ in out],
                                "collection": [c for _, c in out]})

    return sorted({(r["project"], r["collection"]) for r in
                   (objects.select("content")
                    .mapInPandas(scan, "project string, collection string")
                    .collect())})


def decode_bulk_collection(objects: DataFrame, project: str, collection: str,
                           get_columns) -> DataFrame:
    """D7/S4: typed rows of ONE collection from bulk objects,
    distributed (one task per object batch). The full stream is decoded
    (Avro carries no section byte-lengths to skip by), but only the
    target collection's rows materialize; other sections still need
    their schema from ``get_columns`` to be walked past.

    ``get_columns`` must be a *picklable* callable
    (project, collection) -> list[StructField] | None — e.g. a dict
    lookup built from Catalog state, shipped to executors as a closure
    (broadcast-variable analog)."""
    fields = get_columns(project, collection)
    if fields is None:
        raise KeyError(f"unknown collection {project}.{collection}")
    out_schema = T.StructType(fields)
    names = [f.name for f in fields]
    ts_cols = [f.name for f in fields
               if isinstance(f.dataType, T.TimestampType)]
    date_cols = [f.name for f in fields if isinstance(f.dataType, T.DateType)]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for raw in pdf["content"]:
                for p, c, vals in decode_bulk_stream(bytes(raw), get_columns):
                    if p == project and c == collection:
                        rows.append(vals)
            out = pd.DataFrame(rows, columns=names)
            for col in ts_cols:
                out[col] = pd.to_datetime(out[col], unit="ms")
            for col in date_cols:
                out[col] = pd.to_datetime(out[col], unit="D").dt.date
            yield out

    return objects.select("content").mapInPandas(run, out_schema)


# ------------------------------------------------------------- test encoder

def encode_value(dtype: T.DataType, value) -> bytes:
    """Encode one nullable value (union[null, T]) — the writer side used
    by tests to produce wire-faithful fixtures."""
    if value is None:
        return _write_long(0)
    out = bytearray(_write_long(1))
    if isinstance(dtype, T.ArrayType):
        if value:
            out += _write_long(len(value))
            for v in value:
                out += encode_value(dtype.elementType, v)
        out += _write_long(0)
    elif isinstance(dtype, T.MapType):
        if value:
            out += _write_long(len(value))
            for k, v in value.items():
                kb = k.encode("utf-8")
                out += _write_long(len(kb)) + kb
                out += encode_value(dtype.valueType, v)
        out += _write_long(0)
    else:
        name = dtype.typeName()
        if name in ("string", "binary"):
            raw = value.encode("utf-8") if isinstance(value, str) else value
            out += _write_long(len(raw)) + raw
        elif name in ("long", "integer", "date", "timestamp"):
            out += _write_long(int(value))
        elif name == "double":
            out += struct.pack("<d", value)
        elif name == "float":
            out += struct.pack("<f", value)
        elif name == "boolean":
            out += b"\x01" if value else b"\x00"
        else:
            raise TypeError(f"unsupported avro type {name}")
    return bytes(out)


def encode_record(fields: list[T.StructField], values: list,
                  n_cols: int | None = None) -> bytes:
    limit = len(fields) if n_cols is None else n_cols
    return b"".join(encode_value(f.dataType, v)
                    for f, v in zip(fields[:limit], values[:limit]))


def encode_stream_record(fields: list[T.StructField], values: list,
                         collection: str | None = None) -> bytes:
    if collection is None:
        return bytes([TYPE_STREAM0]) + encode_record(fields, values)
    cb = collection.encode("utf-8")
    return (bytes([TYPE_STREAM_WITH_COLLECTION]) + _write_long(len(cb)) + cb
            + encode_record(fields, values))


def encode_bulk_stream(project: str,
                       sections: list[tuple[str, list[T.StructField], int,
                                            list[list]]]) -> bytes:
    """sections = [(collection, fields, n_cols, rows)]"""
    pb = project.encode("utf-8")
    out = bytearray(_write_long(len(pb)) + pb)
    for collection, fields, n_cols, rows in sections:
        cb = collection.encode("utf-8")
        out += _write_long(len(cb)) + cb
        out += _write_long(n_cols) + _write_long(len(rows))
        for row in rows:
            out += encode_record(fields, row, n_cols=n_cols)
    return bytes(out)


def encode_bulk_pointer(key: str, total_size: int) -> bytes:
    return bytes([TYPE_BULK]) + struct.pack(">q", total_size) \
        + key.encode("utf-8")
