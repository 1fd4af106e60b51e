"""Avro Object Container File reading — the STANDARD ``.avro`` file
(Avro 1.x spec §Object Container Files), complementing the custom
wire framing in ``ingest/avro.py``: the reference's Kafka path ships
bare datum bodies, but every data lake's at-rest Avro is OCF —
self-describing (schema JSON in the header), sync-marker-blocked,
optionally deflate-compressed.

Same Spark shape as the other binary scans (S4): ``binaryFile`` lists
files, a TINY first job reads one header to fix the Spark schema at
plan time (one string crosses the wire), then ONE ``mapInPandas``
pass decodes blocks — file-level parallelism, no shuffle. Every
length/count field is UNTRUSTED and bounded against its block before
use, the same stance as the avro/MP4/MKV/WARC parsers; a block whose
decoded row count disagrees with its declared count raises rather
than silently mis-framing at the next sync marker.

Type universe (honest bounds, matching the repo's Avro support):
primitives null/boolean/int/long/float/double/bytes/string, the
date / timestamp-millis / timestamp-micros logical types, two-branch
``[null, T]`` unions (either order), and single-level array/map of
those. Nested records, enums, fixed, decimals, and other codecs
(snappy/zstd — their libraries don't ship here) raise with a named
reason; files that raise follow the ST11 drop-vs-raise contract via
``skip_invalid``.
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rakam_api_collector_spark.ingest.avro import (_read_blocks,
                                                   _read_bytes,
                                                   _read_long,
                                                   _read_str)

_MAGIC = b"Obj\x01"

_PRIMITIVES: dict[str, tuple] = {
    "boolean": (lambda b, p: (b[p] != 0, p + 1), T.BooleanType(), None),
    "int": (_read_long, T.IntegerType(), None),
    "long": (_read_long, T.LongType(), None),
    "float": (lambda b, p: (struct.unpack_from("<f", b, p)[0], p + 4),
              T.FloatType(), None),
    "double": (lambda b, p: (struct.unpack_from("<d", b, p)[0], p + 8),
               T.DoubleType(), None),
    "bytes": (_read_bytes, T.BinaryType(), None),
    "string": (_read_str, T.StringType(), None),
}

_LOGICAL: dict[tuple, tuple] = {
    # (base, logicalType) -> (spark type, pandas conversion unit)
    ("int", "date"): (T.DateType(), "D"),
    ("long", "timestamp-millis"): (T.TimestampType(), "ms"),
    ("long", "timestamp-micros"): (T.TimestampType(), "us"),
}


def _build(node):
    """Avro schema node → (reader, sparkType, nullable, temporal_unit).
    Raises ValueError naming the unsupported construct."""
    if isinstance(node, str):
        if node == "null":
            return (lambda b, p: (None, p)), T.NullType(), True, None
        if node not in _PRIMITIVES:
            raise ValueError(f"unsupported Avro type {node!r} "
                             "(named/nested types not supported)")
        rd, st, _ = _PRIMITIVES[node]
        return rd, st, False, None
    if isinstance(node, list):                       # union
        branches = [b for b in node if b != "null"]
        if len(node) != 2 or len(branches) != 1:
            raise ValueError(f"unsupported union {node!r} (only "
                             "two-branch [null, T])")
        null_first = node[0] == "null"
        rd, st, _n, unit = _build(branches[0])

        def read_union(b, p, rd=rd, null_first=null_first):
            branch, p = _read_long(b, p)
            if branch == (0 if null_first else 1):
                return None, p
            return rd(b, p)
        return read_union, st, True, unit
    if isinstance(node, dict):
        typ = node["type"]
        logical = node.get("logicalType")
        if logical is not None:
            key = (typ, logical)
            if key not in _LOGICAL:
                raise ValueError(f"unsupported logical type {key}")
            st, unit = _LOGICAL[key]
            rd = _PRIMITIVES[typ][0]
            return rd, st, False, unit
        if typ == "array":
            rd, st, nullable, unit = _build(node["items"])
            if unit is not None:
                raise ValueError("temporal array elements unsupported")

            def read_array(b, p, rd=rd):
                return _read_blocks(b, p, rd)
            return read_array, T.ArrayType(st, nullable), False, None
        if typ == "map":
            rd, st, nullable, unit = _build(node["values"])
            if unit is not None:
                raise ValueError("temporal map values unsupported")

            def read_map(b, p, rd=rd):
                def entry(b2, p2):
                    k, p2 = _read_str(b2, p2)
                    v, p2 = rd(b2, p2)
                    return (k, v), p2
                entries, p = _read_blocks(b, p, entry)
                return dict(entries), p
            return read_map, T.MapType(T.StringType(), st,
                                       nullable), False, None
        if typ in _PRIMITIVES or typ == "null" or isinstance(typ, (
                list, dict)):
            return _build(typ)                       # {"type": "long"}
        raise ValueError(f"unsupported Avro construct {typ!r} "
                         "(record nesting / enum / fixed)")
    raise ValueError(f"unparseable schema node {node!r}")


def schema_of(schema_json: str):
    """OCF record schema JSON → (field readers, StructType,
    per-field temporal units). Top level must be a record."""
    sch = json.loads(schema_json)
    if not (isinstance(sch, dict) and sch.get("type") == "record"):
        raise ValueError("top-level OCF schema must be a record")
    readers, fields, units = [], [], {}
    for f in sch["fields"]:
        rd, st, nullable, unit = _build(f["type"])
        readers.append(rd)
        fields.append(T.StructField(f["name"], st, nullable))
        if unit is not None:
            units[f["name"]] = unit
    return readers, T.StructType(fields), units


def parse_ocf(data: bytes):
    """(schema_json, codec, iterator of value-lists). Every count and
    size is bounded before use."""
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro OCF (bad magic)")
    meta = {}
    pos = 4

    def meta_entry(b, p):
        k, p = _read_str(b, p)
        v, p = _read_bytes(b, p)
        return (k, v), p
    entries, pos = _read_blocks(data, pos, meta_entry)
    meta = dict(entries)
    if "avro.schema" not in meta:
        raise ValueError("OCF header missing avro.schema")
    schema_json = meta["avro.schema"].decode("utf-8")
    codec = meta.get("avro.codec", b"null").decode("ascii")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported OCF codec {codec!r} (its "
                         "library does not ship here)")
    sync = data[pos:pos + 16]
    if len(sync) != 16:
        raise ValueError("truncated OCF header sync marker")
    pos += 16
    readers, _st, _units = schema_of(schema_json)

    def rows() -> Iterator[list]:
        p = pos
        while p < len(data):
            n_rows, p = _read_long(data, p)
            n_bytes, p = _read_long(data, p)
            if n_rows < 0 or n_bytes < 0 or p + n_bytes + 16 > len(data):
                raise ValueError(
                    f"OCF block claims {n_rows} rows / {n_bytes} "
                    "bytes past end of file")
            block = data[p:p + n_bytes]
            p += n_bytes
            if data[p:p + 16] != sync:
                raise ValueError("OCF block sync marker mismatch")
            p += 16
            if codec == "deflate":
                try:
                    block = zlib.decompress(block, -15)   # raw RFC1951
                except zlib.error as e:
                    raise ValueError(f"bad deflate block: {e}") from None
            bp = 0
            for _ in range(n_rows):
                vals = []
                for rd in readers:
                    v, bp = rd(block, bp)
                    vals.append(v)
                yield vals
            if bp != len(block):
                raise ValueError(
                    f"OCF block decoded {bp} of {len(block)} bytes "
                    f"for its declared {n_rows} rows")
    return schema_json, codec, rows()


def read_avro_ocf(spark: SparkSession, path: str,
                  skip_invalid: bool = True) -> DataFrame:
    """Scan a directory of OCF files: one tiny job fixes the schema
    from the first file's header, one mapInPandas decodes all files.
    Files whose schema JSON differs from the plan-time schema (or
    that are corrupt) follow drop-vs-raise via ``skip_invalid``."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))
    probe_schema = T.StructType(
        [T.StructField("schema_json", T.StringType())])

    def probe(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            for raw in pdf["content"]:
                sj, _c, _r = parse_ocf(bytes(raw))
                yield pd.DataFrame({"schema_json": [sj]})
                return

    first = files.limit(1).mapInPandas(probe, probe_schema).collect()
    if not first:
        raise FileNotFoundError(f"no OCF files under {path}")
    plan_json = first[0].schema_json
    _, struct_type, units = schema_of(plan_json)
    out_schema = T.StructType(
        [T.StructField("_path", T.StringType())]
        + list(struct_type.fields))
    names = [f.name for f in struct_type.fields]
    plan_canon = json.dumps(json.loads(plan_json), sort_keys=True)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                # buffer per file so a mid-decode failure drops the
                # WHOLE file (including rows already decoded from a
                # block that later fails the framing check) — the
                # drop-vs-raise contract is all-or-nothing per file
                frows: list[list] = []
                try:
                    sj, _codec, it = parse_ocf(bytes(raw))
                    if json.dumps(json.loads(sj),
                                  sort_keys=True) != plan_canon:
                        raise ValueError(
                            f"schema drift in {fpath} vs plan-time "
                            "schema")
                    for vals in it:
                        frows.append([fpath] + vals)
                except (ValueError, IndexError, struct.error):
                    if not skip_invalid:
                        raise
                    continue
                rows.extend(frows)
            out = pd.DataFrame(rows, columns=["_path"] + names)
            for c, unit in units.items():
                out[c] = pd.to_datetime(out[c], unit=unit)
                if unit == "D":
                    out[c] = out[c].dt.date
            yield out

    return files.mapInPandas(run, out_schema)


# -- writer (fixtures + the archive half) -------------------------------------


def write_ocf(schema_json: str, rows: list[list],
              codec: str = "null", sync: bytes = b"\x07" * 16,
              rows_per_block: int | None = None) -> bytes:
    """Serialize value-lists as an OCF byte string (null or deflate
    codec) — the write half and the test fixture source."""
    from rakam_api_collector_spark.ingest.avro import _write_long

    readers_unused, struct_type, _units = schema_of(schema_json)
    sch = json.loads(schema_json)

    def enc(node, v) -> bytes:
        if isinstance(node, str):
            if node == "null":
                return b""
            if node == "boolean":
                return b"\x01" if v else b"\x00"
            if node in ("int", "long"):
                return _write_long(int(v))
            if node == "float":
                return struct.pack("<f", v)
            if node == "double":
                return struct.pack("<d", v)
            if node in ("bytes", "string"):
                raw = v.encode("utf-8") if isinstance(v, str) else v
                return _write_long(len(raw)) + raw
        if isinstance(node, list):
            null_first = node[0] == "null"
            other = node[1] if null_first else node[0]
            if v is None:
                return _write_long(0 if null_first else 1)
            return _write_long(1 if null_first else 0) + enc(other, v)
        if isinstance(node, dict):
            if node.get("logicalType"):
                return _write_long(int(v))
            if node["type"] == "array":
                body = b"".join(enc(node["items"], x) for x in v)
                return ((_write_long(len(v)) + body if v else b"")
                        + _write_long(0))
            if node["type"] == "map":
                body = b"".join(
                    _write_long(len(k.encode())) + k.encode()
                    + enc(node["values"], x) for k, x in v.items())
                return ((_write_long(len(v)) + body if v else b"")
                        + _write_long(0))
            return enc(node["type"], v)
        raise ValueError(f"cannot encode {node!r}")

    header = (_MAGIC
              + _write_long(2)
              + _write_long(len(b"avro.schema")) + b"avro.schema"
              + _write_long(len(schema_json.encode()))
              + schema_json.encode()
              + _write_long(len(b"avro.codec")) + b"avro.codec"
              + _write_long(len(codec.encode())) + codec.encode()
              + _write_long(0)
              + sync)
    per = rows_per_block or max(1, len(rows))
    blocks = b""
    for i in range(0, len(rows), per):
        chunk = rows[i:i + per]
        body = b"".join(
            b"".join(enc(f["type"], v)
                     for f, v in zip(sch["fields"], vals))
            for vals in chunk)
        if codec == "deflate":
            co = zlib.compressobj(wbits=-15)
            body = co.compress(body) + co.flush()
        blocks += (_write_long(len(chunk)) + _write_long(len(body))
                   + body + sync)
    return header + blocks
