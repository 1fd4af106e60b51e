"""Avro wire path (D3/D7/S4/P5): round-trip, schema-lag tolerance,
bulk multi-collection stream, first-byte dispatch.

Mirrors the reference test matrix for the Avro reader
(TestPageDatumReader.java, TestKinesisAvroDeserializer.java): all
supported types with nulls, trailing-missing-field fill, and the
prefix-schema bulk read.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rakam_api_collector_spark.ingest import avro as A

FIELDS = [
    T.StructField("_user", T.StringType()),
    T.StructField("_time", T.TimestampType()),      # epoch-millis long
    T.StructField("n", T.LongType()),
    T.StructField("i", T.IntegerType()),
    T.StructField("d", T.DoubleType()),
    T.StructField("b", T.BooleanType()),
    T.StructField("raw", T.BinaryType()),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("attrs", T.MapType(T.StringType(), T.DoubleType())),
]

ROW = ["u1", 1704067200000, -42, 7, 2.5, True, b"\x00\xff",
       ["a", None, "c"], {"x": 1.5, "y": None}]


def test_roundtrip_all_types():
    buf = A.encode_record(FIELDS, ROW)
    vals, pos = A.AvroRowDecoder(FIELDS).decode(buf)
    assert pos == len(buf)
    assert vals == ROW


def test_roundtrip_nulls():
    row = [None] * len(FIELDS)
    vals, _ = A.AvroRowDecoder(FIELDS).decode(A.encode_record(FIELDS, row))
    assert vals == row


def test_trailing_missing_fields_null_fill():
    # writer knew only the first 3 columns (AvroPageDatumReader.java:88-94)
    buf = A.encode_record(FIELDS[:3], ROW[:3])
    vals, _ = A.AvroRowDecoder(FIELDS).decode(buf)
    assert vals == ROW[:3] + [None] * (len(FIELDS) - 3)


def test_prefix_schema_decode():
    # bulk sections carry col counts (AvroPageDatumReader.java:196-212)
    buf = A.encode_record(FIELDS, ROW, n_cols=4) \
        + A.encode_record(FIELDS, ROW, n_cols=4)
    dec = A.AvroRowDecoder(FIELDS)
    vals1, pos = dec.decode(buf, 0, n_cols=4)
    vals2, pos = dec.decode(buf, pos, n_cols=4)
    assert vals1 == vals2 == ROW[:4] + [None] * (len(FIELDS) - 4)
    assert pos == len(buf)


def test_float_roundtrip():
    f = [T.StructField("f", T.FloatType())]
    vals, _ = A.AvroRowDecoder(f).decode(A.encode_record(f, [1.25]))
    assert vals == [1.25]
    vals, _ = A.AvroRowDecoder(f).decode(A.encode_record(f, [0.1]))
    assert math.isclose(vals[0], 0.1, rel_tol=1e-6)   # float32 precision


def test_bulk_stream_multi_collection():
    other = [T.StructField("k", T.StringType()),
             T.StructField("v", T.LongType())]
    buf = A.encode_bulk_stream("proj", [
        ("events", FIELDS, len(FIELDS), [ROW, ROW]),
        ("kv", other, 2, [["a", 1], ["b", None], [None, 3]]),
        ("events", FIELDS, 3, [ROW[:3]]),          # lagging writer: prefix
    ])
    cols = {"events": FIELDS, "kv": other}
    got = list(A.decode_bulk_stream(buf, lambda p, c: cols.get(c)))
    assert [(p, c) for p, c, _ in got] == \
        [("proj", "events")] * 2 + [("proj", "kv")] * 3 + [("proj", "events")]
    assert got[0][2] == ROW
    assert got[2][2] == ["a", 1]
    assert got[5][2] == ROW[:3] + [None] * (len(FIELDS) - 3)


def test_bulk_stream_unknown_collection_raises():
    buf = A.encode_bulk_stream("proj", [("nope", FIELDS, 1, [[None]])])
    with pytest.raises(KeyError):
        list(A.decode_bulk_stream(buf, lambda p, c: None))


def test_bulk_pointer_roundtrip():
    ptr = A.encode_bulk_pointer("bucket/2024/01/x.avro", 12345)
    size, key = A.parse_bulk_pointer(ptr)
    assert (size, key) == (12345, "bucket/2024/01/x.avro")


KV = [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]


def test_bulk_scan_distributed(spark, tmp_path):
    """S4 end-to-end: bulk objects on disk → binaryFile scan →
    per-collection typed frames (one task per object)."""
    from rakam_api_collector_spark.ingest.avro import (
        bulk_collections, decode_bulk_collection, read_bulk_objects)

    # defined in-function: cloudpickle ships it by value (executors
    # cannot import the test module)
    cols = {"events": FIELDS, "kv": KV}

    def _lookup(p, c, _cols=cols):
        return _cols.get(c)
    obj1 = A.encode_bulk_stream("proj", [
        ("events", FIELDS, len(FIELDS), [ROW]),
        ("kv", KV, 2, [["a", 1], ["b", 2]]),
    ])
    obj2 = A.encode_bulk_stream("proj", [
        ("kv", KV, 1, [["c"]]),                    # lagging writer prefix
        ("events", FIELDS, len(FIELDS), [ROW, ROW]),
    ])
    d = tmp_path / "bulk"
    d.mkdir()
    (d / "a.bin").write_bytes(obj1)
    (d / "b.bin").write_bytes(obj2)

    objects = read_bulk_objects(spark, str(d))
    assert objects.count() == 2
    assert bulk_collections(objects, _lookup) == \
        [("proj", "events"), ("proj", "kv")]

    ev = decode_bulk_collection(objects, "proj", "events", _lookup)
    assert ev.count() == 3
    assert ev.schema.fieldNames() == [f.name for f in FIELDS]
    assert all(r["n"] == -42 for r in ev.collect())

    kv = decode_bulk_collection(objects, "proj", "kv", _lookup)
    got = sorted((r["k"], r["v"]) for r in kv.collect())
    assert got == [("a", 1), ("b", 2), ("c", None)]


def test_dispatch_and_spark_decode(spark):
    msgs = [
        (A.encode_stream_record(FIELDS, ROW, collection="clicks"),),
        (A.encode_stream_record(FIELDS[:3], ROW[:3], collection="clicks"),),
        (A.encode_stream_record(FIELDS, ROW),),        # type 0: default coll
        (A.encode_bulk_pointer("k", 1),),
        (b"\x07junk",),
        (b"\x02\xff\xff\xff",),                        # corrupt: dropped
    ]
    df = spark.createDataFrame(msgs, T.StructType(
        [T.StructField("value", T.BinaryType())]))

    kinds = [r["_record_kind"] for r in
             A.dispatch_record_type(df).select("_record_kind").collect()]
    assert kinds == ["stream", "stream", "stream", "bulk", "ignore", "stream"]

    # Kinesis flavor: first-byte 1 is an obsolete bulk format the
    # reference skips (KinesisRecordProcessor.java:79-99)
    obsolete = spark.createDataFrame(
        [(b"\x01payload",)] + msgs[:1], df.schema)
    kkinds = [r["_record_kind"] for r in
              A.dispatch_record_type(obsolete, source="kinesis")
              .select("_record_kind").collect()]
    assert kkinds == ["ignore", "stream"]

    stream = (A.dispatch_record_type(df)
              .filter(F.col("_record_kind") == "stream").select("value"))
    typed = A.decode_stream_records(stream, FIELDS,
                                    default_collection="defcoll")
    rows = typed.collect()
    assert len(rows) == 3                              # corrupt one dropped
    full = next(r for r in rows
                if r["_collection"] == "clicks" and r["i"] == 7)
    assert full["n"] == -42 and full["tags"] == ["a", None, "c"]
    assert full["attrs"]["x"] == 1.5
    truncated = next(r for r in rows
                     if r["_collection"] == "clicks" and r["i"] is None)
    assert truncated["n"] == -42 and truncated["tags"] is None
    assert any(r["_collection"] == "defcoll" for r in rows)
