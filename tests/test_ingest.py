"""Ingestion-semantics matrix (FIXTURES.md §2.3) — mirrors the
reference's TestDeserializer / TestKafkaJsonDeserializer coverage
(/root/reference/src/test/java/io/rakam/presto/TestDeserializer.java:56-269).
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import types as T

from rakam_api_collector_spark.ingest import Catalog, ingest_batch

SHARD_T = "2020-06-01 00:00:00"


def fabric(collection: str, fields: dict, project: str = "testproject") -> str:
    data = {"_project": project, "_collection": collection, **fields}
    return json.dumps({"id": "1", "metadata": {}, "data": data})


def rakam(collection: str, props: dict, project: str = "testproject") -> str:
    return json.dumps(
        {"project": project, "collection": collection, "properties": props})


def ingest(spark, lines, fmt="fabric", catalog=None, **kw):
    cat = catalog or Catalog()
    raw = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    out = ingest_batch(spark, raw, fmt, cat, shard_time=SHARD_T, **kw)
    return out, cat


def rows_of(df):
    return [r.asDict() for r in df.collect()]


# --- envelope formats --------------------------------------------------------

def test_fabric_envelope_basic(spark):
    out, cat = ingest(spark, [
        fabric("pageview", {"_time": 1500000000000, "url": "x.com", "n": 5})])
    assert set(out) == {("testproject", "pageview")}
    [row] = rows_of(out[("testproject", "pageview")])
    assert row["_time"] == dt.datetime(2017, 7, 14, 2, 40)   # epoch-millis
    assert row["url"] == "x.com"
    assert row["n"] == 5.0 and isinstance(row["n"], float)   # ints → DOUBLE
    assert row["_shard_time"] == dt.datetime(2020, 6, 1)


def test_rakam_envelope_basic(spark):
    out, _ = ingest(spark, [
        rakam("click", {"_time": "2017-07-14T02:40:00", "page": "p"})],
        fmt="rakam")
    [row] = rows_of(out[("testproject", "click")])
    assert row["_time"] == dt.datetime(2017, 7, 14, 2, 40)
    assert row["page"] == "p"


def test_rakam_numeric_time_is_null(spark):
    """Rakam accepts string timestamps only; numeric → null
    (RakamJsonDeserializer.java:363-377 vs Fabric :373-390)."""
    out, _ = ingest(spark, [rakam("c", {"_time": 1500000000000})], fmt="rakam")
    [row] = rows_of(out[("testproject", "c")])
    assert row["_time"] is None


# --- FIXTURES §2.3 semantics pins -------------------------------------------

def test_new_column_inference_prior_rows_null(spark):
    """Unseen field → column added; rows before first occurrence null."""
    cat = Catalog()
    out1, _ = ingest(spark, [fabric("t", {"a": "x"})], catalog=cat)
    assert [f.name for f in cat.get_columns("testproject", "t")] == \
        ["_shard_time", "_time", "_user", "a"]
    out2, _ = ingest(spark, [fabric("t", {"a": "y", "newcolumn1": "test1"})],
                     catalog=cat)
    assert [f.name for f in cat.get_columns("testproject", "t")][-1] == \
        "newcolumn1"
    [row] = rows_of(out2[("testproject", "t")])
    assert row["newcolumn1"] == "test1"
    # first batch's frame (built before evolution) lacks the column — the
    # reference null-fills on the next metastore round-trip; re-projection
    # of old data through the evolved schema is the sink's unionByName job.


def test_metastore_reordering_remaps_by_name(spark):
    """Authoritative order comes from the catalog; blocks remap by name
    (FabricJsonDeserializer.java:266-301)."""
    class Reordering(Catalog):
        def add_columns(self, p, c, new_fields):
            cols = super().add_columns(p, c, new_fields)
            seed = [f for f in cols if f.name.startswith("_")]
            rest = sorted([f for f in cols if not f.name.startswith("_")],
                          key=lambda f: f.name, reverse=True)
            self._tables[(p, c)] = seed + rest
            return list(self._tables[(p, c)])

    out, cat = ingest(spark, [fabric("t", {"aaa": 1, "zzz": "v"})],
                      catalog=Reordering())
    df = out[("testproject", "t")]
    assert df.columns == ["_shard_time", "_time", "_user", "zzz", "aaa"]
    [row] = rows_of(df)
    assert row["zzz"] == "v" and row["aaa"] == 1.0


def test_new_collection_auto_create_seed(spark):
    out, cat = ingest(spark, [fabric("fresh", {})])
    assert [f.name for f in cat.get_columns("testproject", "fresh")] == \
        ["_shard_time", "_time", "_user"]
    [row] = rows_of(out[("testproject", "fresh")])
    assert row["_time"] is None and row["_user"] is None


def test_duplicate_json_key_first_wins_compat(spark):
    """{"testcolumn":"1","testcolumn":"2"} → first wins
    (TestKafkaJsonDeserializer.java:76-93) in compat mode."""
    line = ('{"id":"1","metadata":{},"data":{"_project":"testproject",'
            '"_collection":"t","testcolumn":"1","testcolumn":"2"}}')
    out, _ = ingest(spark, [line], first_wins_duplicates=True)
    [row] = rows_of(out[("testproject", "t")])
    assert row["testcolumn"] == "1"


def test_first_wins_compat_preserves_nested_objects(spark):
    """The first-wins normalizer must not corrupt nested object values:
    {"x":{"y":3}} stays an object (→ MAP column), not an array of pairs."""
    line = ('{"id":"1","metadata":{},"data":{"_project":"testproject",'
            '"_collection":"t","dup":"1","dup":"2","x":{"y":3,"Y":4}}}')
    out, cat = ingest(spark, [line], first_wins_duplicates=True)
    [row] = rows_of(out[("testproject", "t")])
    assert row["dup"] == "1"
    field = {f.name: f for f in cat.get_columns("testproject", "t")}["x"]
    assert isinstance(field.dataType, T.MapType)
    assert row["x"] == {"y": 3.0}    # nested first-wins on lowercased key


def test_empty_collection_name_dropped(spark):
    """checkCollectionValid rejects empty names
    (FabricJsonDeserializer.java:95-103)."""
    out, _ = ingest(spark, [fabric("", {"a": 1}), fabric("ok", {"a": 1})])
    assert set(out) == {("testproject", "ok")}


def _decimal_catalog():
    cat = Catalog()
    cat.create_table("testproject", "t")
    cat.add_columns("testproject", "t", [
        T.StructField("amt", T.DecimalType(18, 4)),
        T.StructField("blob", T.BinaryType())])
    return cat


def test_decimal_binary_spark_mode(spark):
    """compat='spark': DECIMAL converts properly; BINARY base64-decodes;
    mismatched tokens → null, never error."""
    import decimal
    cat = _decimal_catalog()
    out, _ = ingest(spark, [
        fabric("t", {"amt": 12.5, "blob": "aGVsbG8="}),       # valid
        fabric("t", {"amt": "NaNope", "blob": "!!!"})],       # both null
        catalog=cat)
    rows = sorted(rows_of(out[("testproject", "t")]),
                  key=lambda r: r["amt"] is None)
    assert rows[0]["amt"] == decimal.Decimal("12.5000")
    assert bytes(rows[0]["blob"]) == b"hello"
    assert rows[1]["amt"] is None and rows[1]["blob"] is None


def test_decimal_binary_reference_mode(spark):
    """compat='reference': JSON DECIMAL is always null (the reference's
    TODO, FabricJsonDeserializer.java:352-354); BINARY is Avro-only."""
    cat = _decimal_catalog()
    out, _ = ingest(spark, [fabric("t", {"amt": 12.5, "blob": "aGVsbG8="})],
                    catalog=cat, compat="reference")
    [row] = rows_of(out[("testproject", "t")])
    assert row["amt"] is None and row["blob"] is None


def test_struct_objects_inference(spark):
    """struct_objects=True: nested objects become first-class typed
    StructType columns (what Spark can do that the reference rejects,
    FabricJsonDeserializer.java:303-310); unknown nested keys in later
    records drop, missing ones null-fill."""
    cat = Catalog()
    out1, _ = ingest(spark, [
        fabric("t", {"ctx": {"ua": "firefox", "Build": 42,
                             "geo": {"lat": 1.5}}})],
        catalog=cat, struct_objects=True)
    field = {f.name: f for f in cat.get_columns("testproject", "t")}["ctx"]
    assert isinstance(field.dataType, T.StructType)
    assert isinstance(field.dataType["Build"].dataType, T.DoubleType)
    assert isinstance(field.dataType["geo"].dataType, T.StructType)
    [row] = rows_of(out1[("testproject", "t")])
    assert row["ctx"]["ua"] == "firefox" and row["ctx"]["Build"] == 42.0
    assert row["ctx"]["geo"]["lat"] == 1.5

    out2, _ = ingest(spark, [
        fabric("t", {"ctx": {"ua": "chrome", "extra": "dropped"}})],
        catalog=cat, struct_objects=True)
    [row2] = rows_of(out2[("testproject", "t")])
    assert row2["ctx"]["ua"] == "chrome" and row2["ctx"]["Build"] is None
    assert "extra" not in row2["ctx"].asDict()


def test_envelope_key_order_independence(spark):
    """_project/_collection after the data fields → same result
    (TestKafkaFabricJsonDeserializer.java:62-85)."""
    line = ('{"id":"1","metadata":{},"data":{"x":"v","_collection":"t",'
            '"_project":"testproject"}}')
    out, _ = ingest(spark, [line])
    [row] = rows_of(out[("testproject", "t")])
    assert row["x"] == "v"


def test_int_infers_double(spark):
    out, cat = ingest(spark, [fabric("t", {"x": 5})])
    field = cat.get_columns("testproject", "t")[-1]
    assert field.name == "x" and isinstance(field.dataType, T.DoubleType)
    assert rows_of(out[("testproject", "t")])[0]["x"] == 5.0


def test_date_string_sniffing(spark):
    out, cat = ingest(spark, [fabric("t", {"d": "2018-01-01"})])
    assert isinstance(cat.get_columns("testproject", "t")[-1].dataType,
                      T.DateType)
    assert rows_of(out[("testproject", "t")])[0]["d"] == dt.date(2018, 1, 1)


def test_timestamp_string_sniffing(spark):
    out, cat = ingest(spark, [fabric("t", {"ts": "2018-01-01T10:30:00"})])
    assert isinstance(cat.get_columns("testproject", "t")[-1].dataType,
                      T.TimestampType)
    assert rows_of(out[("testproject", "t")])[0]["ts"] == \
        dt.datetime(2018, 1, 1, 10, 30)


def test_bad_value_becomes_null(spark):
    """Existing date column, value 'garbage' → null
    (FabricJsonDeserializer.java:364-370)."""
    cat = Catalog()
    ingest(spark, [fabric("t", {"d": "2018-01-01"})], catalog=cat)
    out, _ = ingest(spark, [fabric("t", {"d": "garbage"})], catalog=cat)
    assert rows_of(out[("testproject", "t")])[0]["d"] is None


def test_type_mismatch_no_widening(spark):
    """Number into an existing string column → null, type unchanged
    (FabricJsonDeserializer.java:392-395)."""
    cat = Catalog()
    ingest(spark, [fabric("t", {"s": "hello"})], catalog=cat)
    out, _ = ingest(spark, [fabric("t", {"s": 123})], catalog=cat)
    assert rows_of(out[("testproject", "t")])[0]["s"] is None
    assert isinstance(cat.get_columns("testproject", "t")[-1].dataType,
                      T.StringType)


def test_100_char_truncation(spark):
    out, _ = ingest(spark, [fabric("t", {"s": "x" * 150})])
    assert rows_of(out[("testproject", "t")])[0]["s"] == "x" * 100


def test_nested_object_json_encoded_in_map_string(spark):
    """Non-scalar map value → MAP<STRING,STRING> with JSON-encoded values
    (FabricJsonDeserializer.java:436-445,595-598)."""
    out, cat = ingest(spark, [fabric("t", {"a": {"b": {"c": 1}}})])
    field = cat.get_columns("testproject", "t")[-1]
    assert field.dataType == T.MapType(T.StringType(), T.StringType())
    assert rows_of(out[("testproject", "t")])[0]["a"] == {"b": '{"c":1}'}


def test_null_only_field_deferred(spark):
    """{"x": null} unseen → no column created
    (FabricJsonDeserializer.java:505-506); same for [] and {}."""
    out, cat = ingest(spark, [fabric("t", {"x": None, "y": [], "z": {}})])
    assert [f.name for f in cat.get_columns("testproject", "t")] == \
        ["_shard_time", "_time", "_user"]


def test_deferred_field_appears_on_first_value(spark):
    cat = Catalog()
    ingest(spark, [fabric("t", {"x": None})], catalog=cat)
    out, _ = ingest(spark, [fabric("t", {"x": 1.5})], catalog=cat)
    assert rows_of(out[("testproject", "t")])[0]["x"] == 1.5


def test_lowercase_folding(spark):
    """{"ColName": 1} → column 'colname' (FabricJsonDeserializer.java:193)."""
    out, cat = ingest(spark, [fabric("t", {"ColName": 1})])
    assert cat.get_columns("testproject", "t")[-1].name == "colname"
    assert rows_of(out[("testproject", "t")])[0]["colname"] == 1.0


def test_array_inference_and_values(spark):
    out, cat = ingest(spark, [fabric("t", {"tags": ["a", "b"], "ns": [1, 2]})])
    cols = {f.name: f.dataType for f in cat.get_columns("testproject", "t")}
    assert cols["tags"] == T.ArrayType(T.StringType())
    assert cols["ns"] == T.ArrayType(T.DoubleType())
    [row] = rows_of(out[("testproject", "t")])
    assert row["tags"] == ["a", "b"] and row["ns"] == [1.0, 2.0]


def test_array_of_objects_json_encoded(spark):
    """Nested elements degrade to ARRAY<STRING> of JSON
    (FabricJsonDeserializer.java:470-478,561-564)."""
    out, cat = ingest(spark, [fabric("t", {"a": [{"k": 1}, {"k": 2}]})])
    assert cat.get_columns("testproject", "t")[-1].dataType == \
        T.ArrayType(T.StringType())
    assert rows_of(out[("testproject", "t")])[0]["a"] == ['{"k":1}', '{"k":2}']


def test_map_inference_and_values(spark):
    out, cat = ingest(spark, [fabric("t", {"m": {"k1": 1.5, "k2": 2.5}})])
    assert cat.get_columns("testproject", "t")[-1].dataType == \
        T.MapType(T.StringType(), T.DoubleType())
    assert rows_of(out[("testproject", "t")])[0]["m"] == {"k1": 1.5, "k2": 2.5}


def test_collection_name_over_100_chars_dropped(spark):
    out, _ = ingest(spark, [fabric("c" * 101, {"x": 1})])
    assert out == {}


def test_project_lowercased(spark):
    out, _ = ingest(spark, [fabric("t", {"x": 1}, project="MyProj")])
    assert set(out) == {("myproj", "t")}


def test_corrupt_json_skipped(spark):
    """Poison-pill policy: parse errors drop the record, batch survives
    (JsonMessageEventTransformer.java:44-60)."""
    out, _ = ingest(spark, ["{not json", fabric("t", {"x": 1})])
    assert [r["x"] for r in rows_of(out[("testproject", "t")])] == [1.0]


def test_multi_collection_fanout(spark):
    """R1 routing: one batch → N typed tables
    (JsonMessageEventTransformer.java:36-64)."""
    lines = [fabric(f"c{i % 3}", {"v": i}) for i in range(9)]
    out, _ = ingest(spark, lines)
    assert {c for _, c in out} == {"c0", "c1", "c2"}
    assert all(df.count() == 3 for df in out.values())


def test_append_order_matches_object_order(spark):
    """New columns append in the order they appear in the record
    (TestKafkaJsonDeserializer field ordering)."""
    out, cat = ingest(spark, [fabric("t", {"zz": 1, "mm": "x", "aa": True})])
    assert [f.name for f in cat.get_columns("testproject", "t")] == \
        ["_shard_time", "_time", "_user", "zz", "mm", "aa"]


def test_first_wins_inference_order(spark):
    """Within a batch, the FIRST record's value decides the type
    (arrival-order first-wins, SURVEY §7 'hard parts')."""
    lines = [fabric("t", {"x": "2018-01-01"}),   # date wins
             fabric("t", {"x": "not a date"})]
    out, cat = ingest(spark, lines)
    assert isinstance(cat.get_columns("testproject", "t")[-1].dataType,
                      T.DateType)
    vals = sorted((r["x"] for r in rows_of(out[("testproject", "t")])),
                  key=lambda v: (v is None, v))
    assert vals == [dt.date(2018, 1, 1), None]
