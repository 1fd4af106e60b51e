"""Sink tests: evolved table round-trip (K1/K5) + NDJSON envelope (K2)."""

from __future__ import annotations

import gzip
import json
from pathlib import Path

from rakam_api_collector_spark.ingest import Catalog, ingest_batch
from rakam_api_collector_spark.sinks import (
    read_collection,
    write_collections,
    write_ndjson_envelope,
)
from tests.test_ingest import fabric

SHARD_T = "2020-06-01 00:00:00"


def _ingest(spark, cat, lines):
    raw = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    return ingest_batch(spark, raw, "fabric", cat, shard_time=SHARD_T)


def test_evolved_write_read_roundtrip(spark, tmp_path):
    """Batch 1 writes [a]; batch 2 evolves [a, b]; reading the table
    yields catalog order with nulls back-filled for old files —
    the metastore-ordered remap (FabricJsonDeserializer.java:266-301)."""
    base = str(tmp_path / "tables")
    cat = Catalog(path=str(tmp_path / "catalog.json"))

    out1 = _ingest(spark, cat, [
        fabric("t", {"_time": "2020-05-30T10:00:00", "a": "one"})])
    write_collections(out1, base)
    out2 = _ingest(spark, cat, [
        fabric("t", {"_time": "2020-05-31T11:00:00", "a": "two", "b": 2})])
    write_collections(out2, base)

    df = read_collection(spark, base, "testproject", "t", cat)
    assert df.columns == ["_shard_time", "_time", "_user", "a", "b"]
    rows = {r["a"]: r for r in df.collect()}
    assert rows["one"]["b"] is None      # null back-fill for pre-evolution file
    assert rows["two"]["b"] == 2.0

    # catalog persisted: a fresh Catalog instance sees the same schema
    cat2 = Catalog(path=str(tmp_path / "catalog.json"))
    assert [f.name for f in cat2.get_columns("testproject", "t")] == \
        ["_shard_time", "_time", "_user", "a", "b"]


def test_day_partitioned_layout(spark, tmp_path):
    base = str(tmp_path / "tables")
    cat = Catalog()
    out = _ingest(spark, cat, [
        fabric("t", {"_time": "2020-05-30T10:00:00", "a": "x"}),
        fabric("t", {"_time": "2020-05-31T10:00:00", "a": "y"})])
    write_collections(out, base)
    days = {p.name for p in Path(base, "testproject", "t").iterdir()
            if p.name.startswith("_day=")}
    assert days == {"_day=2020-05-30", "_day=2020-05-31"}


def test_envelope_datasource_roundtrip(spark, tmp_path):
    """K4: the sink's gzip NDJSON output reads back through the custom
    Python DataSource, one task per file."""
    from pyspark.sql import functions as F

    from rakam_api_collector_spark.sinks import write_ndjson_envelope
    from rakam_api_collector_spark.sources.envelope import EnvelopeDataSource

    df = spark.createDataFrame(
        [("2024-01-01 10:00:00", "u1", 5, "x"),
         ("2024-01-02 11:30:00", "u2", 7, None)],
        "t: string, _user: string, n: bigint, s: string",
    ).select(F.col("t").cast("timestamp").alias("_time"), "_user", "n", "s")
    out = str(tmp_path / "spool")
    write_ndjson_envelope(df, "proj", "ev", out)

    spark.dataSource.register(EnvelopeDataSource)
    back = (spark.read.format("rakam_envelope")
            .option("path", out).load())
    rows = {r["_user"]: r for r in back.collect()}
    assert len(rows) == 2
    assert rows["u1"]["project"] == "proj" and rows["u1"]["collection"] == "ev"
    assert rows["u1"]["_time"].startswith("2024-01-01T10:00:00")
    import json as _json
    props = _json.loads(rows["u1"]["properties"])
    assert props == {"n": 5, "s": "x"}
    assert _json.loads(rows["u2"]["properties"]) == {"n": 7}  # nulls dropped


def test_orc_sink_roundtrip(spark, tmp_path):
    """K1: the ORC format path (the reference's Raptor target is ORC)."""
    from rakam_api_collector_spark.sinks import write_collections
    df = spark.createDataFrame([(1, "a"), (2, "b")], "x: bigint, s: string")
    write_collections({("p", "ev"): df}, str(tmp_path), fmt="orc",
                      partition_by_day=False)
    got = spark.read.orc(str(tmp_path / "p" / "ev"))
    assert sorted((r["x"], r["s"]) for r in got.collect()) == \
        [(1, "a"), (2, "b")]


def test_ndjson_envelope_format(spark, tmp_path):
    """Envelope matches S3DatabaseHandler.java:149-221: _time, $schema,
    $table, _user at top level; non-null user fields under properties."""
    cat = Catalog()
    out = _ingest(spark, cat, [
        fabric("t", {"_time": 1500000000000, "_user": "u1",
                     "page": "home", "n": 3, "missing": None})])
    path = str(tmp_path / "ndjson")
    write_ndjson_envelope(out[("testproject", "t")], "testproject", "t", path)

    files = list(Path(path).glob("*.txt.gz"))
    assert files, "expected gzip text output"
    [line] = [ln for f in files
              for ln in gzip.open(f, "rt").read().splitlines()]
    doc = json.loads(line)
    assert doc["$schema"] == "testproject" and doc["$table"] == "t"
    assert doc["_user"] == "u1"
    assert doc["_time"].startswith("2017-07-14T02:40:00")
    assert doc["properties"] == {"page": "home", "n": 3.0}
