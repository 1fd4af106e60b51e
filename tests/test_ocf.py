"""Avro Object Container File reading (ingest/ocf.py): header/block
framing with untrusted bounds, both codecs, the supported type
universe incl. logical types and unions, schema-drift policy, and the
Spark scan path.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rakam_api_collector_spark.ingest.ocf import (parse_ocf,
                                                  read_avro_ocf,
                                                  schema_of, write_ocf)

SCHEMA = json.dumps({
    "type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": ["double", "null"]},
        {"name": "ok", "type": "boolean"},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-millis"}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map",
                                   "values": ["null", "long"]}},
    ]})

ROWS = [
    [1, "alpha", 0.5, True, 19000, 1_600_000_000_000, ["a", "b"],
     {"k": 7, "z": None}],
    [2, None, None, False, 19001, 1_600_000_060_000, [], {}],
    [3, "gamma", -1.25, True, 19002, 1_600_000_120_000, ["x"],
     {"m": 42}],
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
@pytest.mark.parametrize("per_block", [None, 1, 2])
def test_roundtrip_codecs_and_blocking(codec, per_block):
    blob = write_ocf(SCHEMA, ROWS, codec=codec,
                     rows_per_block=per_block)
    sj, c, rows = parse_ocf(blob)
    assert c == codec and json.loads(sj) == json.loads(SCHEMA)
    assert list(rows) == ROWS


def test_untrusted_bounds_and_unsupported_raise():
    blob = write_ocf(SCHEMA, ROWS)
    with pytest.raises(ValueError, match="bad magic"):
        parse_ocf(b"PAR1" + blob[4:])
    # block byte-size past EOF
    i = blob.index(b"\x07" * 16) + 16     # first block header follows
    import rakam_api_collector_spark.ingest.avro as A
    bad = blob[:i] + A._write_long(3) + A._write_long(10**9) \
        + blob[i + 2:]
    with pytest.raises(ValueError, match="past end of file"):
        list(parse_ocf(bad)[2])
    # sync mismatch
    bad2 = blob[:-8] + b"\x00" * 8
    with pytest.raises(ValueError, match="sync marker"):
        list(parse_ocf(bad2)[2])
    # unsupported constructs raise with names
    k = blob.index(b"avro.codec") + len(b"avro.codec") + 1  # len varint
    with pytest.raises(ValueError, match="codec"):
        parse_ocf(blob[:k] + b"zstd" + blob[k + 4:])
    with pytest.raises(ValueError, match="union"):
        schema_of(json.dumps({"type": "record", "name": "r", "fields":
                              [{"name": "u",
                                "type": ["null", "long", "string"]}]}))
    with pytest.raises(ValueError, match="enum|record nesting"):
        schema_of(json.dumps({"type": "record", "name": "r", "fields":
                              [{"name": "e", "type":
                                {"type": "enum", "name": "c",
                                 "symbols": ["A"]}}]}))


def test_read_avro_ocf_spark(spark, tmp_path):
    """Plan-time schema from the first header; logical types land as
    real date/timestamp columns; a corrupt file and a schema-drifted
    file drop under skip_invalid and raise without it."""
    d = tmp_path / "lake"
    d.mkdir()
    (d / "a.avro").write_bytes(write_ocf(SCHEMA, ROWS[:2],
                                         codec="deflate"))
    (d / "b.avro").write_bytes(write_ocf(SCHEMA, ROWS[2:],
                                         rows_per_block=1))
    (d / "corrupt.avro").write_bytes(b"Obj\x01garbage")
    other = json.dumps({"type": "record", "name": "x", "fields":
                        [{"name": "id", "type": "long"}]})
    (d / "drift.avro").write_bytes(write_ocf(other, [[9]]))

    df = read_avro_ocf(spark, str(d))
    assert [f.name for f in df.schema.fields] \
        == ["_path", "id", "name", "score", "ok", "day", "ts",
            "tags", "attrs"]
    got = {r.id: r for r in df.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].name == "alpha" and got[2].name is None
    assert str(got[1].day) == "2022-01-08"          # epoch-day 19000
    assert got[1].ts.year == 2020                   # 2020-09-13 UTC
    assert got[1].tags == ["a", "b"] and got[1].attrs["k"] == 7
    assert got[3].attrs == {"m": 42}

    with pytest.raises(Exception, match="drift|garbage|header"):
        read_avro_ocf(spark, str(d), skip_invalid=False).count()


def test_read_avro_ocf_no_partial_rows_from_dropped_file(spark, tmp_path):
    """skip_invalid drops a mid-decode-failing file WHOLE: rows
    already decoded from its earlier valid blocks must not leak into
    the output next to the good files' rows (all-or-nothing per
    file)."""
    d = tmp_path / "lake"
    d.mkdir()
    (d / "good.avro").write_bytes(write_ocf(SCHEMA, ROWS[:1]))
    # two blocks; truncation breaks block 2 AFTER block 1 (rows with
    # id 1 and 2) decodes cleanly — those rows must not appear
    bad = write_ocf(SCHEMA, ROWS, rows_per_block=2)
    (d / "bad.avro").write_bytes(bad[:-7])
    assert [r.id for r in read_avro_ocf(spark, str(d)).collect()] == [1]


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(st.tuples(
    st.integers(-2**62, 2**62),
    st.one_of(st.none(), st.text(max_size=20)),
    st.lists(st.text(max_size=8), max_size=4)), max_size=8),
    codec=st.sampled_from(["null", "deflate"]),
    per=st.integers(1, 3))
def test_roundtrip_property(vals, codec, per):
    schema = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "n", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "xs", "type": {"type": "array", "items": "string"}}]})
    rows = [list(v) for v in vals]
    _sj, _c, it = parse_ocf(write_ocf(schema, rows, codec=codec,
                                      rows_per_block=per))
    assert list(it) == rows
