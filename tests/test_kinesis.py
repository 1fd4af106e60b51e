"""Kinesis source (S3): the jar-less ``format("kinesis_py")`` Python
DataSource against the file-backed wire-model emulator — per-shard
checkpointed offsets, TRIM_HORIZON/LATEST starts, resharding
(parent-before-child), expired-iterator re-seek, and the full
Kinesis → ingest-pipeline integration.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from rakam_api_collector_spark.sources.kinesis import (
    _KinesisSimpleStreamReader, register)
from rakam_api_collector_spark.sources.kinesis_local import (
    ExpiredIteratorException, LocalKinesisClient)


def _mk(tmp_path, n_shards=2):
    cl = LocalKinesisClient(str(tmp_path / "kin"))
    cl.create_stream("events", ShardCount=n_shards)
    return cl


def _put(cl, shard, *payloads):
    cl.put_records("events", [
        {"Data": p.encode(), "PartitionKey": f"k{i}", "ShardId": shard}
        for i, p in enumerate(payloads)])


# --- emulator wire semantics -------------------------------------------------

def test_emulator_iterators_and_shard_end(tmp_path):
    cl = _mk(tmp_path, n_shards=1)
    sid = "shardId-000000000000"
    _put(cl, sid, "a", "b")

    it = cl.get_shard_iterator("events", sid, "TRIM_HORIZON")
    got = cl.get_records(ShardIterator=it["ShardIterator"])
    assert [r["Data"] for r in got["Records"]] == [b"a", b"b"]
    assert got["NextShardIterator"] is not None     # open shard

    # LATEST sees only what arrives after the iterator
    it = cl.get_shard_iterator("events", sid, "LATEST")
    _put(cl, sid, "c")
    got = cl.get_records(ShardIterator=it["ShardIterator"])
    assert [r["Data"] for r in got["Records"]] == [b"c"]

    # split closes the parent; draining it returns SHARD_END (None)
    kids = cl.split_shard("events", sid)["ChildShards"]
    assert len(kids) == 2
    shards = {s["ShardId"]: s for s in cl.list_shards("events")["Shards"]}
    assert "EndingSequenceNumber" in shards[sid]["SequenceNumberRange"]
    assert all(shards[k]["ParentShardId"] == sid for k in kids)
    it = cl.get_shard_iterator("events", sid, "TRIM_HORIZON")
    got = cl.get_records(ShardIterator=it["ShardIterator"])
    assert len(got["Records"]) == 3
    assert got["NextShardIterator"] is None         # fully consumed

    with pytest.raises(ValueError, match="closed"):
        _put(cl, sid, "late")


def test_emulator_iterator_expiry(tmp_path):
    cl = _mk(tmp_path, n_shards=1)
    _put(cl, "shardId-000000000000", "a")
    it = cl.get_shard_iterator("events", "shardId-000000000000",
                               "TRIM_HORIZON")["ShardIterator"]
    stale = json.dumps({**json.loads(it), "t": 0.0})
    with pytest.raises(ExpiredIteratorException):
        cl.get_records(ShardIterator=stale)


# --- reader offset protocol (no Spark) ---------------------------------------

def _reader(tmp_path, **opts):
    return _KinesisSimpleStreamReader({
        "streamname": "events",
        "endpoint": f"local:{tmp_path / 'kin'}", **opts})


def test_reader_resharding_parent_before_child(tmp_path):
    """A split's children stay locked until the closed parent is
    drained (KCL ordering); nothing is lost or duplicated across the
    reshard; merge parents BOTH gate the merged child."""
    cl = _mk(tmp_path)
    s0, s1 = "shardId-000000000000", "shardId-000000000001"
    _put(cl, s0, "a0", "a1")
    _put(cl, s1, "b0")
    r = _reader(tmp_path)

    rows1, off1 = r.read(r.initialOffset())
    rows1 = list(rows1)
    assert {t[3] for t in rows1} == {b"a0", b"a1", b"b0"}

    kids = cl.split_shard("events", s0)["ChildShards"]
    _put(cl, kids[0], "c0")
    rows2, off2 = r.read(off1)
    rows2 = list(rows2)
    # batch 2 discovers the close, drains the (already-read) parent
    # to SHARD_END; the child unlocks within the same read pass
    assert {t[3] for t in rows2} == {b"c0"}
    assert off2["shards"][s0].get("drained") is True

    # merge the two children: both parents must drain before the
    # merged shard is consumed
    merged = cl.merge_shards("events", kids[0], kids[1])["ChildShards"][0]
    _put(cl, merged, "d0")
    rows3, off3 = r.read(off2)
    assert {t[3] for t in rows3} == {b"d0"}
    assert off3["shards"][kids[0]].get("drained") is True
    assert off3["shards"][kids[1]].get("drained") is True

    # replay determinism: committed ranges refetch identically
    again = list(r.readBetweenOffsets(off1, off2))
    assert {t[3] for t in again} == {b"c0"}


def test_reader_latest_start_and_replay_over_delivers(tmp_path):
    cl = _mk(tmp_path, n_shards=1)
    sid = "shardId-000000000000"
    _put(cl, sid, "old")
    r = _reader(tmp_path, initialposition="LATEST")
    rows1, off1 = r.read(r.initialOffset())
    assert list(rows1) == []                  # pre-start rows skipped
    _put(cl, sid, "new")
    rows2, off2 = r.read(off1)
    assert {t[3] for t in list(rows2)} == {b"new"}
    # replaying the LATEST-start batch must not lose rows: it
    # refetches from the horizon bounded by the committed end seq
    replay = {t[3] for t in r.readBetweenOffsets(off1, off2)}
    assert b"new" in replay

    r2 = _reader(tmp_path)                    # TRIM_HORIZON default
    rows, _ = r2.read(r2.initialOffset())
    assert {t[3] for t in list(rows)} == {b"old", b"new"}


def test_reader_expired_iterator_reseek(tmp_path):
    """An ExpiredIteratorException mid-fetch re-seeks from the last
    owned sequence number and retries once (KCL
    restart-from-checkpoint), not from the horizon."""
    cl = _mk(tmp_path, n_shards=1)
    sid = "shardId-000000000000"
    _put(cl, sid, "a", "b")

    class FlakyClient(LocalKinesisClient):
        fails = [True]

        def get_records(self, ShardIterator, Limit=10_000):
            if self.fails:
                self.fails.pop()
                raise ExpiredIteratorException(ShardIterator)
            return super().get_records(ShardIterator, Limit)

    r = _reader(tmp_path)
    r._cl = FlakyClient(str(tmp_path / "kin"))
    rows, off = r.read(r.initialOffset())
    assert {t[3] for t in list(rows)} == {b"a", b"b"}
    assert off["shards"][sid]["seq"] == "2"


def test_replay_survives_empty_pages_and_throttle(tmp_path):
    """Real GetRecords returns EMPTY pages mid-stream (aged-out gaps,
    internal pagination; MillisBehindLatest > 0) and throttles with
    ProvisionedThroughputExceededException. A committed-range replay
    must follow the iterator / back off and retry — treating either
    as caught-up would silently truncate a committed batch on
    recovery, despite shard data being immutable."""
    cl = _mk(tmp_path, n_shards=1)
    sid = "shardId-000000000000"
    _put(cl, sid, "a", "b", "c")
    r = _reader(tmp_path)
    rows1, off1 = r.read(r.initialOffset())
    assert len(list(rows1)) == 3

    for knob in ("fault_empty_every", "fault_throttle_every"):
        faulty = LocalKinesisClient(str(tmp_path / "kin"))
        setattr(faulty, knob, 2)          # 1st, 3rd, ... call faulted
        r2 = _reader(tmp_path)
        r2._cl = faulty
        replay = list(r2.readBetweenOffsets(r.initialOffset(), off1))
        assert [t[3] for t in replay] == [b"a", b"b", b"c"], knob


def test_live_read_follows_mid_stream_empty_pages(tmp_path):
    """A live batch keeps following NextShardIterator over empty
    mid-stream pages (records lie ahead) instead of under-delivering
    the batch."""
    cl = _mk(tmp_path, n_shards=1)
    _put(cl, "shardId-000000000000", "a", "b")
    faulty = LocalKinesisClient(str(tmp_path / "kin"))
    faulty.fault_empty_every = 2
    r = _reader(tmp_path)
    r._cl = faulty
    rows, _off = r.read(r.initialOffset())
    assert {t[3] for t in list(rows)} == {b"a", b"b"}


def test_expired_live_latest_iterator_does_not_reevaluate_latest(
        tmp_path):
    """A held LATEST iterator that expires between micro-batches
    (trigger interval > iterator TTL) re-seeks AT_TIMESTAMP of the
    original LATEST evaluation — NOT a fresh LATEST, which would
    silently drop every record that arrived in the interim."""
    import time as _time

    cl = _mk(tmp_path, n_shards=1)
    sid = "shardId-000000000000"
    _put(cl, sid, "old")
    _time.sleep(0.01)                     # separate 'old' from birth
    r = _reader(tmp_path, initialposition="LATEST")
    rows1, off1 = r.read(r.initialOffset())
    assert list(rows1) == []              # holds a live LATEST iterator
    _time.sleep(0.01)
    _put(cl, sid, "during")               # arrives while held

    held_it, birth = r._live_iters[sid]
    assert birth is not None
    # force expiry of exactly the held iterator (TTL elapsed)
    r._live_iters[sid] = (
        json.dumps({**json.loads(held_it), "t": 0.0}), birth)
    rows2, _off2 = r.read(off1)
    assert [t[3] for t in list(rows2)] == [b"during"]


def test_reader_max_records_per_shard_bounds_the_batch(tmp_path):
    cl = _mk(tmp_path, n_shards=1)
    sid = "shardId-000000000000"
    _put(cl, sid, *(f"p{i}" for i in range(7)))
    r = _reader(tmp_path, maxrecordspershard="3")
    rows1, off1 = r.read(r.initialOffset())
    assert len(list(rows1)) == 3
    rows2, off2 = r.read(off1)
    assert len(list(rows2)) == 3
    rows3, _ = r.read(off2)
    assert len(list(rows3)) == 1              # the tail


# --- Spark end-to-end ---------------------------------------------------------

def test_kinesis_py_stream_checkpointed(spark, tmp_path):
    """format('kinesis_py') through a real StreamingQuery: drain,
    checkpoint, restart with new records — no reprocessing, no loss,
    schema as declared."""
    cl = _mk(tmp_path)
    s0, s1 = "shardId-000000000000", "shardId-000000000001"
    _put(cl, s0, '{"v": 1}', '{"v": 2}')
    _put(cl, s1, '{"v": 3}')
    register(spark)
    out = str(tmp_path / "out")

    def drain():
        (spark.readStream.format("kinesis_py")
         .option("streamName", "events")
         .option("endpoint", f"local:{tmp_path / 'kin'}")
         .load()
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start()
         .awaitTermination(120))

    drain()
    df = spark.read.parquet(out)
    assert df.columns == ["shard_id", "sequence_number",
                          "partition_key", "value", "arrival_time"]
    assert {r.value for r in df.select("value").collect()} \
        == {b'{"v": 1}', b'{"v": 2}', b'{"v": 3}'}

    _put(cl, s1, '{"v": 4}')
    drain()
    vals = [r.value for r in
            spark.read.parquet(out).select("value").collect()]
    assert sorted(vals) == sorted(
        [b'{"v": 1}', b'{"v": 2}', b'{"v": 3}', b'{"v": 4}'])


def test_kinesis_py_feeds_ingest_pipeline(spark, tmp_path):
    """The reference's Kinesis → buffer → table path end to end: the
    source stream plugs into start_ingest_stream(source_stream=...)
    (the Kafka byte-payload seam) and envelopes land as typed
    collection tables."""
    from rakam_api_collector_spark.ingest import Catalog
    from rakam_api_collector_spark.sinks import read_collection
    from rakam_api_collector_spark.streaming import start_ingest_stream
    from tests.test_ingest import fabric

    cl = _mk(tmp_path, n_shards=1)
    _put(cl, "shardId-000000000000",
         fabric("t", {"_time": "2020-06-01T10:00:00",
                      "_user": "a", "v": 1}),
         fabric("t", {"_time": "2020-06-01T11:00:00",
                      "_user": "b", "v": 2}))
    register(spark)
    src = (spark.readStream.format("kinesis_py")
           .option("streamName", "events")
           .option("endpoint", f"local:{tmp_path / 'kin'}")
           .load())
    cat = Catalog(path=str(tmp_path / "cat.json"))
    start_ingest_stream(
        spark, source_dir=None, fmt="fabric", catalog=cat,
        table_base=str(tmp_path / "tables"),
        checkpoint=str(tmp_path / "ckpt"),
        now="2020-06-01", shard_time="2020-06-01 00:00:00",
        dedup=False, source_stream=src).awaitTermination(120)

    df = read_collection(spark, str(tmp_path / "tables"),
                         "testproject", "t", cat)
    assert sorted(r["v"] for r in df.collect()) == [1.0, 2.0]
    assert sorted(r["_user"] for r in df.select(
        "_user").collect()) == ["a", "b"]


def test_torn_tail_never_reports_shard_end(tmp_path):
    """A torn tail line (a concurrent multi-line append observed
    mid-write) must NOT combine with a closed shard into SHARD_END —
    that would tombstone the in-flight records unread. The iterator
    stays live until the tail reads complete."""
    import json as _json

    from rakam_api_collector_spark.sources.kinesis_local import \
        LocalKinesisClient

    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("s", ShardCount=1)
    s0 = "shardId-000000000000"
    cl.put_records("s", [{"Data": b"a", "PartitionKey": "k",
                          "ShardId": s0}])
    cl.split_shard("s", s0)          # close the shard
    # simulate the torn tail of an append that raced the close: a
    # partial JSON line after the complete record
    with open(cl._rec_path(s0), "a") as f:
        f.write('{"seq": 2, "key": "k", "da')
    it = cl.get_shard_iterator("s", s0, "TRIM_HORIZON")["ShardIterator"]
    resp = cl.get_records(ShardIterator=it)
    assert [r["Data"] for r in resp["Records"]] == [b"a"]
    assert resp["NextShardIterator"] is not None    # NOT drained
    # the write completes: the record is delivered, THEN SHARD_END
    with open(cl._rec_path(s0), "r+") as f:
        content = f.read().rsplit("\n", 1)[0]
        f.seek(0)
        f.truncate()
        f.write(content + "\n" + _json.dumps(
            {"seq": 2, "key": "k",
             "data": "Yg==", "ts": 0.0}) + "\n")
    resp2 = cl.get_records(ShardIterator=resp["NextShardIterator"])
    assert [r["Data"] for r in resp2["Records"]] == [b"b"]
    assert resp2["NextShardIterator"] is None       # drained now
