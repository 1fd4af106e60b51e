"""Executor-parallel ``kinesis_py`` (``readerMode=partitioned``): one
input partition per shard, GetRecords on executors, arrival-time-
windowed offsets. The harness tests drive the planner loop the way
Spark does (initialOffset → latestOffset → partitions → read per
partition) without a JVM; the e2e test runs a real StreamingQuery.

Contract under test (see ``_KinesisPartitionedStreamReader``):
exactly-once across ANY put/split/merge/read interleaving and any
wire-fault cadence, per-shard sequence order, replay determinism of a
committed (start, end] window, parent-records-never-after-child, and
closed-shard pruning.
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

from hypothesis import given, settings
from hypothesis import strategies as st

import rakam_api_collector_spark.sources.kinesis as K
from rakam_api_collector_spark.sources.kinesis import (
    _KinesisPartitionedStreamReader, register)
from rakam_api_collector_spark.sources.kinesis_local import (
    ExpiredIteratorException, LocalKinesisClient)


def _reader(work: str, **extra) -> _KinesisPartitionedStreamReader:
    opts = {"streamname": "s", "endpoint": f"local:{work}",
            "settlemarginms": "0", "throttlebackoffms": "5"}
    opts.update({k.lower(): str(v) for k, v in extra.items()})
    return _KinesisPartitionedStreamReader(opts)


def _drain_batch(reader, start):
    """One planner round, Spark-shaped: plan the end offset, then read
    every partition. The 2 ms sleep stands in for settleMarginMs=0 in
    a single-process harness — it guarantees any LATER put gets a
    strictly later arrival stamp than the committed window edge."""
    end = reader.latestOffset()
    time.sleep(0.002)
    rows, parts = [], reader.partitions(start, end)
    for p in parts:
        rows.extend(reader.read(p))
    return rows, parts, end


def test_partitioned_drain_reshard_exactly_once(tmp_path):
    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("s", ShardCount=1)
    s0 = "shardId-000000000000"
    cl.put_records("s", [{"Data": b"a", "PartitionKey": "k",
                          "ShardId": s0},
                         {"Data": b"b", "PartitionKey": "k",
                          "ShardId": s0}])
    reader = _reader(work)
    off = reader.initialOffset()
    rows1, parts1, off = _drain_batch(reader, off)
    assert sorted(r[3] for r in rows1) == [b"a", b"b"]

    # reshard mid-stream; child records must land exactly once, after
    # every parent record in delivery order
    kids = cl.split_shard("s", s0)["ChildShards"]
    cl.put_records("s", [{"Data": b"c", "PartitionKey": "k",
                          "ShardId": kids[0]}])
    rows2, _p, off = _drain_batch(reader, off)
    assert [r[3] for r in rows2] == [b"c"]
    # nothing re-delivered, nothing pending
    rows3, _p, off = _drain_batch(reader, off)
    assert rows3 == []


def test_partitioned_replay_of_committed_window_is_deterministic(
        tmp_path):
    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("s", ShardCount=2)
    for i in range(6):
        cl.put_records("s", [{
            "Data": f"p{i}".encode(), "PartitionKey": "k",
            "ShardId": f"shardId-{i % 2:012d}"}])
    reader = _reader(work)
    start = reader.initialOffset()
    rows, parts, end = _drain_batch(reader, start)
    # a replay (recovery path: same start/end dicts, fresh partitions)
    # must reproduce the batch exactly — even with records appended
    # AFTER the window committed
    cl.put_records("s", [{"Data": b"late", "PartitionKey": "k",
                          "ShardId": "shardId-000000000000"}])
    replay = []
    for p in reader.partitions(start, end):
        replay.extend(reader.read(p))
    assert sorted(r[1] for r in replay) == sorted(r[1] for r in rows)
    assert sorted(r[3] for r in replay) == sorted(r[3] for r in rows)


def test_partitioned_latest_anchor_and_window_pacing(tmp_path):
    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("s", ShardCount=1)
    cl.put_records("s", [{"Data": b"old", "PartitionKey": "k"}])
    time.sleep(0.002)
    # LATEST: the anchor is the query-start clock, IN the offset —
    # pre-existing records are excluded, later ones delivered
    reader = _reader(work, initialPosition="LATEST")
    off = reader.initialOffset()
    assert off["ts"] > 0
    time.sleep(0.002)
    cl.put_records("s", [{"Data": b"new", "PartitionKey": "k"}])
    rows, _p, off = _drain_batch(reader, off)
    assert [r[3] for r in rows] == [b"new"]

    # pacing: with maxWindowMs=1 every subsequent window is ≤1 ms of
    # stream time — latestOffset must advance in paced slices, never
    # regress, and never jump past wall-minus-margin
    paced = _reader(work, maxWindowMs="1")
    paced.initialOffset()
    e1 = paced.latestOffset()["ts"]
    e2 = paced.latestOffset()["ts"]
    assert 0 <= e2 - e1 <= 1


def test_partitioned_closed_shard_pruned_from_later_windows(tmp_path):
    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("s", ShardCount=1)
    s0 = "shardId-000000000000"
    cl.put_records("s", [{"Data": b"a", "PartitionKey": "k",
                          "ShardId": s0}])
    reader = _reader(work)
    off = reader.initialOffset()
    rows, parts, off = _drain_batch(reader, off)
    assert len(rows) == 1 and {p.shard_id for p in parts} == {s0}
    cl.split_shard("s", s0)
    # first window after the close: the parent may still be planned
    # (its close was only just observed)...
    _r, _p, off = _drain_batch(reader, off)
    # ...but every window that STARTS at or after the observed close
    # time excludes it: 2 child partitions only
    time.sleep(0.002)
    _r2, parts3, off = _drain_batch(reader, off)
    assert s0 not in {p.shard_id for p in parts3}
    assert len(parts3) == 2


def test_partitioned_expired_iterator_reseek_no_dup_no_loss(
        tmp_path, monkeypatch):
    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("s", ShardCount=1)
    cl.put_records("s", [{"Data": f"p{i}".encode(), "PartitionKey": "k"}
                         for i in range(5)])

    calls: dict[str, int] = {}

    class Flaky(LocalKinesisClient):
        """Expires the iterator on a shard's SECOND get_records (after
        records were already consumed), forcing the mid-read
        AT_TIMESTAMP re-seek + the seq dedup guard."""

        def get_records(self, ShardIterator, Limit=10_000):
            sid = json.loads(ShardIterator)["sid"]
            calls[sid] = calls.get(sid, 0) + 1
            if calls[sid] == 2:
                raise ExpiredIteratorException("forced")
            return super().get_records(ShardIterator, Limit)

    monkeypatch.setattr(K, "_make_client", lambda opts: Flaky(work))
    reader = _reader(work)
    off = reader.initialOffset()
    rows, _p, off = _drain_batch(reader, off)
    assert sorted(r[3] for r in rows) \
        == [f"p{i}".encode() for i in range(5)]
    assert max(calls.values()) >= 3     # the re-seek actually happened


_OPS = st.lists(
    st.tuples(st.sampled_from(["put", "split", "merge", "read"]),
              st.integers(0, 10 ** 6)),
    min_size=1, max_size=20)


@settings(max_examples=25, deadline=None)
@given(ops=_OPS, n_shards=st.integers(1, 3),
       fault=st.sampled_from([None, ("localfaultemptyevery", 2),
                              ("localfaultemptyevery", 3),
                              ("localfaultthrottleevery", 3),
                              ("localfaultthrottleevery", 4)]))
def test_partitioned_any_interleaving_exactly_once(ops, n_shards,
                                                   fault):
    """The Simple-mode fuzz contract, partitioned mode: ANY
    put/split/merge/read interleaving (with wire faults injected into
    the executor-side clients via the local* options) delivers every
    record exactly once, in per-shard seq order, with no ancestor's
    record ever delivered after a descendant's."""
    work = tempfile.mkdtemp(prefix="kinpfuzz_")
    try:
        cl = LocalKinesisClient(work)
        cl.create_stream("s", ShardCount=n_shards)
        extra = {fault[0]: fault[1]} if fault else {}
        reader = _reader(work, **extra)

        put_payloads: list[bytes] = []
        lineage: dict[str, list[str]] = {}
        seen_rows: list[tuple] = []
        offset = reader.initialOffset()

        def open_shards():
            return [s["ShardId"] for s in
                    cl.list_shards("s")["Shards"]
                    if "EndingSequenceNumber"
                    not in s["SequenceNumberRange"]]

        def do_read():
            nonlocal offset
            start = offset
            rows, parts, end = _drain_batch(reader, start)
            # replay determinism on the committed window
            replay = []
            for p in reader.partitions(start, end):
                replay.extend(reader.read(p))
            assert sorted(r[1] for r in replay) \
                == sorted(r[1] for r in rows)
            seen_rows.extend(rows)
            offset = end

        counter = 0
        for kind, n in ops:
            alive = open_shards()
            if kind == "put" and alive:
                counter += 1
                payload = f"p{counter}".encode()
                put_payloads.append(payload)
                cl.put_records("s", [{"Data": payload,
                                      "PartitionKey": "k",
                                      "ShardId": alive[n % len(alive)]}])
            elif kind == "split" and alive:
                sid = alive[n % len(alive)]
                for kid in cl.split_shard("s", sid)["ChildShards"]:
                    lineage[kid] = [sid]
            elif kind == "merge" and len(alive) >= 2:
                a = alive[n % len(alive)]
                b = alive[(n + 1) % len(alive)]
                if a == b:
                    continue
                kid = cl.merge_shards("s", a, b)["ChildShards"][0]
                lineage[kid] = [a, b]
            elif kind == "read":
                do_read()

        for _ in range(4):              # final drain
            before = len(seen_rows)
            do_read()
            if len(seen_rows) == before and len(seen_rows) \
                    == len(put_payloads):
                break

        assert sorted(r[3] for r in seen_rows) == sorted(put_payloads)
        per_shard: dict[str, list[int]] = {}
        for r in seen_rows:
            per_shard.setdefault(r[0], []).append(int(r[1]))
        for seqs in per_shard.values():
            assert seqs == sorted(seqs)
        first_at, last_at = {}, {}
        for i, r in enumerate(seen_rows):
            first_at.setdefault(r[0], i)
            last_at[r[0]] = i
        for child, parents in lineage.items():
            for parent in parents:
                if child in first_at and parent in last_at:
                    assert last_at[parent] < first_at[child]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_partitioned_stream_e2e_checkpointed(spark, tmp_path):
    """readerMode=partitioned through a real StreamingQuery: executor-
    side GetRecords, checkpointed time-window offsets, restart picks
    up new records with no reprocessing and no loss."""
    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("events", ShardCount=2)
    s0, s1 = "shardId-000000000000", "shardId-000000000001"
    cl.put_records("events", [
        {"Data": b'{"v": 1}', "PartitionKey": "a", "ShardId": s0},
        {"Data": b'{"v": 2}', "PartitionKey": "b", "ShardId": s0},
        {"Data": b'{"v": 3}', "PartitionKey": "c", "ShardId": s1}])
    register(spark)
    out = str(tmp_path / "out")

    def drain():
        time.sleep(0.01)        # settle: stamps strictly before plan
        (spark.readStream.format("kinesis_py")
         .option("streamName", "events")
         .option("endpoint", f"local:{work}")
         .option("readerMode", "partitioned")
         .option("settleMarginMs", "0")
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

    cl.put_records("events", [
        {"Data": b'{"v": 4}', "PartitionKey": "d", "ShardId": s1}])
    drain()
    vals = [r.value for r in
            spark.read.parquet(out).select("value").collect()]
    assert sorted(vals) == sorted(
        [b'{"v": 1}', b'{"v": 2}', b'{"v": 3}', b'{"v": 4}'])


def test_latest_offset_never_regresses_below_seen_offsets(tmp_path):
    """Clock-regression guard (r12 review): a restarted driver whose
    wall clock lags the checkpointed offset must not plan an end
    below it — partitions()/commit() feed the high-water mark, so the
    next latestOffset clamps up instead of committing a regressed
    offset whose later re-advance would re-deliver rows."""
    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("s", ShardCount=1)
    future = int(time.time() * 1000) + 3_600_000   # clock 1h "ahead"
    reader = _reader(work)
    reader.partitions({"v": 1, "ts": future, "closed": {}},
                      {"v": 1, "ts": future + 1000, "closed": {}})
    assert reader.latestOffset()["ts"] >= future + 1000

    r2 = _reader(work)
    r2.commit({"v": 1, "ts": future, "closed": {}})
    assert r2.latestOffset()["ts"] >= future


def test_reader_mode_typo_raises():
    """A readerMode typo must raise, not silently fall back to the
    driver-side Simple fetch path (the exact bottleneck partitioned
    mode exists to avoid)."""
    import pytest as _pytest

    from rakam_api_collector_spark.sources.kinesis import \
        KinesisPyDataSource

    ds = KinesisPyDataSource(options={"streamname": "s",
                                      "readermode": "partitoned"})
    with _pytest.raises(ValueError, match="readerMode"):
        ds.streamReader(None)


def test_pacing_is_opt_in_and_availablenow_safe(tmp_path):
    """Without maxWindowMs the first planned window reaches now-margin
    directly (an AvailableNow drain captures latestOffset once, so a
    paced default would strand the backlog after one slice)."""
    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("s", ShardCount=1)
    reader = _reader(work)          # no maxWindowMs
    reader.initialOffset()
    now_ms = int(time.time() * 1000)
    assert reader.latestOffset()["ts"] >= now_ms - 5


def test_partitioned_feeds_ingest_pipeline(spark, tmp_path):
    """The reference's Kinesis → buffer → table path with the
    EXECUTOR-PARALLEL reader: partitioned source → byte-payload seam →
    start_ingest_stream → typed collection tables (the Simple-mode
    integration test's twin, proving both reader modes are drop-in
    equivalent at the pipeline seam)."""
    from rakam_api_collector_spark.ingest import Catalog
    from rakam_api_collector_spark.sinks import read_collection
    from rakam_api_collector_spark.streaming import start_ingest_stream
    from tests.test_ingest import fabric

    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("events", ShardCount=2)
    cl.put_records("events", [
        {"Data": fabric("t", {"_time": "2020-06-01T10:00:00",
                              "_user": "a", "v": 1}).encode(),
         "PartitionKey": "a", "ShardId": "shardId-000000000000"},
        {"Data": fabric("t", {"_time": "2020-06-01T11:00:00",
                              "_user": "b", "v": 2}).encode(),
         "PartitionKey": "b", "ShardId": "shardId-000000000001"}])
    register(spark)
    time.sleep(0.01)
    src = (spark.readStream.format("kinesis_py")
           .option("streamName", "events")
           .option("endpoint", f"local:{work}")
           .option("readerMode", "partitioned")
           .option("settleMarginMs", "0")
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


def test_partitioned_slack_recovers_in_window_record_after_ahead_stamp(
        tmp_path):
    """Arrival stamps are only APPROXIMATELY monotone per shard (AWS
    documents no guarantee): an in-window record sequenced after a
    slightly-ahead stamp must still be found. The default stopSlackMs
    keeps scanning past the first out-of-window stamp, and the record
    scanned-but-not-emitted in the slack zone lands exactly once in
    the NEXT window."""
    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("s", ShardCount=1)
    s0 = "shardId-000000000000"
    t0 = time.time()
    cl.put_records("s", [
        {"Data": b"a", "PartitionKey": "k", "ShardId": s0,
         "Ts": t0 - 5.0},
        # service stamp jitter: stamped past the window edge (the
        # first drain's edge is ~wall-clock = ~t0)
        {"Data": b"ahead", "PartitionKey": "k", "ShardId": s0,
         "Ts": t0 + 0.5},
        # in-window but sequenced AFTER the ahead stamp — lost
        # permanently if the scan stops at the first ahead stamp
        {"Data": b"b", "PartitionKey": "k", "ShardId": s0,
         "Ts": t0 - 4.99},
    ])
    reader = _reader(work)
    rows1, _p, off = _drain_batch(reader, reader.initialOffset())
    assert sorted(r[3] for r in rows1) == [b"a", b"b"]
    time.sleep(0.6)              # wall clock passes the ahead stamp
    rows2, _p, off = _drain_batch(reader, off)
    assert [r[3] for r in rows2] == [b"ahead"]   # exactly once
    rows3, _p, off = _drain_batch(reader, off)
    assert rows3 == []


def test_partitioned_zero_slack_is_the_documented_monotone_posture(
        tmp_path):
    """stopSlackMs=0 opts back into trusting strict per-shard stamp
    monotonicity: the scan stops at the first ahead stamp and an
    in-window record sequenced after it is permanently lost — the
    exact failure mode the non-zero default exists to prevent (pinned
    here so the trade-off stays visible, not so it's endorsed)."""
    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("s", ShardCount=1)
    s0 = "shardId-000000000000"
    t0 = time.time()
    cl.put_records("s", [
        {"Data": b"a", "PartitionKey": "k", "ShardId": s0,
         "Ts": t0 - 5.0},
        {"Data": b"ahead", "PartitionKey": "k", "ShardId": s0,
         "Ts": t0 + 0.5},
        {"Data": b"b", "PartitionKey": "k", "ShardId": s0,
         "Ts": t0 - 4.99},
    ])
    reader = _reader(work, stopSlackMs=0)
    rows1, _p, off = _drain_batch(reader, reader.initialOffset())
    assert [r[3] for r in rows1] == [b"a"]       # b never scanned
    time.sleep(0.6)
    rows2, _p, off = _drain_batch(reader, off)
    # the next window's AT_TIMESTAMP re-seek lands past b: only the
    # ahead record arrives; b is gone (s_ms < ts excludes it forever)
    assert [r[3] for r in rows2] == [b"ahead"]


def test_partitioned_missing_arrival_stamp_raises_descriptive(
        tmp_path, monkeypatch):
    """A record with no ApproximateArrivalTimestamp cannot be placed
    in any arrival-time window: the read fails with a descriptive
    error, not an opaque float(None) TypeError."""
    import pytest as _pytest

    work = str(tmp_path / "kin")
    cl = LocalKinesisClient(work)
    cl.create_stream("s", ShardCount=1)
    cl.put_records("s", [{"Data": b"a", "PartitionKey": "k"}])

    class Stampless(LocalKinesisClient):
        def get_records(self, ShardIterator, Limit=10_000):
            resp = super().get_records(ShardIterator, Limit)
            for rec in resp["Records"]:
                rec.pop("ApproximateArrivalTimestamp", None)
            return resp

    monkeypatch.setattr(K, "_make_client", lambda opts: Stampless(work))
    reader = _reader(work)
    off = reader.initialOffset()
    with _pytest.raises(ValueError, match="ApproximateArrivalTimestamp"):
        _drain_batch(reader, off)
