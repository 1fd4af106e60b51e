"""Kafka wire-model twin (S1/S2): the consumer-group semantics the
reference's workers are built on, pinned against the file-backed
broker emulator, plus the ``format("kafka_py")`` streaming source
end-to-end through the ingest pipeline.

What the reference assumes of the wire (the behaviors under test):
- KafkaUtil.java:107-124 — commitSync of ``max consumed offset + 1``
  per topic-partition; a resuming member reads exactly after it.
- KafkaRealTimeWorker.java:158-166 — on assignment, resume from the
  group's committed offset (or auto.offset.reset when none).
- KafkaRealTimeWorker.java:169-222 — poll → flush → commit loop:
  commit-after-flush makes the pipeline at-least-once; records polled
  but not committed before a rebalance are REDELIVERED to the new
  owner; commits from a fenced (stale-generation) member are refused.
"""

from __future__ import annotations

import json
import time

from hypothesis import given, settings
from hypothesis import strategies as st

from rakam_api_collector_spark.sources.kafka import register_kafka_py
from rakam_api_collector_spark.sources.kafka_local import (
    CommitFailedException, ConcurrentProduceError, LocalKafkaBroker,
    LocalKafkaConsumer, commit_sync_max_plus_one, murmur2)


def _mk(tmp_path, topic="t", partitions=2):
    b = LocalKafkaBroker(str(tmp_path / "kafka"))
    b.create_topic(topic, partitions)
    return b


def _vals(polled) -> list[bytes]:
    return [r["value"] for recs in polled.values() for r in recs]


# -- producer / log basics ----------------------------------------------------


def test_produce_partitioning_and_dense_offsets(tmp_path):
    b = _mk(tmp_path, partitions=3)
    # explicit partition wins; keyed routing is stable; dense offsets
    r1 = b.produce("t", [{"Value": b"a", "Partition": 2}])
    r2 = b.produce("t", [{"Value": b"b", "Key": b"k1"},
                         {"Value": b"c", "Key": b"k1"}])
    assert r1[0]["partition"] == 2 and r1[0]["offset"] == 0
    assert r2[0]["partition"] == r2[1]["partition"]   # same key
    assert r2[1]["offset"] == r2[0]["offset"] + 1
    ends = b.end_offsets("t")
    assert sum(ends.values()) == 3
    assert b.beginning_offsets("t") == {0: 0, 1: 0, 2: 0}


def test_murmur2_matches_upstream_kafka_vectors():
    """Wire-identical key routing: the emulator's murmur2 reproduces
    the published test vectors of the public algorithm it implements
    (org.apache.kafka.common.utils.UtilsTest#testMurmur2), so a
    key→partition assertion against the twin holds against a real
    broker running the default partitioner."""
    def signed(h):
        return h - 2 ** 32 if h >= 2 ** 31 else h

    vectors = {
        b"21": -973932308,
        b"foobar": -790332482,
        b"a-little-bit-long-string": -985981536,
        b"a-little-bit-longer-string": -1486304829,
        b"lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8": -58897971,
        b"abc": 479470107,
    }
    for key, want in vectors.items():
        assert signed(murmur2(key)) == want
    # and the partition formula is toPositive(murmur2(key)) % n
    assert (murmur2(b"foobar") & 0x7FFFFFFF) % 3 \
        == (-790332482 + 2 ** 32) % 2 ** 31 % 3


def test_keyed_produce_routes_by_default_partitioner(tmp_path):
    b = _mk(tmp_path, partitions=5)
    out = b.produce("t", [{"Value": b"v", "Key": k}
                          for k in (b"21", b"foobar", b"abc")])
    assert [r["partition"] for r in out] == [
        (murmur2(k) & 0x7FFFFFFF) % 5
        for k in (b"21", b"foobar", b"abc")]


def test_concurrent_produce_fails_loudly(tmp_path):
    """Single-writer misuse must raise, not silently assign duplicate
    offsets: a second writer appending outside produce()'s
    read-modify-write (here: a raw file append, the torn/foreign-write
    stand-in) is detected on the next produce."""
    import pytest

    b = _mk(tmp_path, partitions=1)
    b.produce("t", [{"Value": b"a", "Partition": 0}])
    log = tmp_path / "kafka" / "topics" / "t" / "p0.jsonl"
    with open(log, "a") as f:
        f.write('{"offset": 99}\n')
    with pytest.raises(ConcurrentProduceError):
        b.produce("t", [{"Value": b"b", "Partition": 0}])


def test_fetch_is_an_offset_range_slice(tmp_path):
    b = _mk(tmp_path, partitions=1)
    b.produce("t", [{"Value": f"v{i}".encode(), "Partition": 0}
                    for i in range(10)])
    recs = b.fetch("t", 0, 3, max_records=4)
    assert [r["offset"] for r in recs] == [3, 4, 5, 6]
    # replay of the same range is byte-identical (dense immutable log)
    assert [r["value"] for r in b.fetch("t", 0, 3, 4)] \
        == [r["value"] for r in recs]


# -- the reference's commit discipline ----------------------------------------


def test_commit_sync_max_plus_one_resumes_exactly_after(tmp_path):
    """KafkaUtil.java:107-124: track max offset per partition across
    the flushed batch, commit max+1; a NEW member in the same group
    resumes exactly after — nothing redelivered, nothing skipped."""
    b = _mk(tmp_path, partitions=2)
    b.produce("t", [{"Value": f"v{i}".encode(), "Partition": i % 2}
                    for i in range(6)])
    c1 = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m1",
                            auto_offset_reset="earliest")
    c1.subscribe(["t"])
    polled = c1.poll()
    assert sorted(_vals(polled)) == [f"v{i}".encode() for i in range(6)]
    commit_sync_max_plus_one(c1, polled)
    assert c1.committed(("t", 0)) == 3 and c1.committed(("t", 1)) == 3
    c1.close()

    b.produce("t", [{"Value": b"late", "Partition": 0}])
    c2 = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m2",
                            auto_offset_reset="earliest")
    c2.subscribe(["t"])
    assert _vals(c2.poll()) == [b"late"]      # exactly after the commit


def test_auto_offset_reset_latest_vs_earliest(tmp_path):
    _mk(tmp_path, partitions=1).produce(
        "t", [{"Value": b"old", "Partition": 0}])
    c_lat = LocalKafkaConsumer(str(tmp_path / "kafka"), "g1", "m",
                               auto_offset_reset="latest")
    c_lat.subscribe(["t"])
    assert c_lat.poll() == {}                 # latest skips history
    c_ear = LocalKafkaConsumer(str(tmp_path / "kafka"), "g2", "m",
                               auto_offset_reset="earliest")
    c_ear.subscribe(["t"])
    assert _vals(c_ear.poll()) == [b"old"]


# -- rebalance: replay, fencing, at-least-once ---------------------------------


class _Listener:
    def __init__(self):
        self.revoked, self.assigned = [], []

    def on_partitions_revoked(self, tps):
        self.revoked.append(sorted(tps))

    def on_partitions_assigned(self, tps):
        self.assigned.append(sorted(tps))


def test_rebalance_redelivers_uncommitted_and_fences_stale_commits(
        tmp_path):
    """The at-least-once core: m1 polls everything but commits
    NOTHING before m2 joins. After the rebalance, m1's commit is
    refused (fenced), and the union of both members' polls re-covers
    every record — uncommitted work is redelivered, not lost."""
    b = _mk(tmp_path, partitions=2)
    b.produce("t", [{"Value": f"v{i}".encode(), "Partition": i % 2}
                    for i in range(6)])
    lis = _Listener()
    m1 = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m1",
                            auto_offset_reset="earliest")
    m1.subscribe(["t"], listener=lis)
    polled1 = m1.poll()
    assert len(_vals(polled1)) == 6           # owns both partitions

    m2 = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m2",
                            auto_offset_reset="earliest")
    m2.subscribe(["t"])
    polled2 = m2.poll()                       # triggers m2's join

    # m1's commit carries the pre-join generation: refused
    try:
        commit_sync_max_plus_one(m1, polled1)
        raised = False
    except CommitFailedException:
        raised = True
    assert raised

    # m1 re-polls: rebalance runs (listener fires), position falls
    # back to committed=none → earliest on the partition it kept
    polled1b = m1.poll()
    assert lis.revoked and lis.assigned
    got = sorted(_vals(polled1b) + _vals(polled2))
    assert got == [f"v{i}".encode() for i in range(6)]   # redelivered
    # exactly one partition each (range assignment over 2 members)
    assert len(m1.assignment()) == len(m2.assignment()) == 1


def test_committed_prefix_never_redelivered_across_rebalance(tmp_path):
    """Commit-after-flush: what WAS committed before the rebalance is
    not replayed to the new owner — only the uncommitted tail is."""
    b = _mk(tmp_path, partitions=1)
    b.produce("t", [{"Value": f"v{i}".encode(), "Partition": 0}
                    for i in range(4)])
    m1 = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m1",
                            auto_offset_reset="earliest")
    m1.subscribe(["t"])
    first = m1.poll(max_records=2)
    commit_sync_max_plus_one(m1, first)       # commit offsets 0-1 → 2
    m1.poll(max_records=1)                    # consume v2, do NOT commit
    m1.close()                                # rebalance

    m2 = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m2",
                            auto_offset_reset="earliest")
    m2.subscribe(["t"])
    assert _vals(m2.poll()) == [b"v2", b"v3"]  # tail only, v2 redelivered


def test_pause_resume_holds_position(tmp_path):
    b = _mk(tmp_path, partitions=1)
    b.produce("t", [{"Value": b"x", "Partition": 0}])
    c = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m",
                           auto_offset_reset="earliest")
    c.subscribe(["t"])
    c.pause(c.assignment())
    assert c.poll() == {}                     # paused: no records
    c.resume([("t", 0)])
    assert _vals(c.poll()) == [b"x"]          # position never moved


# -- fuzz: any interleaving is at-least-once -----------------------------------


_OPS = st.lists(
    st.tuples(st.sampled_from(
        ["produce", "poll_commit", "poll_only", "join", "crash"]),
        st.integers(0, 10 ** 6)),
    min_size=1, max_size=16)


@settings(max_examples=30, deadline=None)
@given(ops=_OPS, partitions=st.integers(1, 3))
def test_any_interleaving_is_at_least_once(ops, partitions, tmp_path_factory):
    """ANY interleaving of produce / poll+commit / poll-without-commit
    / member join / member crash (close without committing) delivers
    every produced record to SOME group member at least once, and the
    at-most-once failure (committed-but-never-polled gaps) never
    occurs: the final drain covers exactly the records not yet
    poll+committed."""
    tmp = tmp_path_factory.mktemp("kfuzz")
    path = str(tmp / "kafka")
    b = LocalKafkaBroker(path)
    b.create_topic("t", partitions)
    produced: list[bytes] = []
    delivered: list[bytes] = []
    committed_delivered: list[bytes] = []
    members: list[LocalKafkaConsumer] = []
    n_member = 0

    def new_member():
        nonlocal n_member
        n_member += 1
        c = LocalKafkaConsumer(path, "g", f"m{n_member:03d}",
                               auto_offset_reset="earliest")
        c.subscribe(["t"])
        members.append(c)
        return c

    new_member()
    for op, arg in ops:
        if op == "produce":
            for i in range(1 + arg % 3):
                v = f"r{len(produced)}".encode()
                produced.append(v)
                b.produce("t", [{"Value": v}])
        elif op in ("poll_commit", "poll_only") and members:
            c = members[arg % len(members)]
            polled = c.poll()
            delivered.extend(_vals(polled))
            if op == "poll_commit":
                try:
                    commit_sync_max_plus_one(c, polled)
                    committed_delivered.extend(_vals(polled))
                except CommitFailedException:
                    pass     # fenced mid-rebalance: stays uncommitted
        elif op == "join" and len(members) < 3:
            new_member()
        elif op == "crash" and len(members) > 1:
            members.pop(arg % len(members)).close()

    # final drain: one surviving member consumes everything left
    survivor = members[0]
    for c in members[1:]:
        c.close()
    for _ in range(4):
        polled = survivor.poll(max_records=10 ** 6)
        delivered.extend(_vals(polled))
        if not polled:
            break
    # at-least-once: every produced record was delivered somewhere
    assert set(produced) <= set(delivered)
    # no at-most-once hole: anything the group ever committed past
    # was delivered BEFORE that commit (by construction of
    # commit_sync_max_plus_one over actually-polled records)
    assert set(committed_delivered) <= set(delivered)


# -- format("kafka_py"): the streaming source ----------------------------------


def test_kafka_py_stream_e2e_checkpointed(spark, tmp_path):
    """kafka_py → ingest pipeline → typed collection tables, then a
    RESTART from the checkpoint sees only post-restart records — the
    jar connector's checkpointed-offsets contract (ST7) on the
    emulator."""
    from rakam_api_collector_spark.ingest import Catalog
    from rakam_api_collector_spark.sinks import read_collection
    from rakam_api_collector_spark.streaming import start_ingest_stream
    from tests.test_ingest import fabric

    work = str(tmp_path / "kafka")
    b = LocalKafkaBroker(work)
    b.create_topic("events", partitions=2)
    b.produce("events", [
        {"Value": fabric("t", {"_time": "2020-06-01T10:00:00",
                               "_user": "a", "v": 1}).encode(),
         "Partition": 0},
        {"Value": fabric("t", {"_time": "2020-06-01T11:00:00",
                               "_user": "b", "v": 2}).encode(),
         "Partition": 1}])
    register_kafka_py(spark)
    src = (spark.readStream.format("kafka_py")
           .option("endpoint", f"local:{work}")
           .option("subscribe", "events")
           .option("startingOffsets", "earliest")
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

    # restart: the checkpoint holds the consumed end offsets — only
    # the record produced after the first run arrives
    b.produce("events", [
        {"Value": fabric("t", {"_time": "2020-06-01T12:00:00",
                               "_user": "c", "v": 3}).encode(),
         "Partition": 0}])
    src2 = (spark.readStream.format("kafka_py")
            .option("endpoint", f"local:{work}")
            .option("subscribe", "events")
            .option("startingOffsets", "earliest")
            .load())
    start_ingest_stream(
        spark, source_dir=None, fmt="fabric", catalog=cat,
        table_base=str(tmp_path / "tables"),
        checkpoint=str(tmp_path / "ckpt"),
        now="2020-06-01", shard_time="2020-06-01 00:00:00",
        dedup=False, source_stream=src2).awaitTermination(120)
    df = read_collection(spark, str(tmp_path / "tables"),
                         "testproject", "t", cat)
    assert sorted(r["v"] for r in df.collect()) == [1.0, 2.0, 3.0]


def test_kafka_py_schema_and_metadata_columns(spark, tmp_path):
    """Schema parity with the jar connector: key/value binary, topic,
    partition, offset, timestamp, timestampType — so a pipeline
    written for format('kafka') runs unchanged."""
    work = str(tmp_path / "kafka")
    b = LocalKafkaBroker(work)
    b.create_topic("t", partitions=1)
    b.produce("t", [{"Value": b"v0", "Key": b"k0", "Partition": 0}])
    register_kafka_py(spark)
    src = (spark.readStream.format("kafka_py")
           .option("endpoint", f"local:{work}")
           .option("subscribe", "t")
           .option("startingOffsets", "earliest")
           .load())
    assert [f.name for f in src.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType"]
    out = str(tmp_path / "rows")
    (src.writeStream.format("parquet")
     .option("path", out)
     .option("checkpointLocation", str(tmp_path / "ck"))
     .trigger(availableNow=True).start().awaitTermination(60))
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert bytes(r["key"]) == b"k0" and bytes(r["value"]) == b"v0"
    assert r["topic"] == "t" and r["partition"] == 0 and r["offset"] == 0


def test_kafka_py_max_offsets_per_trigger_paces_not_loses(spark, tmp_path):
    """maxOffsetsPerTrigger clamps each planned batch, and the paced
    batches TOGETHER still deliver every record exactly once (the
    clamp moves the planned end, never skips a range). The backlog is
    produced AFTER the query starts: the very first latestOffset of a
    (re)started query runs without a proration base and is
    deliberately UNCAPPED — a blind synthesized base could regress
    the committed offsets and re-deliver records (review finding,
    r13); pacing engages once planning has a real base."""
    work = str(tmp_path / "kafka")
    b = LocalKafkaBroker(work)
    b.create_topic("t", partitions=2)
    register_kafka_py(spark)
    src = (spark.readStream.format("kafka_py")
           .option("endpoint", f"local:{work}")
           .option("subscribe", "t")
           .option("startingOffsets", "earliest")
           .option("maxOffsetsPerTrigger", "6")
           .load())
    out = str(tmp_path / "rows")
    q = (src.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="1 second").start())
    time.sleep(3)      # let the first (empty) planning rounds set the base
    b.produce("t", [{"Value": f"v{i}".encode(), "Partition": i % 2}
                    for i in range(20)])
    deadline = time.time() + 90
    while time.time() < deadline:
        try:
            if spark.read.parquet(out).count() >= 20:
                break
        except Exception:
            pass
        time.sleep(1)
    q.stop()
    vals = sorted(bytes(r["value"])
                  for r in spark.read.parquet(out).collect())
    assert vals == sorted(f"v{i}".encode() for i in range(20))
    # pacing actually happened: the 20-record backlog needed >= 4
    # capped micro-batches (ceil(20/6)), so >= 4 commits exist
    import os
    commits = [f for f in os.listdir(str(tmp_path / "ck" / "commits"))
               if not f.startswith(".")]
    assert len(commits) >= 4


def test_kafka_py_new_partitions_enter_at_zero(spark, tmp_path):
    """Topic growth mid-stream: records in partitions created after
    the query started are still delivered (from their beginning)."""
    work = str(tmp_path / "kafka")
    b = LocalKafkaBroker(work)
    b.create_topic("t", partitions=1)
    b.produce("t", [{"Value": b"v0", "Partition": 0}])
    register_kafka_py(spark)

    out = str(tmp_path / "rows")

    def drain():
        src = (spark.readStream.format("kafka_py")
               .option("endpoint", f"local:{work}")
               .option("subscribe", "t")
               .option("startingOffsets", "earliest")
               .load())
        (src.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start().awaitTermination(60))

    drain()
    b.create_partitions("t", 2)
    b.produce("t", [{"Value": b"v1", "Partition": 1}])
    drain()
    vals = sorted(bytes(r["value"])
                  for r in spark.read.parquet(out).collect())
    assert vals == [b"v0", b"v1"]


def test_historical_drain_gate_lag_or_staleness(tmp_path):
    """S2's shouldFlush twin (KafkaHistoricalWorker.java:214-219):
    drain fires on EITHER backlog > maxFlushRecords OR cadence
    elapsed, and never below the memory floor."""
    from rakam_api_collector_spark.sources.kafka import (
        historical_drain_due, historical_lag)

    b = _mk(tmp_path, topic="hist", partitions=2)
    b.produce("hist", [{"Value": f"h{i}".encode()} for i in range(7)])
    # no commits yet: the whole log is lag
    assert historical_lag(b, "g", "hist") == 7
    c = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m",
                           auto_offset_reset="earliest")
    c.subscribe(["hist"])
    commit_sync_max_plus_one(c, c.poll(max_records=3))
    assert historical_lag(b, "g", "hist") == 4

    # lag pressure alone fires; small lag alone does not
    assert historical_drain_due(500_001, ms_since_last_drain=0)
    assert not historical_drain_due(4, ms_since_last_drain=0)
    # staleness alone fires (the 30-min cadence)
    assert historical_drain_due(4, ms_since_last_drain=30 * 60 * 1000 + 1)
    # the memory floor vetoes both
    assert not historical_drain_due(500_001, 10 ** 9,
                                    available_memory_pct=0.2)


def test_kafka_py_cap_restart_never_regresses_offsets(spark, tmp_path):
    """The review-finding regression pin: a restarted query with
    startingOffsets=earliest + maxOffsetsPerTrigger must NOT replan
    ends below the checkpointed offsets (a zero-anchored proration
    base did exactly that, re-delivering the whole committed prefix).
    Stop a capped drain mid-backlog, restart, finish — every record
    exactly once."""
    work = str(tmp_path / "kafka")
    b = LocalKafkaBroker(work)
    b.create_topic("t", partitions=2)
    b.produce("t", [{"Value": f"v{i}".encode(), "Partition": i % 2}
                    for i in range(20)])
    register_kafka_py(spark)
    out = str(tmp_path / "rows")

    def run(stop_at: int) -> None:
        src = (spark.readStream.format("kafka_py")
               .option("endpoint", f"local:{work}")
               .option("subscribe", "t")
               .option("startingOffsets", "earliest")
               .option("maxOffsetsPerTrigger", "6")
               .load())
        q = (src.writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(processingTime="1 second").start())
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= stop_at:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        q.stop()

    run(stop_at=6)          # partial drain (the first batch is uncapped,
    run(stop_at=20)         # so >= 6 rows; restart finishes the rest)
    vals = sorted(bytes(r["value"])
                  for r in spark.read.parquet(out).collect())
    assert vals == sorted(f"v{i}".encode() for i in range(20))


def test_resubscribe_changes_topics_and_rebalances(tmp_path):
    """A re-subscribe with a different topic list must rejoin (bump
    the generation) — real Kafka rebalances on subscription change;
    silently keeping the old assignment strands the new topics."""
    b = _mk(tmp_path, topic="a", partitions=1)
    b.create_topic("x", partitions=1)
    b.produce("a", [{"Value": b"va"}])
    b.produce("x", [{"Value": b"vx"}])
    c = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m",
                           auto_offset_reset="earliest")
    c.subscribe(["a"])
    assert _vals(c.poll()) == [b"va"]
    c.subscribe(["x"])
    assert _vals(c.poll()) == [b"vx"]
    assert c.assignment() == [("x", 0)]


def test_heterogeneous_subscriptions_orphan_no_partition(tmp_path):
    """Per-topic range assignment: members with different topic lists
    in ONE group — every partition goes to a subscriber of its topic,
    none is dealt to a member that will never poll it."""
    b = _mk(tmp_path, topic="a", partitions=1)
    b.create_topic("b", partitions=1)
    b.produce("a", [{"Value": b"va"}])
    b.produce("b", [{"Value": b"vb"}])
    m1 = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m1",
                            auto_offset_reset="earliest")
    m2 = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m2",
                            auto_offset_reset="earliest")
    m1.subscribe(["a"])
    m2.subscribe(["b"])
    assert _vals(m1.poll()) == [b"va"]
    assert _vals(m2.poll()) == [b"vb"]
    assert m1.assignment() == [("a", 0)]
    assert m2.assignment() == [("b", 0)]


def test_cap_proration_never_starves_low_lag_partition(tmp_path):
    """Strict-cap largest-remainder alone starves a 1-record partition
    while a fat partition stays lagged; the skip-aging rule bounds the
    wait to <= #lagging partitions batches."""
    from rakam_api_collector_spark.sources.kafka import \
        _KafkaPyStreamReader

    work = str(tmp_path / "kafka")
    b = LocalKafkaBroker(work)
    b.create_topic("t", partitions=2)
    b.produce("t", [{"Value": b"small", "Partition": 0}])
    b.produce("t", [{"Value": f"fat{i}".encode(), "Partition": 1}
                    for i in range(1000)])
    r = _KafkaPyStreamReader({"endpoint": f"local:{work}",
                              "subscribe": "t",
                              "startingoffsets": "earliest",
                              "maxoffsetspertrigger": "6"})
    r.initialOffset()
    served_small = None
    for step in range(6):
        off = r.latestOffset()["offsets"]
        # keep the fat partition lagged forever
        b.produce("t", [{"Value": b"more", "Partition": 1}
                        for _ in range(6)])
        if off["t 0"] >= 1:
            served_small = step
            break
    assert served_small is not None and served_small <= 2


@settings(max_examples=40, deadline=None)
@given(lags0=st.lists(st.integers(0, 50), min_size=1, max_size=6),
       cap=st.integers(1, 20), rounds=st.integers(1, 12))
def test_cap_proration_invariants_fuzz(lags0, cap, rounds):
    """Planner-level invariants of maxOffsetsPerTrigger under ANY lag
    shape and sustained production: (a) planned ends never regress
    below the base, (b) when clamping engages the batch total never
    exceeds the cap (strict — the floor-at-1 overshoot class), (c) a
    continuously-lagging partition is served within ~#partitions
    batches (the skip-aging bound)."""
    from rakam_api_collector_spark.sources.kafka import \
        _KafkaPyStreamReader

    r = _KafkaPyStreamReader({"endpoint": "local:/nonexistent",
                              "subscribe": "t",
                              "startingoffsets": "earliest",
                              "maxoffsetspertrigger": str(cap)})
    n = len(lags0)
    log_ends = {f"t {i}": lags0[i] for i in range(n)}
    r._ends = lambda: dict(log_ends)
    base = {tp: 0 for tp in log_ends}
    r._last_planned = dict(base)      # post-initialOffset state
    waiting = {tp: 0 for tp in log_ends}
    for _ in range(rounds):
        planned = r.latestOffset()["offsets"]
        allocated = {tp: planned[tp] - base[tp] for tp in planned}
        assert all(v >= 0 for v in allocated.values()), "regression"
        lagged = {tp for tp in base if log_ends[tp] > base[tp]}
        if sum(log_ends[tp] - base[tp] for tp in lagged) > cap:
            assert sum(allocated.values()) <= cap, "cap exceeded"
        for tp in lagged:
            if allocated.get(tp, 0) > 0:
                waiting[tp] = 0
            else:
                waiting[tp] += 1
                assert waiting[tp] <= n + 2, "starved"
        base = dict(planned)
        # keep alternating partitions permanently hot (sustained
        # unequal load — the starvation regime)
        for i, tp in enumerate(sorted(log_ends)):
            if i % 2 == 0:
                log_ends[tp] += 7


def test_historical_drain_cycle_gate_drain_gate(spark, tmp_path):
    """S2's full cycle on the Spark-checkpoint path: lag accumulates
    on the historical topic → the gate fires (lag > maxFlushRecords)
    → an availableNow drain through the ingest pipeline consumes it →
    the gate measured against the query's OWN checkpoint reads zero
    lag and stops firing (until staleness re-arms it)."""
    from rakam_api_collector_spark.ingest import Catalog
    from rakam_api_collector_spark.sinks import read_collection
    from rakam_api_collector_spark.sources.kafka import (
        checkpoint_lag, historical_drain_due)
    from rakam_api_collector_spark.streaming import start_ingest_stream
    from tests.test_ingest import fabric

    work = str(tmp_path / "kafka")
    b = LocalKafkaBroker(work)
    b.create_topic("hist", partitions=2)
    b.produce("hist", [
        {"Value": fabric("t", {"_time": "2020-06-01T10:00:00",
                               "_user": f"u{i}", "v": i}).encode()}
        for i in range(6)])
    ckpt = str(tmp_path / "ckpt")
    lag = checkpoint_lag(ckpt, b, ["hist"])
    assert lag == 6                       # no checkpoint yet: whole log
    assert historical_drain_due(lag, ms_since_last_drain=0,
                                max_flush_records=5)

    register_kafka_py(spark)
    src = (spark.readStream.format("kafka_py")
           .option("endpoint", f"local:{work}")
           .option("subscribe", "hist")
           .option("startingOffsets", "earliest")
           .load())
    cat = Catalog(path=str(tmp_path / "cat.json"))
    start_ingest_stream(
        spark, source_dir=None, fmt="fabric", catalog=cat,
        table_base=str(tmp_path / "tables"), checkpoint=ckpt,
        now="2020-06-01", shard_time="2020-06-01 00:00:00",
        dedup=False, source_stream=src).awaitTermination(120)

    assert checkpoint_lag(ckpt, b, ["hist"]) == 0     # drained
    assert not historical_drain_due(0, ms_since_last_drain=0,
                                    max_flush_records=5)
    # staleness alone re-arms the gate even at zero lag? No — the
    # reference drains on EITHER condition, so a 30-min-stale zero-lag
    # drain runs (and reads nothing); pin the OR shape
    assert historical_drain_due(0, ms_since_last_drain=31 * 60 * 1000,
                                max_flush_records=5)

    df = read_collection(spark, str(tmp_path / "tables"),
                         "testproject", "t", cat)
    assert df.count() == 6


@settings(max_examples=60, deadline=None)
@given(subs=st.dictionaries(
    st.sampled_from([f"m{i}" for i in range(4)]),
    st.lists(st.sampled_from(["a", "b", "c"]), max_size=3,
             unique=True),
    min_size=1, max_size=4),
    parts=st.dictionaries(st.sampled_from(["a", "b", "c"]),
                          st.integers(1, 5), min_size=1, max_size=3))
def test_range_assignment_properties(subs, parts):
    """For ANY member/subscription/partition shape: every partition of
    a subscribed topic is assigned exactly once, only to a subscriber
    of that topic, balanced within one partition per topic among that
    topic's subscribers, and deterministically."""
    from rakam_api_collector_spark.sources.kafka_local import \
        range_assignment

    pbt = {t: list(range(n)) for t, n in parts.items()}
    out = range_assignment(subs, pbt)
    assert range_assignment(dict(reversed(list(subs.items()))),
                            pbt) == out      # deterministic
    seen = [tp for tps in out.values() for tp in tps]
    assert len(seen) == len(set(seen))       # exactly once
    for m, tps in out.items():
        for (t, p) in tps:
            assert t in subs[m]              # only subscribers
    for t, ps in pbt.items():
        owners = {m for m, tps in out.items()
                  for (tt, _p) in tps if tt == t}
        t_subs = {m for m, ts in subs.items() if t in ts}
        covered = {p for m, tps in out.items()
                   for (tt, p) in tps if tt == t}
        if t_subs:
            assert covered == set(ps)        # full coverage
            counts = [sum(1 for (tt, _p) in out[m] if tt == t)
                      for m in t_subs]
            assert max(counts) - min(counts) <= 1   # balanced
        else:
            assert not owners                # unsubscribed: unassigned


def test_kafka_py_feeds_streaming_corpus_dedup(spark, tmp_path):
    """The LLM-pipeline integration: documents arriving over the
    Kafka source stream into the persistent-signature corpus dedup
    (streaming/dedupstream.py) — a near-duplicate produced in a LATER
    burst is rejected against the signature store built from the
    earlier one, across separate micro-batches."""
    from pyspark.sql import functions as F

    from rakam_api_collector_spark.streaming.dedupstream import \
        start_corpus_dedup_stream

    work = str(tmp_path / "kafka")
    b = LocalKafkaBroker(work)
    b.create_topic("docs", partitions=2)
    base = ("the quick brown fox jumps over the lazy dog and then "
            "wanders far away into the quiet hills before dusk")

    def doc(i, text):
        return json.dumps({"doc_id": i, "text": text}).encode()

    b.produce("docs", [{"Value": doc(1, base)},
                       {"Value": doc(2, "an entirely different text "
                                        "about spark streaming and "
                                        "checkpointed state stores")}])
    register_kafka_py(spark)

    def run_drain() -> None:
        src = (spark.readStream.format("kafka_py")
               .option("endpoint", f"local:{work}")
               .option("subscribe", "docs")
               .option("startingOffsets", "earliest")
               .load()
               .select(F.col("value").cast("string").alias("_j"))
               .select(
                   F.get_json_object("_j", "$.doc_id").cast("long")
                   .alias("doc_id"),
                   F.get_json_object("_j", "$.text").alias("text")))
        q = start_corpus_dedup_stream(
            spark, None, store_path=str(tmp_path / "store"),
            id_col="doc_id", text_col="text",
            checkpoint=str(tmp_path / "ckpt"),
            verdicts_dir=str(tmp_path / "verdicts"),
            survivors_dir=str(tmp_path / "survivors"),
            trigger={"availableNow": True}, source_stream=src)
        assert q.awaitTermination(120)   # a live q must never overlap q2

    run_drain()

    # burst 2: a near-dup of doc 1 (one word changed) + a fresh doc,
    # judged by a NEW query against the persisted store
    b.produce("docs", [{"Value": doc(3, base.replace("dog", "cat"))},
                       {"Value": doc(4, "completely novel content on "
                                        "perceptual hashing of media "
                                        "assets at corpus scale")}])
    run_drain()

    survivors = sorted(r["doc_id"] for r in spark.read.parquet(
        str(tmp_path / "survivors")).select("doc_id").collect())
    assert survivors == [1, 2, 4]          # 3 deduped against 1
    verdicts = {r["doc_id"]: r for r in spark.read.parquet(
        str(tmp_path / "verdicts")).collect()}
    assert not verdicts[3]["keep"]
    assert verdicts[3]["matched_id"] == 1


def test_poll_rotates_partitions_no_fetch_starvation(tmp_path):
    """A hot first partition must not exhaust every poll's budget:
    the fetcher rotates which assigned partition is served first
    (real Kafka's fairness posture), so a backlogged second partition
    is served within a bounded number of polls under sustained
    production into the hot one."""
    b = _mk(tmp_path, partitions=2)
    b.produce("t", [{"Value": b"cold", "Partition": 1}])
    c = LocalKafkaConsumer(str(tmp_path / "kafka"), "g", "m",
                           auto_offset_reset="earliest")
    c.subscribe(["t"])
    served_cold = None
    for i in range(4):
        # keep partition 0 hotter than the budget every round
        b.produce("t", [{"Value": b"hot", "Partition": 0}
                        for _ in range(8)])
        polled = c.poll(max_records=5)
        if any(r["value"] == b"cold" for r in _vals_rows(polled)):
            served_cold = i
            break
    assert served_cold is not None and served_cold <= 1


def _vals_rows(polled):
    return [r for recs in polled.values() for r in recs]


def test_late_data_loop_realtime_to_historical_to_same_table(
        spark, tmp_path):
    """The FULL reference late-data loop walked by single records, end
    to end on the Kafka twin: realtime kafka_py stream → event-time
    late split (ST3, KafkaRealTimeWorker.java:294-328) → historical
    producer re-publishing the late envelopes to the historical TOPIC
    (K3, KafkaHistoricalDataHandler.java:41-69) → drain gate over the
    drain query's own checkpoint (S2) → availableNow drain (ST5,
    KafkaHistoricalWorker.java:157-219) → the SAME collection table —
    asserting exactly-once table parity with the plain batch path.
    Every stage is individually pinned elsewhere; this test is the
    one walk-through of all of them."""
    from rakam_api_collector_spark.ingest import Catalog
    from rakam_api_collector_spark.ingest.batch import ingest_batch
    from rakam_api_collector_spark.sinks import read_collection
    from rakam_api_collector_spark.sources.kafka import (
        checkpoint_lag, historical_drain_due, historical_producer_for)
    from rakam_api_collector_spark.streaming import start_ingest_stream
    from tests.test_ingest import fabric

    work = str(tmp_path / "kafka")
    b = LocalKafkaBroker(work)
    b.create_topic("rt", partitions=2)
    b.create_topic("hist", partitions=2)
    fresh = [fabric("t", {"_time": f"2020-06-01T10:00:{i:02d}",
                          "_user": f"u{i}", "v": i}) for i in range(8)]
    late = [fabric("t", {"_time": f"2020-01-0{i + 1}T10:00:00",
                         "_user": f"L{i}", "v": 100 + i})
            for i in range(4)]
    b.produce("rt", [{"Value": e.encode()} for e in fresh + late])

    register_kafka_py(spark)
    cat = Catalog(path=str(tmp_path / "cat.json"))
    tables = str(tmp_path / "tables")
    ck_hist = str(tmp_path / "ck_hist")

    rt_src = (spark.readStream.format("kafka_py")
              .option("endpoint", f"local:{work}")
              .option("subscribe", "rt")
              .option("startingOffsets", "earliest").load())
    start_ingest_stream(
        spark, source_dir=None, fmt="fabric", catalog=cat,
        table_base=tables, checkpoint=str(tmp_path / "ck_rt"),
        now="2020-06-01", shard_time="2020-06-01 00:00:00",
        dedup=False, source_stream=rt_src,
        historical_producer=historical_producer_for(b, "hist"),
    ).awaitTermination(120)

    # ST3+K3: the hot path committed only the fresh rows; the late
    # envelopes sit on the historical topic, verbatim
    assert read_collection(spark, tables, "testproject", "t",
                           cat).count() == len(fresh)
    assert b.end_offsets("hist") != {0: 0, 1: 0}
    lag = checkpoint_lag(ck_hist, b, ["hist"])
    assert lag == len(late)
    assert historical_drain_due(lag, ms_since_last_drain=0,
                                max_flush_records=3)

    def drain():
        src = (spark.readStream.format("kafka_py")
               .option("endpoint", f"local:{work}")
               .option("subscribe", "hist")
               .option("startingOffsets", "earliest").load())
        # dedup=True is load-bearing: the handoff's epoch markers make
        # re-publish idempotent across epoch REPLAYS, but the crash
        # window between produce and marker write stays at-least-once
        # — the drain's TTL dedup (ST6) is what absorbs it, the same
        # composition the reference's Deduplicator provides
        start_ingest_stream(
            spark, source_dir=None, fmt="fabric", catalog=cat,
            table_base=tables, checkpoint=ck_hist,
            now="2020-06-01", shard_time="2020-06-01 00:00:00",
            dedup=True, source_stream=src).awaitTermination(120)

    drain()
    assert checkpoint_lag(ck_hist, b, ["hist"]) == 0
    assert not historical_drain_due(0, ms_since_last_drain=0,
                                    max_flush_records=3)

    # exactly-once: a second drain from the same checkpoint reads the
    # already-committed prefix as planned, re-delivers nothing
    drain()
    got = read_collection(spark, tables, "testproject", "t", cat)
    assert got.count() == len(fresh) + len(late)

    # table parity with the plain batch path over the same envelopes
    batch = ingest_batch(
        spark, spark.createDataFrame([(e,) for e in fresh + late],
                                     "value string"),
        "fabric", Catalog(path=str(tmp_path / "cat2.json")),
        shard_time="2020-06-01 00:00:00")[("testproject", "t")]
    key = lambda r: (r["_user"], r["v"], str(r["_time"]))  # noqa: E731
    assert sorted(key(r) for r in got.collect()) \
        == sorted(key(r) for r in batch.collect())


def test_checkpointed_offsets_positional_selection(tmp_path):
    """The offset-file parser is positional, blank-tolerant, and
    shape-checked: Spark writes `v1`, a metadata line that MAY be
    empty (metadataOpt.getOrElse("")), then one line per source in
    source order — so source_index must index from line 2 without
    dropping blank lines, and a non-kafka_py source line returns None
    rather than someone else's offsets."""
    from rakam_api_collector_spark.sources.kafka import \
        checkpointed_offsets

    d = tmp_path / "ck" / "offsets"
    d.mkdir(parents=True)
    (d / "3").write_text(
        "v1\n"
        "\n"                                   # EMPTY metadata line
        '{"offsets": {"t 0": 7, "t 1": 9}}\n'  # source 0: kafka_py
        "12345\n"                              # source 1: rate-like
        '{"offsets": {"u 0": 2}}\n')           # source 2: another one
    ck = str(tmp_path / "ck")
    assert checkpointed_offsets(ck) == {"t 0": 7, "t 1": 9}
    assert checkpointed_offsets(ck, source_index=0) \
        == {"t 0": 7, "t 1": 9}
    assert checkpointed_offsets(ck, source_index=1) is None   # not ours
    assert checkpointed_offsets(ck, source_index=2) == {"u 0": 2}
    assert checkpointed_offsets(ck, source_index=9) is None   # OOB
    # highest batch file wins
    (d / "10").write_text("v1\n\n" '{"offsets": {"t 0": 50}}\n')
    assert checkpointed_offsets(ck) == {"t 0": 50}


def test_historical_producer_and_dir_conflict_raises(spark, tmp_path):
    """Exactly one K3 channel: passing both the topic producer and the
    spool dir raises instead of silently preferring one."""
    import pytest

    from rakam_api_collector_spark.ingest import Catalog
    from rakam_api_collector_spark.streaming import start_ingest_stream

    with pytest.raises(ValueError, match="not both"):
        start_ingest_stream(
            spark, source_dir=str(tmp_path / "src"), fmt="fabric",
            catalog=Catalog(), table_base=str(tmp_path / "t"),
            checkpoint=str(tmp_path / "ck"),
            historical_dir=str(tmp_path / "hist"),
            historical_producer=lambda df: None)


def test_two_kafka_py_sources_offsets_by_position(spark, tmp_path):
    """Against the ENGINE's own checkpoint writes (not a synthetic
    file): a union of TWO kafka_py sources produces one offsets line
    per source in logical-plan order after the v1 header + metadata
    line, and checkpointed_offsets(ck, i)/checkpoint_lag(..., i)
    select each source's progress by position — the multi-source case
    the positional rewrite exists for."""
    from rakam_api_collector_spark.sources.kafka import (
        checkpoint_lag, checkpointed_offsets)

    work = str(tmp_path / "kafka")
    b = LocalKafkaBroker(work)
    b.create_topic("a", 2)
    b.create_topic("z", 1)
    b.produce("a", [{"Value": f"a{i}".encode(), "Partition": i % 2}
                    for i in range(6)])
    b.produce("z", [{"Value": f"z{i}".encode(), "Partition": 0}
                    for i in range(3)])
    register_kafka_py(spark)

    def src(topic):
        return (spark.readStream.format("kafka_py")
                .option("endpoint", f"local:{work}")
                .option("subscribe", topic)
                .option("startingOffsets", "earliest").load()
                .selectExpr("CAST(value AS STRING) AS value"))

    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    (src("a").unionByName(src("z"))
     .writeStream.format("parquet").option("path", out)
     .option("checkpointLocation", ck)
     .trigger(availableNow=True).start().awaitTermination(120))

    assert spark.read.parquet(out).count() == 9
    assert checkpointed_offsets(ck, 0) == {"a 0": 3, "a 1": 3}
    assert checkpointed_offsets(ck, 1) == {"z 0": 3}
    assert checkpoint_lag(ck, b, ["a"], source_index=0) == 0
    assert checkpoint_lag(ck, b, ["z"], source_index=1) == 0
    # the wrong index against the wrong topic over-counts — exactly
    # the skew the positional API prevents
    assert checkpoint_lag(ck, b, ["z"], source_index=0) == 3


def test_historical_handoff_idempotent_across_epoch_replay(
        spark, tmp_path):
    """Epoch REPLAY must not re-publish late envelopes: a crash
    injected AFTER the handoff (and after the table commit) fails the
    query mid-epoch; the restarted query replays the epoch through
    process(), and the checkpoint's hist_published marker skips the
    re-publish — the historical topic carries each late envelope
    exactly once. (The produce-then-crash-before-marker window stays
    at-least-once by design; the drain's dedup absorbs it — the
    composition the loop test asserts.)"""
    import os

    import pyspark.errors

    from rakam_api_collector_spark.ingest import Catalog
    from rakam_api_collector_spark.sources.kafka import \
        historical_producer_for
    from rakam_api_collector_spark.streaming import start_ingest_stream
    from tests.test_ingest import fabric

    work = str(tmp_path / "kafka")
    b = LocalKafkaBroker(work)
    b.create_topic("rt", partitions=1)
    b.create_topic("hist", partitions=1)
    b.produce("rt", [{"Value": fabric(
        "t", {"_time": "2020-06-01T10:00:00", "_user": "u0", "v": 0})
        .encode()},
        {"Value": fabric(
            "t", {"_time": "2020-01-01T10:00:00", "_user": "L0",
                  "v": 1}).encode()}])
    register_kafka_py(spark)
    cat = Catalog(path=str(tmp_path / "cat.json"))
    flag = str(tmp_path / "crashed_once")

    class FlakyStats:
        def add(self, project, collection, n):
            if not os.path.exists(flag):
                open(flag, "w").close()
                raise RuntimeError("injected post-handoff crash")

    def run(stats):
        src = (spark.readStream.format("kafka_py")
               .option("endpoint", f"local:{work}")
               .option("subscribe", "rt")
               .option("startingOffsets", "earliest").load())
        q = start_ingest_stream(
            spark, source_dir=None, fmt="fabric", catalog=cat,
            table_base=str(tmp_path / "tables"),
            checkpoint=str(tmp_path / "ck"),
            now="2020-06-01", shard_time="2020-06-01 00:00:00",
            dedup=False, source_stream=src, stats=stats,
            historical_producer=historical_producer_for(b, "hist"))
        q.awaitTermination(120)

    try:
        run(FlakyStats())
        raise AssertionError("injected crash did not surface")
    except pyspark.errors.exceptions.captured.StreamingQueryException:
        pass
    assert os.path.exists(flag)
    assert b.end_offsets("hist") == {0: 1}   # published before crash

    run(None)                                # replay of the epoch
    assert b.end_offsets("hist") == {0: 1}   # NOT published twice
