"""Streaming lifecycle tests (ST1-ST7): late split + re-promotion,
stateful dedup, end-state parity stream-vs-batch, historical replay.
Mirrors the reference stress shape (KafkaStressTest.java:107-137) at
test scale.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from rakam_api_collector_spark.ingest import Catalog, ingest_batch
from rakam_api_collector_spark.sinks import read_collection
from rakam_api_collector_spark.streaming import (
    split_late,
    start_historical_stream,
    start_ingest_stream,
)
from tests.test_ingest import fabric

NOW = "2020-06-01"
SHARD_T = "2020-06-01 00:00:00"


# --- ST3/ST4 late split ------------------------------------------------------

def _ts_df(spark, ts_list):
    return spark.createDataFrame([(t,) for t in ts_list], ["_time"]) \
        .select(F.col("_time").cast("timestamp"))


def test_split_late_day_window(spark):
    rt, hist = split_late(
        _ts_df(spark, ["2020-06-01 10:00:00", "2020-05-31 09:00:00",
                       "2020-05-29 08:00:00", None]),
        now=NOW, outdated_day_index=1)
    assert rt.count() == 2          # today + yesterday
    assert hist.count() == 2        # old day + null time


def test_split_late_repromotion(spark):
    """An old day with >N records and >25% of the batch is a backfill
    and stays real-time (KafkaRealTimeWorker.java:370-384)."""
    old_bulk = ["2020-05-01 00:00:00"] * 30
    fresh = ["2020-06-01 00:00:00"] * 10
    stray = ["2020-04-01 00:00:00"] * 5
    rt, hist = split_late(_ts_df(spark, old_bulk + fresh + stray),
                          now=NOW, promote_min_records=20,
                          promote_min_fraction=0.25)
    assert rt.count() == 40         # fresh + promoted bulk day
    assert hist.count() == 5        # stray old day below both thresholds


# --- end-to-end stream -------------------------------------------------------

def _write_lines(path: Path, lines: list[str], name: str = "batch.json"):
    path.mkdir(parents=True, exist_ok=True)
    (path / name).write_text("\n".join(lines) + "\n")


def test_stream_end_state_matches_batch(spark, tmp_path):
    """SURVEY §7 Phase 2 exit test: the streaming pipeline over the same
    envelopes produces the same end state as batch ingest_batch."""
    lines = [fabric("t", {"_time": "2020-06-01T10:00:0%d" % i,
                          "_user": f"u{i}", "v": i}) for i in range(5)]
    src = tmp_path / "src"
    _write_lines(src, lines)

    stream_cat = Catalog()
    q = start_ingest_stream(
        spark, str(src), "fabric", stream_cat,
        table_base=str(tmp_path / "stream_tables"),
        checkpoint=str(tmp_path / "ckpt"),
        now=NOW, shard_time=SHARD_T, dedup=True)
    q.awaitTermination(120)

    batch_cat = Catalog()
    raw = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    batch_out = ingest_batch(spark, raw, "fabric", batch_cat,
                             shard_time=SHARD_T)

    streamed = read_collection(spark, str(tmp_path / "stream_tables"),
                               "testproject", "t", stream_cat) \
        .drop("_day").orderBy("v")
    batched = batch_out[("testproject", "t")].orderBy("v")
    assert streamed.columns == batched.columns
    assert [r.asDict() for r in streamed.collect()] == \
           [r.asDict() for r in batched.collect()]


def test_stream_dead_letter_spool(spark, tmp_path):
    """errors_dir: envelopes the router/parser would drop (unparseable
    body, >100-char collection name) land in the dead-letter spool as
    replayable raw values; valid rows ingest normally."""
    good = fabric("t", {"_time": "2020-06-01T10:00:00",
                        "_user": "u1", "v": 1})
    not_json = '{"id": 1, "metadata": {}, "data": {broken'
    long_coll = fabric("c" * 101, {"_time": "2020-06-01T10:00:01",
                                   "_user": "u2", "v": 2})
    lines = [good, not_json, long_coll]
    src = tmp_path / "src"
    _write_lines(src, lines)

    cat = Catalog()
    q = start_ingest_stream(
        spark, str(src), "fabric", cat,
        table_base=str(tmp_path / "tables"),
        checkpoint=str(tmp_path / "ckpt"),
        now=NOW, shard_time=SHARD_T, dedup=False,
        errors_dir=str(tmp_path / "errors"))
    q.awaitTermination(120)

    ok = read_collection(spark, str(tmp_path / "tables"),
                         "testproject", "t", cat)
    assert [r["v"] for r in ok.collect()] == [1.0]
    dead = spark.read.parquet(str(tmp_path / "errors")).collect()
    assert sorted(r.value for r in dead) == sorted([not_json, long_coll])
    assert all(r.n_bytes == len(r.value.encode()) for r in dead)


def test_stream_dead_letter_with_historical_split(spark, tmp_path):
    """Malformed envelopes carry a null event time; with BOTH
    historical_dir and errors_dir set they must be dead-lettered on the
    hot path per micro-batch — never diverted into the valid-late
    spool — and must still count as failures for ST11."""
    from rakam_api_collector_spark.streaming.committer import (
        ErrorRateMonitor)

    good = fabric("t", {"_time": "2020-06-01T10:00:00",
                        "_user": "u1", "v": 1})
    late = fabric("t", {"_time": "2020-05-01T10:00:00",
                        "_user": "u2", "v": 2})          # 31 days late
    not_json = '{"id": 1, "metadata": {}, "data": {broken'
    src = tmp_path / "src"
    _write_lines(src, [good, late, not_json])

    cat = Catalog()
    mon = ErrorRateMonitor(min_records=1000)
    q = start_ingest_stream(
        spark, str(src), "fabric", cat,
        table_base=str(tmp_path / "tables"),
        checkpoint=str(tmp_path / "ckpt"),
        now=NOW, shard_time=SHARD_T, dedup=False,
        historical_dir=str(tmp_path / "hist"),
        errors_dir=str(tmp_path / "errors"), error_monitor=mon)
    q.awaitTermination(120)

    dead = spark.read.parquet(str(tmp_path / "errors")).collect()
    assert [r.value for r in dead] == [not_json]
    spooled = spark.read.text(str(tmp_path / "hist")).collect()
    assert [r.value for r in spooled] == [late]      # only the VALID late
    ok = read_collection(spark, str(tmp_path / "tables"),
                         "testproject", "t", cat)
    assert [r["v"] for r in ok.collect()] == [1.0]
    assert sum(e[2] for e in mon._events) == 1       # dead row counted


def test_dead_letter_spool_idempotent_per_epoch(spark, tmp_path):
    """foreachBatch is at-least-once: a retried micro-batch re-runs with
    the SAME epoch_id. The spool is epoch-keyed with overwrite, so a
    replay must replace its own rows (no duplicates) while distinct
    epochs accumulate, and readers get epoch_id back as a partition
    column."""
    from rakam_api_collector_spark.streaming.pipeline import (
        _spool_dead_letters)

    errors = str(tmp_path / "errors")
    bad0 = spark.createDataFrame([("oops-a",), ("oops-b",)], ["value"])
    _spool_dead_letters(bad0, errors, epoch_id=0)
    _spool_dead_letters(bad0, errors, epoch_id=0)     # simulated retry
    bad1 = spark.createDataFrame([("oops-c",)], ["value"])
    _spool_dead_letters(bad1, errors, epoch_id=1)
    # the historical stream runs its OWN epoch counter from 0: sharing
    # one errors_dir (app.py default wiring) must not clobber the
    # realtime stream's epoch-0 rows
    badh = spark.createDataFrame([("oops-hist",)], ["value"])
    _spool_dead_letters(badh, errors, epoch_id=0, stream="historical")
    # an empty batch writes nothing (no per-trigger empty dirs)
    _spool_dead_letters(bad1.limit(0), errors, epoch_id=2)

    dead = spark.read.parquet(errors)
    rows = dead.collect()
    assert sorted(r.value for r in rows) == [
        "oops-a", "oops-b", "oops-c", "oops-hist"]
    assert "epoch_id" in dead.columns and "stream" in dead.columns
    assert sorted(int(r.epoch_id) for r in rows) == [0, 0, 0, 1]
    assert dead.filter("epoch_id = 2").count() == 0
    import os
    assert not os.path.exists(f"{errors}/stream=realtime/epoch_id=2")


def test_stream_dedup_drops_duplicate_user_time(spark, tmp_path):
    """ST6: duplicate (_user, _time) keys are dropped across the stream;
    null-keyed records are never deduped (AvroDuplicateHandler.java:93-97)."""
    dup = fabric("t", {"_time": "2020-06-01T10:00:00", "_user": "u1", "v": 1})
    nulls = fabric("t", {"_time": "2020-06-01T11:00:00", "v": 9})
    lines = [dup, dup, dup, nulls, nulls,
             fabric("t", {"_time": "2020-06-01T10:00:00", "_user": "u2",
                          "v": 2})]
    src = tmp_path / "src"
    _write_lines(src, lines)

    cat = Catalog()
    q = start_ingest_stream(
        spark, str(src), "fabric", cat,
        table_base=str(tmp_path / "tables"),
        checkpoint=str(tmp_path / "ckpt"),
        now=NOW, shard_time=SHARD_T, dedup=True)
    q.awaitTermination(120)

    df = read_collection(spark, str(tmp_path / "tables"),
                         "testproject", "t", cat)
    # 3 dups → 1; u2 kept; 2 null-user records both kept
    assert df.count() == 4
    assert df.filter(F.col("_user") == "u1").count() == 1
    assert df.filter(F.col("_user").isNull()).count() == 2


def test_stream_late_split_spools_historical_and_replays(spark, tmp_path):
    """ST3 + ST5: late records bypass the hot tables into the spool; the
    historical worker then lands them in the same tables."""
    fresh = fabric("t", {"_time": "2020-06-01T10:00:00", "_user": "a", "v": 1})
    late = fabric("t", {"_time": "2020-01-15T10:00:00", "_user": "b", "v": 2})
    src = tmp_path / "src"
    _write_lines(src, [fresh, late])

    cat = Catalog()
    hist_dir = tmp_path / "hist"
    hist_dir.mkdir()
    q = start_ingest_stream(
        spark, str(src), "fabric", cat,
        table_base=str(tmp_path / "tables"),
        checkpoint=str(tmp_path / "ckpt"),
        historical_dir=str(hist_dir),
        now=NOW, shard_time=SHARD_T, dedup=False)
    q.awaitTermination(120)

    hot = read_collection(spark, str(tmp_path / "tables"),
                          "testproject", "t", cat)
    assert [r["v"] for r in hot.collect()] == [1.0]

    spooled = [json.loads(ln) for f in hist_dir.glob("*.txt")
               for ln in f.read_text().splitlines()]
    assert len(spooled) == 1 and spooled[0]["data"]["v"] == 2

    q2 = start_historical_stream(
        spark, str(hist_dir), "fabric", cat,
        table_base=str(tmp_path / "tables"),
        checkpoint=str(tmp_path / "ckpt_hist"), shard_time=SHARD_T)
    q2.awaitTermination(120)

    merged = read_collection(spark, str(tmp_path / "tables"),
                             "testproject", "t", cat)
    assert sorted(r["v"] for r in merged.collect()) == [1.0, 2.0]


def test_stream_grouped_layout_commit(spark, tmp_path):
    """layout='grouped' commits one write job per schema group into the
    Hive-partitioned layout; collections read back (partition-pruned)
    with the same rows and dedup/late-split semantics intact."""
    import pytest

    from rakam_api_collector_spark.sinks import read_collection_grouped

    lines = []
    for c in ("a", "b", "c"):
        lines += [fabric(c, {"_time": "2020-06-01T10:00:0%d" % i,
                             "_user": f"u_{c}{i}", "v": i})
                  for i in range(3)]
    # a duplicate (same _user/_time) that dedup must drop
    lines.append(fabric("a", {"_time": "2020-06-01T10:00:00",
                              "_user": "u_a0", "v": 99}))
    src = tmp_path / "src"
    _write_lines(src, lines)
    cat = Catalog()
    q = start_ingest_stream(
        spark, str(src), "fabric", cat,
        table_base=str(tmp_path / "tables"),
        checkpoint=str(tmp_path / "ckpt"),
        now=NOW, shard_time=SHARD_T, dedup=True,
        layout="grouped")
    q.awaitTermination(120)

    for c in ("a", "b", "c"):
        df = read_collection_grouped(spark, str(tmp_path / "tables"),
                                     "testproject", c, cat)
        assert sorted(r["v"] for r in df.collect()) == [0.0, 1.0, 2.0]

    with pytest.raises(ValueError, match="grouped"):
        start_ingest_stream(
            spark, str(src), "fabric", cat,
            table_base=str(tmp_path / "t2"),
            checkpoint=str(tmp_path / "c2"),
            now=NOW, shard_time=SHARD_T,
            layout="grouped", manifested=True)


def test_injected_source_stream_feeds_pipeline(spark, tmp_path):
    """The connector entry point: a streaming DataFrame with a binary
    ``value`` column (the Kafka wire shape) injected via source_stream
    flows through the identical downstream pipeline."""
    lines = [fabric("t", {"_time": "2020-06-01T10:00:0%d" % i,
                          "_user": f"u{i}", "v": i}) for i in range(3)]
    src = tmp_path / "src"
    _write_lines(src, lines)
    # simulate the kafka reader's value:binary column
    kafka_shaped = (spark.readStream.format("text").load(str(src))
                    .select(F.encode("value", "utf-8").alias("value")))

    cat = Catalog()
    q = start_ingest_stream(
        spark, None, "fabric", cat,
        table_base=str(tmp_path / "tables"),
        checkpoint=str(tmp_path / "ckpt"),
        now=NOW, shard_time=SHARD_T, dedup=True,
        source_stream=kafka_shaped)
    q.awaitTermination(120)

    df = read_collection(spark, str(tmp_path / "tables"),
                         "testproject", "t", cat)
    assert sorted(r["v"] for r in df.collect()) == [0.0, 1.0, 2.0]


def test_stream_leaves_no_cached_batches(spark, tmp_path):
    """Each micro-batch's parsed cache must be unpersisted — a leaked
    cache per batch accumulates storage blocks on a long-running stream."""
    src = tmp_path / "src"
    for i in range(3):
        _write_lines(src, [fabric("t", {"_time": "2020-06-01T10:00:00",
                                        "_user": f"u{i}", "v": i})],
                     f"b{i}.json")
    before = set(spark.sparkContext._jsc.sc().getPersistentRDDs()
                 .keySet().toString().strip("Set()").split(", "))
    q = start_ingest_stream(
        spark, str(src), "fabric", Catalog(),
        table_base=str(tmp_path / "tables"),
        checkpoint=str(tmp_path / "ckpt"),
        now=NOW, shard_time=SHARD_T, dedup=False,
        trigger={"availableNow": True}, max_files_per_trigger=1)
    q.awaitTermination(120)
    after = set(spark.sparkContext._jsc.sc().getPersistentRDDs()
                .keySet().toString().strip("Set()").split(", "))
    assert after <= before, f"stream leaked cached RDDs: {after - before}"


def test_stream_checkpoint_no_reprocessing(spark, tmp_path):
    """ST7: restarting the query with the same checkpoint does not
    re-ingest already-committed files; new files still flow."""
    src = tmp_path / "src"
    _write_lines(src, [fabric("t", {"_time": "2020-06-01T10:00:00",
                                    "_user": "a", "v": 1})], "one.json")
    cat = Catalog(path=str(tmp_path / "cat.json"))
    kw = dict(table_base=str(tmp_path / "tables"),
              checkpoint=str(tmp_path / "ckpt"),
              now=NOW, shard_time=SHARD_T, dedup=False)
    start_ingest_stream(spark, str(src), "fabric", cat, **kw) \
        .awaitTermination(120)
    _write_lines(src, [fabric("t", {"_time": "2020-06-01T11:00:00",
                                    "_user": "b", "v": 2})], "two.json")
    start_ingest_stream(spark, str(src), "fabric", cat, **kw) \
        .awaitTermination(120)

    df = read_collection(spark, str(tmp_path / "tables"),
                         "testproject", "t", cat)
    assert sorted(r["v"] for r in df.collect()) == [1.0, 2.0]


def test_handoff_helpers_idempotent_pinned_and_pruned(spark, tmp_path):
    """The K3 bookkeeping helpers shared by the JSON and Avro paths:
    _handoff_once runs publish exactly once per (checkpoint, epoch);
    _pinned_epoch_date stores current_date() on the epoch's first
    attempt and re-reads it on replay even after a (simulated)
    midnight rollover — the guard against a replay reclassifying
    boundary-day records and silently dropping a newly-late one; and
    _prune_epoch_files bounds both bookkeeping dirs so a 15 s trigger
    doesn't leak 5,760 checkpoint files/day forever."""
    from rakam_api_collector_spark.manifest import LocalMetadataStore
    from rakam_api_collector_spark.streaming.pipeline import (
        _ckpt_meta,
        _handoff_once,
        _pinned_epoch_date,
        _prune_epoch_files,
    )

    ck = str(tmp_path / "ck")
    meta = LocalMetadataStore()
    calls = []
    _handoff_once(ck, 7, lambda: calls.append(1), meta)
    _handoff_once(ck, 7, lambda: calls.append(1), meta)  # replay: skip
    assert calls == [1]

    d1 = _pinned_epoch_date(spark, ck, 7, meta)
    clock = Path(ck) / "hist_clock" / "7"
    assert clock.read_text() == d1 and len(d1) == 10
    clock.write_text("1999-12-31")        # simulate midnight rollover
    assert _pinned_epoch_date(spark, ck, 7, meta) == "1999-12-31"

    mdir = Path(ck) / "hist_published"
    for e in (0, 1, 500):
        (mdir / str(e)).write_text("")
    (mdir / "3.tmp").write_text("")       # torn clock/marker leftover
    _prune_epoch_files(meta, str(mdir), 500)
    assert sorted(p.name for p in mdir.iterdir()) == ["500"]

    # r16 seam: a URI checkpoint refuses unless a store is passed —
    # os.* under s3://... would silently keep markers on LOCAL disk
    # (duplicate publishes after a driver relocation)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="meta_store"):
        _ckpt_meta("s3://bucket/ck", None)
    assert _ckpt_meta("s3://bucket/ck", meta) is meta


def test_stream_handoff_replay_pins_classification_clock(spark, tmp_path):
    """now=None end-to-end: the epoch's classification date is pinned
    under the checkpoint on the first attempt (hist_clock/<epoch>) and
    re-read when the crashed epoch replays — the ST3 split stays
    identical across the replay even if the wall date rolls over
    mid-crash, so the skip-on-marker guard can never strand a
    newly-late record — and the K3 spool carries the late envelope
    exactly once."""
    import datetime as dt
    import os

    import pyspark.errors

    today = dt.date.today().isoformat()
    src = tmp_path / "src"
    _write_lines(src, [
        fabric("t", {"_time": f"{today}T10:00:00", "_user": "a", "v": 1}),
        fabric("t", {"_time": "2000-01-01T10:00:00", "_user": "b",
                     "v": 2}),
    ], "one.json")
    cat = Catalog(path=str(tmp_path / "cat.json"))
    hist_dir = str(tmp_path / "hist")
    flag = str(tmp_path / "crashed_once")

    class FlakyStats:
        def add(self, project, collection, n):
            if not os.path.exists(flag):
                open(flag, "w").close()
                raise RuntimeError("injected post-handoff crash")

    def run(stats):
        q = start_ingest_stream(
            spark, str(src), "fabric", cat,
            table_base=str(tmp_path / "tables"),
            checkpoint=str(tmp_path / "ckpt"),
            historical_dir=hist_dir, dedup=False, stats=stats)
        q.awaitTermination(120)

    try:
        run(FlakyStats())
        raise AssertionError("injected crash did not surface")
    except pyspark.errors.exceptions.captured.StreamingQueryException:
        pass
    clock = tmp_path / "ckpt" / "hist_clock" / "0"
    assert clock.read_text() == today      # pinned on the first attempt
    assert spark.read.text(hist_dir).count() == 1

    run(None)                              # replay of the epoch
    assert spark.read.text(hist_dir).count() == 1
