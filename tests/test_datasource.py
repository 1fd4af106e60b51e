"""format("manifest") — the Python DataSource over manifest tables.

Pins the reader half of the K1 transaction guarantee through Spark's
own reader API (`RaptorDatabaseHandler.java:312-339` semantics — only
registered shards are visible): snapshot reads with evolved-schema
union and time travel, zone-map pruning hard enough to skip deleted
files, and streaming micro-batches driven by manifest version diffs
with the compaction-fold walk (datasource.py / manifest.py
appended_between)."""

from __future__ import annotations

import os
import shutil
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from rakam_api_collector_spark.datasource import ManifestDataSource
from rakam_api_collector_spark.manifest import ManifestedTable


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(ManifestDataSource)


def _df(spark, ids, day="2024-03-01T10:00:00"):
    return spark.createDataFrame(
        [(i, datetime.fromisoformat(day)) for i in ids],
        "id long, _time timestamp")


def _load(spark, t, **opts):
    r = spark.read.format("manifest").option("path", t.table_dir)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_matches_table_read(spark, tmp_path):
    """Same snapshot as ManifestedTable.read: all committed rows, the
    hive _day partition re-materialized, evolved columns null-filled
    into the add-only union schema — and orphans invisible."""
    t = ManifestedTable(str(tmp_path), "proj", "events")
    t.write(_df(spark, [1, 2]), batch_id="b1")
    t.write(_df(spark, [3], day="2024-03-02T10:00:00"), batch_id="b2")
    # evolved batch adds a column
    t.write(spark.createDataFrame(
        [(4, datetime(2024, 3, 3, 10), 0.5)],
        "id long, _time timestamp, score double"), batch_id="b3")
    # a crashed writer's orphan dir must stay invisible
    _df(spark, [99]).write.mode("overwrite") \
        .parquet(f"{t.batches_dir}/orphan")

    got = _load(spark, t)
    assert sorted(got.columns) == ["_day", "_time", "id", "score"]
    rows = {(r.id, str(r._day), r.score) for r in got.collect()}
    assert rows == {(1, "2024-03-01", None), (2, "2024-03-01", None),
                    (3, "2024-03-02", None), (4, "2024-03-03", 0.5)}

    via_table = {(r.id, str(r._day), r.score)
                 for r in t.read(spark).collect()}
    assert rows == via_table


def test_version_as_of_time_travel(spark, tmp_path):
    t = ManifestedTable(str(tmp_path), "proj", "events")
    t.write(_df(spark, [1]), batch_id="b1")
    t.write(_df(spark, [2]), batch_id="b2")
    v1 = _load(spark, t, versionAsOf="1")
    assert [r.id for r in v1.collect()] == [1]
    with pytest.raises(Exception, match="no committed batches"):
        _load(spark, t, versionAsOf="9").collect()
    # non-numeric versionAsOf resolves as a TAG name (manifest.tag)
    t.tag("gold", version=1)
    assert [r.id for r in
            _load(spark, t, versionAsOf="gold").collect()] == [1]
    with pytest.raises(Exception, match="no tag"):
        _load(spark, t, versionAsOf="ghost").collect()
    # r14 ADVICE: a creatable tag like '-3' must READ back as a tag —
    # only PLAIN digits parse as versions (negatives are never valid
    # versions), matching tag()'s own name.isdigit() rejection
    t.tag("-3", version=2)
    assert sorted(r.id for r in
                  _load(spark, t, versionAsOf="-3").collect()) == [1, 2]
    with pytest.raises(ValueError, match="tag"):
        t.tag("7")                           # plain digits stay refused


def test_pushdown_prunes_files_hard(spark, tmp_path):
    """The skip is physical: after range-clustered writes, a file whose
    zone map is disjoint from the pushed filter is never OPENED — we
    delete it from disk, and the filtered scan still succeeds while the
    full scan fails. Spark still applies the predicate itself (all
    filters stay residual), so the pruned result is exact."""
    t = ManifestedTable(str(tmp_path), "proj", "events")
    t.write(_df(spark, range(100)), batch_id="b1",
            cluster_by=["id"], n_files=4, partition_by_day=False)
    files = t.committed()[0]["files"]
    assert len(files) == 4
    # delete the file holding the TOP of the id range
    top = max(files, key=lambda f: f["stats"]["id"][1])
    victim = os.path.join(t.batches_dir, t.committed()[0]["dir"],
                          top["path"])
    os.remove(victim)
    lo_cut = top["stats"]["id"][0]

    # strict < converts to an inclusive zone-map bound (conservative),
    # so cut below the victim's min to make the skip provable
    got = _load(spark, t).filter(F.col("id") <= lo_cut - 1)
    assert sorted(r.id for r in got.collect()) == list(range(int(lo_cut)))
    with pytest.raises(Exception):
        _load(spark, t).collect()          # full scan needs the victim


def test_pushdown_prunes_batches_hard(spark, tmp_path):
    """Batch-level zone maps skip whole batch directories the same
    way — the deleted batch dir is never listed for disjoint bounds."""
    t = ManifestedTable(str(tmp_path), "proj", "events")
    t.write(_df(spark, [1, 2]), batch_id="lo", partition_by_day=False)
    t.write(_df(spark, [1000, 1001]), batch_id="hi",
            partition_by_day=False)
    hi_dir = next(m for m in t.committed() if m["batch"] == "hi")
    shutil.rmtree(os.path.join(t.batches_dir, hi_dir["dir"]))

    got = _load(spark, t).filter(F.col("id") <= 2)
    assert sorted(r.id for r in got.collect()) == [1, 2]
    with pytest.raises(Exception):
        _load(spark, t).collect()


def test_streaming_versions_are_offsets(spark, tmp_path):
    """availableNow micro-batches ride the version cursor: each run
    picks up exactly the batches committed since the checkpointed
    version — including a batch that was appended AND compacted away
    between runs (the appended_between chain walk; an endpoint diff
    would lose it) — and compaction output itself never re-delivers."""
    t = ManifestedTable(str(tmp_path), "proj", "events")
    t.write(_df(spark, [1, 2, 3]), batch_id="b1")
    out, ck = f"{tmp_path}/out", f"{tmp_path}/ck"

    def run():
        q = (spark.readStream.format("manifest")
             .option("path", t.table_dir).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    assert sorted(r.id for r in spark.read.parquet(out).collect()) \
        == [1, 2, 3]

    t.write(_df(spark, [4, 5]), batch_id="b2")
    t.compact(spark)                       # folds the UNSEEN b2
    t.write(_df(spark, [6]), batch_id="b3")
    run()
    assert sorted(r.id for r in spark.read.parquet(out).collect()) \
        == [1, 2, 3, 4, 5, 6]              # exactly once, nothing lost

    run()                                  # caught up: no new rows
    assert spark.read.parquet(out).count() == 6


def test_streaming_starting_version_latest(spark, tmp_path):
    t = ManifestedTable(str(tmp_path), "proj", "events")
    t.write(_df(spark, [1]), batch_id="b1")
    out, ck = f"{tmp_path}/out", f"{tmp_path}/ck"
    q = (spark.readStream.format("manifest")
         .option("path", t.table_dir)
         .option("startingVersion", "latest").load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    t.write(_df(spark, [2]), batch_id="b2")
    q = (spark.readStream.format("manifest")
         .option("path", t.table_dir).load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == [2]                      # pre-existing b1 skipped


def test_appended_between_walks_the_chain(spark, tmp_path):
    """Unit pins on the metadata walk: compaction folding an unseen
    batch still surfaces it from its own append version; a rewrite
    inside the window collapses to the final dir; a gc-pruned
    intermediate version raises instead of losing data."""
    t = ManifestedTable(str(tmp_path), "proj", "events")
    t.write(_df(spark, [1]), batch_id="b1")            # v1
    t.write(_df(spark, [2]), batch_id="b2")            # v2
    t.compact(spark)                                   # v3 (moves b1+b2)
    got = t.appended_between(1, 3)
    assert [m["batch"] for m in got] == ["b2"]         # fold != loss

    # DML rewrite collapses to one (final) dir per batch id
    t.delete_where(spark, F.col("id") == 2,
                   prune={"id": (2, 2)})               # v4 rewrites compact-*
    names = [m["batch"] for m in t.appended_between(1, 4)]
    assert sorted(n.startswith("compact-") for n in names) \
        == [False, True]                               # b2 + rewritten output
    assert len(names) == len(set(names))

    # gc-pruned gap: fail fast, never guess
    t.write(_df(spark, [9]), batch_id="b9")            # v5
    t.gc(keep_versions=1, grace_seconds=0)
    with pytest.raises(FileNotFoundError, match="gc-pruned"):
        t.appended_between(1, 5)


def test_writer_two_phase_commit(spark, tmp_path):
    """df.write.format("manifest"): tasks write private parquet files
    with executor-computed footer zone maps; the driver commit
    publishes ONE manifest entry via the version CAS. The committed
    entry interoperates with every other reader (table.read, zone-map
    pruning) and append replaces idempotently on batchId."""
    t = ManifestedTable(str(tmp_path), "proj", "events")
    df = _df(spark, range(50))
    (df.write.format("manifest").option("path", t.table_dir)
       .option("batchId", "load-1").mode("append").save())

    assert [m["batch"] for m in t.committed()] == ["load-1"]
    entry = t.committed()[0]
    assert entry["rows"] == 50
    assert entry["stats"]["id"] == [0, 49]      # executor-side stats
    assert all(f["stats"] for f in entry["files"])
    got = sorted(r.id for r in t.read(spark).collect())
    assert got == list(range(50))

    # idempotent replay: same batchId replaces, never duplicates
    (df.write.format("manifest").option("path", t.table_dir)
       .option("batchId", "load-1").mode("append").save())
    assert t.rows() == 50 and t.current_version() == 2

    # round trip through the source reader
    assert _load(spark, t).count() == 50


def test_writer_overwrite_is_atomic_truncate(spark, tmp_path):
    t = ManifestedTable(str(tmp_path), "proj", "events")
    t.write(_df(spark, [1, 2]), batch_id="old")
    (_df(spark, [10]).write.format("manifest")
     .option("path", t.table_dir).mode("overwrite").save())
    assert [r.id for r in t.read(spark).collect()] == [10]
    # one version swap — time travel still sees the old set
    assert sorted(r.id for r in t.read(spark, version=1).collect()) \
        == [1, 2]


def test_writer_enforces_addonly_evolution(spark, tmp_path):
    t = ManifestedTable(str(tmp_path), "proj", "events")
    t.write(_df(spark, [1]), batch_id="b1")
    bad = spark.createDataFrame([("x", datetime(2024, 3, 1, 10))],
                                "id string, _time timestamp")
    with pytest.raises(Exception, match="evolution"):
        (bad.write.format("manifest").option("path", t.table_dir)
         .mode("append").save())


def test_stream_writer_epoch_idempotent(spark, tmp_path):
    """readStream(manifest) → writeStream(manifest): a CDC mirror.
    Epoch ids key the committed batches, the mirror converges to the
    source's rows, and re-running a caught-up stream commits nothing
    new."""
    src = ManifestedTable(str(tmp_path), "proj", "src")
    dst = ManifestedTable(str(tmp_path), "proj", "dst")
    src.write(_df(spark, [1, 2]), batch_id="b1")
    ck = f"{tmp_path}/ck"

    def mirror():
        q = (spark.readStream.format("manifest")
             .option("path", src.table_dir).load()
             .writeStream.format("manifest")
             .option("path", dst.table_dir)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    mirror()
    assert sorted(r.id for r in dst.read(spark).collect()) == [1, 2]
    assert all(m["batch"].startswith("epoch-") for m in dst.committed())

    src.write(_df(spark, [3]), batch_id="b2")
    mirror()
    assert sorted(r.id for r in dst.read(spark).collect()) == [1, 2, 3]
    v = dst.current_version()
    mirror()                                 # caught up: no new commit
    assert dst.current_version() == v


def test_orc_batches_read_through_source(spark, tmp_path):
    """Stats-less formats fall back to walking the batch dir whole —
    no pruning, every row still served."""
    t = ManifestedTable(str(tmp_path), "proj", "events")
    t.write(_df(spark, [1, 2]), batch_id="b1", fmt="orc")
    got = _load(spark, t)
    assert sorted(r.id for r in got.collect()) == [1, 2]
