"""Versioned atomic index publish (operators/indexroot.py, r17 —
VERDICT r16 item 1): persisted IVF/IVF-PQ indexes get a manifest-style
CAS version pointer, so rebuild/compact land as one atomic swap that
searchers and the streaming maintainer follow automatically; appends
a swap overtook refuse instead of feeding a dead generation; old
generations are gc-able under a retention rule; and index health rides
the run_maintenance sweep.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rakam_api_collector_spark.manifest import CommitConflict
from rakam_api_collector_spark.operators import similarity as S
from rakam_api_collector_spark.operators.indexroot import (
    StaleAppend, VersionedIndex)
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF, "embeddings")


def _published_root(spark, tmp_path, upto=100, n_cells=16):
    emb = _emb(spark)
    root = VersionedIndex(str(tmp_path / "idx"))
    gen = root.new_generation_path()
    S.build_ivf_index(emb.filter(F.col("vec_id") < upto), "vec_id",
                      "embedding", gen, n_cells=n_cells)
    root.publish(gen)
    return emb, root


def test_publish_resolve_append_search(spark, tmp_path):
    """The base protocol: build into new_generation_path, publish via
    CAS, search through the pointer; appends bump the version and the
    grown index equals in-memory search; an unpublished root refuses
    both search and stream use; publishing a non-index refuses."""
    emb, root = _published_root(spark, tmp_path)
    assert root.current_version() == 1
    root.append(emb.filter(F.col("vec_id") >= 100), "vec_id",
                "embedding")
    assert root.current_version() == 2
    assert spark.read.parquet(root.current_path()).count() \
        == emb.count()

    q = emb.filter(F.col("vec_id") < 5)
    got = {(r.q, r.neighbor) for r in
           root.topk(spark, q, "vec_id", "embedding", k=10,
                     nprobe=16).collect()}
    cents = S._read_model(root.meta, root.current_path(),
                          "_centroids.json")
    want = {(r.q, r.neighbor) for r in
            S.ivf_topk(emb, q, "vec_id", "embedding", k=10, nprobe=16,
                       centroids=cents).collect()}
    assert got == want

    empty = VersionedIndex(str(tmp_path / "none"))
    with pytest.raises(FileNotFoundError, match="no published"):
        empty.current_path()
    with pytest.raises(ValueError, match="no built index"):
        empty.publish(str(tmp_path / "not_an_index"))
    # flat generations reject the PQ-only rerank knob loudly
    with pytest.raises(ValueError, match="IVF-flat"):
        root.topk(spark, q, "vec_id", "embedding", rerank_factor=3)


def test_version_cas_races(spark, tmp_path):
    """8 concurrent publishers through the OCC loop: every version CAS
    has exactly one winner, all 8 commits land (versions 2..9), every
    committed state is readable and names a real generation, and a
    direct usurper put on a committed version loses — the
    ManifestedTable race suite applied to the index pointer. (The
    pointer CAS is the racing surface; concurrent PHYSICAL appends to
    one generation are excluded by the single-maintainer contract —
    module docstring.)"""
    from concurrent.futures import ThreadPoolExecutor

    emb, root = _published_root(spark, tmp_path)
    gen2 = root.new_generation_path()
    S.build_ivf_index(emb.filter(F.col("vec_id") < 50), "vec_id",
                      "embedding", gen2, n_cells=16)
    gen1 = root._read_version(1)["index_path"]

    def one(i):
        VersionedIndex(root.root).publish(gen2 if i % 2 else gen1)

    with ThreadPoolExecutor(8) as ex:
        list(ex.map(one, range(8)))
    assert root.current_version() == 9
    assert root._version_numbers() == list(range(1, 10))
    for n in range(1, 10):
        st = root._read_version(n)
        assert st["version"] == n and st["parent"] == n - 1
        assert st["index_path"] in {gen1, gen2}
    assert not root.meta.put_if_absent(
        f"{root.versions_dir}/v{9:010d}.json", "usurper")
    assert root._read_version(9) != "usurper"


def test_rebuild_swap_catches_up_concurrent_appends(spark, tmp_path):
    """The swap CAS is conditioned on the version it caught up to: an
    append landing between the rebuild's snapshot and its publish
    forces a catch-up round (id anti-join), so the swapped-in
    generation holds EVERY id — nothing a concurrent appender wrote
    is lost — and the searcher flips to it atomically."""
    emb, root = _published_root(spark, tmp_path)
    extra = emb.filter((F.col("vec_id") >= 100)
                       & (F.col("vec_id") < 160))

    class Race(VersionedIndex):
        injected = 0

        def _try_commit(self, n, state):
            if state["action"] == "rebuild" and Race.injected == 0:
                Race.injected = 1
                # a concurrent appender sneaks in version n first
                VersionedIndex(self.root).append(
                    extra, "vec_id", "embedding")
            return super()._try_commit(n, state)

    racer = Race(str(tmp_path / "idx"))
    st = racer.rebuild(spark)
    assert Race.injected == 1 and st["action"] == "rebuild"
    # the rebuild's first CAS lost to the append, the catch-up folded
    # the appended rows into the new generation before the swap won
    assert st["version"] == 3                  # publish, append, swap
    live = spark.read.parquet(root.current_path())
    assert live.select("neighbor").distinct().count() == 160
    got = root.topk(spark, emb.filter("vec_id = 120"), "vec_id",
                    "embedding", k=1, nprobe=16).collect()
    assert got and got[0].neighbor != 120      # appended rows searchable


def test_stale_append_refuses_and_replays_to_live_gen(spark, tmp_path):
    """An append a swap overtook mid-flight must NOT commit a version
    bump (its rows went to the superseded generation): StaleAppend
    raises, and the caller's replay lands the rows in the live
    generation — at-least-once, never lost, never silently dead."""
    emb, root = _published_root(spark, tmp_path)
    batch = emb.filter((F.col("vec_id") >= 100)
                       & (F.col("vec_id") < 150))

    class Hooked(VersionedIndex):
        swapped = 0

        def _append_fn(self, path):
            fn = super()._append_fn(path)

            def wrapped(df, i, v, p, meta_store=None):
                if Hooked.swapped == 0:
                    # the overtaking swap lands while this append is
                    # still physically writing: its snapshot excludes
                    # the in-flight rows
                    Hooked.swapped = 1
                    VersionedIndex(self.root).compact(df.sparkSession)
                fn(df, i, v, p, meta_store=meta_store)
            return wrapped

    hooked = Hooked(str(tmp_path / "idx"))
    with pytest.raises(StaleAppend, match="superseded"):
        hooked.append(batch, "vec_id", "embedding")
    live = root.current_path()
    assert root.current()["action"] == "compact"
    # the swap snapshotted BEFORE the stale rows landed: replaying the
    # batch (what the streaming epoch retry does) lands them live
    assert spark.read.parquet(live).count() == 100
    root.append(batch, "vec_id", "embedding")
    assert spark.read.parquet(root.current_path()).count() == 150


def test_gc_retention(spark, tmp_path):
    """Superseded generations are reclaimed under keep_versions +
    grace; the live one survives; an in-flight build dir (no model
    artifact yet) is never touched; version files whose generation
    was reclaimed are pruned."""
    emb, root = _published_root(spark, tmp_path)
    root.compact(spark)
    root.compact(spark)
    gens = sorted(d for d in os.listdir(root.root)
                  if d.startswith("gen-"))
    assert len(gens) == 3
    os.makedirs(f"{root.root}/gen-999999")        # mid-flight build
    assert root.gc(keep_versions=2, grace_seconds=1e6) == []
    removed = root.gc(keep_versions=1, grace_seconds=0.0)
    assert removed == [f"{root.root}/gen-000001",
                       f"{root.root}/gen-000002"]
    assert os.path.isdir(f"{root.root}/gen-999999")
    assert root._version_numbers() == [3]
    assert spark.read.parquet(root.current_path()).count() == 100


def test_replace_refuses_concurrent_swap(spark, tmp_path):
    """The pointer-CAS backstop behind the lease: a swap that lands
    through the lease-free escape hatch (publish — the operator's
    wholesale replacement) while a compact is mid-flight moves the
    pointer off the compact's source generation, and the compact
    raises CommitConflict instead of publishing a generation built
    from a superseded snapshot."""
    emb, root = _published_root(spark, tmp_path)
    gen2 = root.new_generation_path()
    S.build_ivf_index(emb.filter(F.col("vec_id") < 50), "vec_id",
                      "embedding", gen2, n_cells=16)

    class Race(VersionedIndex):
        swapped = 0

        def _try_commit(self, n, state):
            if state["action"] == "compact" and Race.swapped == 0:
                Race.swapped = 1
                VersionedIndex(self.root).publish(
                    gen2)                      # the winning swap
            return super()._try_commit(n, state)

    with pytest.raises(CommitConflict, match="concurrent swap"):
        Race(str(tmp_path / "idx")).compact(spark)
    assert root.current()["action"] == "publish"
    assert root.current_path() == gen2
    # the loser's finally released the lease: the root is maintainable
    root.compact(spark)
    assert root.current()["action"] == "compact"


def test_maintenance_lease_refuses_and_expires(spark, tmp_path):
    """VERDICT r17 item 2: the single-maintainer contract is
    mechanical — a rebuild/compact racing a HELD lease raises
    MaintenanceBusy BEFORE writing anything (no generation dir, no
    marker), and a crashed maintainer's lease (store mtime older than
    its ttl) is stolen so the root never wedges."""
    import json as _json

    from rakam_api_collector_spark.operators.indexroot import \
        MaintenanceBusy

    emb, root = _published_root(spark, tmp_path)
    lease = root._lease_path()
    root.meta.put(lease, _json.dumps(
        {"holder": "other-maintainer", "action": "rebuild",
         "ttl_seconds": 3600.0}))
    gens_before = sorted(d for d in os.listdir(root.root)
                         if d.startswith("gen-"))
    with pytest.raises(MaintenanceBusy, match="one rebuild/compact"):
        root.compact(spark)
    with pytest.raises(MaintenanceBusy, match="one rebuild/compact"):
        root.rebuild(spark)
    # the loser raised BEFORE writing: no new generation, no marker
    assert sorted(d for d in os.listdir(root.root)
                  if d.startswith("gen-")) == gens_before
    assert not os.path.exists(f"{root.root}/_building") or \
        not os.listdir(f"{root.root}/_building")
    assert os.path.exists(lease)               # holder's lease intact

    # crashed maintainer: age the lease past its ttl (store mtime is
    # the expiry clock) — the next op steals it and completes
    os.utime(lease, (0, 0))
    root.compact(spark)
    assert root.current()["action"] == "compact"
    assert not os.path.exists(lease)           # released after


def test_maintenance_lease_released_on_failure(spark, tmp_path):
    """A rebuild/compact that dies mid-build releases its lease on
    the way out (finally) — a failed maintenance op never wedges the
    root until ttl expiry."""
    emb, root = _published_root(spark, tmp_path)

    def worker(src, dest):
        raise RuntimeError("mid-build crash")

    with pytest.raises(RuntimeError, match="mid-build crash"):
        root._replace(spark, worker, "compact")
    assert not os.path.exists(root._lease_path())
    root.compact(spark)                        # immediately retryable
    assert root.current()["action"] == "compact"


def test_run_maintenance_reports_index_health(spark, tmp_path):
    """VERDICT r16 item 6: one cadence owns all maintenance — the
    shard-organizer sweep reports index health (imbalance, drift
    trigger, last-full-build age) beside table compaction, and
    isolates a broken root as an error row."""
    from datetime import datetime

    from rakam_api_collector_spark.manifest import (ManifestedTable,
                                                    run_maintenance)

    base = str(tmp_path / "warehouse")
    t = ManifestedTable(base, "proj", "events")
    t.write(spark.createDataFrame(
        [(1, datetime.fromisoformat("2024-03-01T10:00:00"))],
        "id long, _time timestamp"), batch_id="b0")

    _, root = _published_root(spark, tmp_path)
    reports = run_maintenance(
        spark, base, min_batches=8,
        index_roots=[root, str(tmp_path / "broken")])
    assert reports[0]["collection"] == "events"
    idx = reports[1]
    assert idx["index"] == root.root
    assert idx["rows"] == 100 and idx["n_cells"] == 16
    assert idx["rebuild_due"] is False
    assert idx["last_full_build_age"] >= 0
    assert "error" in reports[2]

    # the DAEMON cadence owns index health too (r17 review): the
    # MaintenanceHook plumbs index_roots through to every sweep
    from rakam_api_collector_spark.manifest import MaintenanceHook
    hook = MaintenanceHook(spark, base, every_epochs=1, inline=True,
                           min_batches=99, index_roots=[root])
    hook.after_epoch(0)
    assert hook.reports[-1]["tables"][-1]["index"] == root.root
    assert hook.reports[-1]["tables"][-1]["rebuild_due"] is False


def test_cell_stats_spark_path_matches_footer_walk(spark, tmp_path):
    """ivf_cell_stats' distributed branch (r17, VERDICT r16 "what's
    wrong" #2): above the file-count threshold the counts come from a
    partition-column-only Spark scan — identical stats to the serial
    footer walk."""
    emb, root = _published_root(spark, tmp_path, upto=300)
    path = root.current_path()
    serial = S.ivf_cell_stats(path)
    dist = S.ivf_cell_stats(path, spark=spark, parallel_threshold=0)
    assert dist == serial
    # and by default (below threshold) spark= is a no-op
    assert S.ivf_cell_stats(path, spark=spark) == serial


def test_gc_bounds_the_version_log(spark, tmp_path):
    """r17 review: append history (one version per streamed epoch) is
    redundant once superseded — gc prunes out-of-window versions whose
    generation is reclaimed OR re-referenced by a newer version, so
    the log is O(generations + keep window) regardless of stream age;
    the newest reference to each still-on-disk generation survives to
    carry the grace clock."""
    emb, root = _published_root(spark, tmp_path)
    for lo in (100, 150, 200):
        root.append(emb.filter((F.col("vec_id") >= lo)
                               & (F.col("vec_id") < lo + 50)),
                    "vec_id", "embedding")
    assert root._version_numbers() == [1, 2, 3, 4]
    # nothing reclaimed (gen-000001 is live), but the append history
    # collapses to the keep window + the newest per-gen reference
    assert root.gc(keep_versions=1, grace_seconds=0.0) == []
    assert root._version_numbers() == [4]
    assert spark.read.parquet(root.current_path()).count() == 250
    st = root.current()
    assert st["last_full_build"]["version"] == 1   # rides forward


def test_cell_stats_uri_path_routes_through_spark(spark, tmp_path):
    """A URI index path with spark= audits through SPARK's
    filesystems (never the local pyarrow walk, whose credentials are
    configured separately) — pinned end to end on a real file:// URI:
    identical stats to the POSIX footer walk. The no-store URI
    refusal still fires first."""
    from rakam_api_collector_spark.manifest import LocalMetadataStore

    with pytest.raises(ValueError, match="meta_store"):
        S.ivf_cell_stats("s3://bkt/ivf")

    class _FileUri(LocalMetadataStore):
        def read_if_exists(self, path):
            return super().read_if_exists(
                path.replace("file://", "", 1))

    _, root = _published_root(spark, tmp_path)
    posix = root.current_path()
    serial = S.ivf_cell_stats(posix)
    via_spark = S.ivf_cell_stats(f"file://{posix}",
                                 meta_store=_FileUri(), spark=spark)
    assert via_spark == serial


def test_topk_time_travel_to_pre_swap_generation(spark, tmp_path):
    """version= (r17): search an OLDER committed state — the A/B
    window for judging a rebuild's recall before gc reclaims the
    superseded generation; pruned/reclaimed versions refuse with the
    retention remedy named."""
    emb, root = _published_root(spark, tmp_path)
    q = emb.filter(F.col("vec_id") < 5)
    before = {(r.q, r.neighbor) for r in
              root.topk(spark, q, "vec_id", "embedding", k=10,
                        nprobe=16).collect()}
    root.rebuild(spark)
    # the superseded generation still answers identically at v1...
    old = {(r.q, r.neighbor) for r in
           root.topk(spark, q, "vec_id", "embedding", k=10,
                     nprobe=16, version=1).collect()}
    assert old == before
    # ...and the live one matches exact search over the same corpus
    live = {(r.q, r.neighbor) for r in
            root.topk(spark, q, "vec_id", "embedding", k=10,
                      nprobe=16).collect()}
    exact = {(r.q, r.neighbor) for r in
             S.cosine_topk(emb.filter(F.col("vec_id") < 100), q,
                           "vec_id", "embedding", k=10).collect()}
    assert live == exact                       # full-probe == exact
    with pytest.raises(FileNotFoundError, match="not in the log"):
        root.topk(spark, q, "vec_id", "embedding", version=99)
    root.gc(keep_versions=1, grace_seconds=0.0)
    with pytest.raises(FileNotFoundError, match="not in the log"):
        # v1's generation was reclaimed AND its version file pruned
        root.topk(spark, q, "vec_id", "embedding", version=1)


def test_gc_reclaims_crashed_builds_and_dangling_versions(spark,
                                                          tmp_path):
    """r17 review closures: (a) a _replace build that crashed between
    its data write and its artifact put (marker present, no
    _centroids.json) reclaims after grace — it used to leak a full
    index copy forever; (b) a marker-less artifact-less dir (manual
    build in progress) stays untouchable; (c) a version file whose
    generation vanished (crash between delete_tree and the prune)
    prunes on the next sweep."""
    import json as _json
    import shutil

    emb, root = _published_root(spark, tmp_path)
    root.compact(spark)                        # v2 -> gen-000002 live
    assert not os.path.isdir(f"{root.root}/_building") or \
        not os.listdir(f"{root.root}/_building")   # markers cleaned

    # (a) crashed build: data landed, artifact + commit never did
    crashed = f"{root.root}/gen-000007"
    emb.limit(5).write.parquet(crashed)
    root.meta.put(root._marker(crashed), "{}")
    # (b) manual build in progress: same shape, no marker
    manual = f"{root.root}/gen-000008"
    emb.limit(5).write.parquet(manual)

    assert root.gc(keep_versions=2, grace_seconds=1e6) == []
    assert os.path.isdir(crashed)              # grace protects it
    removed = root.gc(keep_versions=2, grace_seconds=0.0)
    assert removed == [crashed]
    assert not os.path.exists(root._marker(crashed))
    assert os.path.isdir(manual)               # untouchable, forever

    # (c) dangling version: gen deleted, version file survived a crash
    root.compact(spark)                        # v3 -> gen-000009 live
    gen2 = root._read_version(2)["index_path"]
    shutil.rmtree(gen2)
    assert root.gc(keep_versions=1, grace_seconds=1e6) == []
    assert 2 not in root._version_numbers()    # pruned though not gone
    st = _json.loads(root.meta.read(root._log.path_of(
        root.current_version())))
    assert st["index_path"] != gen2


def test_run_maintenance_restores_scheduler_pool(spark, tmp_path):
    """r17 review: pool tagging is thread-local — an inline hook runs
    the sweep on the stream-execution thread, so run_maintenance must
    restore the caller's pool or every later production micro-batch
    inherits the organizer's low-weight pool."""
    from rakam_api_collector_spark.manifest import run_maintenance

    sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", "production")
    try:
        _, root = _published_root(spark, tmp_path)
        run_maintenance(spark, str(tmp_path / "none"), min_batches=99,
                        scheduler_pool="manifest-maintenance",
                        index_roots=[root], parallelism=1)
        assert sc.getLocalProperty("spark.scheduler.pool") \
            == "production"
    finally:
        sc.setLocalProperty("spark.scheduler.pool", None)


def test_versioned_index_protocol_fuzz(spark, tmp_path):
    """Seeded random interleavings of the whole protocol surface —
    append / compact / rebuild / gc / reopen — under the
    single-maintainer contract, with the invariants asserted after
    every op: the pointer always resolves to a searchable generation,
    every ingested id is present exactly once among the live distinct
    ids, full-probe top-1 equals brute-force cosine, and after any gc
    the version log stays within its documented bound (the fuzz tier
    the repo's other protocols carry — kafka interleavings, avro wire,
    DSIR chunking)."""
    import random

    emb = _emb(spark)

    for seed in (3, 11):
        rng = random.Random(seed)
        root = VersionedIndex(str(tmp_path / f"fz{seed}"))
        gen = root.new_generation_path()
        base = emb.filter(F.col("vec_id") < 60)
        S.build_ivf_index(base, "vec_id", "embedding", gen,
                          n_cells=8)
        root.publish(gen)
        expected = set(range(60))
        next_lo = 60
        n_gc = 0

        for step in range(8):
            op = rng.choice(["append", "append", "compact",
                             "rebuild", "gc", "reopen"])
            if op == "append":
                hi = min(next_lo + rng.choice([20, 40]), 500)
                if hi == next_lo:
                    continue
                batch = emb.filter((F.col("vec_id") >= next_lo)
                                   & (F.col("vec_id") < hi))
                root.append(batch, "vec_id", "embedding")
                expected |= set(range(next_lo, hi))
                next_lo = hi
            elif op == "compact":
                root.compact(spark)
            elif op == "rebuild":
                root.rebuild(spark)
            elif op == "gc":
                root.gc(keep_versions=rng.choice([1, 2]),
                        grace_seconds=0.0)
                n_gc += 1
                ns = root._version_numbers()
                gens = sum(1 for d in os.listdir(root.root)
                           if d.startswith("gen-"))
                assert len(ns) <= gens + 2      # the documented bound
            else:
                root = VersionedIndex(root.root)   # reopen, no state

            live = spark.read.parquet(root.current_path())
            ids = [r.neighbor for r in
                   live.select("neighbor").distinct().collect()]
            assert set(ids) == expected, (seed, step, op)
            # one searchable probe: full-probe top-1 == brute force
            q = emb.filter(F.col("vec_id") == min(expected))
            got = root.topk(spark, q, "vec_id", "embedding", k=1,
                            nprobe=8).collect()
            pool = emb.filter(F.col("vec_id")
                              .isin([int(i) for i in expected]))
            want = S.cosine_topk(pool, q, "vec_id", "embedding",
                                 k=1).collect()
            assert got[0].neighbor == want[0].neighbor, (seed, step,
                                                         op)
        assert n_gc == 0 or root._version_numbers()


def test_append_records_files_and_catchup_reads_only_them(spark,
                                                          tmp_path):
    """VERDICT r17 item 1 — catch-up is O(delta), truly: every append
    commits the exact data files it added (before/after listing diff,
    sound under the single-appender contract), and a rebuild's
    catch-up round reads ONLY those files — pinned at the reader API
    boundary: every DataFrameReader.parquet call inside _catchup
    names exactly the recorded delta files, never the live
    generation's path (the pre-r18 full scan+shuffle)."""
    from pyspark.sql.readwriter import DataFrameReader

    emb, root = _published_root(spark, tmp_path)
    src = root.current_path()

    # (a) appends record exactly the on-disk diff, disjointly
    pre = root._data_files(src)
    root.append(emb.filter((F.col("vec_id") >= 100)
                           & (F.col("vec_id") < 130)),
                "vec_id", "embedding")                       # v2
    mid = root._data_files(src)
    root.append(emb.filter((F.col("vec_id") >= 130)
                           & (F.col("vec_id") < 150)),
                "vec_id", "embedding")                       # v3
    post = root._data_files(src)
    v2 = root._read_version(2)
    v3 = root._read_version(3)
    assert set(v2["appended_files"]) == mid - pre != set()
    assert set(v3["appended_files"]) == post - mid != set()
    assert root._delta_files(src, 1, 3) \
        == v2["appended_files"] + v3["appended_files"]

    # (b) the IO pin: a rebuild racing one more append catches up by
    # reading exactly that append's recorded files
    extra = emb.filter((F.col("vec_id") >= 150)
                       & (F.col("vec_id") < 180))

    class Spy(VersionedIndex):
        injected = 0
        reads: list[tuple] = []

        def _try_commit(self, n, state):
            if state["action"] == "rebuild" and Spy.injected == 0:
                Spy.injected = 1
                VersionedIndex(self.root).append(
                    extra, "vec_id", "embedding")            # v4
            return super()._try_commit(n, state)

        def _catchup(self, spark_, src_, dest_, base_v, n,
                     exclude=None):
            real = DataFrameReader.parquet

            def spy(rself, *paths, **kw):
                Spy.reads.append(tuple(paths))
                return real(rself, *paths, **kw)
            DataFrameReader.parquet = spy
            try:
                return super()._catchup(spark_, src_, dest_,
                                        base_v, n, exclude=exclude)
            finally:
                DataFrameReader.parquet = real

    st = Spy(str(tmp_path / "idx")).rebuild(spark)
    assert Spy.injected == 1 and st["action"] == "rebuild"
    delta = sorted(f"{src}/{r}" for r in
                   root._read_version(4)["appended_files"])
    assert sorted(p for tup in Spy.reads for p in tup) == delta
    live = spark.read.parquet(root.current_path())
    assert live.select("neighbor").distinct().count() == 180
    got = root.topk(spark, emb.filter("vec_id = 160"), "vec_id",
                    "embedding", k=1, nprobe=16).collect()
    assert got and got[0].neighbor != 160      # caught-up, searchable


def test_catchup_fallback_on_pre_r18_log(spark, tmp_path):
    """A version state that predates file recording (pre-r18 append)
    can't drive the fast path: _delta_files returns None and catch-up
    falls back to the ids-only anti-join — nothing a concurrent
    appender wrote is lost either way."""
    import json as _json

    emb, root = _published_root(spark, tmp_path)
    src = root.current_path()
    extra = emb.filter((F.col("vec_id") >= 100)
                       & (F.col("vec_id") < 160))

    class Race(VersionedIndex):
        injected = 0

        def _try_commit(self, n, state):
            if state["action"] == "rebuild" and Race.injected == 0:
                Race.injected = 1
                inner = VersionedIndex(self.root)
                inner.append(extra, "vec_id", "embedding")   # v2
                # strip the recording — a pre-r18 append state
                st = inner._read_version(2)
                st.pop("appended_files")
                inner.meta.put(inner._log.path_of(2),
                               _json.dumps(st))
            return super()._try_commit(n, state)

    st = Race(str(tmp_path / "idx")).rebuild(spark)
    assert Race.injected == 1 and st["action"] == "rebuild"
    assert root._delta_files(src, 1, 2) is None   # fast path refused
    live = spark.read.parquet(root.current_path())
    assert live.select("neighbor").distinct().count() == 160


def test_gc_grace_measures_store_mtime_not_writer_clock(spark,
                                                        tmp_path):
    """VERDICT r17 item 6: the gc grace clock is the STORE's mtime of
    the newest referencing version file — a maintainer whose clock
    runs arbitrarily behind (committed_at stamped in the past) cannot
    undercut the window protecting in-flight readers; the same object
    ages out naturally."""
    import json as _json

    emb, root = _published_root(spark, tmp_path)
    root.compact(spark)                      # v2 live, gen-000001 old
    gen1 = f"{root.root}/gen-000001"
    # a skewed writer stamped its commit in 1970
    st = root._read_version(1)
    st["committed_at"] = 0.0
    root.meta.put(root._log.path_of(1), _json.dumps(st))
    assert root.gc(keep_versions=1, grace_seconds=3600.0) == []
    assert os.path.isdir(gen1)               # grace held (fresh mtime)
    os.utime(root._log.path_of(1), (0, 0))   # now genuinely old
    assert root.gc(keep_versions=1, grace_seconds=3600.0) == [gen1]


def test_marker_and_lease_refresh_on_progress(spark, tmp_path):
    """ADVICE r17: the in-flight-build marker (gc's crash clock) and
    the maintenance lease (the single-maintainer clock) are RE-PUT at
    every progress point — build done, each catch-up round — so both
    expiry windows measure time since last progress, never time since
    the build started; a long build can no longer be reclaimed or
    stolen mid-flight by a window sized for one job."""
    from rakam_api_collector_spark.manifest import LocalMetadataStore

    class Counting(LocalMetadataStore):
        def __init__(self):
            self.puts: dict[str, int] = {}

        def put(self, path, content):
            self.puts[path] = self.puts.get(path, 0) + 1
            super().put(path, content)

        def put_if_absent(self, path, content):
            # the marker's initial CLAIM rides the CAS (r18 review:
            # a plain put could clobber a stalled builder's claim)
            self.puts[path] = self.puts.get(path, 0) + 1
            return super().put_if_absent(path, content)

    meta = Counting()
    emb = _emb(spark)
    root = VersionedIndex(str(tmp_path / "idx"), meta_store=meta)
    gen = root.new_generation_path()
    S.build_ivf_index(emb.filter(F.col("vec_id") < 100), "vec_id",
                      "embedding", gen, n_cells=16, meta_store=meta)
    root.publish(gen)
    extra = emb.filter((F.col("vec_id") >= 100)
                       & (F.col("vec_id") < 140))

    class Race(VersionedIndex):
        injected = 0

        def _try_commit(self, n, state):
            if state["action"] == "rebuild" and Race.injected == 0:
                Race.injected = 1
                VersionedIndex(self.root, meta_store=meta).append(
                    extra, "vec_id", "embedding")
            return super()._try_commit(n, state)

    Race(str(tmp_path / "idx"), meta_store=meta).rebuild(spark)
    marker = f"{root.root}/_building/gen-000002.json"
    # start + post-build + one catch-up round
    assert meta.puts.get(marker, 0) >= 3
    # post-build + post-catch-up refreshes (acquire is put_if_absent)
    assert meta.puts.get(root._lease_path(), 0) >= 2
    assert not os.path.exists(root._lease_path())   # released


def test_new_generation_path_respects_inflight_markers(spark,
                                                       tmp_path):
    """r18 review: a builder whose Spark write hasn't committed an
    object yet has NO gen dir on an object store — only its
    _building marker. new_generation_path must count the marker, or
    a lease stolen from a live-but-stalled builder would pick the
    SAME name and interleave two builds' files under one prefix."""
    emb, root = _published_root(spark, tmp_path)
    root.meta.put(root._marker(f"{root.root}/gen-000002"),
                  '{"action": "rebuild"}')
    assert root.new_generation_path() == f"{root.root}/gen-000003"


def test_mid_build_committed_append_not_baked_twice(spark, tmp_path):
    """r18 review: an append whose PHYSICAL files landed before the
    rebuild's scan but whose version committed after the snapshot
    version is already in the built generation — catch-up must
    subtract the pre-build file snapshot, or every one of its rows
    is published twice (TOTAL row count, not just distinct ids)."""
    emb, root = _published_root(spark, tmp_path)
    src = root.current_path()
    extra = emb.filter((F.col("vec_id") >= 100)
                       & (F.col("vec_id") < 160))
    before = root._data_files(src)
    S.append_to_ivf_index(extra, "vec_id", "embedding", src)
    added = sorted(root._data_files(src) - before)

    class Tricky(VersionedIndex):
        injected = 0

        def _try_commit(self, n, state):
            if state["action"] == "rebuild" and Tricky.injected == 0:
                Tricky.injected = 1
                # the append's version commit lands only NOW — after
                # the build already read its files from disk
                inner = VersionedIndex(self.root)
                st = inner._state(inner._read_version(1), src,
                                  "append", appended_files=added)
                assert inner._log.try_commit(2, st)
            return super()._try_commit(n, state)

    st = Tricky(str(tmp_path / "idx")).rebuild(spark)
    assert Tricky.injected == 1 and st["version"] == 3
    live = spark.read.parquet(root.current_path())
    assert live.count() == 160                 # no double-bake
    assert live.select("neighbor").distinct().count() == 160


def test_heartbeat_keeps_clocks_alive_through_long_build(spark,
                                                         tmp_path):
    """r18 review: worker() is the dominant phase — the heartbeat
    re-puts the marker AND the lease on a cadence while it runs, so
    a build longer than the lease ttl (or gc grace) is measured from
    its last heartbeat, not its start; and a lease stolen mid-build
    aborts the operation right after the build instead of publishing
    over the stealer."""
    import time as _time

    from rakam_api_collector_spark.manifest import LocalMetadataStore
    from rakam_api_collector_spark.operators.indexroot import \
        MaintenanceBusy
    from rakam_api_collector_spark.operators.similarity import \
        compact_ivf_index

    class Counting(LocalMetadataStore):
        def __init__(self):
            self.puts: dict[str, int] = {}

        def put(self, path, content):
            self.puts[path] = self.puts.get(path, 0) + 1
            super().put(path, content)

    meta = Counting()
    emb = _emb(spark)
    root = VersionedIndex(str(tmp_path / "idx"), meta_store=meta,
                          lease_ttl_seconds=2.0)   # heartbeat = 1 s
    gen = root.new_generation_path()
    S.build_ivf_index(emb.filter(F.col("vec_id") < 100), "vec_id",
                      "embedding", gen, n_cells=16, meta_store=meta)
    root.publish(gen)

    def slow_worker(src, dest):
        _time.sleep(2.5)                       # > ttl: would expire
        compact_ivf_index(spark, src, dest, meta_store=meta)

    st = root._replace(spark, slow_worker, "compact")
    assert st["action"] == "compact"
    # ≥2 heartbeats fired during the 2.5 s build (interval 1 s), on
    # both clocks, on top of the start/post-build progress puts
    marker = f"{root.root}/_building/gen-000002.json"
    assert meta.puts.get(marker, 0) >= 4
    assert meta.puts.get(root._lease_path(), 0) >= 3

    # stolen mid-build: the heartbeat detects it and the operation
    # aborts AFTER the build, before publishing over the stealer
    def thief_worker(src, dest):
        meta.delete(root._lease_path())
        meta.put(root._lease_path(),
                 '{"holder": "thief", "ttl_seconds": 3600}')
        _time.sleep(1.5)                       # one heartbeat fires

    with pytest.raises(MaintenanceBusy, match="stolen"):
        root._replace(spark, thief_worker, "compact")
    import json as _json
    assert _json.loads(meta.read(
        root._lease_path()))["holder"] == "thief"   # thief's survives


def test_heartbeat_survives_transient_store_blips(spark, tmp_path):
    """r18 review: one transient store error must not kill the
    heartbeat (silently freezing both freshness clocks for the rest
    of a long build) nor discard the build — the beat skips and
    retries on its next interval; only a STOLEN lease aborts."""
    import time as _time

    from rakam_api_collector_spark.manifest import LocalMetadataStore
    from rakam_api_collector_spark.operators.similarity import \
        compact_ivf_index

    class Flaky(LocalMetadataStore):
        fail_next = 0
        beat_puts = 0

        def put(self, path, content):
            if "_building" in path:
                if Flaky.fail_next > 0:
                    Flaky.fail_next -= 1
                    raise ConnectionError("transient blip")
                Flaky.beat_puts += 1
            super().put(path, content)

    meta = Flaky()
    emb = _emb(spark)
    root = VersionedIndex(str(tmp_path / "idx"), meta_store=meta,
                          lease_ttl_seconds=1.0)  # heartbeat 0.25 s
    gen = root.new_generation_path()
    S.build_ivf_index(emb.filter(F.col("vec_id") < 100), "vec_id",
                      "embedding", gen, n_cells=16, meta_store=meta)
    root.publish(gen)

    def slow_worker(src, dest):
        Flaky.fail_next = 1                    # first beat blips
        _time.sleep(1.2)
        compact_ivf_index(spark, src, dest, meta_store=meta)

    st = root._replace(spark, slow_worker, "compact")
    assert st["action"] == "compact"           # build not discarded
    assert Flaky.beat_puts >= 2                # later beats resumed


def test_generation_claim_conflict_repicks(spark, tmp_path):
    """r18 review: the generation name is claimed by put_if_absent of
    its marker — a name another (stalled) builder claimed in the
    pick-to-stamp gap is re-picked, never clobbered."""
    emb, root = _published_root(spark, tmp_path)
    taken = f"{root.root}/gen-000042"
    root.meta.put(root._marker(taken), '{"action": "rebuild"}')

    class Collide(VersionedIndex):
        picks = 0

        def new_generation_path(self):
            Collide.picks += 1
            if Collide.picks == 1:
                return taken            # the stalled builder's name
            return super().new_generation_path()

    st = Collide(str(tmp_path / "idx")).compact(spark)
    assert st["action"] == "compact"
    assert st["index_path"] != taken           # re-picked
    # the stalled builder's claim survives untouched
    assert root.meta.read(root._marker(taken)) \
        == '{"action": "rebuild"}'
