"""Streaming ANN index maintenance (streaming/annindex.py): a built
IVF / IVF-PQ index grows from a parquet file stream via the persisted
model artifacts — checkpointed (no reprocessing on restart), layout-
introspecting (flat vs PQ, codes-only vs stored-vector), and
at-least-once-safe (replays collapse at search time).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators import similarity as S
from rakam_api_collector_spark.streaming import start_ann_index_stream
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _split_embeddings(spark, tmp_path, cuts=(100, 150)):
    """Built-from corpus (id < cuts[0]) + stream files for the rest,
    one parquet file per (cuts[i], cuts[i+1]) id slice."""
    emb = load_table(spark, SF, "embeddings")
    first = emb.filter(F.col("vec_id") < cuts[0])
    src = tmp_path / "incoming"
    bounds = list(cuts) + [None]
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        part = emb.filter(F.col("vec_id") >= lo)
        if hi is not None:
            part = part.filter(F.col("vec_id") < hi)
        (part.coalesce(1).write.mode("append")
         .parquet(str(src)))
    return emb, first, str(src)


def test_ann_stream_grows_flat_index_and_checkpoints(spark, tmp_path):
    """Draining the stream equals in-memory search over the union
    corpus with the build-time centroids; a restart on the same
    checkpoint with no new files appends nothing; a NEW file after
    restart flows through."""
    emb, first, src = _split_embeddings(spark, tmp_path)
    path = str(tmp_path / "ivf")
    S.build_ivf_index(first, "vec_id", "embedding", path, n_cells=16)

    class Counter:
        n = 0

        def add(self, k):
            Counter.n += k

    kw = dict(index_path=path, id_col="vec_id", vec_col="embedding",
              checkpoint=str(tmp_path / "ckpt"), stats=Counter())
    start_ann_index_stream(spark, src, **kw).awaitTermination(120)
    total = emb.count()
    assert Counter.n == total - 100
    assert spark.read.parquet(path).count() == total

    q = emb.filter(F.col("vec_id") < 5)
    got = {(r.q, r.neighbor, r.rnk) for r in
           S.ivf_index_topk(spark, path, q, "vec_id", "embedding",
                            k=10, nprobe=4).collect()}
    import numpy as np
    cents_rows = (first.filter(F.col("vec_id") < 16)
                  .select("vec_id", "embedding").collect())
    cents = np.asarray([[float(x) for x in r.embedding] for r in
                        sorted(cents_rows, key=lambda r: r.vec_id)])
    mem = {(r.q, r.neighbor, r.rnk) for r in
           S.ivf_topk(emb, q, "vec_id", "embedding", k=10,
                      n_cells=16, nprobe=4, centroids=cents).collect()}
    assert got == mem and len(got) == 50

    # restart, nothing new: checkpoint prevents re-appending
    start_ann_index_stream(spark, src, **kw).awaitTermination(120)
    assert spark.read.parquet(path).count() == total

    # a new file after restart flows through (re-keyed ids so the
    # growth is visible as count, not collapsed duplicates)
    (emb.filter(F.col("vec_id") < 10)
     .select((F.col("vec_id") + 100_000).alias("vec_id"), "embedding")
     .coalesce(1).write.mode("append").parquet(src))
    start_ann_index_stream(spark, src, **kw).awaitTermination(120)
    assert spark.read.parquet(path).count() == total + 10


def test_ann_stream_introspects_pq_layout(spark, tmp_path):
    """With _pq_books.json beside the index the stream appends PQ
    codes (encoded with the persisted codebooks), carrying the stored
    vector iff the index was built with store_vectors — rerank then
    works over STREAMED rows."""
    emb, first, src = _split_embeddings(spark, tmp_path)
    books = S.train_pq_codebooks(first, "vec_id", "embedding",
                                 m=16, nbits=4)
    path = str(tmp_path / "ivfpq")
    S.build_ivf_pq_index(first, "vec_id", "embedding", path,
                         n_cells=16, books=books, store_vectors=True)
    start_ann_index_stream(
        spark, src, index_path=path, id_col="vec_id",
        vec_col="embedding",
        checkpoint=str(tmp_path / "ckpt")).awaitTermination(120)

    idx = spark.read.parquet(path)
    assert idx.count() == emb.count()
    assert "codes" in idx.columns and "_cv" in idx.columns
    assert idx.filter(F.col("_cv").isNull()).count() == 0

    q = emb.filter(F.col("vec_id") < 5)
    refined = S.ivf_pq_index_topk(spark, path, q, "vec_id",
                                  "embedding", k=5, nprobe=8,
                                  rerank_factor=5)
    exact = {(r.q, r.neighbor) for r in
             S.cosine_topk(emb, q, "vec_id", "embedding", k=5).collect()}
    ref = {(r.q, r.neighbor) for r in refined.collect()}
    assert len(ref & exact) / len(exact) >= 0.6


def test_ann_stream_refuses_unbuilt_index(spark, tmp_path):
    """The stream maintains an index, it never trains one: a missing
    _centroids.json raises instead of freezing first-batch vectors as
    an accidental model."""
    with pytest.raises(ValueError, match="no built index"):
        start_ann_index_stream(
            spark, str(tmp_path / "incoming"),
            index_path=str(tmp_path / "nope"), id_col="vec_id",
            vec_col="embedding", checkpoint=str(tmp_path / "ckpt"))
    assert not os.path.exists(str(tmp_path / "nope"))


def test_ann_stream_drift_audit_fires_on_hot_cell(spark, tmp_path):
    """audit_every_n_epochs (r16): the stream polls the footer-only
    cell audit and surfaces drift the moment appends make a rebuild
    due — on_drift receives the stats; without a callback the query
    fails loud instead of letting recall degrade silently. A balanced
    stream never fires."""
    import numpy as np
    from pyspark.errors import StreamingQueryException

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    S.build_ivf_index(emb, "vec_id", "embedding", path, n_cells=16)

    # hot blob: 600 near-identical vectors -> one or two hot cells,
    # imbalance far past the 8x trigger either way
    rng = np.random.default_rng(11)
    base = rng.normal(size=64)
    base /= np.linalg.norm(base)
    src = tmp_path / "hot"
    spark.createDataFrame(
        [(20_000 + i, (base + 0.005 * rng.normal(size=64)).tolist())
         for i in range(600)],
        "vec_id long, embedding array<double>") \
        .coalesce(1).write.parquet(str(src))

    fired = []
    start_ann_index_stream(
        spark, str(src), path, "vec_id", "embedding",
        str(tmp_path / "ck1"), audit_every_n_epochs=1,
        on_drift=fired.append).awaitTermination(120)
    assert fired and fired[0]["max"] >= 400
    assert S.ivf_needs_rebuild(fired[0])

    # default (no callback): the query fails loud BEFORE appending —
    # a fresh checkpoint pointed at the drifted index raises without
    # landing a duplicate copy of the batch (replay-idempotent: every
    # retry re-audits the same pre-append state)
    n_before = spark.read.parquet(path).count()
    q = start_ann_index_stream(
        spark, str(src), path, "vec_id", "embedding",
        str(tmp_path / "ck2"), audit_every_n_epochs=1)
    with pytest.raises(StreamingQueryException, match="drifted"):
        q.awaitTermination(120)
    assert spark.read.parquet(path).count() == n_before  # no append

    # balanced growth never fires: a fresh balanced index streamed
    # with the audit on completes cleanly
    path2 = str(tmp_path / "ivf2")
    S.build_ivf_index(emb.filter("vec_id < 250"), "vec_id",
                      "embedding", path2, n_cells=16)
    src2 = tmp_path / "rest"
    emb.filter("vec_id >= 250").coalesce(1).write.parquet(str(src2))
    calls = []
    start_ann_index_stream(
        spark, str(src2), path2, "vec_id", "embedding",
        str(tmp_path / "ck3"), audit_every_n_epochs=1,
        on_drift=calls.append).awaitTermination(120)
    assert calls == []


def test_compact_ivf_index_folds_stream_files(spark, tmp_path):
    """compact_ivf_index (r16): a multi-epoch streamed index's
    accreted small files fold to one set per cell with the SAME
    centroids — search results identical, every id preserved, file
    count strictly down."""
    emb, first, src = _split_embeddings(spark, tmp_path,
                                        cuts=(100, 150, 200, 250))
    path = str(tmp_path / "ivf")
    S.build_ivf_index(first, "vec_id", "embedding", path, n_cells=16)
    start_ann_index_stream(
        spark, src, path, "vec_id", "embedding",
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1).awaitTermination(120)

    def _n_files(p):
        return sum(1 for root, _, fns in os.walk(p)
                   for f in fns if f.endswith(".parquet"))

    q = emb.filter(F.col("vec_id") < 5)
    before = {(r.q, r.neighbor, r.rnk) for r in
              S.ivf_index_topk(spark, path, q, "vec_id", "embedding",
                               k=10, nprobe=4).collect()}
    n0 = _n_files(path)
    dest = str(tmp_path / "ivf_c")
    S.compact_ivf_index(spark, path, dest)
    assert _n_files(dest) < n0
    assert spark.read.parquet(dest).count() == emb.count()
    after = {(r.q, r.neighbor, r.rnk) for r in
             S.ivf_index_topk(spark, dest, q, "vec_id", "embedding",
                              k=10, nprobe=4).collect()}
    assert after == before


def test_compact_ivf_pq_index_preserves_model(spark, tmp_path):
    """r16 review fix: compacting a store_vectors=True IVF-PQ index
    carries the PQ model through (codes re-encoded with the SAME
    codebooks — search results identical at dest) instead of silently
    downgrading to IVF-flat; a codes-only PQ index refuses loudly
    (codes are not invertible)."""
    emb = load_table(spark, SF, "embeddings")
    books = S.train_pq_codebooks(emb, "vec_id", "embedding",
                                 m=16, nbits=4)
    path = str(tmp_path / "pq")
    S.build_ivf_pq_index(emb, "vec_id", "embedding", path, n_cells=16,
                         books=books, store_vectors=True)
    q = emb.filter(F.col("vec_id") < 5)
    before = {(r.q, r.neighbor) for r in
              S.ivf_pq_index_topk(spark, path, q, "vec_id",
                                  "embedding", k=5, nprobe=8,
                                  rerank_factor=5).collect()}
    dest = str(tmp_path / "pq_c")
    S.compact_ivf_index(spark, path, dest)
    after = {(r.q, r.neighbor) for r in
             S.ivf_pq_index_topk(spark, dest, q, "vec_id",
                                 "embedding", k=5, nprobe=8,
                                 rerank_factor=5).collect()}
    assert after == before and len(after) == 25

    codes_only = str(tmp_path / "pq_co")
    S.build_ivf_pq_index(emb, "vec_id", "embedding", codes_only,
                         n_cells=16, books=books, store_vectors=False)
    with pytest.raises(ValueError, match="codes-only"):
        S.compact_ivf_index(spark, codes_only,
                            str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="codes-only"):
        S.rebuild_ivf_index(spark, codes_only, str(tmp_path / "nope2"))


def test_ann_stream_follows_versioned_root(spark, tmp_path):
    """r17 (VERDICT r16 items 1+2): pointed at a VersionedIndex the
    maintainer appends through the CAS pointer (one version bump per
    epoch), folds files on the compact cadence with identical search
    results, and a RESUMED stream lands new rows in a generation an
    EXTERNAL rebuild swapped in while it was down — the swap is
    followed automatically, no re-point by hand."""
    from rakam_api_collector_spark.operators.indexroot import \
        VersionedIndex

    emb, first, src = _split_embeddings(spark, tmp_path,
                                        cuts=(100, 150, 200, 250))
    root = VersionedIndex(str(tmp_path / "idx"))
    gen1 = root.new_generation_path()
    S.build_ivf_index(first, "vec_id", "embedding", gen1, n_cells=16)
    root.publish(gen1)

    kw = dict(index_root=root, id_col="vec_id", vec_col="embedding",
              checkpoint=str(tmp_path / "ckpt"),
              max_files_per_trigger=1, compact_every_n_epochs=2)
    start_ann_index_stream(spark, src, **kw).awaitTermination(180)

    # 4 stream files = 4 append epochs, compacts after epochs 2 and 4
    actions = [root._read_version(n)["action"]
               for n in root._version_numbers()]
    assert actions == ["publish", "append", "append", "compact",
                       "append", "append", "compact"]
    live = spark.read.parquet(root.current_path())
    assert live.select("neighbor").distinct().count() == emb.count()

    q = emb.filter(F.col("vec_id") < 5)
    got = {(r.q, r.neighbor) for r in
           root.topk(spark, q, "vec_id", "embedding", k=10,
                     nprobe=16).collect()}
    cents = S._read_model(root.meta, root.current_path(),
                          "_centroids.json")
    want = {(r.q, r.neighbor) for r in
            S.ivf_topk(emb, q, "vec_id", "embedding", k=10,
                       nprobe=16, centroids=cents).collect()}
    assert got == want

    # external retrain-and-swap while the stream is down...
    root.rebuild(spark)
    rebuilt = root.current_path()
    n_before = spark.read.parquet(rebuilt).count()
    extra = spark.createDataFrame(
        [(9_000 + i, [float(i % 7) + 0.1] * 64) for i in range(20)],
        "vec_id long, embedding array<float>")   # the table's type
    extra.coalesce(1).write.mode("append").parquet(src)
    # ...the resumed stream (same checkpoint) follows the pointer:
    # the new epoch's append version names the REBUILT generation
    start_ann_index_stream(spark, src, **kw).awaitTermination(180)
    st = root.current()
    assert st["action"] == "append" and st["index_path"] == rebuilt
    live = spark.read.parquet(root.current_path())
    assert live.filter(F.col("neighbor") >= 9_000).count() == 20
    assert live.count() >= n_before + 20


def test_ann_stream_drift_rebuild_closes_the_loop(spark, tmp_path):
    """on_drift="rebuild" (r17): the drift audit's answer is the
    maintainer itself running retrain-and-swap — the stream keeps
    running, the pointer flips to a rebuilt generation whose hot cell
    is split (imbalance back under the trigger), and every id
    (built + streamed) survives the cycle."""
    import numpy as np

    from rakam_api_collector_spark.operators.indexroot import \
        VersionedIndex

    emb = load_table(spark, SF, "embeddings")
    root = VersionedIndex(str(tmp_path / "idx"))
    gen1 = root.new_generation_path()
    S.build_ivf_index(emb, "vec_id", "embedding", gen1, n_cells=16)
    root.publish(gen1)

    # the r16-proven drift regime (test_llm_ops rebuild test): a 300-
    # row blob at 0.01 noise — hot enough to trip the 8x trigger,
    # loose enough that Lloyd's reseeded rounds can actually split it
    rng = np.random.default_rng(7)
    base = rng.normal(size=64)
    base /= np.linalg.norm(base)
    src = tmp_path / "hot"
    spark.createDataFrame(
        [(20_000 + i, (base + 0.01 * rng.normal(size=64)).tolist())
         for i in range(300)],
        "vec_id long, embedding array<double>") \
        .coalesce(1).write.parquet(str(src))

    start_ann_index_stream(
        spark, str(src), index_root=root, id_col="vec_id",
        vec_col="embedding", checkpoint=str(tmp_path / "ck"),
        audit_every_n_epochs=1,
        on_drift="rebuild").awaitTermination(180)

    st = root.current()
    assert st["action"] == "rebuild"
    h = root.health()
    assert h["rows"] == emb.count() + 300
    assert not h["rebuild_due"]            # hot cell split by reseed
    live = spark.read.parquet(root.current_path())
    assert live.select("neighbor").distinct().count() \
        == emb.count() + 300


def test_ann_stream_root_knob_validation(spark, tmp_path):
    """The root-only knobs refuse without a root; path and root are
    mutually exclusive; an unpublished root refuses at start."""
    from rakam_api_collector_spark.operators.indexroot import \
        VersionedIndex

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    S.build_ivf_index(emb, "vec_id", "embedding", path, n_cells=16)
    common = dict(id_col="vec_id", vec_col="embedding",
                  checkpoint=str(tmp_path / "ck"))
    with pytest.raises(ValueError, match="exactly one"):
        start_ann_index_stream(spark, path, **common)
    with pytest.raises(ValueError, match="exactly one"):
        start_ann_index_stream(spark, path, index_path=path,
                               index_root=str(tmp_path / "r"),
                               **common)
    with pytest.raises(ValueError, match="compact_every_n_epochs"):
        start_ann_index_stream(spark, path, index_path=path,
                               compact_every_n_epochs=2, **common)
    with pytest.raises(ValueError, match="rebuild"):
        start_ann_index_stream(spark, path, index_path=path,
                               on_drift="rebuild", **common)
    with pytest.raises(FileNotFoundError, match="no published"):
        start_ann_index_stream(spark, path,
                               index_root=str(tmp_path / "empty"),
                               **common)


def test_ann_stream_gc_cadence_reclaims_superseded_gens(spark,
                                                        tmp_path):
    """gc_keep_versions (r17): a stream that compacts also RECLAIMS —
    after the drain, only the live generation remains on disk, the
    version log is bounded (keep window + newest per-gen reference),
    and search is unaffected."""
    from rakam_api_collector_spark.operators.indexroot import \
        VersionedIndex

    emb, first, src = _split_embeddings(spark, tmp_path,
                                        cuts=(100, 150, 200, 250))
    root = VersionedIndex(str(tmp_path / "idx"))
    gen1 = root.new_generation_path()
    S.build_ivf_index(first, "vec_id", "embedding", gen1, n_cells=16)
    root.publish(gen1)

    start_ann_index_stream(
        spark, src, index_root=root, id_col="vec_id",
        vec_col="embedding", checkpoint=str(tmp_path / "ck"),
        max_files_per_trigger=1, compact_every_n_epochs=2,
        gc_keep_versions=1,
        gc_grace_seconds=0.0).awaitTermination(180)

    gens = [d for d in os.listdir(root.root) if d.startswith("gen-")]
    assert gens == [root.current_path().rsplit("/", 1)[-1]]
    assert root._version_numbers() == [root.current_version()]
    live = spark.read.parquet(root.current_path())
    assert live.select("neighbor").distinct().count() == emb.count()
    q = emb.filter(F.col("vec_id") < 5)
    assert root.topk(spark, q, "vec_id", "embedding", k=10,
                     nprobe=16).count() == 50

    # retention is a version-log property: without a root it refuses
    with pytest.raises(ValueError, match="gc_keep_versions"):
        start_ann_index_stream(
            spark, src, index_path=gen1, id_col="vec_id",
            vec_col="embedding", checkpoint=str(tmp_path / "ck2"),
            gc_keep_versions=1)


def test_ann_stream_retries_stale_append_in_epoch(spark, tmp_path,
                                                  monkeypatch):
    """r18 (VERDICT r17 item 4): an EXTERNAL maintenance swap landing
    while an epoch's physical append is mid-flight no longer fails
    the epoch — the maintainer catches StaleAppend in-epoch,
    re-resolves the pointer, and re-appends to the swapped-in
    generation (bounded retry), so the stream completes without a
    restart; the rows in the superseded generation gc with it and
    retry duplicates collapse at search."""
    from rakam_api_collector_spark.operators.indexroot import \
        VersionedIndex

    emb, first, src = _split_embeddings(spark, tmp_path, cuts=(100,))
    root = VersionedIndex(str(tmp_path / "idx"))
    gen1 = root.new_generation_path()
    S.build_ivf_index(first, "vec_id", "embedding", gen1, n_cells=16)
    root.publish(gen1)

    real = S.append_to_ivf_index
    state = {"swapped": False}

    def hooked(df, i, v, p, meta_store=None):
        if not state["swapped"] and p == gen1:
            # the external window compacts while this epoch's append
            # is still physically writing into gen1
            state["swapped"] = True
            VersionedIndex(root.root).compact(df.sparkSession)
        return real(df, i, v, p, meta_store=meta_store)

    monkeypatch.setattr(S, "append_to_ivf_index", hooked)
    q = start_ann_index_stream(spark, src, index_root=root,
                               id_col="vec_id", vec_col="embedding",
                               checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)                    # no StreamingQueryException
    assert state["swapped"]
    st = root.current()
    assert st["action"] == "append"            # the retry committed...
    assert st["index_path"] != gen1            # ...into the new gen
    live = spark.read.parquet(root.current_path())
    assert live.select("neighbor").distinct().count() == emb.count()
    got = root.topk(spark, emb.filter("vec_id = 120"), "vec_id",
                    "embedding", k=1, nprobe=16).collect()
    assert got and got[0].neighbor != 120


def test_ann_stream_defers_compact_when_lease_held(spark, tmp_path):
    """r18 review: the cadence compact (and the on_drift="rebuild"
    response) defers when an EXTERNAL maintenance window holds the
    root's lease — the epoch completes (its append is never at
    stake), the external holder's lease survives, and once the lease
    is free the next cadence compacts as usual."""
    from rakam_api_collector_spark.operators.indexroot import \
        VersionedIndex

    emb, first, src = _split_embeddings(spark, tmp_path,
                                        cuts=(100, 150))
    root = VersionedIndex(str(tmp_path / "idx"))
    gen1 = root.new_generation_path()
    S.build_ivf_index(first, "vec_id", "embedding", gen1, n_cells=16)
    root.publish(gen1)
    root.meta.put(root._lease_path(),
                  '{"holder": "external-window", "ttl_seconds": 3600}')

    kw = dict(index_root=root, id_col="vec_id", vec_col="embedding",
              checkpoint=str(tmp_path / "ckpt"),
              max_files_per_trigger=1, compact_every_n_epochs=1)
    start_ann_index_stream(spark, src, **kw).awaitTermination(120)
    # both epochs appended; every compact deferred; lease intact
    actions = [root._read_version(n)["action"]
               for n in root._version_numbers()]
    assert actions == ["publish", "append", "append"]
    import json as _json
    assert _json.loads(root.meta.read(
        root._lease_path()))["holder"] == "external-window"

    # lease released: the next cadence compacts again
    root.meta.delete(root._lease_path())
    (emb.filter(F.col("vec_id") < 5)
     .select((F.col("vec_id") + 500_000).alias("vec_id"), "embedding")
     .coalesce(1).write.mode("append").parquet(src))
    start_ann_index_stream(spark, src, **kw).awaitTermination(120)
    assert root.current()["action"] == "compact"
    live = spark.read.parquet(root.current_path())
    assert live.select("neighbor").distinct().count() \
        == emb.count() + 5
