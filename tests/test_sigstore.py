"""Incremental signature-store dedup: batch N+1 against batch N's
persisted signatures, without re-reading batch N's text.

Ground truth comes from the exact ngram_jaccard_pairs operator (the
fixture plants natural near-dups — e.g. 0≈50, 8≈12 — in addition to the
perturbed copies these tests add). Every true pair here has Jaccard
≥ 0.85 and every non-pair ≤ 0.1, so the store's lane-agreement estimate
(sd ≈ 0.03 at 128 perms) cannot flip a verdict at threshold 0.5.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.dedup import ngram_jaccard_pairs
from rakam_api_collector_spark.operators.sigstore import MinHashStore
from rakam_api_collector_spark.operators.text import tokens
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark, lo, hi):
    return (load_table(spark, SF, "documents")
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .select("doc_id", "text"))


def _perturbed(df, offset=10000):
    t = tokens(F.col("text"))
    return df.select(
        (F.col("doc_id") + offset).alias("doc_id"),
        F.array_join(F.slice(t, 3, F.greatest(F.size(t) - 2, F.lit(0))),
                     " ").alias("text"))


def _neighbors(corpus) -> dict[int, set[int]]:
    """True near-dup adjacency from the exact operator."""
    adj: dict[int, set[int]] = {}
    for r in ngram_jaccard_pairs(corpus, "doc_id", "text", threshold=0.5,
                                 max_shingle_freq=None).collect():
        adj.setdefault(r.a, set()).add(r.b)
        adj.setdefault(r.b, set()).add(r.a)
    return adj


def _expected_keep(batch_ids, stored_ids, adj) -> dict[int, bool]:
    """The store's greedy contract: a doc is dropped iff it has a true
    near-dup among stored docs or smaller-id docs of the same batch."""
    out = {}
    for i in sorted(batch_ids):
        near = adj.get(i, set())
        out[i] = not (near & stored_ids
                      or {j for j in near if j in batch_ids and j < i})
    return out


def _check_batch(verdict_rows, batch_ids, stored_ids, adj):
    expect = _expected_keep(batch_ids, stored_ids, adj)
    got = {r.doc_id: r for r in verdict_rows}
    assert set(got) == set(batch_ids)
    for i, keep in expect.items():
        assert got[i].keep == keep, f"doc {i}: keep={got[i].keep}"
        if not keep:
            assert got[i].matched_id in adj[i]
            assert got[i].est_jac >= 0.5
    return {i for i, k in expect.items() if k}


def test_incremental_dedup_across_batches(spark, tmp_path):
    store = MinHashStore(spark, str(tmp_path / "store"), threshold=0.5)
    b1 = _docs(spark, 0, 40)
    b2 = _docs(spark, 40, 60).unionByName(_perturbed(_docs(spark, 0, 20)))
    adj = _neighbors(b1.unionByName(b2))

    b1_ids = {r.doc_id for r in b1.select("doc_id").collect()}
    v1 = store.ingest(b1, "doc_id", "text").collect()
    stored = _check_batch(v1, b1_ids, set(), adj)
    assert len(stored) < len(b1_ids)        # fixture has in-batch dups

    b2_ids = {r.doc_id for r in b2.select("doc_id").collect()}
    v2 = store.ingest(b2, "doc_id", "text").collect()
    kept2 = _check_batch(v2, b2_ids, stored, adj)
    # every perturbed copy of a STORED original must be caught
    assert all(i + 10000 not in kept2 for i in range(20) if i in stored)
    # the store grew by only the surviving docs
    assert store.stored_sigs().count() == len(stored) + len(kept2)


def test_store_survives_reopen(spark, tmp_path):
    path = str(tmp_path / "store")
    MinHashStore(spark, path).ingest(_docs(spark, 0, 20),
                                     "doc_id", "text")
    # a fresh instance (new session lifecycle analog) sees the signatures
    reopened = MinHashStore(spark, path)
    v = reopened.ingest(_perturbed(_docs(spark, 0, 20)), "doc_id", "text")
    assert v.filter("keep").count() == 0            # all 20 are copies


def test_streaming_foreachbatch_dedup(spark, tmp_path):
    """The wiring the verdict asked for: a file-source stream where each
    micro-batch dedups against the signatures persisted by the previous
    one."""
    src = tmp_path / "incoming"
    f1 = _docs(spark, 0, 30)
    f2 = _docs(spark, 30, 40).unionByName(_perturbed(_docs(spark, 0, 10)))
    f1.coalesce(1).write.parquet(str(src / "f1"))
    f2.coalesce(1).write.parquet(str(src / "f2"))
    adj = _neighbors(f1.unionByName(f2))
    f1_ids = {r.doc_id for r in f1.select("doc_id").collect()}
    f2_ids = {r.doc_id for r in f2.select("doc_id").collect()}
    keep1 = _expected_keep(f1_ids, set(), adj)
    stored1 = {i for i, k in keep1.items() if k}
    keep2 = _expected_keep(f2_ids, stored1, adj)

    store = MinHashStore(spark, str(tmp_path / "store"))
    verdicts: list[tuple[int, int, int]] = []       # (batch, kept, dropped)

    def process(batch_df, batch_id):
        v = store.ingest(batch_df, "doc_id", "text")
        verdicts.append((batch_id, v.filter("keep").count(),
                         v.filter("NOT keep").count()))

    schema = "doc_id long, text string"
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1)
         .parquet(str(src / "*"))
         .writeStream.foreachBatch(process)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    n_keep1 = sum(keep1.values())
    n_keep2 = sum(keep2.values())
    assert [v[1:] for v in sorted(verdicts)] == [
        (n_keep1, len(f1_ids) - n_keep1),
        (n_keep2, len(f2_ids) - n_keep2)]
    # every perturbed copy of a stored doc was dropped in batch 2
    assert all(not keep2[i + 10000] for i in range(10) if i in stored1)
    assert store.stored_sigs().count() == n_keep1 + n_keep2


def test_bucketed_catalog_table_layout(spark, tmp_path):
    """bucketBy(bh) + saveAsTable: the store side of the band join is
    pre-shuffled on disk, so reading it back carries bucket metadata."""
    store = MinHashStore(spark, str(tmp_path / "store"),
                         bucket_table="sigstore_buckets_test")
    try:
        store.ingest(_docs(spark, 0, 20), "doc_id", "text")
        assert spark.catalog.tableExists("sigstore_buckets_test")
        v = store.ingest(_perturbed(_docs(spark, 0, 20)),
                         "doc_id", "text")
        assert v.filter("keep").count() == 0
        # the catalog table carries the bucket spec (the band join's
        # store side is pre-shuffled on disk)
        desc = "\n".join(f"{r[0]} {r[1]}" for r in spark.sql(
            "DESC EXTENDED sigstore_buckets_test").collect())
        assert "Num Buckets 64" in desc
        assert "Bucket Columns [`bh`]" in desc
    finally:
        spark.sql("DROP TABLE IF EXISTS sigstore_buckets_test")


def test_compact_preserves_dedup_and_replay_contract(spark, tmp_path):
    """compact() (r15): every epoch partition folds into one blob
    with dedup behavior unchanged — a compacted store gives the SAME
    verdicts as an uncompacted twin on the next batch — and the
    replay contract survives: a replayed MERGED ingest returns its
    stored verdict (it must NOT recompute and match its own previous
    attempt, which would mark every doc a self-duplicate); post-blob
    epochs land beside the blob and a second compact folds them."""
    import os

    a = MinHashStore(spark, str(tmp_path / "a"), threshold=0.5)
    b = MinHashStore(spark, str(tmp_path / "b"), threshold=0.5)
    batches = [(_docs(spark, 0, 20), "e0"),
               (_docs(spark, 20, 40), "e1"),
               (_perturbed(_docs(spark, 0, 10)), "e2")]
    verdicts = {}
    for df, eid in batches:
        verdicts[eid] = {r.doc_id: (r.keep, r.matched_id) for r in
                         a.ingest(df, "doc_id", "text",
                                  ingest_id=eid).collect()}
        b.ingest(df, "doc_id", "text", ingest_id=eid)

    assert a.compact() == 3
    sig_dirs = [d for d in os.listdir(tmp_path / "a" / "sigs")
                if d.startswith("_ingest=")]
    assert len(sig_dirs) == 1 and sig_dirs[0].startswith("_ingest=_c-")
    assert a.stored_sigs().count() == b.stored_sigs().count()

    # replayed merged ingest: the STORED verdict, not a recompute
    replay = {r.doc_id: (r.keep, r.matched_id) for r in
              a.ingest(batches[2][0], "doc_id", "text",
                       ingest_id="e2").collect()}
    assert replay == verdicts["e2"]
    assert a.stored_sigs().count() == b.stored_sigs().count()

    # the next REAL batch dedups identically against blob vs partitions
    nxt = _docs(spark, 40, 50).unionByName(_perturbed(_docs(spark, 20, 30)))
    va = {r.doc_id: (r.keep, r.matched_id)
          for r in a.ingest(nxt, "doc_id", "text",
                            ingest_id="e3").collect()}
    vb = {r.doc_id: (r.keep, r.matched_id)
          for r in b.ingest(nxt, "doc_id", "text",
                            ingest_id="e3").collect()}
    assert va == vb
    # and a replayed NOT-yet-merged epoch still excludes itself
    va_replay = {r.doc_id: (r.keep, r.matched_id)
                 for r in a.ingest(nxt, "doc_id", "text",
                                   ingest_id="e3").collect()}
    assert va_replay == va

    # second compact folds blob + the new epochs together
    assert a.compact() == 2  # blob + e3 (the replay overwrote in place)
    assert a.stored_sigs().count() == b.stored_sigs().count()


def test_compact_crash_recovery(spark, tmp_path):
    """r16 contract: store OPENS are passive (an open can never roll
    back another process's live compaction — ADVICE r15) and READS
    resolve crash leftovers from the metadata alone: a manifest-less
    blob and a resurrected merged-input dir are both dead to reads the
    moment the store is opened, while the destructive convergence
    (roll back / roll forward / sweep) runs inside ingest()/compact()
    — the operations the single-writer window already serializes."""
    import json as _json

    path = tmp_path / "s"
    store = MinHashStore(spark, str(path), threshold=0.5)
    store.ingest(_docs(spark, 0, 20), "doc_id", "text", ingest_id="e0")
    store.ingest(_docs(spark, 20, 40), "doc_id", "text",
                 ingest_id="e1")
    n = store.stored_sigs().count()

    # (a) manifest-less blob: PASSIVE open leaves it on disk but reads
    # exclude it; compact() rolls it back and folds e0+e1
    dead = path / "sigs" / "_ingest=_c-dead"
    spark.createDataFrame([(999,)], "_id long").write.parquet(str(dead))
    s2 = MinHashStore(spark, str(path), threshold=0.5)
    assert dead.exists()                           # open is passive
    assert s2.stored_sigs().count() == n           # ...reads resolve
    assert s2.compact() == 2
    assert not dead.exists()                       # rolled back
    assert s2.stored_sigs().count() == n

    # (b) record lost + merged input resurrected: reads derive the
    # folded set from the blob's own _inputs manifest (no doubling on
    # a passive open); ingest-time recovery re-records and sweeps,
    # and a replayed MERGED ingest still returns its stored verdict
    with open(path / "_merged.json", "w") as f:
        _json.dump({"ids": []}, f)
    leftover = path / "sigs" / "_ingest=e0"
    spark.createDataFrame([(999,)], "_id long") \
        .write.parquet(str(leftover))
    s3 = MinHashStore(spark, str(path), threshold=0.5)
    assert s3.merged_ids() == set()                # record really lost
    assert leftover.exists()                       # open is passive
    assert s3.stored_sigs().count() == n           # ...reads resolve
    replay = s3.ingest(_docs(spark, 0, 20), "doc_id", "text",
                       ingest_id="e0")             # recovery runs here
    assert replay.count() == _docs(spark, 0, 20).count()
    assert {"e0", "e1"} <= s3.merged_ids()         # rolled forward
    assert not leftover.exists()                   # swept
    assert s3.stored_sigs().count() == n
