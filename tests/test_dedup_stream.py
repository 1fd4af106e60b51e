"""Streaming corpus dedup (streaming/dedupstream.py): cross-batch
dedup against the persistent signature store, checkpointed restarts,
and epoch-keyed replay idempotency (a re-run of the same ingest must
not mark documents duplicates of their own previous attempt).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.sigstore import MinHashStore
from rakam_api_collector_spark.streaming import \
    start_corpus_dedup_stream

DOC_A = ("the quick brown fox jumps over the lazy dog and then "
         "wanders off into the deep green forest looking for food")
DOC_A_NEAR = ("the quick brown fox jumps over the lazy dog and then "
              "wanders off into the deep green forest hunting for food")
DOC_B = ("completely different content about distributed query "
         "engines shuffling partitioned columnar data across executors")
DOC_C = ("a third unrelated document discussing tokenizer vocabularies "
         "and byte pair encoding merge tables for language models")


def _write(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(path)


def test_cross_batch_dedup_and_restart(spark, tmp_path):
    src = str(tmp_path / "incoming")
    _write(spark, src, [(1, DOC_A), (2, DOC_B)])

    kw = dict(store_path=str(tmp_path / "store"), id_col="doc_id",
              text_col="text", checkpoint=str(tmp_path / "ckpt"),
              verdicts_dir=str(tmp_path / "verdicts"),
              survivors_dir=str(tmp_path / "kept"),
              threshold=0.5)
    start_corpus_dedup_stream(spark, src, **kw).awaitTermination(180)

    v1 = {r.doc_id: r for r in
          spark.read.parquet(str(tmp_path / "verdicts")).collect()}
    assert v1[1].keep and v1[2].keep            # nothing to match yet

    # batch 2 arrives AFTER a restart: the near-dup of doc 1 must
    # match across the batch boundary through the persisted store
    _write(spark, src, [(3, DOC_A_NEAR), (4, DOC_C)])
    start_corpus_dedup_stream(spark, src, **kw).awaitTermination(180)

    verdicts = {r.doc_id: r for r in
                spark.read.parquet(str(tmp_path / "verdicts")).collect()}
    assert len(verdicts) == 4                   # no reprocessing of 1/2
    assert not verdicts[3].keep and verdicts[3].matched_id == 1
    assert verdicts[3].est_jac >= 0.5
    assert verdicts[4].keep

    kept = {r.doc_id for r in
            spark.read.parquet(str(tmp_path / "kept")).collect()}
    assert kept == {1, 2, 4}                    # the curated corpus
    # survivors carry full input columns (+ the hive epoch partition)
    assert spark.read.parquet(str(tmp_path / "kept")).columns \
        == ["doc_id", "text", "_epoch"]


def test_replayed_ingest_is_idempotent(spark, tmp_path):
    """The exact crash-replay scenario: ingest N ran (store written),
    the offset never committed, ingest N runs again with the SAME
    epoch id and the SAME documents — every document must keep its
    original verdict instead of matching its own previous attempt,
    and the store must not grow."""
    store = MinHashStore(spark, str(tmp_path / "store"), threshold=0.5)
    docs = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B)], "doc_id long, text string")
    first = {r.doc_id: r.keep for r in
             store.ingest(docs, "doc_id", "text",
                          ingest_id="epoch-7").collect()}
    assert first == {1: True, 2: True}

    replay = {r.doc_id: r.keep for r in
              store.ingest(docs, "doc_id", "text",
                           ingest_id="epoch-7").collect()}
    assert replay == {1: True, 2: True}         # NOT self-duplicates
    assert store.stored_sigs().count() == 2     # overwrote, not grew

    # a DIFFERENT ingest id still matches against epoch-7's docs
    near = spark.createDataFrame([(9, DOC_A_NEAR)],
                                 "doc_id long, text string")
    v = store.ingest(near, "doc_id", "text",
                     ingest_id="epoch-8").collect()[0]
    assert not v.keep and v.matched_id == 1

    import pytest
    with pytest.raises(ValueError, match="bucket_table"):
        MinHashStore(spark, str(tmp_path / "s2"),
                     bucket_table="t").ingest(docs, "doc_id", "text",
                                              ingest_id="epoch-1")


def test_legacy_guard_scoped_to_resumed_lineage(spark, tmp_path):
    """r17 (ADVICE r16): the pre-r15 legacy-id guard fires ONLY on the
    lineage that can actually replay — a resumed checkpoint with
    committed progress and no namespaced ids in the store. A FRESH
    checkpoint against a store holding legacy partitions (even for
    epoch 0, which always collides numerically) starts clean: its
    namespaced ids cannot collide and no replay hazard exists."""
    import os

    import pytest
    from pyspark.errors import StreamingQueryException

    src = str(tmp_path / "incoming")
    _write(spark, src, [(1, DOC_A), (2, DOC_B)])
    store_path = str(tmp_path / "store")

    # a drained pre-r15 store: legacy partitions for epochs 0 AND 99
    store = MinHashStore(spark, store_path, threshold=0.5)
    for did, doc, eid in [(50, DOC_C, "epoch-000000000099"),
                          (60, DOC_A_NEAR, "epoch-000000000000")]:
        store.ingest(spark.createDataFrame([(did, doc)],
                                           "doc_id long, text string"),
                     "doc_id", "text", ingest_id=eid)
    # FRESH checkpoint: epoch 0 collides with 'epoch-0' by number
    # only — pre-r17 this raised (the ADVICE false positive); now it
    # ingests namespaced, stored docs winning matches as usual
    start_corpus_dedup_stream(
        spark, src, store_path=store_path, id_col="doc_id",
        text_col="text", checkpoint=str(tmp_path / "ck1"),
        threshold=0.5).awaitTermination(180)
    # doc 1 (DOC_A) deduped against the planted legacy doc 60
    # (DOC_A_NEAR) — stored docs win; doc 2 ingested namespaced
    assert store.stored_sigs().count() == 3      # 50 + 60 + 2

    # resumed PRE-R15 lineage: drain one epoch under ck2, then
    # rewrite its committed partition to the un-namespaced id
    # pre-r15 code would have used, and plant store state for the
    # NEXT epoch (the crash-before-offset-commit leftover). Resuming
    # ck2 replays epoch 1 against a store with commits-but-no-
    # namespaced-ids: the genuine double-ingest hazard — guard fires
    # BEFORE any store write.
    store2_path = str(tmp_path / "store2")
    src2 = str(tmp_path / "incoming2")
    _write(spark, src2, [(1, DOC_A)])
    kw = dict(store_path=store2_path, id_col="doc_id",
              text_col="text", checkpoint=str(tmp_path / "ck2"),
              threshold=0.5, max_files_per_trigger=1)
    start_corpus_dedup_stream(spark, src2, **kw).awaitTermination(180)
    sigs = f"{store2_path}/sigs"
    [tokened] = os.listdir(sigs)
    os.rename(f"{sigs}/{tokened}",
              f"{sigs}/_ingest=epoch-000000000000")
    store2 = MinHashStore(spark, store2_path, threshold=0.5)
    store2.ingest(spark.createDataFrame([(70, DOC_B)],
                                        "doc_id long, text string"),
                  "doc_id", "text", ingest_id="epoch-000000000001")
    n = store2.stored_sigs().count()
    _write(spark, src2, [(3, DOC_C)])            # makes epoch 1 fire
    q = start_corpus_dedup_stream(spark, src2, **kw)
    with pytest.raises(StreamingQueryException, match="pre-r15"):
        q.awaitTermination(180)
    assert MinHashStore(spark, store2_path, threshold=0.5) \
        .stored_sigs().count() == n              # nothing landed


def test_legacy_replay_ids_branches(tmp_path):
    """The guard-arming decision table (streaming/_guards.py), pure:
    no legacy ids → off; namespaced ids for this token present → off
    (replay window already cleared); fresh checkpoint → off; resumed
    checkpoint without namespaced ids → ON (including the ADVICE r17
    crash shape: offsets/0 written, commits/0 never — the replayable
    in-flight epoch a commits-based probe misread as fresh);
    unprobeable URI checkpoint → conservative ON."""
    import os

    from rakam_api_collector_spark.streaming._guards import \
        legacy_replay_ids

    ck = str(tmp_path / "ck")
    os.makedirs(f"{ck}/offsets")
    legacy = {"epoch-000000000000", "epoch-000000000007"}

    assert legacy_replay_ids(set(), ck, "abcd1234") == set()
    # fresh checkpoint (offsets dir empty — nothing ever planned)
    assert legacy_replay_ids(legacy, ck, "abcd1234") == set()
    # truly fresh (no checkpoint dir at all)
    assert legacy_replay_ids(legacy, str(tmp_path / "nope"),
                             "abcd1234") == set()
    # ADVICE r17: offsets/0 exists, commits/ does not — a pre-r15 run
    # that planned (and possibly half-ingested) epoch 0 and crashed
    # before its commit marker. Structured Streaming WILL replay
    # epoch 0 on resume, so the guard must arm.
    with open(f"{ck}/offsets/0", "w") as f:
        f.write("v1")
    assert legacy_replay_ids(legacy, ck, "abcd1234") == legacy
    # resumed with committed progress, no namespaced ids: armed
    os.makedirs(f"{ck}/commits")
    with open(f"{ck}/commits/0", "w") as f:
        f.write("v1")
    assert legacy_replay_ids(legacy, ck, "abcd1234") == legacy
    # resumed but this token already committed post-r15: cleared
    assert legacy_replay_ids(
        legacy | {"epoch-abcd1234-000000000002"}, ck,
        "abcd1234") == set()
    # URI checkpoint: unprobeable, conservative
    assert legacy_replay_ids(legacy, "s3://bkt/ck",
                             "abcd1234") == legacy


def test_dedup_stream_scheduled_compaction(spark, tmp_path):
    """compact_every_n_epochs (r16, VERDICT r15 item 4): a multi-epoch
    drain with the hook on ends with ONE compacted blob, verdicts
    identical to the unhooked run, and the replay contract intact —
    a resumed drain re-ingests nothing and a replayed merged epoch
    returns its stored verdict."""
    import os

    src = str(tmp_path / "incoming")
    for rows in [[(1, DOC_A), (2, DOC_B)], [(3, DOC_A_NEAR)],
                 [(4, DOC_C)],
                 [(5, "yet another entirely unrelated text about "
                      "parquet footer statistics and row group "
                      "pruning strategies in columnar scans")]]:
        _write(spark, src, rows)

    kw = dict(store_path=str(tmp_path / "store"), id_col="doc_id",
              text_col="text", checkpoint=str(tmp_path / "ckpt"),
              verdicts_dir=str(tmp_path / "verdicts"), threshold=0.5,
              max_files_per_trigger=1, compact_every_n_epochs=2)
    start_corpus_dedup_stream(spark, src, **kw).awaitTermination(240)

    sig_parts = [d for d in os.listdir(tmp_path / "store" / "sigs")
                 if d.startswith("_ingest=")]
    assert len(sig_parts) == 1                   # one blob
    assert sig_parts[0].startswith("_ingest=_c-")

    verdicts = {r.doc_id: r for r in
                spark.read.parquet(str(tmp_path / "verdicts"))
                .collect()}
    assert len(verdicts) == 5
    assert all(verdicts[i].keep for i in (1, 2, 4, 5))
    assert not verdicts[3].keep and verdicts[3].matched_id == 1

    # resumed drain: nothing new, store unchanged
    start_corpus_dedup_stream(spark, src, **kw).awaitTermination(120)
    store = MinHashStore(spark, str(tmp_path / "store"), threshold=0.5)
    assert store.stored_sigs().count() == 4
