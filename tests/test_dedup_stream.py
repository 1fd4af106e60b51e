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
