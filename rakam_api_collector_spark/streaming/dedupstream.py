"""Streaming corpus dedup: the incremental MinHash signature store
(operators/sigstore.py) driven by a checkpointed stream — documents
arrive continuously, each micro-batch dedups against EVERYTHING
ingested before it (and within itself), and per-batch cost never
re-reads stored text (signatures persist; the store side of the band
join is signature rows only).

The at-least-once seam, spelled out: file-source offsets commit AFTER
``foreachBatch``, so a crash between the store write and the offset
commit replays the batch. Replay is idempotent end to end because
every write is keyed by the EPOCH id — ``MinHashStore.ingest`` takes
``ingest_id=epoch-N`` (its sig/verdict partition overwrites in place
and the match scan excludes it, so a replayed document can never
match its own previous attempt), and the verdict/survivor outputs
overwrite per-epoch directories the same way. This is the
``start_ann_index_stream`` contract applied to dedup state, and the
corpus-scale analog of the reference's RocksDB TTL event dedup
(Deduplicator.java) — its TTL window becomes a persistent store, its
(collection, user, time) key becomes document content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.sigstore import MinHashStore


def start_corpus_dedup_stream(spark: SparkSession,
                              source_dir: str | None,
                              store_path: str, id_col: str,
                              text_col: str, checkpoint: str, *,
                              verdicts_dir: str | None = None,
                              survivors_dir: str | None = None,
                              trigger: dict | None = None,
                              max_files_per_trigger: int | None = None,
                              source_stream: DataFrame | None = None,
                              compact_every_n_epochs: int | None = None,
                              **store_kw):
    """Start the dedup query over a parquet directory of documents
    (schema frozen from a static read, the annindex convention) or an
    explicit ``source_stream``. Returns the StreamingQuery.

    Outputs, both optional and both epoch-overwrite-idempotent:
    ``verdicts_dir`` gets each batch's (id, keep, matched_id,
    est_jac) under ``_epoch=N``; ``survivors_dir`` gets the batch's
    KEPT documents (full input columns) — the curated corpus a
    training pipeline reads downstream.

    ``store_kw`` passes through to :class:`MinHashStore` (num_perm,
    bands, threshold, …); ``bucket_table`` is rejected there — replay
    idempotency requires derived buckets.

    Epoch ingest ids — and the per-epoch verdict/survivor output dirs
    — are namespaced by a token of the CHECKPOINT string (the
    dsirstream rule, r15): epoch ids restart at 0 under a fresh
    checkpoint, and un-namespaced ids would silently OVERWRITE a
    prior run's signature partitions (and epoch outputs) in a shared
    store — replacing stored corpus state, not replaying it.
    Rebinding a store to a new checkpoint instead re-dedups whatever
    the new stream reads against everything stored (the correct
    semantics: already-stored documents win). The token hashes the
    checkpoint string AS GIVEN — deliberately not driver-resolved
    (abspath of a relative path changes with the driver's cwd and
    mangles URIs); pass the same string on every restart, as the
    engine itself requires for the checkpoint to resume.

    LEGACY GUARD (r16, ADVICE r15; scoped to real lineage in r17): ids
    were un-namespaced before r15 (``epoch-N``). Resuming a pre-r15
    checkpoint against its store would replay its in-flight epoch
    under the NEW namespaced id — self-exclusion would miss the old
    partition and every replayed document would be stored twice and
    marked a duplicate of its own prior attempt. The wrapper arms the
    guard ONLY for that lineage — a checkpoint with committed
    progress and no namespaced ids in the store
    (``streaming/_guards.py``) — and then RAISES the moment an epoch
    whose legacy partition exists would ingest. A FRESH checkpoint
    against a drained pre-r15 store starts clean: its epoch numbers
    coincide with legacy partitions by arithmetic, not lineage, and
    the namespaced ids cannot collide (ADVICE r16).

    ``compact_every_n_epochs`` (r16, opt-in) folds the store's epoch
    partitions into one blob every N committed epochs, FROM INSIDE
    ``foreachBatch`` — the one place streaming guarantees the store's
    single-writer window (no concurrent ingest; epochs serialize).
    Enable it only if nothing else ingests into or compacts this
    store, and note SELECT-shaped readers outside the stream must
    tolerate the window too (the store contract). Replays compose:
    a replayed epoch a prior compact already folded no-ops its ingest
    and the follow-up compact sees ≤1 partition and returns 0."""
    import hashlib

    from rakam_api_collector_spark.streaming._guards import \
        legacy_replay_ids

    store = MinHashStore(spark, store_path, **store_kw)
    ck_token = hashlib.md5(checkpoint.encode()).hexdigest()[:8]
    # non-empty ONLY for a resumed pre-r15 checkpoint whose replay
    # window is still open — a fresh checkpoint against a drained
    # legacy store starts clean (see streaming/_guards.py)
    legacy_ids = legacy_replay_ids(store.ingest_ids(), checkpoint,
                                   ck_token)

    if source_stream is not None:
        src = source_stream
    else:
        schema = spark.read.parquet(source_dir).schema
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger",
                                   max_files_per_trigger)
        src = reader.parquet(source_dir)

    def process(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        if legacy_ids and (f"epoch-{epoch_id}" in legacy_ids
                           or f"epoch-{epoch_id:012d}" in legacy_ids):
            raise ValueError(
                f"store at {store_path!r} holds epoch {epoch_id} "
                f"under a pre-r15 un-namespaced id — replaying it "
                f"namespaced would store its documents twice and "
                f"mark them duplicates of their own prior attempt. "
                f"Drain the pre-upgrade checkpoint, rename the "
                f"store partition to "
                f"_ingest=epoch-{ck_token}-{epoch_id:012d}, or "
                f"restart under a FRESH checkpoint (new path) — a "
                f"fresh lineage cannot replay legacy epochs and "
                f"starts unguarded")
        verdict = store.ingest(
            batch, id_col, text_col,
            ingest_id=f"epoch-{ck_token}-{epoch_id:012d}")
        if verdicts_dir is not None:
            (verdict.write.mode("overwrite")
             .parquet(f"{verdicts_dir}/_epoch={ck_token}-{epoch_id}"))
        if survivors_dir is not None:
            # kept is ≤ one id per batch doc (a pruned scan of the
            # just-written verdict partition) — broadcast it so the
            # survivor join re-reads the batch without shuffling it
            # (r18, guide §3.1; the batch side is micro-batch-bounded
            # but still the big side here)
            kept = verdict.filter("keep").select(id_col)
            (batch.join(F.broadcast(kept), id_col)
             .write.mode("overwrite")
             .parquet(f"{survivors_dir}/_epoch={ck_token}-{epoch_id}"))
        if compact_every_n_epochs \
                and (epoch_id + 1) % compact_every_n_epochs == 0:
            store.compact()

    trig = trigger or {"availableNow": True}
    return (src.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(**trig).start())
