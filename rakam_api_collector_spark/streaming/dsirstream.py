"""Streaming DSIR featurization: documents are tokenized, gram-hashed,
and LM-counted ONCE — in the micro-batch that ingests them — so the
data-selection step later never re-reads text.

Batch ``dsir_select`` scans the raw TEXT corpus three times, and
tokenization dominates each scan; at 100 TB that triple scan is the
cost. This stream moves featurization to ingest time: each micro-batch
appends its pre-aggregated (id, bucket, cnt) features and its B-row
bucket-count partial to a :class:`~rakam_api_collector_spark.operators
.dsir.DsirFeatureStore`, after which ``store.select(target, ..., k)``
is an O(epochs·B) counts aggregate plus one broadcast Δlogp join over
integer features — identical ids/weights/order to the batch form
(same md5 chain; equivalence pinned in tests/test_dsir.py). Scoring
happens at SELECT time against the full accumulated LM, so streaming
introduces no early-document weight drift by construction.

The at-least-once seam, same as ``start_corpus_dedup_stream``: file-
source offsets commit AFTER ``foreachBatch``, so a crash between the
store write and the offset commit replays the batch; both store writes
are keyed by the EPOCH id and overwrite their ``_ingest`` partition in
place, so a replay replaces — never double-counts — its previous
attempt.

Reference relation: the reference has no data-selection stage; this is
the LLM-pipeline surface (SURVEY §"beyond the reference") given the
same ingest-time rhythm its buffer→commit middleware applies to table
shards (middleware/MiddlewareBuffer.java:34-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rakam_api_collector_spark.operators.dsir import DsirFeatureStore


def start_dsir_feature_stream(spark: SparkSession,
                              source_dir: str | None,
                              store_path: str, id_col: str,
                              text_col: str, checkpoint: str, *,
                              n: int = 2, buckets: int = 10_000,
                              trigger: dict | None = None,
                              max_files_per_trigger: int | None = None,
                              source_stream: DataFrame | None = None,
                              compact_every_n_epochs: int | None = None,
                              meta_store=None, stats=None):
    """Start the featurization query over a parquet directory of
    documents (schema frozen from a static read, the annindex
    convention) or an explicit ``source_stream``. Returns the
    StreamingQuery; the store is readable (and selectable) while the
    stream runs — a select sees every fully-committed epoch.

    ``stats`` (optional) is a counter sink with ``.add(n_docs)`` —
    the committer-metrics shape — called once per non-empty batch
    ATTEMPT: an at-least-once replay that re-ingests an epoch counts
    again (the store stays exact; the counter counts work done, the
    committer convention).

    Epoch ingest ids are namespaced by a token of the CHECKPOINT
    path: Structured Streaming epoch ids restart at 0 under a fresh
    checkpoint, and un-namespaced ids would silently OVERWRITE a
    prior run's epochs in a shared store (replace-on-replay is the
    contract within one checkpoint lineage, data loss across two).
    The flip side is explicit: rebinding a store to a new checkpoint
    re-ingests whatever the new stream reads beside the old rows —
    point a fresh store at a fresh checkpoint, or dedup upstream.
    The token hashes the checkpoint string AS GIVEN — deliberately
    not driver-resolved (abspath of a relative path changes with the
    driver's cwd and mangles URIs); pass the same string on every
    restart, as the engine itself requires for the checkpoint to
    resume.

    LEGACY GUARD (r16, ADVICE r15 — the dedupstream rule; scoped to
    real lineage in r17): ids were un-namespaced before r15
    (``epoch-N``). Resuming a pre-r15 checkpoint would replay its
    in-flight epoch under the NEW namespaced id — the replay would
    land BESIDE the old partition and double-count every document.
    The wrapper arms the guard ONLY for that lineage — a checkpoint
    with committed progress and no namespaced ids in the store
    (``streaming/_guards.py``) — and then raises the moment an epoch
    whose legacy partition exists would ingest. A FRESH checkpoint
    against a drained pre-r15 store starts clean: its epoch numbers
    coincide with legacy partitions by arithmetic, not lineage
    (ADVICE r16).

    ``compact_every_n_epochs`` (r16, opt-in) folds the store's epoch
    partition pairs into one blob pair every N committed epochs, from
    inside ``foreachBatch`` — the one place streaming guarantees the
    single-writer window (epochs serialize; no concurrent ingest).
    Enable only if nothing else ingests into or compacts this store,
    and run selects outside the compaction instants (the store
    contract). ``meta_store`` passes through to the store — the
    object-store seam."""
    import hashlib

    from rakam_api_collector_spark.streaming._guards import \
        legacy_replay_ids

    store = DsirFeatureStore(spark, store_path, n=n, buckets=buckets,
                             meta_store=meta_store)
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
                f"namespaced would double-count its documents. Drain "
                f"the pre-upgrade checkpoint, rename the store "
                f"partitions to "
                f"_ingest=epoch-{ck_token}-{epoch_id:012d}, or "
                f"restart under a FRESH checkpoint (new path) — a "
                f"fresh lineage cannot replay legacy epochs and "
                f"starts unguarded")
        ingested = store.ingest(
            batch, id_col, text_col,
            ingest_id=f"epoch-{ck_token}-{epoch_id:012d}")
        if stats is not None:
            stats.add(ingested)
        if compact_every_n_epochs \
                and (epoch_id + 1) % compact_every_n_epochs == 0:
            store.compact()

    trig = trigger or {"availableNow": True}
    return (src.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(**trig).start())
