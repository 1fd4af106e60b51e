"""Streaming ANN index maintenance: keep a persisted IVF / IVF-PQ
index fresh as embeddings arrive.

The 100 TB ingest shape: the index is BUILT once from a training
corpus (``build_ivf_index`` / ``build_ivf_pq_index`` — the model
artifacts, coarse centroids and PQ codebooks, are fixed at build
time), then a Structured Streaming query appends each micro-batch of
new vectors encoded with the persisted model — partition-wise
appends, never a re-read or rewrite of existing index files — so
ingest cost is O(batch) regardless of index size and searches keep
the nprobe/n_cells read fraction while the stream runs.

Semantics are at-least-once end to end: file-source offsets commit to
the checkpoint AFTER the ``foreachBatch`` append, so a crash between
append and offset commit replays the batch on restart; duplicate
(q, neighbor) pairs collapse at search time (``ivf_index_topk`` /
``ivf_pq_index_topk`` groupBy before the top-k window), making a
replay a storage cost, never a correctness one — the same contract as
the dead-letter spool (``pipeline._spool_dead_letters``) and the
incremental signature store (``operators/sigstore.py``). Model drift
stays the operator's responsibility: rebuild when the corpus
distribution moves (the FAISS add-with-fixed-model convention;
``append_to_ivf_index``'s docstring).

Reference parity: the reference maintains no ANN index — this is the
training-data-pipeline surface (SURVEY §2 similarity search) made
continuous, the same buffer→commit rhythm its middleware applies to
table shards (middleware/MiddlewareBuffer.java:34-54) applied to
index partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rakam_api_collector_spark.operators.similarity import (
    _model_meta, append_to_ivf_index, append_to_ivf_pq_index)


def start_ann_index_stream(spark: SparkSession, source_dir: str | None,
                           index_path: str, id_col: str, vec_col: str,
                           checkpoint: str, *,
                           trigger: dict | None = None,
                           max_files_per_trigger: int | None = None,
                           source_stream: DataFrame | None = None,
                           meta_store=None, stats=None,
                           audit_every_n_epochs: int | None = None,
                           on_drift=None):
    """Start a streaming query appending new embedding rows to the
    persisted ANN index at ``index_path``. Returns the StreamingQuery.

    The index layout is INTROSPECTED, not configured: a
    ``_pq_books.json`` beside the data means IVFADC (PQ codes are
    encoded with the persisted codebooks, and the stored-vector column
    follows the built layout — see ``append_to_ivf_pq_index``);
    otherwise IVF-flat. A missing ``_centroids.json`` raises — the
    stream maintains an index, it never trains one (bootstrapping from
    an unseen distribution would silently freeze arbitrary first-batch
    centroids as the model; build deliberately, then stream).

    The default source is a parquet directory (``source_dir``), schema
    frozen from a static read at start so late-arriving files can't
    widen the stream schema mid-query; pass ``source_stream`` (any
    streaming DataFrame carrying ``id_col`` + ``vec_col``) to feed
    from a connector source instead. ``trigger`` defaults to
    availableNow (drain-and-stop, for tests); pass
    ``{"processingTime": "15 seconds"}`` for a live cadence.

    ``stats`` (optional) is a counter sink with ``.add(n_rows)`` —
    the committer-metrics shape (streaming/committer.py) — called once
    per non-empty micro-batch with the appended row count.
    ``meta_store`` routes the model-artifact reads (and this
    introspection) through the manifest seam — the object-store index
    path (r16, operators/similarity.py:_model_meta).

    ``audit_every_n_epochs`` (r16, opt-in) runs the footer-only
    cell-balance audit (``similarity.ivf_cell_stats``) every N
    committed epochs and, when the max/median drift trigger fires
    (``ivf_needs_rebuild``), calls ``on_drift(stats)`` — the operable
    half of the frozen-centroid contract: the stream itself cannot
    rebuild (readers must switch to the rebuilt path — the manifest
    swap rule), but it can tell the operator the moment appends have
    made a rebuild due instead of leaving recall to degrade silently.
    ``on_drift`` defaults to raising RuntimeError (fail loud beats
    quiet recall loss; pass a callback to alert instead). The audit
    reads parquet footers only — KBs per file, no Spark job.
    """
    meta = _model_meta(index_path, meta_store)
    if meta.read_if_exists(f"{index_path}/_centroids.json") is None:
        raise ValueError(f"no built index at {index_path} — run "
                         "build_ivf_index/build_ivf_pq_index first")
    pq = meta.read_if_exists(f"{index_path}/_pq_books.json") is not None
    append = append_to_ivf_pq_index if pq else append_to_ivf_index

    if source_stream is not None:
        src = source_stream
    else:
        schema = spark.read.parquet(source_dir).schema
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger",
                                   max_files_per_trigger)
        src = reader.parquet(source_dir)
    src = src.select(id_col, vec_col)

    def _audit_fire():
        from rakam_api_collector_spark.operators.similarity import (
            ivf_cell_stats, ivf_needs_rebuild)
        cell_stats = ivf_cell_stats(index_path, meta_store=meta_store)
        if not ivf_needs_rebuild(cell_stats):
            return
        if on_drift is not None:
            on_drift(cell_stats)
        else:
            raise RuntimeError(
                f"IVF index at {index_path} drifted: imbalance "
                f"{cell_stats['imbalance']} (max {cell_stats['max']}"
                f" / median {cell_stats['median']}) — rebuild due "
                "(similarity.rebuild_ivf_index)")

    def process(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        audit_due = (audit_every_n_epochs
                     and (epoch_id + 1) % audit_every_n_epochs == 0)
        if audit_due and on_drift is None:
            # fail-loud path audits BEFORE the append: the raise
            # leaves the epoch uncommitted, and a replay re-audits
            # the same pre-append state and raises again WITHOUT
            # appending — raising after the append would re-append
            # the batch into the already-drifted index on every
            # retry/restart (duplicates growing the hot cell). The
            # cost is one audited epoch of lag on the epoch that
            # itself introduces the drift.
            _audit_fire()
        append(batch, id_col, vec_col, index_path,
               meta_store=meta_store)
        if stats is not None:
            # opt-in extra action per micro-batch, the A2-counter
            # pattern (pipeline.start_ingest_stream's stats kwarg)
            stats.add(batch.count())
        if audit_due and on_drift is not None:
            # callback path audits the POST-append state (no replay
            # hazard: the callback mutates nothing in the index)
            _audit_fire()

    trig = trigger or {"availableNow": True}
    return (src.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(**trig).start())
