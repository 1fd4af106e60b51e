"""Persisted MinHash signature store — incremental dedup for streaming
corpora.

At 100 TB you never re-sign the whole corpus per batch: signatures are
computed once per document and persisted; deduping batch N+1 is a band
join of the *new batch's* buckets (tiny) against the stored bucket
table, then a lane-agreement Jaccard estimate over the full signatures —
no text from previously ingested documents is ever re-read.

Layout under ``path/``:

- ``sigs/_ingest=<id>/`` — one row per document of that ingest batch:
  (_id, _sig array<num_perm longs>, _bands array<bands longs>,
  matched_id, est_jac, keep). The VERDICT and the STORE are one
  parquet: ``ingest`` runs a single Spark job whose write IS the
  verdict output (keep=false rows name the surviving duplicate), and
  store reads simply filter ``keep`` — the previous protocol's
  separate verdict-checkpoint job and survivor-append job folded into
  one (the round-7 llm17 perf debt). The returned verdict re-reads
  this ingest's partition — file scan, no lineage re-run.
  Lifecycle (r15): a long-running stream accretes one partition per
  epoch; ``compact()`` merges them into one ``_ingest=_c-*`` blob
  (original ingest ids carried in ``_orig``) so the store-side scan
  lists one directory regardless of stream age. The replay contract
  survives: a replayed MERGED ingest returns its stored verdict from
  the blob (recomputing would match it against its own previous
  attempt), and the match exclusion filters ``_orig`` too.
  r16: the store's PROTOCOL state (the ``_merged`` record, blob
  ``_inputs.json`` commit markers, listings, maintenance deletes)
  rides the manifest ``MetadataStore`` seam — pass an
  ``ObjectMetadataStore`` and the store, compaction included, lives
  on S3/GCS; opens are PASSIVE and reads resolve crash leftovers
  from the metadata alone (``_dead_ids``), so only ingest()/compact()
  — inside the single-writer window — ever delete anything.
- ``buckets/`` — one row per KEPT (doc, band): (_id, band, bh), written
  ONLY with ``bucket_table`` set: then it is a catalog table
  ``CLUSTERED BY (bh)`` (``bucketBy`` + ``saveAsTable``) so the store
  side of the join is pre-shuffled on disk — the per-batch join then
  shuffles only the new batch. Without a durable metastore, bucket
  rows are derived from ``sigs/`` by a ``posexplode`` at read, which
  costs the same as scanning a plain buckets parquet (one shuffle of
  (long, int, long) rows at the join, never text).

Verification is the *estimate* path: est_jac = fraction of agreeing
signature lanes (sd ≈ sqrt(s(1-s)/num_perm) ≈ 0.03 at num_perm=128) —
the standard incremental form, since stored docs have no text here.
Callers wanting exact Jaccard re-join candidate ids to their own text
store (same shape as minhash_lsh_pairs' verify step).

Reference parity: the reference dedups events inside a TTL window via a
RocksDB store keyed on (collection, user, time)
(ingestion/../Deduplicator.java) — this is the corpus-scale analog for
document content, with the state store swapped for a persisted,
band-keyed parquet table.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, DoubleType,
                               LongType, StringType, StructField,
                               StructType)

from rakam_api_collector_spark.manifest import (MetadataStore,
                                                resolve_meta_store)

from rakam_api_collector_spark.operators.dedup import minhash_signatures

_SIGS_SCHEMA = StructType([
    StructField("_id", LongType()),
    StructField("_sig", ArrayType(LongType())),
    StructField("_bands", ArrayType(LongType())),
    StructField("matched_id", LongType()),
    StructField("est_jac", DoubleType()),
    StructField("keep", BooleanType()),
    StructField("_orig", StringType()),        # pre-compaction ingest id
    StructField("_ingest", StringType()),      # hive partition column
])


class MinHashStore:
    """Incremental MinHash-LSH dedup against a persisted signature table.

    ``ingest(docs)`` is the pipeline stage: signs the batch, finds
    matches against the store AND within the batch, returns a per-doc
    (id, keep, matched_id, est_jac) verdict, and appends the surviving
    documents' signatures to the store.
    """

    def __init__(self, spark: SparkSession, path: str, *,
                 num_perm: int = 128, n: int = 3, bands: int = 64,
                 threshold: float = 0.5,
                 max_shingle_freq: int | None = 10_000,
                 bucket_table: str | None = None,
                 num_buckets: int = 64,
                 meta_store: MetadataStore | None = None,
                 broadcast_guard_bytes: int = 2 << 30):
        """``meta_store`` routes the store's PROTOCOL state — the
        ``_merged`` record, blob ``_inputs.json`` commit markers,
        partition listings, and maintenance deletes — exactly as
        :class:`~rakam_api_collector_spark.manifest.MetadataStore`
        routes the manifest txn log (r16, VERDICT r15 item 1): pass an
        ``ObjectMetadataStore`` and the store lives on S3/GCS,
        compaction included. Default: POSIX. Data reads/writes go
        through Spark's own filesystems either way.

        Opening a store is PASSIVE (r16): crashed-compaction recovery
        runs inside ``ingest()``/``compact()`` — operations the
        single-writer maintenance window already excludes — so an open
        during a live ``compact()`` can no longer roll it back, and
        every read resolves crash leftovers from the metadata instead
        of requiring a destructive sweep first (``_dead_ids``).

        ``broadcast_guard_bytes`` (r19, ADVICE r18): ``ingest`` arms
        the match DAG's batch-side broadcast hints only while the
        batch's Catalyst size ESTIMATE (from the docs frame's source
        stats) stays under this ceiling; a grossly mis-sized batch
        (availableNow over a huge backlog with no trigger cap) falls
        back to shuffle joins — slower, but it degrades instead of
        failing the broadcast build. The default 2 GiB is conservative
        against the 8 GiB broadcast hard cap: signatures+bands expand
        docs bytes by roughly (num_perm + bands·2) ints ≈ 1 KB/doc,
        comparable to fixture doc text, and an estimate within 4× of
        the cap is not a margin to run a stream at."""
        self.spark = spark
        self.path = path.rstrip("/")
        self.meta = resolve_meta_store(self.path, meta_store,
                                       "MinHashStore")
        self.num_perm, self.n, self.bands = num_perm, n, bands
        self.threshold = threshold
        self.max_shingle_freq = max_shingle_freq
        self.bucket_table = bucket_table
        self.num_buckets = num_buckets
        self.broadcast_guard_bytes = broadcast_guard_bytes
        self._exists: dict[str, bool] = {}

    # -- storage ------------------------------------------------------------

    def _read_or_empty(self, sub: str, schema: StructType) -> DataFrame:
        # existence probed via the Hadoop FS API, not a caught
        # AnalysisException: the exception path costs a full JVM stack
        # per probe and _matches builds the store scan on every batch.
        # Memoized once true — a store directory never disappears
        # mid-run (gc removes ingest partitions, not the root).
        if not self._exists.get(sub):
            jvm = self.spark._jvm
            p = jvm.org.apache.hadoop.fs.Path(f"{self.path}/{sub}")
            fs = p.getFileSystem(
                self.spark._jsc.hadoopConfiguration())
            if not fs.exists(p):
                return self.spark.createDataFrame([], schema)
            self._exists[sub] = True
        return self.spark.read.schema(schema).parquet(
            f"{self.path}/{sub}")

    def _dead_ids(self) -> list[str]:
        """Partition ids a correct read must exclude — crash leftovers
        no maintenance pass has swept yet: ids already folded into a
        committed blob (their rows would double against the blob's)
        and blobs whose ``_inputs.json`` commit marker never landed
        (their rows duplicate the still-live inputs). Resolving these
        at READ time — the manifest lesson: state lives in metadata,
        not in what a listing happens to contain — is what lets store
        opens stay passive. Almost always empty (one listing + one
        small read; no filter is added to the plan when it is)."""
        base = f"{self.path}/sigs"
        ids = {d.split("=", 1)[1] for d in self.meta.list(base)
               if d.startswith("_ingest=")}
        # folded = the authoritative merged set: the _merged record
        # (a cache) UNION every committed blob's own _inputs manifest
        # — so a crash between a compact's commit marker and its
        # record step still excludes the blob's inputs from reads
        folded = self.merged_ids()
        dead: set[str] = set()
        for i in ids:
            if not i.startswith("_c-"):
                continue
            raw = self.meta.read_if_exists(
                f"{base}/_ingest={i}/_inputs.json")
            if raw is None:
                dead.add(i)           # uncommitted blob
            else:
                folded |= set(json.loads(raw)["ids"])
        dead |= ids & folded
        return sorted(dead)

    def _sigs_all(self) -> DataFrame:
        """Every COMMITTED signature row (verdict history included):
        the raw partitioned read minus crash leftovers."""
        df = self._read_or_empty("sigs", _SIGS_SCHEMA)
        dead = self._dead_ids()
        if dead:
            df = df.filter(~F.col("_ingest").isin(dead))
        return df

    def stored_sigs(self, exclude_ingest: str | None = None) -> DataFrame:
        """Surviving documents' signatures — the store a new batch
        dedups against (keep=false rows are verdict history, not
        corpus state). ``exclude_ingest`` drops one ingest's rows from
        the view: the replay-idempotency hook — a re-run of ingest N
        must not match its documents against their own previous
        attempt. For live partitions the exclusion is the partition
        value (pruned); for rows a compact() folded into a blob it is
        the carried ``_orig`` id (row filter over the one blob)."""
        df = self._sigs_all()
        if exclude_ingest is not None:
            df = df.filter(
                (F.col("_ingest").isNull()
                 | (F.col("_ingest") != exclude_ingest))
                & (F.col("_orig").isNull()
                   | (F.col("_orig") != exclude_ingest)))
        return df.filter("keep").select("_id", "_sig", "_bands")

    # -- compaction (the DsirFeatureStore lifecycle, sig-store form) ---------

    @property
    def _merged_path(self) -> str:
        return f"{self.path}/_merged.json"

    def merged_ids(self) -> set[str]:
        """Ingest ids whose rows live in a compacted blob — a replayed
        ingest of one of these returns its STORED verdict (recomputing
        would match the replay against its own previous attempt, now
        inside the blob, and mark every document a duplicate of
        itself)."""
        raw = self.meta.read_if_exists(self._merged_path)
        return set(json.loads(raw)["ids"]) if raw is not None else set()

    def _record_merged(self, ids: set[str]) -> None:
        # monotone append-only set, written under the single-writer
        # maintenance window — last-writer-wins overwrite is safe (a
        # concurrent roll-forward recorders' union is re-derived from
        # the blobs' _inputs.json on the next recovery either way)
        out = sorted(self.merged_ids() | ids)
        self.meta.put(self._merged_path, json.dumps({"ids": out}))

    def _delete_dir(self, d: str) -> None:
        try:
            self.meta.delete_tree(d)
        except FileNotFoundError:
            pass                      # concurrent sweep won

    def ingest_ids(self) -> set[str]:
        """Every ingest id the store has committed state for: live
        epoch partition ids plus ids a compact() folded into a blob —
        the stream wrappers' pre-start audit surface (legacy-id
        detection, streaming/dedupstream.py)."""
        base = f"{self.path}/sigs"
        live = {d.split("=", 1)[1] for d in self.meta.list(base)
                if d.startswith("_ingest=")
                and not d.startswith("_ingest=_c-")}
        return live | self.merged_ids()

    def _recover_compactions(self) -> None:
        """Converge a crashed compact(): a blob whose ``_inputs.json``
        ids are not yet recorded rolls FORWARD (record, then sweep) —
        transient double-presence of blob + input rows is
        verdict-idempotent here (max-by best-match over duplicated
        candidates yields the same verdict), so unlike the DSIR
        store's counts no pre-commit staging is needed; recorded
        leftovers sweep. Runs from ``ingest()``/``compact()`` only
        (r16): both sit inside the single-writer maintenance window,
        so the roll-BACK branch can never delete a blob a LIVE
        compactor is still building — the race a recovery-on-open
        had. Reads need no recovery at all (``_dead_ids``)."""
        base = f"{self.path}/sigs"
        dirs = self.meta.list(base)
        merged = self.merged_ids()
        pending: set[str] = set()
        for d in dirs:
            if not d.startswith("_ingest=_c-"):
                continue
            raw = self.meta.read_if_exists(f"{base}/{d}/_inputs.json")
            if raw is not None:
                pending |= set(json.loads(raw)["ids"]) - merged
            elif d.split("=", 1)[1] not in merged:
                # blob written but its manifest never landed: its
                # inputs are intact — roll back
                self._delete_dir(f"{base}/{d}")
        if pending:
            self._record_merged(pending)
            merged |= pending
        if merged:
            for d in dirs:
                if d.startswith("_ingest=") \
                        and d.split("=", 1)[1] in merged:
                    self._delete_dir(f"{base}/{d}")

    def compact(self) -> int:
        """Merge every sig partition into ONE blob (``_ingest=_c-*``,
        original ingest ids carried in ``_orig``): the store side of
        every future match scan lists one directory instead of one
        per epoch. Returns the number of partitions merged. Replay
        contract preserved: ``ingest`` of a merged id returns the
        blob's stored verdict and the match exclusion also filters on
        ``_orig``. Single-writer maintenance window, like
        run_maintenance and the DSIR store's compact — the window
        covers ingest/select but NOT store opens or reads (both are
        passive since r16). On an object store the listings, merged
        record, and deletes all ride ``meta_store``."""
        self._recover_compactions()
        base = f"{self.path}/sigs"
        parts = sorted(d.split("=", 1)[1] for d in self.meta.list(base)
                       if d.startswith("_ingest="))
        if len(parts) <= 1:
            return 0
        cid = f"_c-{uuid.uuid4().hex[:12]}"
        # the write executes immediately (before any delete), so the
        # read's plan-time file listing is already frozen — no
        # checkpoint needed
        (self._sigs_all()
         .withColumn("_orig", F.coalesce("_orig", "_ingest"))
         .drop("_ingest")
         .write.mode("overwrite").parquet(f"{base}/_ingest={cid}"))
        # COMMIT POINT: one atomic object create — until it lands the
        # blob is dead to every reader (_dead_ids) and rolls back
        self.meta.put_if_absent(f"{base}/_ingest={cid}/_inputs.json",
                                json.dumps({"ids": sorted(parts)}))
        self._record_merged(set(parts))
        for p in parts:
            self._delete_dir(f"{base}/_ingest={p}")
        return len(parts)

    def stored_buckets(self) -> DataFrame:
        if self.bucket_table and self.spark.catalog.tableExists(
                self.bucket_table):
            return self.spark.table(self.bucket_table)
        return self.stored_sigs().select(
            "_id", F.posexplode("_bands").alias("band", "bh"))

    def append(self, sigs: DataFrame) -> None:
        """Persist (_id, _sig, _bands) rows as already-kept store state
        (bulk load / migration path — ``ingest`` writes its own verdict
        partition); with ``bucket_table`` also materialize the exploded
        band-keyed bucket table pre-shuffled on bh."""
        out = (sigs.select("_id", "_sig", "_bands")
               .withColumn("matched_id", F.lit(None).cast("long"))
               .withColumn("est_jac", F.lit(None).cast("double"))
               .withColumn("keep", F.lit(True)))
        (out.write.mode("overwrite")
         .parquet(f"{self.path}/sigs/_ingest={uuid.uuid4().hex}"))
        if self.bucket_table:
            self._append_buckets(sigs)

    def _append_buckets(self, kept_sigs: DataFrame) -> None:
        buckets = kept_sigs.select(
            "_id", F.posexplode("_bands").alias("band", "bh"))
        (buckets.write.mode("append")
         .bucketBy(self.num_buckets, "bh").sortBy("bh")
         .option("path", f"{self.path}/buckets")
         .format("parquet").saveAsTable(self.bucket_table))

    # -- dedup --------------------------------------------------------------

    def signatures(self, docs: DataFrame, id_col: str,
                   text_col: str) -> DataFrame:
        return minhash_signatures(docs, id_col, text_col, self.num_perm,
                                  self.n, self.bands,
                                  self.max_shingle_freq, with_sig=True)

    @staticmethod
    def _batch_is_bounded(docs: DataFrame, cap_bytes: int) -> bool:
        """Catalyst size estimate of the batch's docs frame vs the
        broadcast guard ceiling. Sentinel-aware: an UNKNOWN estimate
        (stats unavailable, or the Long.MaxValue default a checkpointed
        / RDD-backed lineage reports) keeps the documented contract —
        micro-batches are trigger-bounded, hints stay armed — because
        tripping the guard on "unknown" would silently strip the
        at-scale plan from every legitimately tiny createDataFrame or
        post-checkpoint batch. Only a REAL estimate above the ceiling
        disarms the hints."""
        try:
            est = int(docs._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes())
        except Exception:  # noqa: BLE001 — estimate is best-effort
            return True
        return not (0 < est < (1 << 62)) or est <= cap_bytes

    @staticmethod
    def _est_jac(a, b) -> F.Column:
        """Lane-agreement Jaccard estimate: E[#{i: sig_a[i]==sig_b[i]}]
        / num_perm = J(A,B) (MinHash collision probability)."""
        eq = F.zip_with(a, b, lambda x, y: (x == y).cast("int"))
        return (F.aggregate(eq, F.lit(0), lambda acc, x: acc + x)
                / F.size(a))

    def _matches(self, new_sigs: DataFrame,
                 exclude_ingest: str | None = None,
                 broadcast_batch: bool = True) -> DataFrame:
        """(new_id, matched_id, est_jac): new docs vs the STORE plus new
        docs vs smaller-id docs in the SAME batch (greedy in-batch rule:
        first id of a duplicate group survives). One bucket join: the
        store's buckets and the batch's own buckets union into a single
        tagged right side, so the new batch's (id, band, bh) stream is
        scanned and shuffled once instead of once per candidate
        source.

        ``broadcast_batch`` arms the batch-side broadcast hints (the
        r18 store-never-shuffles plan). Broadcast-memory contract,
        stated precisely (ADVICE r18): the hinted builds are (a) the
        batch's exploded band stream — |batch| × ``bands`` small rows
        (the bands multiplier is why trigger sizing, not |batch| alone,
        bounds it), (b) the candidate PAIRS as bare ids — |batch| ×
        store-band-collision rows, collision-bounded, NOT |batch|-
        bounded on a duplicate-heavy store, which is why the pairs
        broadcast carries no signature payload (r19: the ~1 KB ``_sig``
        arrays attach via the O(batch) ``sig_new`` broadcast AFTER the
        store probe, so candidate multiplicity can no longer multiply
        payload bytes into a broadcast build) — and (c) the batch
        signatures, |batch| × ~1 KB. Callers whose batch is NOT
        trigger-bounded pass ``broadcast_batch=False`` and take the
        shuffle join (``ingest`` derives this from the docs-side size
        estimate — the guard a mis-sized availableNow backlog needs to
        degrade to a slow shuffle instead of a broadcast OOM)."""
        hint = F.broadcast if broadcast_batch else (lambda df: df)
        nb = new_sigs.select("_id", F.posexplode("_bands")
                             .alias("band", "bh"))
        stored = self.stored_sigs(exclude_ingest)  # ONE store scan
        # build per batch:
        # both the bucket side and the verify side reference it (each
        # read.parquet costs a driver-side file listing on a growing
        # store — and the plan dedups to one physical scan)
        if self.bucket_table and self.spark.catalog.tableExists(
                self.bucket_table):
            # bucketed catalog store: keep the store join SEPARATE so
            # the bucketed scan's HashPartitioning(bh) satisfies the
            # join distribution and only the tiny batch side shuffles —
            # a union would erase that partitioning and re-shuffle the
            # ever-growing store every batch
            store_cand = (nb.join(self.stored_buckets()
                                  .select(F.col("_id").alias("_old"),
                                          "band", "bh"),
                                  ["band", "bh"])
                          .select("_id", "_old"))
            batch_cand = (nb.join(nb.select(F.col("_id").alias("_old"),
                                            "band", "bh"),
                                  ["band", "bh"])
                          .filter(F.col("_old") < F.col("_id"))
                          .select("_id", "_old"))
            cand = store_cand.unionByName(batch_cand).distinct()
        else:
            # derived store buckets (a plain parquet scan with no
            # useful partitioning): one tagged union join. The BATCH
            # side broadcasts (r18, guide §3.1): it is bounded by the
            # micro-batch contract (maxFilesPerTrigger /
            # maxOffsetsPerTrigger upstream), while the union side
            # grows with the STORE — a shuffle join would re-shuffle
            # every stored (id, band, bh) row per batch, O(store)
            # network each epoch; with the batch side broadcast the
            # store is scanned, never shuffled
            right = (stored
                     .select("_id", F.posexplode("_bands")
                             .alias("band", "bh"))
                     .select(F.col("_id").alias("_old"), "band", "bh")
                     .withColumn("_stored", F.lit(True))
                     .unionByName(nb.select(F.col("_id").alias("_old"),
                                            "band", "bh")
                                  .withColumn("_stored", F.lit(False))))
            cand = (hint(nb).join(right, ["band", "bh"])
                    .filter(F.col("_stored")
                            | (F.col("_old") < F.col("_id")))
                    .select("_id", "_old").distinct())

        # verify side, same asymmetry (r18, payload-free since r19):
        # sig_all is O(store) and ~1 KB/row (the full _sig array) — it
        # must stay a pure scan, never shuffled per batch. The
        # candidate PAIRS broadcast as bare ids and probe the store
        # scan on _old; the batch signatures (_sn, genuinely O(batch))
        # attach afterwards by their own broadcast. The old shape
        # broadcast cand WITH _sn attached — candidate multiplicity ×
        # ~1 KB payload in one broadcast build, the ADVICE r18 hazard.
        # Join order is inner-associative and est_jac per (new, old)
        # pair is plan-independent, so verdicts are unchanged.
        sig_all = (stored.select("_id", "_sig")
                   .unionByName(new_sigs.select("_id", "_sig"))
                   .select(F.col("_id").alias("_old"),
                           F.col("_sig").alias("_so")))
        sig_new = new_sigs.select("_id", F.col("_sig").alias("_sn"))
        return (sig_all.join(hint(cand), "_old")
                .join(hint(sig_new), "_id")
                .select("_id", F.col("_old").alias("matched_id"),
                        self._est_jac(F.col("_sn"), F.col("_so"))
                        .alias("est_jac"))
                .filter(F.col("est_jac") >= self.threshold))

    def ingest(self, docs: DataFrame, id_col: str,
               text_col: str, ingest_id: str | None = None) -> DataFrame:
        """One incremental batch: returns (id, keep, matched_id,
        est_jac) — keep=false rows name the surviving duplicate — and
        persists the batch's signatures + verdict to the store in the
        SAME Spark job: the parquet write IS the verdict
        materialization (store reads filter ``keep``), replacing the
        previous checkpoint-then-append two-job protocol. The returned
        verdict frame re-reads this ingest's ``_ingest=<id>`` partition
        — a pruned file scan, never a lineage re-run.

        ``ingest_id`` (default: a fresh uuid) makes a RE-RUN of the
        same logical batch idempotent — the streaming wrapper's
        at-least-once hook (streaming/dedupstream.py): the partition
        overwrites in place, and the match scan EXCLUDES it, so a
        replayed document can never be marked a duplicate of its own
        previous attempt. Incompatible with ``bucket_table`` (that
        table appends non-idempotently; derived buckets re-read the
        sig partitions, so exclusion covers them)."""
        if ingest_id is not None and self.bucket_table:
            raise ValueError(
                "explicit ingest_id (replay idempotency) requires "
                "derived buckets — bucket_table appends are not "
                "replay-safe")
        # converge any crashed compact() BEFORE consulting merged_ids:
        # a compact that died past its commit point but before its
        # record step would otherwise hide folded ids from the replay
        # check. ingest sits inside the single-writer window, so this
        # can never touch a live compactor's state (r16 — recovery
        # moved here from __init__).
        self._recover_compactions()
        ingest_id = ingest_id or uuid.uuid4().hex
        if ingest_id in self.merged_ids():
            # a compact() folded this ingest into a blob: return its
            # STORED verdict — recomputing would match the replayed
            # docs against their own previous attempt (the exclusion
            # can no longer drop a whole partition) and mark every
            # document a duplicate of itself
            return (self._sigs_all()
                    .filter(F.col("_orig") == ingest_id)
                    .select(F.col("_id").alias(id_col), "keep",
                            "matched_id", "est_jac"))
        # EAGER localCheckpoint, not cache() (r19): the write job
        # references sigs in FIVE DAG branches (the band stream twice,
        # the new-sig verify side, the union'd store side, the verdict
        # join), and AQE submits their stage-materialization jobs
        # CONCURRENTLY — with a lazy cache every consumer found the
        # cache cold and recomputed the full tokenize+shingle+minhash
        # lineage in parallel (measured: five ~equal 33-task jobs per
        # batch, submitted within 60 ms of each other — a cold-cache
        # stampede; cache blocks only help the consumers that start
        # AFTER the first finishes). One eager job signs the batch
        # once; every consumer then reads checkpoint blocks. Blocks
        # are reclaimed by the ContextCleaner when the frame is
        # collected (the dsir.py rule), and signatures are pure
        # functions of the text, so materializing them changes nothing.
        # the broadcast guard reads the DOCS estimate (real source
        # stats), not the signature frame's — post-checkpoint lineage
        # reports the unknown-size sentinel (see _batch_is_bounded)
        bounded = self._batch_is_bounded(docs, self.broadcast_guard_bytes)
        sigs = self.signatures(docs, id_col, text_col).localCheckpoint()
        best = (self._matches(sigs, exclude_ingest=ingest_id,
                              broadcast_batch=bounded)
                .groupBy("_id")
                .agg(F.max_by("matched_id", "est_jac").alias("matched_id"),
                     F.max("est_jac").alias("est_jac")))
        # best is ≤ one row per batch doc — broadcast it so the
        # verdict join never shuffles the batch signatures (r18);
        # same guard as the match DAG
        out = (sigs.join(F.broadcast(best) if bounded else best,
                         "_id", "left")
               .withColumn("keep", F.col("matched_id").isNull()))
        # the ONE action of the batch; overwrite of a fresh uuid dir is
        # also retry-idempotent per ingest call
        (out.select("_id", "_sig", "_bands",
                    "matched_id", "est_jac", "keep")
         .write.mode("overwrite")
         .parquet(f"{self.path}/sigs/_ingest={ingest_id}"))
        # (checkpoint blocks are reclaimed when `sigs` goes out of
        # scope — no unpersist counterpart needed)
        # read back the exact partition directory — no discovery walk
        # over the whole (growing) store just to prune back to one dir
        this = self.spark.read.schema(
            StructType([f for f in _SIGS_SCHEMA
                        if f.name != "_ingest"])).parquet(
            f"{self.path}/sigs/_ingest={ingest_id}")
        if self.bucket_table:
            # bucket rows for the survivors, from the just-written
            # parquet (a pruned scan — no recompute of the match DAG)
            self._append_buckets(this.filter("keep"))
        return this.select(F.col("_id").alias(id_col), "keep",
                           "matched_id", "est_jac")
