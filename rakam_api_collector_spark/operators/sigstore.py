"""Persisted MinHash signature store — incremental dedup for streaming
corpora.

At 100 TB you never re-sign the whole corpus per batch: signatures are
computed once per document and persisted; deduping batch N+1 is a band
join of the *new batch's* buckets (tiny) against the stored bucket
table, then a lane-agreement Jaccard estimate over the full signatures —
no text from previously ingested documents is ever re-read.

Layout under ``path/``:

- ``sigs/``    — one row per document: (_id, _sig array<num_perm longs>,
  _bands array<bands longs>).
- ``buckets/`` — one row per (doc, band): (_id, band, bh), written ONLY
  with ``bucket_table`` set: then it is a catalog table ``CLUSTERED BY
  (bh)`` (``bucketBy`` + ``saveAsTable``) so the store side of the join
  is pre-shuffled on disk — the per-batch join then shuffles only the
  new batch. Without a durable metastore, bucket rows are derived from
  ``sigs/`` by a ``posexplode`` at read, which costs the same as
  scanning a plain buckets parquet (one shuffle of (long, int, long)
  rows at the join, never text) and halves the write jobs per batch.

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, LongType, StructField,
                               StructType)

from rakam_api_collector_spark.operators.dedup import minhash_signatures

_SIGS_SCHEMA = StructType([
    StructField("_id", LongType()),
    StructField("_sig", ArrayType(LongType())),
    StructField("_bands", ArrayType(LongType())),
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
                 num_buckets: int = 64):
        self.spark = spark
        self.path = path.rstrip("/")
        self.num_perm, self.n, self.bands = num_perm, n, bands
        self.threshold = threshold
        self.max_shingle_freq = max_shingle_freq
        self.bucket_table = bucket_table
        self.num_buckets = num_buckets

    # -- storage ------------------------------------------------------------

    def _read_or_empty(self, sub: str, schema: StructType) -> DataFrame:
        try:
            return self.spark.read.schema(schema).parquet(
                f"{self.path}/{sub}")
        except Exception:
            return self.spark.createDataFrame([], schema)

    def stored_sigs(self) -> DataFrame:
        return self._read_or_empty("sigs", _SIGS_SCHEMA)

    def stored_buckets(self) -> DataFrame:
        if self.bucket_table and self.spark.catalog.tableExists(
                self.bucket_table):
            return self.spark.table(self.bucket_table)
        return self.stored_sigs().select(
            "_id", F.posexplode("_bands").alias("band", "bh"))

    def append(self, sigs: DataFrame) -> None:
        """Persist (_id, _sig, _bands) rows; with ``bucket_table`` also
        materialize the exploded band-keyed bucket table pre-shuffled
        on bh (otherwise buckets are derived at read)."""
        (sigs.select("_id", "_sig", "_bands")
         .write.mode("append").parquet(f"{self.path}/sigs"))
        if self.bucket_table:
            buckets = sigs.select(
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
    def _est_jac(a, b) -> F.Column:
        """Lane-agreement Jaccard estimate: E[#{i: sig_a[i]==sig_b[i]}]
        / num_perm = J(A,B) (MinHash collision probability)."""
        eq = F.zip_with(a, b, lambda x, y: (x == y).cast("int"))
        return (F.aggregate(eq, F.lit(0), lambda acc, x: acc + x)
                / F.size(a))

    def _matches(self, new_sigs: DataFrame) -> DataFrame:
        """(new_id, matched_id, est_jac): new docs vs the STORE plus new
        docs vs smaller-id docs in the SAME batch (greedy in-batch rule:
        first id of a duplicate group survives). One bucket join: the
        store's buckets and the batch's own buckets union into a single
        tagged right side, so the new batch's (id, band, bh) stream is
        scanned and shuffled once instead of once per candidate
        source."""
        nb = new_sigs.select("_id", F.posexplode("_bands")
                             .alias("band", "bh"))
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
            # useful partitioning): one tagged union join scans and
            # shuffles the batch's bucket stream once
            right = (self.stored_buckets()
                     .select(F.col("_id").alias("_old"), "band", "bh")
                     .withColumn("_stored", F.lit(True))
                     .unionByName(nb.select(F.col("_id").alias("_old"),
                                            "band", "bh")
                                  .withColumn("_stored", F.lit(False))))
            cand = (nb.join(right, ["band", "bh"])
                    .filter(F.col("_stored")
                            | (F.col("_old") < F.col("_id")))
                    .select("_id", "_old").distinct())

        sig_all = (self.stored_sigs().select("_id", "_sig")
                   .unionByName(new_sigs.select("_id", "_sig"))
                   .select(F.col("_id").alias("_old"),
                           F.col("_sig").alias("_so")))
        sig_new = new_sigs.select("_id", F.col("_sig").alias("_sn"))
        return (cand.join(sig_new, "_id").join(sig_all, "_old")
                .select("_id", F.col("_old").alias("matched_id"),
                        self._est_jac(F.col("_sn"), F.col("_so"))
                        .alias("est_jac"))
                .filter(F.col("est_jac") >= self.threshold))

    def ingest(self, docs: DataFrame, id_col: str,
               text_col: str) -> DataFrame:
        """One incremental batch: returns (id, keep, matched_id,
        est_jac) — keep=false rows name the surviving duplicate — and
        appends surviving signatures to the store. The verdict is
        materialized (the store append is a side effect, so laziness
        would double-run the batch)."""
        # cache() with no forcing count: the verdict's localCheckpoint
        # job is the first action and populates the cache as it runs,
        # so signing costs zero extra jobs — the append below then
        # reads signatures from cache. One fewer Spark job per batch.
        sigs = self.signatures(docs, id_col, text_col).cache()
        best = (self._matches(sigs)
                .groupBy("_id")
                .agg(F.max_by("matched_id", "est_jac").alias("matched_id"),
                     F.max("est_jac").alias("est_jac")))
        verdict = (sigs.select("_id")
                   .join(best, "_id", "left")
                   .select(F.col("_id").alias(id_col),
                           F.col("matched_id").isNull().alias("keep"),
                           "matched_id", "est_jac")
                   .localCheckpoint())
        kept = verdict.filter("keep").select(F.col(id_col).alias("_id"))
        self.append(sigs.join(kept, "_id", "left_semi"))
        sigs.unpersist()
        return verdict
