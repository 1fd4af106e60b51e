"""Chunk-level corpus operators: cross-document chunk dedup and
benchmark-contamination screening.

A web-scale training pipeline dedups not only whole documents but the
repeated BLOCKS inside them (boilerplate headers, license text, nav
bars — the "remove duplicated lines across the corpus" step), and
screens the corpus for n-gram overlap with evaluation benchmarks before
training. Both reduce to the same shape: explode documents into hashed
chunk keys, aggregate or join on the key, re-aggregate per document.

Scale shape (both operators):
- tokenization happens ONCE per document into a materialized array
  column before any lambda touches it (Catalyst does not CSE inside
  higher-order-function lambdas — an inlined tokenizer would re-split
  per chunk position, O(tokens²) per doc);
- only (doc_id, chunk_hash) longs ride the shuffles — never chunk text;
- chunk frequency is a partial+final count (map-side combine absorbs
  within-partition repeats);
- the contamination join is an inner join on the hash with the
  benchmark side DISTINCT'd first (benchmarks are ≪ corpus, so AQE
  broadcasts it); a doc with zero hits never leaves its mapper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.text import tokens


def chunks_from_tokens(t: Column, size: int) -> Column:
    """Non-overlapping ``size``-token chunks (the "lines" of a
    whitespace corpus) from an already-materialized token array: chunk
    i = t[i*size, (i+1)*size). A final partial chunk is kept — dropping
    it would let a trailing duplicate block escape."""
    n_chunks = F.ceil(F.size(t) / F.lit(size)).cast("int")
    # guard: sequence(0, -1) would infer a NEGATIVE step and yield
    # [0, -1] instead of [] — empty docs must produce zero chunks
    return F.when(n_chunks > 0, F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(t, i * size + 1, size), " "))
    ).otherwise(F.array().cast("array<string>"))


def ngram_hashes_from_tokens(t: Column, n: int) -> Column:
    """xxhash64 of every (overlapping) n-gram of an already-materialized
    token array; zero n-grams for docs shorter than n tokens (the
    sequence guard again — sequence(1, 0) infers a negative step)."""
    last = F.size(t) - (n - 1)
    return F.when(last >= 1, F.transform(
        F.sequence(F.lit(1), last),
        lambda i: F.xxhash64(F.array_join(F.slice(t, i, n), " "))
    )).otherwise(F.array().cast("array<bigint>"))


def token_chunks(text: Column, size: int) -> Column:
    """Expression-form chunks straight from text — for one-shot
    projections only; exploding operators must two-step through a
    materialized token column (see module docstring)."""
    return chunks_from_tokens(tokens(text), size)


def chunk_dedup(docs: DataFrame, id_col: str, text_col: str, *,
                size: int = 5, max_doc_freq: int = 1) -> DataFrame:
    """Per-document verdict of the cross-corpus chunk-dedup pass:
    ``(id, n_chunks, n_dropped, kept_text)`` where a chunk is dropped
    when it appears in more than ``max_doc_freq`` DISTINCT documents.

    kept_text re-joins the surviving chunks in document order — the
    cleaned document a pipeline would write out."""
    ch = (docs.select(F.col(id_col).alias("_id"),
                      tokens(F.col(text_col)).alias("_tk"))
          .select("_id", F.posexplode(chunks_from_tokens(F.col("_tk"),
                                                         size))
                  .alias("_pos", "_chunk"))
          .withColumn("_h", F.xxhash64("_chunk")))

    # distinct doc-count per chunk hash: two partial+final pairs —
    # (hash, id) dedup, then the per-hash count
    freq = (ch.select("_h", "_id").distinct()
            .groupBy("_h").agg(F.count("*").alias("_docs")))

    flagged = (ch.join(freq, "_h")
               .withColumn("_drop", F.col("_docs") > max_doc_freq))
    return (flagged.groupBy("_id")
            .agg(F.count("*").alias("n_chunks"),
                 F.sum(F.col("_drop").cast("int")).alias("n_dropped"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(~F.col("_drop"),
                                    F.struct("_pos", "_chunk")))),
                         lambda s: s["_chunk"]),
                     " ").alias("kept_text"))
            .select(F.col("_id").alias(id_col), "n_chunks", "n_dropped",
                    "kept_text"))


def contamination_screen(corpus: DataFrame, benchmark: DataFrame,
                         id_col: str, text_col: str, *,
                         n: int = 5) -> DataFrame:
    """Benchmark-contamination report: for each corpus document, the
    number of its (distinct) n-grams that appear anywhere in
    ``benchmark`` (``n_hits``) and the flag (any overlap).

    Docs sharing no n-gram with the benchmark report n_hits=0 — the
    report covers the whole corpus so a pipeline can threshold it."""
    def grams(df: DataFrame) -> DataFrame:
        return (df.select(F.col(id_col).alias("_id"),
                          tokens(F.col(text_col)).alias("_tk"))
                .select("_id",
                        F.explode(F.array_distinct(
                            ngram_hashes_from_tokens(F.col("_tk"), n)))
                        .alias("_h")))

    bench_set = grams(benchmark).select("_h").distinct()
    hits = (grams(corpus).join(bench_set, "_h")
            .groupBy("_id").agg(F.count("*").alias("n_hits")))
    return (corpus.select(F.col(id_col).alias("_id"))
            .join(hits, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                    .alias("contaminated")))
