"""LLM-pipeline correctness queries over documents/embeddings.

These pin the training-data-pipeline operator pillars (SURVEY.md §7
Phase 4): text analysis, deduplication, similarity search. Every query
here is the *correctness* contract — each has a DuckDB oracle that
computes the same deterministic function, so both engines must agree
value-for-value. The scale-path implementations live in
``rakam_api_collector_spark.operators.*``; queries call those operators,
not reimplementations.

Determinism rules shared with the oracle:
- tokenization = lowercase split on ``[^a-z0-9]+``, empty tokens dropped
  (operators/text.py); the DuckDB side is
  ``list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> x <> '')``.
- doubles are rounded to 4 dp after exact (integer / ordered) arithmetic.
- hash-valued outputs (xxhash64 fingerprints) are engine-specific, so the
  oracle compares *cardinalities* of the pre-image, never hash values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators import text as T
from rakam_api_collector_spark.tables import load_table

# DuckDB-side tokenizer expression (must mirror operators/text.py exactly)
_DUCK_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"


# --- text analysis -----------------------------------------------------------

def llm01_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace/punct tokenizer token counts (operators/text.py:34)."""
    return (load_table(spark, sf, "documents")
            .select("doc_id", T.token_count(F.col("text")).alias("n_tok"))
            .orderBy("doc_id").limit(200))


def llm02_ttr(spark: SparkSession, sf: str) -> DataFrame:
    """Type-token ratio (lexical diversity) per document."""
    return (load_table(spark, sf, "documents")
            .select("doc_id",
                    F.round(T.type_token_ratio(F.col("text")), 4).alias("ttr"))
            .orderBy("doc_id").limit(200))


def llm03_avg_token_len(spark: SparkSession, sf: str) -> DataFrame:
    """Mean token length in chars per document (quality signal)."""
    return (load_table(spark, sf, "documents")
            .select("doc_id",
                    F.round(T.avg_token_length(F.col("text")), 4).alias("avg_len"))
            .orderBy("doc_id").limit(200))


def llm04_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-argmax language heuristic (operators/text.py:62): counts
    of docs per predicted language."""
    return (load_table(spark, sf, "documents")
            .select(T.lang_id(F.col("text")).alias("lang_pred"))
            .groupBy("lang_pred").agg(F.count("*").alias("n"))
            .orderBy("lang_pred"))


def llm05_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprint (xxhash64 of normalized text). Hash values are
    engine-specific; #distinct fingerprints == #distinct normalized texts
    (collision-free at this n), which the oracle computes directly."""
    return (load_table(spark, sf, "documents")
            .agg(F.countDistinct(T.fingerprint(F.col("text"))).alias("n")))


def llm06_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-score aggregate per source: avg token count and avg
    stopword('en') ratio — length/stopword quality heuristics."""
    docs = load_table(spark, sf, "documents")
    ntok = T.token_count(F.col("text"))
    hits = T.stopword_hits(F.col("text"), "en")
    per_doc = docs.select(
        "source", ntok.alias("ntok"),
        F.when(ntok > 0, hits.cast("double") / ntok).otherwise(F.lit(0.0))
         .alias("sw_ratio"))
    return (per_doc.groupBy("source")
            .agg(F.round(F.sum("ntok").cast("double") / F.count("*"), 4)
                 .alias("avg_tok"),
                 F.round(F.sum(F.col("sw_ratio").cast("decimal(18,9)"))
                          .cast("double") / F.count("*"), 4)
                 .alias("avg_sw_ratio"),
                 F.count("*").alias("n"))
            .orderBy("source"))


QUERIES = {
    "llm01_token_count": llm01_token_count,
    "llm02_ttr": llm02_ttr,
    "llm03_avg_token_len": llm03_avg_token_len,
    "llm04_lang_id": llm04_lang_id,
    "llm05_fingerprint": llm05_fingerprint,
    "llm06_quality": llm06_quality,
}

_SW = {k: ", ".join(f"'{w}'" for w in v) for k, v in T.STOPWORDS.items()}
_HITS = {k: f"len(list_filter(t, x -> list_contains([{v}], x)))"
         for k, v in _SW.items()}

ORACLE = {
    "llm01_token_count": f"""
        SELECT doc_id, CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_tok
        FROM documents ORDER BY doc_id LIMIT 200
    """,
    "llm02_ttr": f"""
        WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
        SELECT doc_id,
               round(CASE WHEN len(t) > 0
                          THEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
                          ELSE 0.0 END, 4) AS ttr
        FROM toks ORDER BY doc_id LIMIT 200
    """,
    "llm03_avg_token_len": f"""
        WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
        SELECT doc_id,
               round(CASE WHEN len(t) > 0
                          THEN CAST(length(array_to_string(t, '')) AS DOUBLE) / len(t)
                          ELSE 0.0 END, 4) AS avg_len
        FROM toks ORDER BY doc_id LIMIT 200
    """,
    "llm04_lang_id": f"""
        WITH toks AS (SELECT {_DUCK_TOKS} AS t FROM documents),
        hits AS (SELECT {_HITS['en']} AS h_en, {_HITS['es']} AS h_es,
                        {_HITS['de']} AS h_de, {_HITS['fr']} AS h_fr
                 FROM toks)
        SELECT CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
                    WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
                    WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
                    WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
                    ELSE 'fr' END AS lang_pred,
               count(*) AS n
        FROM hits GROUP BY 1 ORDER BY 1
    """,
    "llm05_fingerprint": f"""
        SELECT count(DISTINCT array_to_string({_DUCK_TOKS}, ' ')) AS n
        FROM documents
    """,
    "llm06_quality": f"""
        WITH toks AS (SELECT source, {_DUCK_TOKS} AS t FROM documents),
        per_doc AS (
          SELECT source, len(t) AS ntok,
                 CASE WHEN len(t) > 0
                      THEN CAST({_HITS['en']} AS DOUBLE) / len(t)
                      ELSE 0.0 END AS sw_ratio
          FROM toks)
        SELECT source,
               round(CAST(sum(ntok) AS DOUBLE) / count(*), 4) AS avg_tok,
               round(CAST(sum(CAST(sw_ratio AS DECIMAL(18,9))) AS DOUBLE) / count(*), 4) AS avg_sw_ratio,
               count(*) AS n
        FROM per_doc GROUP BY source ORDER BY source
    """,
}
