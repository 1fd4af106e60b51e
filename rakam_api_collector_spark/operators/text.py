"""Text-analysis operators: tokenization, quality, language-ID,
fingerprinting.

All operators are built from JVM-side higher-order functions
(``split`` / ``filter`` / ``transform`` / ``aggregate``) so they stay
inside whole-stage codegen — no Python in the hot path. Each is a
narrow per-row map: embarrassingly parallel, no shuffle, scales
linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deliberately tiny, deterministic stopword lists — the lang-id operator
# must produce identical answers in Spark and the DuckDB oracle, so the
# heuristic is a pure function of these constants.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "und", "das", "ist", "ich", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
}

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """Lowercased alphanumeric tokens (empty strings dropped)."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


# BPE-ish pre-tokenizer: letter runs, digit runs, and single
# non-alphanumeric marks — the GPT-2-style pre-split shape (the real BPE
# merge table is model-specific; counts over this pre-split are the
# standard cheap token estimate). Kept RE2-compatible so the DuckDB
# oracle runs the identical pattern.
BPE_ISH_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_ish_tokens(text: Column) -> Column:
    """Lowercased BPE-style pre-tokens (letter/digit runs + marks)."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_RE), 0)


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))


def type_token_ratio(text: Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens (0 for empty)."""
    n = token_count(text)
    return F.when(n > 0, distinct_token_count(text).cast("double") / n) \
            .otherwise(F.lit(0.0))


def avg_token_length(text: Column) -> Column:
    """Mean token length in characters (0 for empty docs)."""
    n = token_count(text)
    total_chars = F.length(F.array_join(tokens(text), ""))
    return F.when(n > 0, total_chars.cast("double") / n).otherwise(F.lit(0.0))


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of tokens belonging to ``lang``'s stopword list."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def lang_id(text: Column) -> Column:
    """Deterministic n-gram-style language heuristic: argmax of stopword
    hit counts with a fixed tie-break order (en, es, de, fr); no hits →
    'und'. Matches the oracle SQL expression token for token."""
    hits = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build the CASE in reverse so earlier langs win ties
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((hits[lang] == best) & (best > 0), lang).otherwise(expr)
    return expr


# Characters that do NOT count as symbols: alphanumerics + explicit
# whitespace escapes. Enumerated (no \s shorthand) because Java regex
# \s includes \x0B while RE2's does not — the explicit class means the
# DuckDB oracle runs the IDENTICAL character set.
SYMBOL_KEEP_RE = r"[a-z0-9 \t\n\f\r\x0B]"


def symbol_ratio(text: Column) -> Column:
    """Symbol-to-word ratio (Gopher rule family): count of characters
    outside [a-z0-9] and whitespace (after lowercasing) per token.
    0.0 for token-less docs. RE2-compatible pattern so the DuckDB
    oracle runs it verbatim."""
    n = token_count(text)
    syms = F.length(F.regexp_replace(F.lower(text), SYMBOL_KEEP_RE, ""))
    return F.when(n > 0, syms.cast("double") / n).otherwise(F.lit(0.0))


def digit_token_fraction(t: Column) -> Column:
    """Fraction of tokens that are pure digit runs, over an ALREADY
    MATERIALIZED token array. 0.0 for empty docs."""
    n = F.size(t)
    digits = F.size(F.filter(t, lambda x: x.rlike("^[0-9]+$")))
    return F.when(n > 0, digits.cast("double") / n).otherwise(F.lit(0.0))


def bigrams(t: Column) -> Column:
    """Adjacent token pairs ``"w1 w2"`` over an ALREADY MATERIALIZED
    token array (same no-CSE-inside-HOF rule as repetition_ratio).
    Docs with < 2 tokens yield an empty array. Pure per-row map —
    zip(tokens[:-1], tokens[1:]) as a JVM ``zip_with``, no shuffle."""
    n = F.size(t)
    return F.when(
        n >= 2,
        F.zip_with(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1),
                   lambda a, b: F.concat_ws(" ", a, b))
    ).otherwise(F.array().cast("array<string>"))


def repetition_ratio(t: Column, n: int = 2) -> Column:
    """Within-document repeated-n-gram fraction (the Gopher-style
    repetition quality signal): 1 - distinct_ngrams / total_ngrams over
    an ALREADY MATERIALIZED token array (no CSE inside HOF lambdas —
    see operators/chunks.py). 0.0 for docs with < n tokens. Pure
    per-row map: no shuffle, stays in whole-stage codegen."""
    last = F.size(t) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), last),
        lambda i: F.array_join(F.slice(t, i, n), " "))
    return F.when(
        last >= 1,
        F.lit(1.0) - F.size(F.array_distinct(grams)) /
        F.size(grams).cast("double")
    ).otherwise(F.lit(0.0))


def compression_ratio_udf(level: int = 6):
    """Arrow-batched zlib compression ratio (compressed/raw bytes) — the
    CCNet/Gopher-family redundancy signal: repetitive boilerplate
    compresses far below ~0.4 while natural prose sits higher. This is
    the one text signal that genuinely needs Python (no Catalyst
    compression expression), so it runs as a pandas_udf: stdlib zlib
    per Arrow batch, no per-row Python call overhead beyond the loop,
    and deterministic for a fixed (text, level) across platforms (zlib
    output is spec-stable for a given level/strategy). Empty docs → 0.0
    by convention."""
    import pandas as pd
    import zlib

    from pyspark.sql.functions import pandas_udf

    def ratio(texts):
        out = []
        for t in texts:
            raw = (t or "").encode("utf-8")
            out.append(len(zlib.compress(raw, level)) / len(raw)
                       if raw else 0.0)
        return pd.Series(out)

    ratio.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(ratio, "double")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: 64-bit hash of the token-normalized text —
    the batch analog of the reference's shard checksum
    (InMemoryOrcStorageManager.java:234-242)."""
    return F.xxhash64(F.array_join(tokens(text), " "))


# Gopher-style hard quality rules (Rae et al. 2021, Appendix A): the
# ONE definition of signals and thresholds — queries/llm_ops (llm40/42
# oracle gates) and curation.gopher_filter both build from these, so
# the pinned oracle behavior and the user-facing pipeline cannot drift.
GOPHER_THRESHOLDS = {
    "min_tokens": 20, "max_tokens": 100_000,
    "min_word_len": 3.0, "max_word_len": 10.0,
    "max_symbol_ratio": 0.1, "min_stopwords": 2,
    "max_digit_frac": 0.2,
}


def gopher_signals(text: Column) -> dict[str, Column]:
    """The five row-local quality signals the rule battery thresholds."""
    tk = tokens(text)
    return {
        "n_tok": F.size(tk),
        "avg_word_len": avg_token_length(text),
        "symbol_ratio": symbol_ratio(text),
        "stopword_hits": stopword_hits(text, "en"),
        "digit_frac": digit_token_fraction(tk),
    }


def gopher_verdicts(sig: dict[str, Column], **overrides) -> dict[str, Column]:
    """Named boolean verdicts over (possibly pre-materialized) signal
    columns; thresholds default to GOPHER_THRESHOLDS."""
    p = {**GOPHER_THRESHOLDS, **overrides}
    unknown = set(overrides) - set(GOPHER_THRESHOLDS)
    if unknown:
        raise ValueError(f"unknown gopher thresholds: {sorted(unknown)}")
    return {
        "ok_len": (sig["n_tok"] >= p["min_tokens"])
        & (sig["n_tok"] <= p["max_tokens"]),
        "ok_word_len": (sig["avg_word_len"] >= p["min_word_len"])
        & (sig["avg_word_len"] <= p["max_word_len"]),
        "ok_symbols": sig["symbol_ratio"] <= p["max_symbol_ratio"],
        "ok_stopwords": sig["stopword_hits"] >= p["min_stopwords"],
        "ok_digits": sig["digit_frac"] <= p["max_digit_frac"],
    }


def tfidf_topk(docs: DataFrame, id_col: str, text_col: str,
               k: int = 3) -> DataFrame:
    """(id, term, rnk, tfidf): top-k characteristic terms per document.

    tf = in-doc term count; idf = ln((N+1)/(df+1)) + 1 (smoothed,
    scikit-learn's convention). Two aggregations (doc-term counts, then
    document frequency) + one join on term and a per-doc top-k window.
    At scale the term-df table is Zipf-skewed but small relative to the
    corpus (vocabulary ≪ tokens); the join shuffles on term and AQE
    picks broadcast when the vocabulary fits."""
    toks = (docs.select(F.col(id_col).alias("_id"),
                        F.explode(tokens(F.col(text_col))).alias("term")))
    tf = toks.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("_n"))
    scored = (tf.join(df_, "term").crossJoin(F.broadcast(n))
              .withColumn(
                  "tfidf",
                  F.col("tf") * (F.log((F.col("_n") + 1)
                                       / (F.col("df") + 1)) + 1)))
    w = Window.partitionBy("_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(F.col("_id").alias(id_col), "term", "rnk", "tfidf"))


def vocab_coverage(docs: DataFrame, text_col: str, k: int = 1000
                   ) -> DataFrame:
    """(term, n, rnk, cum_share): top-k vocabulary by corpus frequency
    with cumulative coverage share — the vocabulary-build / tokenizer-
    training precursor (how much of the corpus do the top-k types
    cover).

    Scale: term counts shuffle once with map-side combine; the top-k
    cut is ``orderBy().limit(k)`` — planned as TakeOrderedAndProject,
    i.e. a per-partition partial top-k merged k×partitions rows at a
    time, so NO step ever globally sorts or single-partition-windows
    the full vocabulary (the r12 shape ranked every distinct term
    through one unpartitioned window — fine for Zipf-bounded vocabs,
    removed in r13 per the verdict). Rank + cumulative share then run
    over exactly k survivors: bounded by the PARAMETER, not the
    corpus, with an explicit single-group partition key (a foldable
    literal would be optimized away, reverting to an unpartitioned
    window; ``repartition(1)`` makes ``spark_partition_id()`` a
    constant 0 by contract, so the k-row window runs as one DEFINED
    group)."""
    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_tot"))
    top = (counts.orderBy(F.desc("n"), F.asc("term")).limit(k)
           .repartition(1))
    w = (Window.partitionBy(F.spark_partition_id())
         .orderBy(F.desc("n"), F.asc("term")))
    return (top
            .withColumn("rnk", F.row_number().over(w))
            .withColumn("_cum", F.sum("n").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .crossJoin(F.broadcast(total))
            .select("term", "n", "rnk",
                    F.round(F.col("_cum") / F.col("_tot"), 6)
                    .alias("cum_share")))
