"""Corpus-curation operators: PII scrub, chunk dedup, contamination
screen, repetition ratio — edge cases the fixture queries don't hit."""

from __future__ import annotations

from pyspark.sql import functions as F

from rakam_api_collector_spark.operators import scrub
from rakam_api_collector_spark.operators.chunks import (
    chunk_dedup, contamination_screen, token_chunks)
from rakam_api_collector_spark.operators.text import repetition_ratio, tokens


def _one(spark, s):
    return spark.createDataFrame([(s,)], "s string")


def test_redact_all_kinds(spark):
    s = ("mail a.b+c@x-y.co or (555) 010-1234 or +1 555 010 9999 "
         "from 192.168.0.1 end")
    out = _one(spark, s).select(scrub.redact(F.col("s")).alias("r")) \
                        .first().r
    assert "<EMAIL>" in out and "<PHONE>" in out and "<IP>" in out
    assert "@" not in out and "192" not in out


def test_redact_email_wins_over_embedded_digits(spark):
    # the email is redacted first, so its digit runs can't be re-matched
    s = "x 555-010-1234abc@mail.example.org y"
    row = _one(spark, s).select(
        scrub.pii_count(F.col("s"), "email").alias("e"),
        scrub.redact(F.col("s")).alias("r")).first()
    assert row.e == 1
    assert "<PHONE>" not in row.r


def test_pii_count_null_and_clean(spark):
    df = spark.createDataFrame([(None,), ("no pii here",)], "s string")
    got = [r.n for r in
           df.select(scrub.pii_count(F.col("s"), "email").alias("n"))
             .collect()]
    assert got == [0, 0]


def test_token_chunks_partial_and_empty(spark):
    df = spark.createDataFrame([(1, "a b c d e f g"), (2, ""), (3, None)],
                               "id long, t string")
    got = {r.id: r.c for r in
           df.select("id", token_chunks(F.col("t"), 3).alias("c"))
             .collect()}
    assert got[1] == ["a b c", "d e f", "g"]     # final partial kept
    assert got[2] == []                           # no [0, -1] artifact
    assert got[3] == []                           # null text -> no chunks


def test_chunk_dedup_verdict_and_kept_order(spark):
    df = spark.createDataFrame(
        [(1, "u1 u2 u3 u4 u5 shared shared shared shared shared"),
         (2, "v1 v2 v3 v4 v5 shared shared shared shared shared"),
         (3, "w1 w2 w3 w4 w5")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           chunk_dedup(df, "doc_id", "text", size=5).collect()}
    assert (got[1].n_chunks, got[1].n_dropped) == (2, 1)
    assert got[1].kept_text == "u1 u2 u3 u4 u5"   # order preserved
    assert (got[3].n_chunks, got[3].n_dropped) == (1, 0)
    assert got[3].kept_text == "w1 w2 w3 w4 w5"


def test_contamination_covers_whole_corpus(spark):
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "x alpha beta gamma delta epsilon y"),  # contains a 5-gram
         (2, "totally unrelated words none shared here"),
         (3, "tiny doc")],                           # < n tokens: 0 grams
        "doc_id long, text string")
    got = {r.doc_id: (r.n_hits, r.contaminated) for r in
           contamination_screen(corpus, bench, "doc_id", "text",
                                n=5).collect()}
    assert got[1][0] >= 1 and got[1][1]
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_repetition_ratio_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"),       # bigrams: ab,ba,ab,ba,ab -> 2/5 distinct
         (2, "a b c d"),           # all distinct -> 0.0
         (3, "x")],                # < 2 tokens -> 0.0
        "id long, t string")
    got = {r.id: round(r.rep, 4) for r in
           df.select("id", tokens(F.col("t")).alias("_tk"))
             .select("id", repetition_ratio(F.col("_tk"), 2).alias("rep"))
             .collect()}
    assert got[1] == round(1 - 2 / 5, 4)
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_chunk_dedup_no_cartesian_and_narrow_shuffle(spark):
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame([(1, "a b c d e"), (2, "a b c d e")],
                               "doc_id long, text string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        chunk_dedup(df, "doc_id", "text", size=5).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    with redirect_stdout(buf):
        contamination_screen(df, df, "doc_id", "text").explain("formatted")
    assert "CartesianProduct" not in buf.getvalue()
