"""Packing / mixture / vocabulary operators (training-data pipeline):
semantic invariants the hash-match oracle doesn't state explicitly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.packing import pack_sequences
from rakam_api_collector_spark.operators.sampling import mixture_sample
from rakam_api_collector_spark.operators.text import vocab_coverage
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"
BUDGET = 64


def test_pack_sequences_prefix_sum_invariants(spark):
    docs = spark.createDataFrame(
        [(i, "g", "tok " * (10 * (i + 1))) for i in range(6)],
        "id long, g string, text string")
    rows = {r.id: r for r in
            pack_sequences(docs, "id", "text", budget=BUDGET,
                           part_col="g").collect()}
    # doc i has 10*(i+1) tokens; running prefix determines placement
    before = 0
    for i in range(6):
        r = rows[i]
        assert r.n_tok == 10 * (i + 1)
        assert r.seq_id == before // BUDGET
        assert r.seq_off == before % BUDGET
        before += r.n_tok
    # offsets are always inside the budget
    assert all(0 <= r.seq_off < BUDGET for r in rows.values())


def test_pack_sequences_partition_isolation(spark):
    """Packing restarts per part group: group b is blind to group a."""
    docs = spark.createDataFrame(
        [(1, "a", "x " * 50), (2, "a", "x " * 50),
         (3, "b", "x " * 50)],
        "id long, g string, text string")
    rows = {r.id: (r.seq_id, r.seq_off) for r in
            pack_sequences(docs, "id", "text", budget=64,
                           part_col="g").collect()}
    assert rows[1] == (0, 0)
    assert rows[2] == (0, 50)
    assert rows[3] == (0, 0)   # fresh prefix in group b


def test_mixture_sample_rates_and_determinism(spark):
    docs = load_table(spark, SF, "documents")
    weights = {"en": 0.4, "zh": 0.2, "es": 0.2, "de": 0.1, "fr": 0.1}
    kept = mixture_sample(docs, "doc_id", "lang", weights).cache()
    n = {r.lang: r.n for r in
         kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {r.lang: r.n for r in
           docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    t = min(tot[g] / w for g, w in weights.items())
    # kept shares track the target mixture within hash noise (4σ of
    # binomial at these counts) and never exceed the group total
    for g, w in weights.items():
        expect = min(tot[g], w * t)
        sigma = (expect * (1 - expect / tot[g])) ** 0.5 or 1.0
        assert abs(n.get(g, 0) - expect) <= 4 * sigma + 1, (g, n, expect)
        assert n.get(g, 0) <= tot[g]
    # determinism: the same rows exactly, run to run
    ids1 = sorted(r.doc_id for r in kept.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in
                  mixture_sample(docs, "doc_id", "lang", weights)
                  .select("doc_id").collect())
    assert ids1 == ids2
    # selection is the documented pure function of the row key
    rate_en = min(1.0, weights["en"] * t / tot["en"])
    en_ids = {r.doc_id for r in kept.filter(F.col("lang") == "en")
              .select("doc_id").collect()}
    en_all = [r.doc_id for r in docs.filter(F.col("lang") == "en")
              .select("doc_id").collect()]
    for did in en_all:
        u = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16) / 2**32
        assert (u < rate_en) == (did in en_ids)
    kept.unpersist()


def test_vocab_coverage_monotone_and_consistent(spark):
    docs = load_table(spark, SF, "documents")
    rows = vocab_coverage(docs, "text", k=20).orderBy("rnk").collect()
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    # counts non-increasing, coverage strictly increasing and ≤ 1
    for a, b in zip(rows, rows[1:]):
        assert a.n >= b.n
        assert a.cum_share < b.cum_share
    assert 0 < rows[0].cum_share and rows[-1].cum_share <= 1.0
    # spot-check the top term's count against a direct computation
    from rakam_api_collector_spark.operators.text import tokens
    top = rows[0]
    direct = (docs.select(F.explode(tokens(F.col("text"))).alias("t"))
              .filter(F.col("t") == top.term).count())
    assert direct == top.n
