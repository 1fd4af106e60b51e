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


def test_sample_token_budget_exact_prefix_replay(spark):
    """sample_token_budget == the pure-Python canonical definition
    (order each group by the seeded md5 uniform, keep the prefix
    until the running token total reaches w_g·budget, crossing doc
    included) — exercised with a tiny boundary_buckets so the
    two-phase cutoff + boundary-bucket window both engage. Plus the
    contract properties: reached-or-exhausted targets, minimality
    (dropping the last kept doc falls below target), budget
    monotonicity, and partitioning invariance."""
    import hashlib

    from rakam_api_collector_spark.operators.sampling import \
        sample_token_budget

    rows = [(i, ["web", "code", "news"][i % 3], 10 + (i * 7) % 90)
            for i in range(120)]
    docs = spark.createDataFrame(rows, ["doc_id", "src", "n_tok"])
    weights = {"web": 0.7, "code": 0.3}          # news drops
    budget, seed = 2_000, 3

    def u(k):
        h = hashlib.md5(f"{seed}:{k}".encode()).hexdigest()[:8]
        return int(h, 16) / (1 << 32)

    def canonical():
        kept = set()
        for g, w in weights.items():
            target = w * budget
            run = 0.0
            for i, _, t in sorted((r for r in rows if r[1] == g),
                                  key=lambda r: (u(r[0]), str(r[0]))):
                if run >= target:
                    break
                kept.add(i)
                run += t
        return kept

    want = canonical()
    for buckets in (1, 7, 4096):
        got = {r["doc_id"] for r in sample_token_budget(
            docs, "doc_id", "src", "n_tok", weights, budget,
            seed=seed, boundary_buckets=buckets).collect()}
        assert got == want, buckets

    # properties on the kept set
    by_id = {r[0]: r for r in rows}
    for g, w in weights.items():
        ks = sorted((i for i in want if by_id[i][1] == g),
                    key=lambda i: (u(i), str(i)))
        total = sum(by_id[i][2] for i in ks)
        assert total >= w * budget               # target reached
        assert total - by_id[ks[-1]][2] < w * budget   # minimal
    assert not any(by_id[i][1] == "news" for i in want)

    # monotone in budget: a smaller budget's sample is a subset
    smaller = {r["doc_id"] for r in sample_token_budget(
        docs, "doc_id", "src", "n_tok", weights, budget // 2,
        seed=seed, boundary_buckets=7).collect()}
    assert smaller <= want

    # partitioning invariance (the module's core contract)
    re32 = {r["doc_id"] for r in sample_token_budget(
        docs.repartition(32), "doc_id", "src", "n_tok", weights,
        budget, seed=seed, boundary_buckets=7).collect()}
    assert re32 == want

    # exhausted group: a huge budget keeps every weighted doc
    everything = {r["doc_id"] for r in sample_token_budget(
        docs, "doc_id", "src", "n_tok", weights, 10**9,
        seed=seed, boundary_buckets=7).collect()}
    assert everything == {i for i, g, _ in rows if g in weights}
    import pytest as _pt
    with _pt.raises(ValueError, match="budget"):
        sample_token_budget(docs, "doc_id", "src", "n_tok", weights, 0)


def test_sample_token_budget_fuzz(spark):
    """Hypothesis fuzz: arbitrary token counts (including 0 and
    null-as-0), group shapes, budgets, and seeds match the canonical
    prefix replay under a small bucket count."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rakam_api_collector_spark.operators.sampling import \
        sample_token_budget

    @settings(max_examples=8, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=0, max_value=50),
                      min_size=1, max_size=30),
        budget=st.integers(min_value=1, max_value=400),
        seed=st.integers(min_value=0, max_value=5),
    )
    def check(toks, budget, seed):
        rows = [(i, "ab"[i % 2], t) for i, t in enumerate(toks)]
        docs = spark.createDataFrame(rows, ["doc_id", "src", "n_tok"])
        weights = {"a": 0.6, "b": 0.4}

        def u(k):
            h = hashlib.md5(f"{seed}:{k}".encode()).hexdigest()[:8]
            return int(h, 16) / (1 << 32)

        want = set()
        for g, w in weights.items():
            run = 0.0
            for i, _, t in sorted((r for r in rows if r[1] == g),
                                  key=lambda r: (u(r[0]), str(r[0]))):
                if run >= w * budget:
                    break
                want.add(i)
                run += t
        got = {r["doc_id"] for r in sample_token_budget(
            docs, "doc_id", "src", "n_tok", weights, budget,
            seed=seed, boundary_buckets=5).collect()}
        assert got == want

    check()
