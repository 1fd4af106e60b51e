"""hash_split: partition-invariant, disjoint, complete, and stable as
the corpus grows — the properties seeded sample() does not have."""

from __future__ import annotations

from rakam_api_collector_spark.operators.sampling import hash_split
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _ids(df):
    return {r.o_orderkey for r in df.select("o_orderkey").collect()}


def test_split_disjoint_and_complete(spark):
    orders = load_table(spark, SF, "orders")
    train, test = hash_split(orders, "o_orderkey", frac_pct=10)
    tr, te = _ids(train), _ids(test)
    assert tr & te == set()
    assert tr | te == _ids(orders)
    # ~10%: generous bounds for a 1.5k-row fixture
    frac = len(tr) / (len(tr) + len(te))
    assert 0.05 < frac < 0.15, frac


def test_split_invariant_under_repartition(spark):
    orders = load_table(spark, SF, "orders")
    a, _ = hash_split(orders, "o_orderkey", frac_pct=10)
    b, _ = hash_split(orders.repartition(7), "o_orderkey", frac_pct=10)
    assert _ids(a) == _ids(b)


def test_assignment_stable_as_corpus_grows(spark):
    orders = load_table(spark, SF, "orders")
    half = orders.limit(500)
    a, _ = hash_split(half, "o_orderkey", frac_pct=10)
    b, _ = hash_split(orders, "o_orderkey", frac_pct=10)
    assert _ids(a) <= _ids(b)          # membership never flips
