"""hash_split: partition-invariant, disjoint, complete, and stable as
the corpus grows — the properties seeded sample() does not have."""

from __future__ import annotations

from pyspark.sql import functions as F
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


def test_training_order_is_pure_function_of_seed_and_key(spark):
    from rakam_api_collector_spark.operators.sampling import training_order

    docs = load_table(spark, SF, "documents").select("doc_id")

    def perm(df, seed):
        return {r.doc_id: (r.shard, r.pos) for r in
                training_order(df, "doc_id", n_shards=8,
                               seed=seed).collect()}

    a = perm(docs, 42)
    b = perm(docs.repartition(13), 42)      # partitioning-invariant
    assert a == b
    assert a != perm(docs, 43)              # new epoch = new permutation
    # every shard's positions are contiguous 1..n
    by_shard = {}
    for shard, pos in a.values():
        by_shard.setdefault(shard, []).append(pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # sharding is reasonably balanced (md5-uniform over 500 docs)
    sizes = [len(v) for v in by_shard.values()]
    assert len(by_shard) == 8 and min(sizes) > 30


def test_bigrams_edges(spark):
    from rakam_api_collector_spark.operators import text as T

    df = spark.createDataFrame(
        [("",), ("one",), ("one two",), ("a b a b",)], ["text"])
    rows = df.select(T.bigrams(T.tokens(F.col("text"))).alias("bg")) \
             .collect()
    assert [r.bg for r in rows] == [
        [], [], ["one two"], ["a b", "b a", "a b"]]
