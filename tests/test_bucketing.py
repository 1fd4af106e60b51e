"""Bucketed co-located join: zero-exchange plan + result parity with
the shuffled join."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.bucketing import (
    cobucketed_join, write_bucketed)
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey",
                   num_buckets=4, path=str(base / "orders"))
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "b_lineitem", "o_orderkey",
                   num_buckets=4, path=str(base / "lineitem"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force the SMJ path: the point is the exchange-free shuffle join,
    # not a broadcast escape hatch
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, lt, rt, "o_orderkey")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan          # both sides pre-bucketed
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_join_matches_shuffled_result(spark, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = (cobucketed_join(spark, lt, rt, "o_orderkey")
                .groupBy().agg(F.count("*").alias("n"),
                               F.sum("o_orderkey").alias("s"))
                .first())
    orders = load_table(spark, SF, "orders")
    li = (load_table(spark, SF, "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"))
    plain = (orders.join(li, "o_orderkey")
             .groupBy().agg(F.count("*").alias("n"),
                            F.sum("o_orderkey").alias("s"))
             .first())
    assert (bucketed.n, bucketed.s) == (plain.n, plain.s)


def test_bucket_pruning_for_point_lookup(spark, bucketed_tables):
    lt, _ = bucketed_tables
    some_key = spark.table(lt).select("o_orderkey").first().o_orderkey
    # auto-bucketed-scan turns bucketed reading off when no exchange is
    # saved; disable it so the point lookup can prune to one bucket
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            spark.table(lt).filter(F.col("o_orderkey") == some_key) \
                 .explain("formatted")
        plan = buf.getvalue()
        # the scan advertises bucket pruning: 1 of 4 buckets selected
        assert "SelectedBucketsCount: 1 out of 4" in plan
    finally:
        spark.conf.unset(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled")
