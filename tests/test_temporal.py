"""asof_join semantics: backward/forward, inclusive/strict ties,
unmatched rows, and the single-shuffle plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.temporal import asof_join


def _t(s):
    return datetime.fromisoformat(s)


def _fixtures(spark):
    left = spark.createDataFrame(
        [(1, "u", _t("2024-01-01T10:00")),
         (2, "u", _t("2024-01-01T12:00")),
         (3, "v", _t("2024-01-01T09:00")),      # before any right row
         (4, "w", _t("2024-01-01T09:00"))],     # key absent on right
        "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", _t("2024-01-01T09:30"), 100, 1.0),
         ("u", _t("2024-01-01T12:00"), 200, 2.0),   # equal-ts tie with lid=2
         ("v", _t("2024-01-01T11:00"), 300, 3.0)],
        "k string, ts timestamp, rid long, rv double")
    return left, right


def test_backward_inclusive(spark):
    left, right = _fixtures(spark)
    out = {r.lid: r.rid for r in
           asof_join(left, right, ["k"], "ts", ["rid", "rv"]).collect()}
    assert out == {1: 100, 2: 200, 3: None, 4: None}


def test_backward_strict_excludes_equal_ts(spark):
    left, right = _fixtures(spark)
    out = {r.lid: r.rid for r in
           asof_join(left, right, ["k"], "ts", ["rid", "rv"],
                     strict=True).collect()}
    assert out == {1: 100, 2: 100, 3: None, 4: None}


def test_forward(spark):
    left, right = _fixtures(spark)
    out = {r.lid: r.rid for r in
           asof_join(left, right, ["k"], "ts", ["rid", "rv"],
                     direction="forward").collect()}
    # lid=1 → next u row at 12:00; lid=2 equal ts inclusive; lid=3 → 11:00
    assert out == {1: 200, 2: 200, 3: 300, 4: None}


def test_left_row_count_and_null_values(spark):
    left, right = _fixtures(spark)
    rows = asof_join(left, right, ["k"], "ts", ["rid", "rv"]).collect()
    assert len(rows) == left.count()
    by_id = {r.lid: r for r in rows}
    assert by_id[3].rv is None and by_id[4].rv is None
    assert by_id[1].rv == 1.0


def test_single_shuffle_no_join(spark):
    """The plan is union + one window exchange — no Join operator, no
    range-join explosion."""
    left, right = _fixtures(spark)
    plan = (asof_join(left, right, ["k"], "ts", ["rid", "rv"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
