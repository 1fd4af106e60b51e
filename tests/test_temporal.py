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


def test_tie_cols_pick_greatest_right_row(spark):
    """tie_cols resolves equal-(key, ts) right duplicates to the row
    with the greatest tie value — equivalent to the row_number pre-dedup
    it replaces (dq31), and ALL carried value_cols come from that same
    winning row."""
    left = spark.createDataFrame(
        [(1, "u", _t("2024-01-01T10:00")),
         (2, "u", _t("2024-01-01T12:00"))],
        "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", _t("2024-01-01T09:30"), 100, 1.0),
         ("u", _t("2024-01-01T09:30"), 150, 1.5),   # same ts, higher rid
         ("u", _t("2024-01-01T09:30"), 120, 1.2),   # same ts, mid rid
         ("u", _t("2024-01-01T12:00"), 200, 2.0)],
        "k string, ts timestamp, rid long, rv double")
    out = {r.lid: (r.rid, r.rv) for r in
           asof_join(left, right, ["k"], "ts", ["rid", "rv"],
                     tie_cols=["rid"]).collect()}
    assert out == {1: (150, 1.5), 2: (200, 2.0)}
    # strict mode: lid=2 must NOT see the equal-ts 12:00 row, and the
    # 09:30 tie still resolves to the greatest rid
    out_s = {r.lid: r.rid for r in
             asof_join(left, right, ["k"], "ts", ["rid", "rv"],
                       strict=True, tie_cols=["rid"]).collect()}
    assert out_s == {1: 150, 2: 150}


def test_tie_cols_must_be_value_cols(spark):
    import pytest
    left, right = _fixtures(spark)
    with pytest.raises(ValueError, match="tie_cols"):
        asof_join(left, right, ["k"], "ts", ["rid", "rv"],
                  tie_cols=["nope"])


def test_single_shuffle_no_join(spark):
    """The plan is union + one window exchange — no Join operator, no
    range-join explosion."""
    left, right = _fixtures(spark)
    plan = (asof_join(left, right, ["k"], "ts", ["rid", "rv"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


# --- band_join ---------------------------------------------------------------

def _band_fixtures(spark):
    fact = spark.createDataFrame(
        [(1, 0.05), (2, 0.1), (3, 0.35), (4, 0.999), (5, 5.0)],
        "fid long, value double")
    # unaligned, varied-width intervals incl. one spanning many buckets
    bands = spark.createDataFrame(
        [(0, 0.0, 0.1), (1, 0.1, 0.4), (2, 0.4, 1.0)],
        "band int, lo double, hi double")
    return fact, bands


def test_band_join_inner_half_open(spark):
    from rakam_api_collector_spark.operators.temporal import band_join
    fact, bands = _band_fixtures(spark)
    out = {r.fid: r.band for r in
           band_join(fact, bands, "value", "lo", "hi", 0.1).collect()}
    # 0.1 is excluded from band 0 (half-open) and included in band 1;
    # 5.0 matches nothing and is dropped
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}


def test_band_join_left_keeps_unmatched(spark):
    from rakam_api_collector_spark.operators.temporal import band_join
    fact, bands = _band_fixtures(spark)
    rows = band_join(fact, bands, "value", "lo", "hi", 0.1,
                     how="left").collect()
    out = {r.fid: r.band for r in rows}
    assert out[5] is None and len(rows) == 5


def test_band_join_is_hash_join_not_nested_loop(spark):
    from rakam_api_collector_spark.operators.temporal import band_join
    fact, bands = _band_fixtures(spark)
    plan = (band_join(fact, bands, "value", "lo", "hi", 0.1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_band_join_property_matches_bruteforce(spark):
    """Randomized cross-check: bucketed band_join must equal the naive
    nested-loop range join for arbitrary (unaligned, overlapping,
    multi-bucket-spanning) intervals and any bucket width. Hypothesis
    drives the data; one Spark comparison per case would be minutes, so
    the strategy generates N cases and a single Spark job checks the
    union (case id in the join key via interval identity)."""
    import random

    from rakam_api_collector_spark.operators.temporal import band_join

    rng = random.Random(7)
    facts, bands = [], []
    for case in range(20):
        for i in range(30):
            facts.append((case * 1000 + i,
                          round(rng.uniform(-2.0, 4.0), 3)))
        for b in range(rng.randint(1, 6)):
            lo = round(rng.uniform(-2.0, 3.0), 3)
            hi = round(lo + rng.uniform(0.0, 2.5), 3)
            bands.append((case * 100 + b, lo, hi))
    fact = spark.createDataFrame(facts, "fid long, value double")
    iv = spark.createDataFrame(bands, "band long, lo double, hi double")
    # fact case must match interval case: include it in both sides
    fact = fact.withColumn("case", (F.col("fid") / 1000).cast("long"))
    iv = iv.withColumn("case", (F.col("band") / 100).cast("long"))

    expected = {(r.fid, r.band) for r in
                fact.join(iv, "case")
                .filter((F.col("value") >= F.col("lo"))
                        & (F.col("value") < F.col("hi"))).collect()}
    for width in (0.1, 0.37, 1.0, 3.0):
        got = {(r.fid, r.band) for r in
               band_join(fact, iv.drop("case"), "value", "lo", "hi",
                         width).collect()}
        # band_join has no case key: keep only same-case matches
        got = {(f, b) for f, b in got if f // 1000 == b // 100}
        assert got == expected, f"width={width}"
