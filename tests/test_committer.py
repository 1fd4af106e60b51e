"""Commit retry, error kill-switch, counters, sink SPI (ST9/ST11/A2/K4)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from rakam_api_collector_spark.ingest.catalog import Catalog
from rakam_api_collector_spark.sinks import ParquetDatabaseHandler
from rakam_api_collector_spark.streaming.committer import (
    ErrorRateMonitor, IngestStats, RetryPolicy, commit_with_retry)


def test_retry_succeeds_after_transient_failures():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return "ok"

    out = commit_with_retry(flaky, RetryPolicy(), sleep=sleeps.append,
                            rng=lambda: 0.5)
    assert out == "ok" and calls["n"] == 3
    assert sleeps == [1.0, 2.0]          # backoff 1 → 2 (jitter zeroed)


def test_retry_exhausts_and_raises():
    calls = {"n": 0}

    def dead():
        calls["n"] += 1
        raise IOError("down")

    with pytest.raises(IOError):
        commit_with_retry(dead, RetryPolicy(max_retries=3),
                          sleep=lambda s: None)
    assert calls["n"] == 4               # initial + 3 retries


def test_error_rate_kill_switch():
    now = {"t": 0.0}
    mon = ErrorRateMonitor(window_sec=300, max_ratio=0.4, min_records=100,
                           clock=lambda: now["t"])
    mon.record(ok=90, failed=20)          # 110 records, 18% — fine
    assert not mon.should_kill()
    mon.record(ok=10, failed=60)          # 180 records, 44% — fatal
    assert mon.should_kill()
    now["t"] = 400.0                      # first burst ages out of window
    assert not mon.should_kill()          # 70 records left: under minimum


def test_error_rate_needs_minimum_records():
    mon = ErrorRateMonitor(min_records=100)
    mon.record(ok=1, failed=99)           # 99% errors but only 100 records
    assert not mon.should_kill()          # > min, not >=: boundary excluded


def test_ingest_stats_counters():
    st = IngestStats()
    st.add("p", "a", 10)
    st.add("p", "a", 5)
    st.add("p", "b", 7)
    assert st.records[("p", "a")] == 15
    assert st.batches[("p", "a")] == 2
    assert st.total_records() == 22


def test_parquet_database_handler_spi(spark, tmp_path):
    cat = Catalog()
    h = ParquetDatabaseHandler(cat, str(tmp_path / "tables"))
    assert h.get_columns("p", "ev") is None
    cols = h.add_columns("p", "ev", [T.StructField("x", T.LongType())])
    assert [f.name for f in cols] == ["_shard_time", "_time", "_user", "x"]
    # commit is deferred until the committer fires it (Inserter.commit)
    df = spark.createDataFrame([(1,), (2,)], "x: bigint")
    commit = h.insert("p", "ev", df)
    import os
    assert not os.path.exists(tmp_path / "tables" / "p" / "ev")
    commit_with_retry(commit)
    got = spark.read.parquet(str(tmp_path / "tables" / "p" / "ev"))
    assert sorted(r["x"] for r in got.collect()) == [1, 2]
