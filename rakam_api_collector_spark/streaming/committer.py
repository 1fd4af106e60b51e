"""Commit orchestration: retry, metrics, error kill-switch (ST9/ST11/A2).

The reference wraps every per-table commit in a Failsafe retry (backoff
1→60 s, jitter 0.1, ≤3 retries — TargetConnectorCommitter.java:35-39),
counts records/bytes per table (MiddlewareBuffer.java:44-50,
KafkaRealTimeWorker.java:87-95), and hard-exits when the 5-minute error
rate crosses 40% over >100 records (KafkaUtil.java:158-166).

On Spark most of that is native — task retries, StreamingQueryProgress —
but the *sink-commit* retry and the error-rate policy live above task
granularity, so they are the two pieces re-implemented here for use
inside ``foreachBatch``. ST10's concurrency limiter and ST8's
backpressure are deliberately absent (Spark scheduler/memory manager).
"""

from __future__ import annotations

import random
import time
from collections import deque
from dataclasses import dataclass, field


@dataclass
class RetryPolicy:
    """TargetConnectorCommitter.java:35-39 defaults."""
    max_retries: int = 3
    backoff_start_sec: float = 1.0
    backoff_max_sec: float = 60.0
    jitter: float = 0.1
    max_total_sec: float = 60.0


def commit_with_retry(fn, policy: RetryPolicy = RetryPolicy(),
                      sleep=time.sleep, rng=random.random):
    """Run ``fn()`` under the reference's retry envelope. Sinks must be
    idempotent (file-sink epoch commit / Delta txn make replay safe —
    the reference only offers at-least-once here, ST12). Raises the last
    error once the policy is exhausted."""
    start = time.monotonic()
    delay = policy.backoff_start_sec
    for attempt in range(policy.max_retries + 1):
        try:
            return fn()
        except Exception:
            exhausted = (attempt == policy.max_retries
                         or time.monotonic() - start >= policy.max_total_sec)
            if exhausted:
                raise
            sleep(delay * (1 + policy.jitter * (2 * rng() - 1)))
            delay = min(delay * 2, policy.backoff_max_sec)


class ErrorRateMonitor:
    """ST11 kill-switch: sliding-window error-rate check
    (KafkaUtil.java:158-166: >40% of records errored within 5 minutes,
    minimum 100 records → fatal). The caller decides what "fatal" means
    (the reference calls System.exit; a Spark driver stops the query)."""

    def __init__(self, window_sec: float = 300.0, max_ratio: float = 0.4,
                 min_records: int = 100, clock=time.monotonic) -> None:
        self._window = window_sec
        self._max_ratio = max_ratio
        self._min_records = min_records
        self._clock = clock
        self._events: deque[tuple[float, int, int]] = deque()

    def record(self, ok: int, failed: int) -> None:
        self._events.append((self._clock(), ok, failed))

    def should_kill(self) -> bool:
        cutoff = self._clock() - self._window
        while self._events and self._events[0][0] < cutoff:
            self._events.popleft()
        total = sum(ok + bad for _, ok, bad in self._events)
        bad = sum(bad for _, _, bad in self._events)
        return total > self._min_records and bad / total > self._max_ratio


@dataclass
class IngestStats:
    """A2 counter accumulation (per-table records + batches); Spark's
    per-query numbers live in StreamingQueryProgress — these are the
    per-*collection* counters the reference tracks in MiddlewareBuffer."""
    records: dict[tuple[str, str], int] = field(default_factory=dict)
    batches: dict[tuple[str, str], int] = field(default_factory=dict)

    def add(self, project: str, collection: str, n_records: int) -> None:
        key = (project, collection)
        self.records[key] = self.records.get(key, 0) + n_records
        self.batches[key] = self.batches.get(key, 0) + 1

    def total_records(self) -> int:
        return sum(self.records.values())
