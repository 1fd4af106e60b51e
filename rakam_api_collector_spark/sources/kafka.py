"""Kafka sources & historical producer (S1/S2/K3).

Maps the reference's consumer loop config (KafkaConfig.java:25-46:
``kafka.offset`` latest-default, ``max.poll.records`` 300k,
``session.timeout.ms`` 12s, ``request.timeout.ms`` 15s, group id
``presto_streaming``) onto the Spark Kafka connector's option names.
The hand-rolled poll/pause/commit loop itself (KafkaRealTimeWorker.java:
145-222) intentionally has NO equivalent: trigger cadence replaces
poll cadence, `maxOffsetsPerTrigger` replaces max.poll.records,
checkpointLocation replaces commitSync (ST7), and Spark's memory
manager replaces pause/resume backpressure (ST8).

The production path requires the ``spark-sql-kafka-0-10`` connector
jar on the cluster (not shipped in this environment —
``kafka_available`` probes for it). ``format("kafka_py")`` is the
jar-free twin: the same schema and offset semantics as the real
connector, speaking to the file-backed broker emulator
(sources/kafka_local.py) — the Kinesis pattern
(sources/kinesis.py) applied to Kafka so ingest pipelines earn
checkpointed e2e evidence without a broker.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)
from pyspark.sql.streaming import DataStreamReader

MAX_POLL_RECORDS = 300_000       # KafkaConfig.java:33
DEFAULT_GROUP_ID = "presto_streaming"   # KafkaConfig.java:31
HISTORICAL_MAX_RECORDS = 500_000  # HistoricalDataConfig.java:14
HISTORICAL_CADENCE = "30 minutes"  # HistoricalDataConfig.java:15


def kafka_available(spark: SparkSession) -> bool:
    """True when the Kafka SQL connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def realtime_reader_options(brokers: list[str], topics: list[str],
                            offset: str = "latest",
                            group_id: str = DEFAULT_GROUP_ID,
                            max_records_per_trigger: int = MAX_POLL_RECORDS,
                            session_timeout_ms: int = 12_000,
                            request_timeout_ms: int = 15_000
                            ) -> dict[str, str]:
    """S1 option set. ``offset`` is the reference's ``kafka.offset``
    knob ('latest'|'earliest')."""
    return {
        "kafka.bootstrap.servers": ",".join(brokers),
        "subscribe": ",".join(topics),
        "startingOffsets": offset,
        "kafka.group.id": group_id,
        "maxOffsetsPerTrigger": str(max_records_per_trigger),
        "kafka.session.timeout.ms": str(session_timeout_ms),
        "kafka.request.timeout.ms": str(request_timeout_ms),
        # poison-pill parity (ST11/ST12): skip silently-expired offsets
        "failOnDataLoss": "false",
    }


def realtime_reader(spark: SparkSession, brokers: list[str],
                    topics: list[str], **kwargs) -> DataStreamReader:
    """S1: the real-time consumer stream."""
    return (spark.readStream.format("kafka")
            .options(**realtime_reader_options(brokers, topics, **kwargs)))


def historical_reader_options(brokers: list[str], historical_topic: str,
                              max_records_per_trigger: int =
                              HISTORICAL_MAX_RECORDS) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": ",".join(brokers),
        "subscribe": historical_topic,
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": str(max_records_per_trigger),
        "failOnDataLoss": "false",
    }


def historical_reader(spark: SparkSession, brokers: list[str],
                      historical_topic: str, **kwargs) -> DataStreamReader:
    """S2: the slow-cadence historical drain — pair with
    ``.trigger(processingTime=HISTORICAL_CADENCE)`` to mirror the 30-min
    / 500k-lag gate (KafkaHistoricalWorker.java:214-219)."""
    return (spark.readStream.format("kafka")
            .options(**historical_reader_options(brokers, historical_topic,
                                                 **kwargs)))


def historical_producer_options(brokers: list[str],
                                historical_topic: str) -> dict[str, str]:
    """K3: options for re-publishing late records
    (KafkaHistoricalDataHandler.java:41-69):
    ``df.select(value).write.format('kafka').options(**these).save()``."""
    return {"kafka.bootstrap.servers": ",".join(brokers),
            "topic": historical_topic}


def historical_producer_for(endpoint, historical_topic: str):
    """K3 as a callable for ``start_ingest_stream(historical_producer=
    ...)``: returns ``frame -> None`` re-publishing a micro-batch's
    late envelopes to the historical topic
    (KafkaHistoricalDataHandler.java:41-69).

    ``endpoint``: a broker list → the distributed jar-connector batch
    write (``df.write.format("kafka")``, value column per record);
    a ``LocalKafkaBroker`` (or any object with ``produce``) → the
    emulator twin, which COLLECTS the frame and issues one
    single-writer ``produce`` call — the emulator log is a
    single-writer file, so a distributed ``foreachPartition`` append
    would violate (and now trips) its concurrent-produce guard. The
    collect is bounded by the late fraction of one micro-batch, the
    same records the reference buffers in its handler before
    producing; production-scale late floods belong on the jar path."""
    if isinstance(endpoint, list):
        opts = historical_producer_options(endpoint, historical_topic)

        def produce_jar(frame) -> None:
            (frame.selectExpr("CAST(value AS STRING) AS value")
             .write.format("kafka").options(**opts).save())
        return produce_jar

    def produce_local(frame) -> None:
        # mirror the jar branch's CAST(value AS STRING): a binary
        # value column must decode to its UTF-8 text, never through
        # str(bytearray) repr; null values (Kafka tombstones — the
        # envelope pipeline never emits them) are skipped because the
        # emulator log has no null-payload record shape
        rows = [{"Value": r["value"].encode()}
                for r in frame.selectExpr(
                    "CAST(value AS STRING) AS value").collect()
                if r["value"] is not None]
        if rows:
            endpoint.produce(historical_topic, rows)
    return produce_local


# -- kafka_py: the jar-free streaming source over the wire emulator ----------

# schema parity with the spark-sql-kafka-0-10 connector, so a pipeline
# written against format("kafka") runs unchanged against format("kafka_py")
KAFKA_PY_SCHEMA = ("key binary, value binary, topic string, "
                   "partition int, offset long, timestamp timestamp, "
                   "timestampType int")


class _TopicRangePartition(InputPartition):
    """One (topic, partition) × one [start, end) offset range — the
    executor work unit; dense Kafka offsets make the range replay a
    pure log slice."""

    def __init__(self, topic: str, partition: int, start: int, end: int,
                 endpoint: str) -> None:
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end
        self.endpoint = endpoint


class _KafkaPyStreamReader(DataSourceStreamReader):
    """Executor-parallel reader with the real connector's offset
    model: the offset is ``{"topic p": next_offset_to_read}`` per
    topic-partition (dense, server-assigned — Kafka's own coordinates,
    unlike Kinesis where the partitioned reader had to invent
    arrival-time windows because no end-offset API exists). Planning
    cost per batch is one log-end metadata read per partition; fetches
    run on executors.

    Semantics mirrored from the jar connector:
    - ``startingOffsets`` earliest|latest anchors the initial offset
      (latest = log-end at query start, restart-safe because it's IN
      the checkpoint);
    - ``maxOffsetsPerTrigger`` caps a batch's TOTAL records, prorated
      across partitions by their share of the lag (processing-time
      triggers; an availableNow drain runs complete and unpaced — its
      only planning call precedes any proration base);
    - partitions discovered mid-stream (``create_partitions`` growth)
      enter at offset 0 — their whole retained history, the jar
      connector's new-partition posture;
    - group offsets are never committed: progress lives in the query
      checkpoint (ST7), so the consumer-group protocol (rebalances,
      commit fencing) doesn't apply to this path — it is pinned
      separately against the emulator in tests/test_kafka_local.py,
      mirroring the reference's own worker loop
      (KafkaRealTimeWorker.java:169-222, KafkaUtil.java:107-124).
    """

    def __init__(self, options: dict) -> None:
        self._options = dict(options)
        self._endpoint = options.get("endpoint") or ""
        if not self._endpoint.startswith("local:"):
            raise ValueError(
                "kafka_py requires option endpoint=local:<dir> (the "
                "file-backed emulator); real brokers use format('kafka')")
        topics = options.get("subscribe") or ""
        self._topics = [t.strip() for t in topics.split(",") if t.strip()]
        if not self._topics:
            raise ValueError("kafka_py requires option 'subscribe'")
        start = (options.get("startingoffsets") or "latest").lower()
        if start not in ("latest", "earliest"):
            raise ValueError(f"startingOffsets {start!r}: expected "
                             "'latest' or 'earliest'")
        self._starting = start
        cap = options.get("maxoffsetspertrigger")
        self._max_per_trigger = int(cap) if cap else None
        self._b = None
        # last offsets THIS reader planned or observed — the proration
        # base. None on the very first latestOffset() of a (re)started
        # query (the engine calls it before initialOffset(), and never
        # shows planning the checkpointed start): that first batch is
        # UNCAPPED. Deliberate and load-bearing — a synthesized base
        # (zeros, the starting anchor…) can clamp the planned end
        # BELOW the checkpointed offset, Spark commits whatever
        # latestOffset returns, and the next batch starts at the
        # regressed offset and re-delivers everything between it and
        # the old checkpoint. An uncapped now-shaped end can never
        # regress. partitions() feeds the base from the authoritative
        # checkpoint offsets, so pacing engages from the second batch
        # after a restart. The cap must clamp latestOffset() itself:
        # partitions() always reads the FULL committed [start, end)
        # range, so a clamp there would silently skip the tail between
        # planned and committed ends.
        # KNOWN DIVERGENCE from the jar connector: spark-sql-kafka's
        # DSv2 reader receives the checkpointed start offset as
        # latestOffset(start, limit)'s argument, so it paces even the
        # restart batch; the Python DataSourceStreamReader API passes
        # no start, forcing the uncapped-first-batch design above
        # (safe: no loss, no duplication, no regression — all tested).
        # Operational implication: restarting onto a DEEP backlog
        # plans that whole backlog as ONE batch — executor memory and
        # the batch's wall-clock must absorb it before pacing resumes;
        # if that bites, drain the backlog with Trigger.AvailableNow
        # (which is one unpaced batch by contract anyway) before
        # resuming the paced processing-time query.
        self._last_planned: dict[str, int] | None = None
        # batches a lagging partition has gone without an allocation —
        # ages its priority so sustained unequal load cannot starve a
        # low-lag partition (bounded wait: <= #lagging partitions
        # batches, see latestOffset)
        self._skips: dict[str, int] = {}

    def _broker(self):
        if self._b is None:
            from rakam_api_collector_spark.sources.kafka_local import \
                LocalKafkaBroker
            self._b = LocalKafkaBroker(self._endpoint[len("local:"):])
        return self._b

    def _ends(self) -> dict[str, int]:
        b = self._broker()
        out = {}
        for t in self._topics:
            for p, off in b.end_offsets(t).items():
                out[f"{t} {p}"] = off
        return out

    def initialOffset(self) -> dict:
        if self._starting == "earliest":
            b = self._broker()
            offs = {f"{t} {p}": 0 for t in self._topics
                    for p in b.partitions_for(t)}
        else:
            offs = self._ends()
        self._last_planned = dict(offs)
        return {"v": 1, "offsets": offs}

    def latestOffset(self) -> dict:
        ends = self._ends()
        # maxOffsetsPerTrigger: prorate the batch cap by each
        # partition's share of the lag (the jar connector's rate-limit
        # shape), clamping the PLANNED end — the unread tail simply
        # stays in the next batch. Allocation is largest-remainder so
        # the batch TOTAL never exceeds the cap even with more lagging
        # partitions than records allowed (a floor-at-1-each would
        # overshoot by up to #partitions/cap — the jar connector's own
        # posture, traded here for a strict cap). Strictness needs an
        # anti-starvation rule: under SUSTAINED unequal load a low-lag
        # partition's fractional share never wins the remainder, so
        # zero-allocation batches age a partition's priority
        # (self._skips) until it leads the remainder order — bounded
        # wait of <= #lagging partitions batches, then it is served or
        # steals one record from the largest allocation. Under
        # Trigger.AvailableNow the single planning call is the blind
        # first one, which is UNCAPPED — so an availableNow drain is
        # complete in one unpaced batch and the cap simply has no
        # effect there (tested; the cap paces processing-time
        # triggers, where planning has a base from the prior batch).
        if self._max_per_trigger and self._last_planned is not None:
            base = self._last_planned
            lags = {tp: ends[tp] - base.get(tp, 0) for tp in ends
                    if ends[tp] > base.get(tp, 0)}
            total = sum(lags.values())
            cap = self._max_per_trigger
            if total > cap:
                scale = cap / total
                floors = {tp: int(n * scale) for tp, n in lags.items()}
                left = cap - sum(floors.values())
                # remainder order: longest-starved first, then largest
                # fractional share, then name (deterministic)
                order = sorted(
                    lags, key=lambda tp: (-self._skips.get(tp, 0),
                                          -(lags[tp] * scale
                                            - floors[tp]), tp))
                for tp in order:
                    if left <= 0:
                        break
                    floors[tp] += 1
                    left -= 1
                # (no zero-total case exists: largest-remainder
                # distributes exactly `left`, so floors sum to cap>=1)
                for tp in order:
                    if (floors[tp] == 0
                            and self._skips.get(tp, 0) >= len(lags)):
                        donor = max(floors, key=floors.get)
                        if floors[donor] > 1:
                            floors[donor] -= 1
                            floors[tp] += 1
                for tp in lags:              # 0-alloc partitions age
                    if floors[tp] == 0:
                        self._skips[tp] = self._skips.get(tp, 0) + 1
                    else:
                        self._skips.pop(tp, None)
                    ends[tp] = base.get(tp, 0) + floors[tp]
        self._last_planned = dict(ends)
        return {"v": 1, "offsets": ends}

    def partitions(self, start: dict, end: dict):
        s, e = start["offsets"], end["offsets"]
        # feed the proration base from the authoritative checkpoint
        # offsets (the restart path: the first latestOffset ran blind
        # and uncapped; from here on pacing has a real base)
        merged = dict(self._last_planned or {})
        for src in (s, e):
            for tp, off in src.items():
                merged[tp] = max(merged.get(tp, 0), off)
        self._last_planned = merged
        parts = []
        for tp, hi in e.items():
            lo = s.get(tp, 0)      # new partitions enter at offset 0
            if hi <= lo:
                continue
            topic, p = tp.rsplit(" ", 1)
            parts.append(_TopicRangePartition(topic, int(p), lo, hi,
                                              self._endpoint))
        return parts

    def read(self, partition: _TopicRangePartition):
        from rakam_api_collector_spark.sources.kafka_local import \
            LocalKafkaBroker
        b = LocalKafkaBroker(partition.endpoint[len("local:"):])
        # dense offsets make the range size exact — bound the fetch so
        # a paced drain decodes O(range), not O(backlog), per batch
        for rec in b.fetch(partition.topic, partition.partition,
                           partition.start,
                           max_records=partition.end - partition.start):
            if rec["offset"] >= partition.end:
                break
            yield (rec["key"], rec["value"], rec["topic"],
                   rec["partition"], rec["offset"],
                   datetime.fromtimestamp(rec["timestamp"], tz=timezone.utc),
                   0)   # timestampType 0 = CreateTime

    def commit(self, end: dict) -> None:
        pass            # progress lives in the query checkpoint (ST7)


class KafkaPyDataSource(DataSource):
    """``spark.dataSource.register(KafkaPyDataSource)`` once per
    session, then ``spark.readStream.format("kafka_py")`` with options
    ``endpoint=local:<dir>``, ``subscribe=<topics>``,
    ``startingOffsets``, ``maxOffsetsPerTrigger``."""

    @classmethod
    def name(cls) -> str:
        return "kafka_py"

    def schema(self) -> str:
        return KAFKA_PY_SCHEMA

    def streamReader(self, schema):
        return _KafkaPyStreamReader(
            {k.lower(): v for k, v in self.options.items()})


def register_kafka_py(spark: SparkSession) -> None:
    """Idempotent per session."""
    key = "_kafka_py_registered"
    if getattr(spark, key, False):
        return
    spark.dataSource.register(KafkaPyDataSource)
    setattr(spark, key, True)


def historical_drain_due(lag_records: int, ms_since_last_drain: int,
                         max_flush_records: int = HISTORICAL_MAX_RECORDS,
                         max_flush_ms: int = 30 * 60 * 1000,
                         available_memory_pct: float = 1.0) -> bool:
    """S2's drain gate (KafkaHistoricalWorker.java:214-219
    ``shouldFlush``): the historical topic drains only when memory
    allows AND (the 30-minute cadence elapsed OR the backlog exceeds
    500k records) — lag-pressure OR staleness, never a hot loop.
    Pure-predicate twin so the gate is testable and reusable: pair it
    with ``historical_lag`` and fire a ``Trigger.AvailableNow`` drain
    query when it returns True (the Spark mapping of the reference's
    do/while poll burst). ``available_memory_pct`` maps the
    memoryTracker guard (> 0.3 required); Spark's own memory manager
    usually makes it moot — pass the default 1.0 unless a caller
    tracks external pressure."""
    return available_memory_pct > 0.3 and (
        ms_since_last_drain > max_flush_ms
        or lag_records > max_flush_records)


def checkpointed_offsets(checkpoint: str,
                         source_index: int = 0,
                         meta_store=None) -> dict[str, int] | None:
    """Latest planned per-partition offsets of a ``kafka_py`` query,
    read from its own checkpoint (``offsets/<max-batch>``). Both the
    jar connector and kafka_py keep progress in the CHECKPOINT, never
    in consumer-group commits (ST7), so the reference's "lag since
    committed" test maps onto checkpoint-vs-log-end here. Returns
    None before any batch has been planned. File shape: a ``v1``
    header line, one batch-metadata JSON line, then one offset line
    PER SOURCE in the query's source order — so the line is selected
    by POSITION (``source_index``, default 0: the single-source
    case), never by "first line that looks like ours": a second
    source whose offset JSON also carries an ``offsets`` key (another
    kafka_py stream, a rate source with a dict payload) would
    otherwise shadow this one and skew ``checkpoint_lag``. For a
    multi-source query pass the kafka_py source's position among the
    query's streaming sources. Returns None if that line is missing
    or isn't a kafka_py offsets map.

    ``meta_store`` (r16) routes the checkpoint listing/read through
    the manifest MetadataStore seam — on a cluster the checkpoint
    lives on HDFS/S3, where the POSIX default can only report "no
    progress yet"; a URI checkpoint without an explicit store raises
    so a drain gate can't silently read lag-from-zero forever."""
    from rakam_api_collector_spark.manifest import resolve_meta_store
    meta_store = resolve_meta_store(checkpoint, meta_store,
                                    "checkpoint offsets")
    d = f"{checkpoint}/offsets"
    try:
        batches = sorted(int(f) for f in meta_store.list(d)
                         if f.isdigit())
        if not batches:
            return None
        raw = meta_store.read_if_exists(f"{d}/{batches[-1]}")
    except OSError:
        # the documented contract: an unreadable checkpoint reads as
        # "no progress yet" (NotADirectoryError, PermissionError, ...)
        # — the drain-gate poll degrades instead of crashing
        return None
    except Exception as e:  # noqa: BLE001 — typed by wire status
        from rakam_api_collector_spark.manifest import \
            ObjectMetadataStore
        if ObjectMetadataStore._http_status(e) == 403:
            # the object-store shape of the same contract (ADVICE
            # r16, narrowed in r18 per ADVICE r17): a 403
            # AccessDenied degrades to "no progress yet" exactly as
            # the POSIX PermissionError it mirrors; 404s already
            # return None via read_if_exists. Anything else — a 5xx
            # that survived the adapter's capped retries, a wire
            # 400 — PROPAGATES: a drain-gate poll must see a store
            # failure, not wait forever on a silent None
            return None
        raise
    if raw is None:
        return None
    # strip newlines but KEEP empty lines: Spark serializes the
    # metadata line as metadataOpt.getOrElse(""), so a blank line
    # still occupies its positional slot — dropping it would shift
    # every source's index by one
    lines = [ln.strip() for ln in raw.splitlines()]
    # lines[0] = "v1", lines[1] = batch metadata, lines[2:] = sources
    idx = 2 + source_index
    if not 0 <= idx < len(lines) or not lines[idx]:
        return None
    try:
        doc = json.loads(lines[idx])
    except ValueError:
        return None
    if isinstance(doc, dict) and isinstance(doc.get("offsets"), dict):
        return {k: int(v) for k, v in doc["offsets"].items()}
    return None


def checkpoint_lag(checkpoint: str, broker, topics: list[str],
                   source_index: int = 0, meta_store=None) -> int:
    """Records between a kafka_py query's checkpointed offsets and the
    log ends — the ``recordsToBeProcessed`` input of
    ``historical_drain_due`` for the Spark-checkpoint path (S2's lag
    gate over the query's own progress state). An unplanned partition
    counts its whole log (startingOffsets=earliest drain posture).
    ``source_index`` and ``meta_store`` pass through to
    ``checkpointed_offsets`` (the latter for object-store
    checkpoints)."""
    committed = checkpointed_offsets(checkpoint, source_index,
                                     meta_store) or {}
    total = 0
    for t in topics:
        for p, end in broker.end_offsets(t).items():
            total += max(0, end - committed.get(f"{t} {p}", 0))
    return total


def historical_lag(broker, group: str, topic: str) -> int:
    """Total records between the group's committed offsets and the
    log end across a topic's partitions — the ``recordsToBeProcessed``
    input of ``historical_drain_due``. Works against any object with
    the LocalKafkaBroker metadata surface (``end_offsets`` +
    ``committed``)."""
    total = 0
    for p, end in broker.end_offsets(topic).items():
        committed = broker.committed(group, topic, p) or 0
        total += max(0, end - committed)
    return total
