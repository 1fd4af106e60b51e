"""Kinesis source (S3): KCL semantics, two ways onto Spark.

The reference runs one KCL ``IRecordProcessor`` per shard with a
DynamoDB lease table, TRIM_HORIZON start, and per-shard checkpointing
(KinesisRecordProcessor.java:77-133, KinesisWorkerManager.java:85-116).

**Connector path** (``kinesis_reader``): OSS Spark has no first-party
Kinesis source; the two maintained connectors (``spark-sql-kinesis``
qubole/ASF fork lineage, and the AWS Kinesis EFO connector) both
accept the option set produced here. Shard-level parallelism maps to
source partitions, the lease table to the connector's DynamoDB
metadata table, and ``checkpointer.checkpoint()`` to Spark's
checkpointLocation (ST7) — there is deliberately no per-shard
processor class to port.

**Jar-less path** (``KinesisPyDataSource``, ``format("kinesis_py")``):
a PySpark DataSource speaking the public Kinesis Data Streams API
(ListShards / GetShardIterator / GetRecords) through any boto3-shaped
client — boto3 itself against AWS, or the file-backed
``kinesis_local.LocalKinesisClient`` emulator for dev/test. It
implements the KCL consumption contract the reference relies on:
per-shard sequence-number offsets in the query checkpoint (the lease
table's checkpoint column), TRIM_HORIZON / LATEST starts, and
resharding — a closed parent is drained to its EndingSequenceNumber
before its children are consumed (KinesisShardSyncer's
parent-before-child ordering), merge parents both drained first.

Scale note, stated plainly: this source is built on
``SimpleDataSourceStreamReader``, Spark's API for sources whose end
offsets cannot be enumerated without reading (a Kinesis sequence
number is only discoverable FROM a record — there is no "latest
sequence" call), so fetches run in the driver-side source worker and
Spark's WAL redistributes to executors. Per-batch volume is bounded
by ``maxRecordsPerShard`` × #shards. That is the right shape for the
reference's workload (its KCL workers are single-process consumers
too) and for modest shard counts; a 100 TB firehose belongs on the
jar connector (``kinesis_reader``) whose executor-side fetch this
option set already targets.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.streaming import DataStreamReader

TRIM_HORIZON = "TRIM_HORIZON"    # KinesisUtil default in the reference


def kinesis_available(spark: SparkSession) -> bool:
    for cls in ("org.apache.spark.sql.kinesis.KinesisSourceProvider",
                "org.apache.spark.sql.connector.kinesis.KinesisTable"):
        try:
            spark._jvm.java.lang.Class.forName(cls)
            return True
        except Exception:
            continue
    return False


def kinesis_reader_options(stream_name: str, region: str,
                           app_name: str,
                           position: str = TRIM_HORIZON) -> dict[str, str]:
    """Connector-agnostic option set (S3). ``app_name`` becomes the
    DynamoDB lease/metadata table name, as in the KCL."""
    return {
        "streamName": stream_name,
        "region": region,
        "initialPosition": position,
        "consumerName": app_name,
        # KCL CloudWatch metrics (KinesisWorkerManager.java:101-108) are
        # Spark streaming metrics; no option needed.
    }


def kinesis_reader(spark: SparkSession, stream_name: str, region: str,
                   app_name: str,
                   position: str = TRIM_HORIZON) -> DataStreamReader:
    if not kinesis_available(spark):
        raise RuntimeError(
            "no Kinesis connector on the classpath; add spark-sql-kinesis "
            "or the AWS EFO connector jar (see module docstring)")
    reader = spark.readStream.format("kinesis")
    for k, v in kinesis_reader_options(stream_name, region, app_name,
                                       position).items():
        reader = reader.option(k, v)
    return reader


# ---------------------------------------------------------------------------
# jar-less Python DataSource: format("kinesis_py")

KINESIS_PY_SCHEMA = ("shard_id string, sequence_number string, "
                     "partition_key string, value binary, "
                     "arrival_time timestamp")


def _err_code(e: Exception) -> str:
    """Error-identity across client shapes: botocore ClientError
    carries response["Error"]["Code"]; the local emulator raises
    classes NAMED as the codes. Matching on the code string keeps the
    reader client-agnostic."""
    resp = getattr(e, "response", None)
    if isinstance(resp, dict):
        code = resp.get("Error", {}).get("Code")
        if code:
            return code
    return type(e).__name__


def _make_client(options: dict):
    endpoint = options.get("endpoint")
    if endpoint and endpoint.startswith("local:"):
        from rakam_api_collector_spark.sources.kinesis_local import \
            LocalKinesisClient
        return LocalKinesisClient(endpoint[len("local:"):])
    try:
        import boto3
    except ImportError:
        raise RuntimeError(
            "format('kinesis_py') needs boto3 for a real stream, or "
            "option endpoint='local:<dir>' for the file-backed "
            "emulator") from None
    return boto3.client("kinesis",
                        region_name=options.get("region") or None,
                        endpoint_url=endpoint or None)


class _KinesisSimpleStreamReader(SimpleDataSourceStreamReader):
    """Per-shard sequence-number offsets; KCL consumption order.

    Offset shape (JSON in the query checkpoint, the lease-table
    analog)::

        {"shards": {shard_id: {"seq": "<n>"[, "drained": true]}}}

    ``drained`` marks a CLOSED shard read through its
    EndingSequenceNumber — the SHARD_END signal that unlocks its
    children. Entries are never removed: a drained tombstone is what
    proves, on every later batch, that the child may be read (and it
    is bounded by the stream's total historical shard count, exactly
    like KCL leases).

    LATEST starts carry one documented at-least-once edge, shared
    with the jar connectors: a shard with NO offset entry yet resolves
    LATEST at read time, so a restart from a checkpoint written before
    the shard's first record re-evaluates "latest". TRIM_HORIZON and
    resumed (seq-bearing) offsets replay exactly
    (``readBetweenOffsets`` refetches a closed seq range; shard data
    is immutable within retention)."""

    def __init__(self, options: dict) -> None:
        self._options = dict(options)
        self._stream = options.get("streamname")
        if not self._stream:
            raise ValueError("kinesis_py requires option 'streamName'")
        self._position = (options.get("initialposition")
                          or TRIM_HORIZON).upper()
        if self._position not in (TRIM_HORIZON, "LATEST"):
            raise ValueError(f"initialPosition {self._position!r}: "
                             "expected TRIM_HORIZON or LATEST")
        self._max_per_shard = int(options.get("maxrecordspershard")
                                  or 10_000)
        self._cl = None
        # live iterators for LATEST shards that have produced no
        # record yet: without one, every batch would re-evaluate
        # LATEST and drop whatever arrived between batches. In-memory
        # only (iterators are not replayable offsets) — a restart
        # before the shard's first record re-evaluates LATEST, the
        # documented edge shared with the jar connectors.
        # value = (iterator, LATEST-evaluation time | None): the time
        # anchors the AT_TIMESTAMP re-seek when a held iterator
        # expires between micro-batches (see _drain_shard)
        self._live_iters: dict[str, tuple[str, float | None]] = {}

    def _client(self):
        if self._cl is None:
            self._cl = _make_client(self._options)
        return self._cl

    def initialOffset(self) -> dict:
        return {"shards": {}}

    # -- consumption order -------------------------------------------------

    def _parents(self, shard: dict) -> list[str]:
        return [p for p in (shard.get("ParentShardId"),
                            shard.get("AdjacentParentShardId")) if p]

    def _consumable(self, shard: dict, shard_map: dict,
                    offsets: dict) -> bool:
        """Parent-before-child: every parent still listed must be
        drained; a parent aged out of the retention window (absent
        from ListShards) no longer gates."""
        return all(p not in shard_map or offsets.get(p, {}).get("drained")
                   for p in self._parents(shard))

    def _start_iterator(self, sid: str, shard: dict, offsets: dict,
                        replay: bool = False):
        cl = self._client()
        st = offsets.get(sid)
        if st is not None:
            return cl.get_shard_iterator(
                StreamName=self._stream, ShardId=sid,
                ShardIteratorType="AFTER_SEQUENCE_NUMBER",
                StartingSequenceNumber=st["seq"])["ShardIterator"]
        # unseen shard: children always start at horizon (their data
        # began after the split/merge); root shards follow the
        # configured initial position. A REPLAY of a batch that
        # started from LATEST must NOT re-evaluate LATEST (head has
        # moved — rows would vanish): it refetches from the horizon
        # bounded above by the committed end seq, over-delivering at
        # worst (the documented at-least-once edge), never losing.
        typ = TRIM_HORIZON if (replay or self._parents(shard)
                               or self._position == TRIM_HORIZON) \
            else "LATEST"
        return cl.get_shard_iterator(
            StreamName=self._stream, ShardId=sid,
            ShardIteratorType=typ)["ShardIterator"]

    def _drain_shard(self, sid: str, shard: dict, offsets: dict,
                     limit: int, stop_seq: int | None = None):
        """Fetch up to ``limit`` records (through ``stop_seq`` when
        replaying). Returns (rows, new_state|None): state is the
        post-fetch offset entry, None for 'unchanged'.

        Wire realities handled here (real GetRecords, not just the
        emulator's happy path): an EMPTY Records list does NOT mean
        caught-up — Kinesis routinely returns empty pages mid-stream
        (aged-out gaps, internal pagination) with
        ``MillisBehindLatest > 0`` and a live NextShardIterator, and
        throttles with ProvisionedThroughputExceededException. The
        live path follows a bounded number of empty pages and
        throttle retries per batch (progress resumes next batch); the
        REPLAY path (``stop_seq`` set) follows empty pages until
        caught up and retries throttling without bound, because
        a committed batch must reproduce exactly — truncating on an
        empty page or a throttle would silently lose committed
        rows."""
        cl = self._client()
        rows, state = [], offsets.get(sid)
        latest_birth = None
        if state is None and stop_seq is None \
                and sid in self._live_iters:
            it, latest_birth = self._live_iters.pop(sid)
        else:
            stateless_latest = (state is None and stop_seq is None
                                and not self._parents(shard)
                                and self._position == "LATEST")
            if stateless_latest:
                # remember when LATEST gets evaluated: if the
                # iterator later expires, AT_TIMESTAMP(birth) can
                # re-seek without re-evaluating LATEST (taken BEFORE
                # the call — earlier only over-delivers)
                latest_birth = time.time()
            it = self._start_iterator(sid, shard, offsets,
                                      replay=stop_seq is not None)
        reseeked = False
        throttle_delay = 0.1
        throttles = 0
        empty_pages = 0
        while it is not None and len(rows) < limit:
            try:
                resp = cl.get_records(ShardIterator=it,
                                      Limit=min(limit - len(rows),
                                                10_000))
            except Exception as e:     # noqa: BLE001 — code-matched below
                code = _err_code(e)
                if code == "ExpiredIteratorException" and not reseeked:
                    reseeked = True
                    if latest_birth is not None and state is None:
                        # a held/just-made LATEST iterator expired
                        # (trigger interval > iterator TTL): must NOT
                        # re-evaluate LATEST — records that arrived in
                        # the interim would silently vanish. Re-seek
                        # to the original evaluation time instead:
                        # at-least-once (boundary records at exactly
                        # birth over-deliver), never lossy.
                        it = cl.get_shard_iterator(
                            StreamName=self._stream, ShardId=sid,
                            ShardIteratorType="AT_TIMESTAMP",
                            Timestamp=latest_birth)["ShardIterator"]
                    else:
                        # re-seek from the last position we own (KCL
                        # restart-from-checkpoint behavior), retry once
                        it = self._start_iterator(
                            sid, shard,
                            {**offsets, **({sid: state} if state else {})},
                            replay=stop_seq is not None)
                    continue
                if code == "ProvisionedThroughputExceededException":
                    throttles += 1
                    if stop_seq is None and throttles > 3:
                        break          # yield; the next batch resumes
                    # back off and retry (the KCL posture). A REPLAY
                    # never gives up: it must reproduce the committed
                    # range, and a bounded live retry also breaks
                    # cadence resonance (a shard whose fetch always
                    # lands on a throttled slot would otherwise be
                    # starved across batches).
                    time.sleep(throttle_delay)
                    throttle_delay = min(throttle_delay * 2, 2.0)
                    continue
                raise
            for rec in resp["Records"]:
                seq = rec["SequenceNumber"]
                if stop_seq is not None and int(seq) > stop_seq:
                    return rows, state
                ts = rec.get("ApproximateArrivalTimestamp")
                if isinstance(ts, (int, float)):
                    ts = datetime.fromtimestamp(ts, tz=timezone.utc)
                rows.append((sid, seq, rec.get("PartitionKey"),
                             bytes(rec["Data"]), ts))
                state = {"seq": seq}
            nxt = resp.get("NextShardIterator")
            if nxt is None:
                # SHARD_END: closed shard fully consumed — tombstone
                # unlocks the children on the next batch
                end = shard.get("SequenceNumberRange", {}).get(
                    "EndingSequenceNumber")
                state = {"seq": (state or {}).get("seq", end or "0"),
                         "drained": True}
                break
            it = nxt
            if not resp["Records"]:
                if (resp.get("MillisBehindLatest") or 0) <= 0:
                    break               # genuinely caught up
                # mid-stream empty page: records lie ahead — follow
                # the iterator (bounded per batch in the live path;
                # unbounded in replay, which must reach stop_seq)
                empty_pages += 1
                if stop_seq is None and empty_pages >= 100:
                    break
        if state is None and stop_seq is None and it is not None:
            # hold the position (and, for LATEST, its evaluation
            # time — the AT_TIMESTAMP re-seek anchor above)
            self._live_iters[sid] = (it, latest_birth)
        return rows, state

    # -- SimpleDataSourceStreamReader contract ------------------------------

    def read(self, start: dict):
        offsets = dict(start.get("shards", {}))
        shard_map = {s["ShardId"]: s for s in
                     self._client().list_shards(
                         StreamName=self._stream)["Shards"]}
        rows_out = []
        for sid in sorted(shard_map):
            shard = shard_map[sid]
            st = offsets.get(sid)
            if st is not None and st.get("drained"):
                continue
            if not self._consumable(shard, shard_map, offsets):
                continue
            rows, state = self._drain_shard(sid, shard, offsets,
                                            self._max_per_shard)
            rows_out.extend(rows)
            if state is not None:
                offsets[sid] = state
        return iter(rows_out), {"shards": offsets}

    def readBetweenOffsets(self, start: dict, end: dict):
        """Deterministic replay of a committed range: shard data is
        immutable within retention, so refetching (start.seq,
        end.seq] per shard reproduces the batch exactly."""
        s_sh = start.get("shards", {})
        shard_map = {s["ShardId"]: s for s in
                     self._client().list_shards(
                         StreamName=self._stream)["Shards"]}
        for sid, st in sorted(end.get("shards", {}).items()):
            end_seq = st.get("seq")
            prev = s_sh.get(sid, {}).get("seq")
            if end_seq is None or end_seq == prev:
                continue
            rows, _ = self._drain_shard(
                sid, shard_map.get(sid, {}), s_sh,
                limit=2 ** 31, stop_seq=int(end_seq))
            yield from rows

    def commit(self, end: dict) -> None:
        pass                    # offsets live in the query checkpoint


class KinesisPyDataSource(DataSource):
    """``spark.dataSource.register(KinesisPyDataSource)`` once per
    session, then ``spark.readStream.format("kinesis_py")``."""

    @classmethod
    def name(cls) -> str:
        return "kinesis_py"

    def schema(self) -> str:
        return KINESIS_PY_SCHEMA

    def simpleStreamReader(self, schema):
        return _KinesisSimpleStreamReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent per session."""
    spark.dataSource.register(KinesisPyDataSource)
