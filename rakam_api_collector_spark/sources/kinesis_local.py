"""File-backed Kinesis wire-model emulator (the local dev/test stream).

``LocalKinesisClient`` implements the subset of the public Kinesis
Data Streams API the source reader consumes — ``list_shards``,
``get_shard_iterator``, ``get_records``, plus the producer/admin half
(``put_records``, ``split_shard``, ``merge_shards``) — with
boto3-shaped request/response dicts, so the same reader code runs
against AWS (boto3 client) and against this emulator (the
kinesalite/LocalStack role). File-backed rather than in-memory
because PySpark DataSource code executes in Spark's planning/worker
Python processes, never in the test process — state must survive a
process hop (the same reason the manifest's OCC suite uses a
boto3-shaped S3 fake but this one cannot stay in-memory).

Wire-model semantics kept faithful (the parts that shape a consumer):

- per-shard strictly increasing sequence numbers (decimal strings);
- shard lineage: ``split_shard``/``merge_shards`` CLOSE the parent(s)
  — ``EndingSequenceNumber`` set, no further writes — and open child
  shards carrying ``ParentShardId``; a correct consumer drains a
  parent to its end before starting its children (KCL ordering);
- iterator types ``TRIM_HORIZON`` / ``LATEST`` /
  ``AT_SEQUENCE_NUMBER`` / ``AFTER_SEQUENCE_NUMBER`` /
  ``AT_TIMESTAMP`` (first record with arrival time >= Timestamp);
- ``GetRecords`` returns ``NextShardIterator=None`` once a CLOSED
  shard is fully consumed (the SHARD_END signal); open shards always
  return a live iterator;
- iterators expire (5 min on AWS; configurable here so tests can
  force ``ExpiredIteratorException``);
- OPT-IN fault knobs reproduce the two wire behaviors a happy-path
  emulator otherwise never shows a consumer: ``fault_empty_every=k``
  makes every k-th ``get_records`` call (starting with the first)
  return an EMPTY mid-stream page — live NextShardIterator at the
  same position, ``MillisBehindLatest > 0`` — exactly what real
  Kinesis serves over aged-out gaps / internal pagination;
  ``fault_throttle_every=k`` raises
  ``ProvisionedThroughputExceededException`` on the same cadence. A
  correct consumer follows / retries; one that treats empty-or-throttle
  as caught-up silently truncates (the bug class these knobs exist
  to catch).

Layout under ``path/``: ``stream.json`` (atomic-replace metadata:
shard table + next sequence number) and ``records/<shard>.jsonl``
(append-only). Single-writer-per-call atomicity is enough for the
dev/test role; production traffic goes to the real service.
"""

from __future__ import annotations

import base64
import json
import os
import time


class ExpiredIteratorException(Exception):
    pass


class ProvisionedThroughputExceededException(Exception):
    pass


class ResourceNotFoundException(Exception):
    pass


def _complete_json_lines(path: str) -> tuple[list[dict], bool]:
    """(docs, torn): every COMPLETE line parsed, plus whether the final
    visible line was torn — a concurrent multi-line append observed
    mid-write (appends are sequential, so only the tail can be
    partial; a later read sees it whole). The ONE torn-tail policy for
    both emulators: a reader must treat torn=True as "more data is in
    flight", NEVER as drained — conflating the two turns an in-flight
    write into silent loss (a closed shard would report SHARD_END past
    records hidden by the tear).

    KNOWN LIMIT of the detection: a tear observed EXACTLY at a newline
    boundary mid-append parses clean (torn=False) — mid-line tears are
    the only detectable kind. Within the emulators' documented
    single-writer protocol this cannot combine with SHARD_END into
    loss: the writer closes a shard (split/merge updates stream.json)
    only AFTER its produce calls return, so by the time any reader can
    observe the closed state the append is fully flushed — the race
    requires a second concurrent writer, which the protocol forbids
    (and kafka_local's produce guard now detects). If the emulators
    ever grow multi-writer produce, terminate each multi-line append
    with a record-count sentinel line so boundary tears become
    detectable too."""
    docs: list[dict] = []
    torn = False
    try:
        with open(path) as f:
            for line in f:
                try:
                    docs.append(json.loads(line))
                except ValueError:
                    torn = True
                    break
    except OSError:
        pass
    return docs, torn


def _load(path: str, default: dict | None = None) -> dict:
    """Shared by the Kinesis and Kafka emulators (kafka_local.py
    imports these) — a durability fix here reaches both."""
    try:
        with open(path) as f:
            return json.load(f)
    except OSError:
        if default is not None:
            return default
        raise


def _store(path: str, meta: dict) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)


class LocalKinesisClient:
    """boto3-``kinesis``-shaped client over a local directory. Pickle-
    safe (state is the path), so it crosses into Spark's DataSource
    worker processes intact."""

    iterator_ttl_sec: float = 300.0
    # fault knobs (module docstring): None = faithful happy path
    fault_empty_every: int | None = None
    fault_throttle_every: int | None = None
    # wire-accounting knob: when set, every get_records appends one
    # {"n": <records returned>} line to <dir>/<pid>.jsonl (per-pid
    # files — no cross-process interleaving), so a stress cell can
    # measure records-FETCHED vs records-DELIVERED (the slack-zone
    # read-amplification bound documented at kinesis.py read())
    fetch_stats_dir: str | None = None

    def __init__(self, path: str) -> None:
        self._path = path
        self._calls = 0        # get_records counter for fault cadence

    # -- admin / producer -------------------------------------------------

    def create_stream(self, StreamName: str, ShardCount: int = 1) -> None:
        os.makedirs(os.path.join(self._path, "records"), exist_ok=True)
        meta_path = self._meta_path(StreamName)
        if os.path.exists(meta_path):
            raise ValueError(f"stream {StreamName} exists")
        shards = {f"shardId-{i:012d}": {
            "ShardId": f"shardId-{i:012d}", "Parent": None,
            "Start": 0, "End": None} for i in range(ShardCount)}
        _store(meta_path, {"next_seq": 1, "next_shard": ShardCount,
                           "shards": shards})

    def put_records(self, StreamName: str, Records: list[dict]) -> dict:
        """Records: [{"Data": bytes, "PartitionKey": str,
        "ShardId": str (emulator extension — no md5 hash-range
        routing; tests pick the shard explicitly),
        "Ts": float (emulator extension — explicit arrival stamp, for
        tests that model the service's only-approximate per-shard
        stamp monotonicity)}]"""
        meta_path = self._meta_path(StreamName)
        meta = self._meta(StreamName)
        out = []
        now = time.time()
        # appends buffered per shard (one write per touched shard per
        # call, not one open/append per record — the same O(B) produce
        # discipline the Kafka emulator uses)
        pending: dict[str, list[str]] = {}
        for rec in Records:
            sid = rec.get("ShardId") or next(
                s for s, m in sorted(meta["shards"].items())
                if m["End"] is None)
            shard = meta["shards"][sid]
            if shard["End"] is not None:
                raise ValueError(f"shard {sid} is closed")
            seq = meta["next_seq"]
            meta["next_seq"] = seq + 1
            pending.setdefault(sid, []).append(json.dumps({
                "seq": seq, "key": rec.get("PartitionKey", ""),
                "data": base64.b64encode(rec["Data"]).decode(),
                "ts": float(rec.get("Ts", now))}))
            out.append({"SequenceNumber": str(seq), "ShardId": sid})
        for sid, lines in pending.items():
            with open(self._rec_path(sid), "a") as f:
                f.write("\n".join(lines) + "\n")
        _store(meta_path, meta)
        return {"Records": out, "FailedRecordCount": 0}

    def split_shard(self, StreamName: str, ShardToSplit: str) -> dict:
        """Close the parent, open two children (hash-range halving is
        immaterial to consumption order, so it isn't modeled)."""
        meta = self._meta(StreamName)
        parent = meta["shards"][ShardToSplit]
        if parent["End"] is not None:
            raise ValueError(f"shard {ShardToSplit} already closed")
        parent["End"] = meta["next_seq"] - 1   # last written seq
        kids = []
        for _ in range(2):
            sid = f"shardId-{meta['next_shard']:012d}"
            meta["next_shard"] += 1
            meta["shards"][sid] = {"ShardId": sid,
                                   "Parent": ShardToSplit,
                                   "Start": meta["next_seq"],
                                   "End": None}
            kids.append(sid)
        _store(self._meta_path(StreamName), meta)
        return {"ChildShards": kids}

    def merge_shards(self, StreamName: str, ShardToMerge: str,
                     AdjacentShardToMerge: str) -> dict:
        """Close both parents, open ONE child. AWS records the second
        parent as AdjacentParentShardId; consumers treat both as
        parents, so the emulator keeps a single Parent + an Adjacent
        field with the same drain-before-child meaning."""
        meta = self._meta(StreamName)
        for sid in (ShardToMerge, AdjacentShardToMerge):
            if meta["shards"][sid]["End"] is not None:
                raise ValueError(f"shard {sid} already closed")
            meta["shards"][sid]["End"] = meta["next_seq"] - 1
        child = f"shardId-{meta['next_shard']:012d}"
        meta["next_shard"] += 1
        meta["shards"][child] = {"ShardId": child,
                                 "Parent": ShardToMerge,
                                 "AdjacentParent": AdjacentShardToMerge,
                                 "Start": meta["next_seq"], "End": None}
        _store(self._meta_path(StreamName), meta)
        return {"ChildShards": [child]}

    # -- consumer ----------------------------------------------------------

    def list_shards(self, StreamName: str) -> dict:
        meta = self._meta(StreamName)
        shards = []
        for sid in sorted(meta["shards"]):
            m = meta["shards"][sid]
            rng = {"StartingSequenceNumber": str(m["Start"])}
            if m["End"] is not None:
                rng["EndingSequenceNumber"] = str(m["End"])
            s = {"ShardId": sid, "SequenceNumberRange": rng}
            if m["Parent"]:
                s["ParentShardId"] = m["Parent"]
            if m.get("AdjacentParent"):
                s["AdjacentParentShardId"] = m["AdjacentParent"]
            shards.append(s)
        return {"Shards": shards}

    def get_shard_iterator(self, StreamName: str, ShardId: str,
                           ShardIteratorType: str,
                           StartingSequenceNumber: str | None = None,
                           Timestamp: float | None = None,
                           ) -> dict:
        meta = self._meta(StreamName)
        if ShardId not in meta["shards"]:
            raise ResourceNotFoundException(ShardId)
        if ShardIteratorType == "TRIM_HORIZON":
            nxt = 0
        elif ShardIteratorType == "LATEST":
            nxt = meta["next_seq"]
        elif ShardIteratorType == "AT_TIMESTAMP":
            # first existing record with arrival ts >= Timestamp; an
            # empty/no-match shard positions at the tip (records put
            # later carry later timestamps, so they are still seen)
            nxt = meta["next_seq"]
            docs, _torn = _complete_json_lines(self._rec_path(ShardId))
            for rec in docs:
                if rec["ts"] >= Timestamp:
                    nxt = rec["seq"]
                    break
        elif ShardIteratorType == "AT_SEQUENCE_NUMBER":
            nxt = int(StartingSequenceNumber)
        elif ShardIteratorType == "AFTER_SEQUENCE_NUMBER":
            nxt = int(StartingSequenceNumber) + 1
        else:
            raise ValueError(ShardIteratorType)
        return {"ShardIterator": json.dumps(
            {"stream": StreamName, "sid": ShardId, "next": nxt,
             "t": time.time()})}

    def get_records(self, ShardIterator: str, Limit: int = 10_000) -> dict:
        it = json.loads(ShardIterator)
        if time.time() - it["t"] > self.iterator_ttl_sec:
            raise ExpiredIteratorException(ShardIterator)
        self._calls += 1
        if (self.fault_throttle_every
                and (self._calls - 1) % self.fault_throttle_every == 0):
            raise ProvisionedThroughputExceededException(
                "injected throttle")
        meta = self._meta(it["stream"])
        shard = meta["shards"][it["sid"]]
        records, nxt = [], it["next"]
        pending = 0
        docs, torn = _complete_json_lines(self._rec_path(it["sid"]))
        for rec in docs:
            if rec["seq"] < nxt:
                continue
            if len(records) >= Limit:
                pending += 1
                continue
            records.append({
                "SequenceNumber": str(rec["seq"]),
                "PartitionKey": rec["key"],
                "Data": base64.b64decode(rec["data"]),
                "ApproximateArrivalTimestamp": rec["ts"]})
            nxt = rec["seq"] + 1
        if (self.fault_empty_every and records
                and (self._calls - 1) % self.fault_empty_every == 0):
            # empty MID-STREAM page: same position, live iterator,
            # MillisBehindLatest > 0 because records ARE pending —
            # the page shape real Kinesis serves over record gaps
            return {
                "Records": [],
                "NextShardIterator": json.dumps(
                    {"stream": it["stream"], "sid": it["sid"],
                     "next": it["next"], "t": time.time()}),
                "MillisBehindLatest": max(1, int(
                    (time.time() - records[0]
                     ["ApproximateArrivalTimestamp"]) * 1000)),
            }
        # SHARD_END: the shard is closed and this fetch consumed its
        # last remaining record (sequence numbers are stream-global,
        # so the closed range's upper bound is NOT a per-shard seq —
        # exhaustion is what ends a shard, as on the wire). A torn
        # tail VETOES the drained verdict: records past the tear are
        # in flight, and SHARD_END here would tombstone them unread
        closed_drained = (shard["End"] is not None and pending == 0
                          and not torn)
        if self.fetch_stats_dir:
            # diagnostics must never kill the data path: create the
            # dir on demand and swallow IO failures (full disk, race
            # on teardown) — a lost stats line only undercounts
            try:
                os.makedirs(self.fetch_stats_dir, exist_ok=True)
                with open(os.path.join(self.fetch_stats_dir,
                                       f"{os.getpid()}.jsonl"),
                          "a") as f:
                    f.write(json.dumps({"n": len(records)}) + "\n")
            except OSError:
                pass
        return {
            "Records": records,
            "NextShardIterator": None if closed_drained else json.dumps(
                {"stream": it["stream"], "sid": it["sid"], "next": nxt,
                 "t": time.time()}),
            "MillisBehindLatest": 0 if not records else max(
                0, int((time.time() - records[-1]
                        ["ApproximateArrivalTimestamp"]) * 1000)),
        }

    # -- internals ---------------------------------------------------------

    def _meta_path(self, stream: str) -> str:
        return os.path.join(self._path, "stream.json")

    def _rec_path(self, sid: str) -> str:
        return os.path.join(self._path, "records", f"{sid}.jsonl")

    def _meta(self, stream: str) -> dict:
        try:
            return _load(self._meta_path(stream))
        except FileNotFoundError:
            raise ResourceNotFoundException(stream) from None
