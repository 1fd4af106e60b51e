"""File-backed Kafka wire-model emulator (the local dev/test broker).

The Kafka twin of ``kinesis_local.py``: ``LocalKafkaBroker`` is the
admin/producer half, ``LocalKafkaConsumer`` the consumer-group half,
implementing the subset of the public Kafka consumer contract the
reference's workers are built on (KafkaRealTimeWorker.java:145-222's
subscribe/poll/commitSync/pause loop; KafkaUtil.java:107-124's
commit-max-plus-one) — so those semantics can be pinned by tests in an
environment with no broker and no connector jar. File-backed rather
than in-memory because PySpark DataSource code executes in Spark's
planning/worker Python processes, never the test process — state must
survive a process hop.

Wire-model semantics kept faithful (the parts that shape a consumer):

- per-(topic, partition) dense offsets starting at 0; a partition is
  an append-only log; LOG-END offset = next offset to be written;
- producer partitioning: explicit partition wins, else Kafka's
  default partitioner wire-identically —
  ``toPositive(murmur2(keyBytes)) % numPartitions`` (the public
  algorithm from org.apache.kafka.common.utils.Utils, pinned against
  the upstream test vectors), so a test asserting WHICH partition a
  key lands on holds against a real broker too — else round-robin;
- consumer groups: committed offsets are stored per (group, topic,
  partition) and mean "next offset to read" — Kafka's convention, and
  why the reference commits ``max consumed + 1``
  (KafkaUtil.java:118: ``new OffsetAndMetadata(offset + 1)``);
- rebalancing: subscribing/closing a member bumps the group
  GENERATION; every other member discovers the new generation at its
  next ``poll()``, fires ``on_partitions_revoked`` then
  ``on_partitions_assigned`` (range assignment over sorted member
  ids — deterministic), and resumes each newly-assigned partition at
  the group's committed offset, or per ``auto_offset_reset`` when
  none exists (the reference logs exactly this resume point in its
  ConsumerRebalanceListener, KafkaRealTimeWorker.java:158-166);
- at-least-once by construction: a record polled but not committed
  before a rebalance moves its partition is re-served to whichever
  member now owns the partition;
- ``commit`` from a member whose assignment generation is stale
  raises ``CommitFailedException`` (the broker refuses commits from
  fenced members — the guarantee that makes "poll, process, commit"
  safe across rebalances);
- ``pause``/``resume`` stop ``poll`` from returning records for a
  partition without losing the position (the reference's
  memory-backpressure posture, KafkaRealTimeWorker.java:192-212).

Layout under ``path/``: ``topics/<topic>/meta.json`` (partition
count), ``topics/<topic>/p<N>.jsonl`` (append-only records), and
``groups.json`` (atomic-replace: per-group committed offsets, member
list, generation). Single-writer-per-call atomicity is enough for the
dev/test role; production traffic goes to a real cluster through the
``spark-sql-kafka-0-10`` connector (sources/kafka.py).
"""

from __future__ import annotations

import base64
import json
import os
import time

# one atomic-replace JSON persistence idiom across both emulators
from rakam_api_collector_spark.sources.kinesis_local import (  # noqa: F401
    _load, _store)


class CommitFailedException(Exception):
    """Commit attempted by a member fenced by a newer group generation."""


class ConcurrentProduceError(Exception):
    """A partition log grew outside produce()'s read-modify-write of
    the cached end offsets — a second concurrent producer process (or
    a produce that crashed between append and meta store) would
    silently assign duplicate offsets and break the offset ==
    line-number invariant fetch()'s prefix skip relies on; the
    emulator is documented single-writer, and a violation must fail
    loudly, not corrupt."""


def murmur2(data: bytes) -> int:
    """Kafka's partitioner hash — 32-bit MurmurHash2, seed 0x9747b28c
    (the public algorithm from org.apache.kafka.common.utils
    .Utils#murmur2), returned as an unsigned 32-bit int;
    ``murmur2(key) & 0x7FFFFFFF`` equals Java's
    ``toPositive(murmur2(key))``. Pinned against the upstream
    UtilsTest vectors in tests/test_kafka_local.py."""
    length = len(data)
    m = 0x5BD1E995
    h = (0x9747B28C ^ length) & 0xFFFFFFFF
    for i4 in range(length // 4):
        i = i4 * 4
        k = (data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
             | (data[i + 3] << 24))
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> 24
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
    rem, base = length % 4, length & ~3
    if rem == 3:
        h ^= data[base + 2] << 16
    if rem >= 2:
        h ^= data[base + 1] << 8
    if rem >= 1:
        h ^= data[base]
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


class UnknownTopicOrPartitionError(Exception):
    pass


def _tp(topic: str, partition: int) -> str:
    return f"{topic} {partition}"


class LocalKafkaBroker:
    """Admin + producer half. Pickle-safe (state is the path)."""

    def __init__(self, path: str) -> None:
        self._path = path

    # -- admin --------------------------------------------------------------

    def _topic_dir(self, topic: str) -> str:
        return os.path.join(self._path, "topics", topic)

    def _groups_path(self) -> str:
        return os.path.join(self._path, "groups.json")

    def create_topic(self, topic: str, partitions: int = 1) -> None:
        d = self._topic_dir(topic)
        os.makedirs(d, exist_ok=True)
        meta = os.path.join(d, "meta.json")
        if os.path.exists(meta):
            raise ValueError(f"topic {topic} exists")
        _store(meta, {"partitions": partitions, "rr": 0})

    def partitions_for(self, topic: str) -> list[int]:
        meta = os.path.join(self._topic_dir(topic), "meta.json")
        try:
            return list(range(_load(meta)["partitions"]))
        except OSError:
            raise UnknownTopicOrPartitionError(topic) from None

    def create_partitions(self, topic: str, total: int) -> None:
        """Grow a topic's partition count (Kafka allows growth only)."""
        meta_path = os.path.join(self._topic_dir(topic), "meta.json")
        meta = _load(meta_path)
        if total < meta["partitions"]:
            raise ValueError("partition count can only grow")
        meta["partitions"] = total
        _store(meta_path, meta)

    # -- producer -----------------------------------------------------------

    def produce(self, topic: str, records: list[dict]) -> list[dict]:
        """records: [{"Value": bytes, "Key": bytes|None,
        "Partition": int|None, "Ts": float|None (explicit CreateTime —
        Kafka lets producers stamp record time)}] →
        [{"partition", "offset"}]."""
        meta_path = os.path.join(self._topic_dir(topic), "meta.json")
        meta = _load(meta_path)
        n = meta["partitions"]
        out = []
        now = time.time()
        # end offsets read ONCE per touched partition and appends
        # buffered per partition — per-record recounts made a B-record
        # produce O(B²) in line scans; dense offsets only need a
        # counter
        next_off: dict[int, int] = {}
        pending: dict[int, list[str]] = {}
        for rec in records:
            if rec.get("Partition") is not None:
                p = int(rec["Partition"])
                if not 0 <= p < n:
                    raise UnknownTopicOrPartitionError(f"{topic}/{p}")
            elif rec.get("Key") is not None:
                p = (murmur2(bytes(rec["Key"])) & 0x7FFFFFFF) % n
            else:
                p = meta["rr"] % n
                meta["rr"] += 1
            if p not in next_off:
                # the meta already in hand carries the end offsets —
                # no re-read; line-count fallback for pre-field logs
                next_off[p] = meta.get("ends", {}).get(str(p))
                if next_off[p] is None:
                    next_off[p] = self._end_offset(topic, p)
            off = next_off[p]
            next_off[p] = off + 1
            ts = rec.get("Ts")
            pending.setdefault(p, []).append(json.dumps({
                "offset": off,
                "key": (base64.b64encode(bytes(rec["Key"])).decode()
                        if rec.get("Key") is not None else None),
                "value": base64.b64encode(bytes(rec["Value"])).decode(),
                "ts": float(ts) if ts is not None else now}))
            out.append({"partition": p, "offset": off})
        sizes = meta.setdefault("bytes", {})
        # single-writer guard (cheap O(1) detection, not a lock):
        # every touched log's size must equal what the LAST produce
        # left behind — growth outside this read-modify-write means a
        # concurrent producer (or a produce that crashed between
        # append and meta store) whose records would get duplicate
        # offsets assigned over them. Checked for ALL partitions
        # BEFORE appending to ANY, so a violation on one partition
        # aborts the whole produce cleanly instead of leaving other
        # partitions' appends unrecorded in meta (which would poison
        # them with false positives on the next produce).
        actual: dict[int, int] = {}
        for p in pending:
            log = os.path.join(self._topic_dir(topic), f"p{p}.jsonl")
            try:
                actual[p] = os.path.getsize(log)
            except OSError:
                actual[p] = 0
            expect = sizes.get(str(p))
            if expect is not None and actual[p] != expect:
                raise ConcurrentProduceError(
                    f"{topic}/p{p}: log is {actual[p]} bytes but the "
                    f"last produce left {expect} — a second writer "
                    "appended outside the documented single-writer "
                    "protocol")
        for p, lines in pending.items():
            log = os.path.join(self._topic_dir(topic), f"p{p}.jsonl")
            payload = "\n".join(lines) + "\n"
            with open(log, "a") as f:
                f.write(payload)
            sizes[str(p)] = actual[p] + len(payload.encode())
        ends = meta.setdefault("ends", {})
        for p, off in next_off.items():
            ends[str(p)] = off
        _store(meta_path, meta)
        return out

    # -- log metadata / fetch (shared with the consumer + DataSource) --------

    def _end_offset(self, topic: str, partition: int) -> int:
        # maintained in topic meta by produce() so the per-second
        # planning rounds don't line-scan growing logs; line-count
        # fallback for logs predating the meta field
        meta = _load(os.path.join(self._topic_dir(topic), "meta.json"),
                     default={})
        cached = meta.get("ends", {}).get(str(partition))
        if cached is not None:
            return cached
        log = os.path.join(self._topic_dir(topic), f"p{partition}.jsonl")
        n = 0
        try:
            with open(log) as f:
                for _ in f:
                    n += 1
        except OSError:
            pass
        return n

    def beginning_offsets(self, topic: str) -> dict[int, int]:
        return {p: 0 for p in self.partitions_for(topic)}

    def end_offsets(self, topic: str) -> dict[int, int]:
        # ONE meta read per call (this sits on the per-second planning
        # path: a per-partition _end_offset would re-parse the same
        # meta.json #partitions times per round)
        try:
            meta = _load(os.path.join(self._topic_dir(topic),
                                      "meta.json"))
        except OSError:
            raise UnknownTopicOrPartitionError(topic) from None
        ends = meta.get("ends", {})
        return {p: (ends[str(p)] if str(p) in ends
                    else self._end_offset(topic, p))
                for p in range(meta["partitions"])}

    def fetch(self, topic: str, partition: int, start: int,
              max_records: int | None = None) -> list[dict]:
        """Records with ``offset >= start``, offset-ascending — dense
        offsets make the committed-range replay a pure slice, and the
        offset IS the line number by construction, so the prefix is
        skipped without decoding (a paced drain stays O(range) in
        decode work per batch, not O(backlog))."""
        log = os.path.join(self._topic_dir(topic), f"p{partition}.jsonl")
        out: list[dict] = []
        try:
            with open(log) as f:
                for i, line in enumerate(f):
                    if i < start:
                        continue
                    if max_records is not None and len(out) >= max_records:
                        break
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        # torn tail of a concurrent multi-line append —
                        # not yet readable; a later fetch sees it whole
                        # (the kinesis_local._complete_json_lines
                        # policy; this loop keeps its own copy because
                        # it must SKIP the pre-start prefix by line
                        # index without parsing it). Harmless here:
                        # Kafka has no drained signal to corrupt —
                        # meta end offsets only advance after an
                        # append completes, so bounded reads never
                        # reach a tear, and an unbounded poll just
                        # returns fewer records this round
                        break
                    out.append({
                        "topic": topic, "partition": partition,
                        "offset": rec["offset"],
                        "key": (base64.b64decode(rec["key"])
                                if rec["key"] is not None else None),
                        "value": base64.b64decode(rec["value"]),
                        "timestamp": rec["ts"]})
        except OSError:
            pass
        return out

    # -- group coordinator half ----------------------------------------------

    def _group(self, group: str) -> dict:
        doc = _load(self._groups_path(), default={})
        return doc.get(group) or {"generation": 0, "members": {},
                                  "committed": {}}

    def _update_group(self, group: str, g: dict) -> None:
        doc = _load(self._groups_path(), default={})
        doc[group] = g
        _store(self._groups_path(), doc)

    def join_group(self, group: str, member_id: str,
                   topics: list[str]) -> int:
        """``members`` maps member id → its SUBSCRIPTION (topic list):
        assignment is computed per topic over that topic's subscribers
        (the RangeAssignor shape), so heterogeneous subscriptions in
        one group cannot orphan a partition on a non-subscriber. A
        re-join with a CHANGED subscription bumps the generation too —
        real Kafka rejoins on subscription change; silently keeping
        the old assignment would strand the new topics."""
        g = self._group(group)
        if g["members"].get(member_id) != sorted(topics):
            g["members"][member_id] = sorted(topics)
            g["generation"] += 1
            self._update_group(group, g)
        return g["generation"]

    def leave_group(self, group: str, member_id: str) -> None:
        g = self._group(group)
        if member_id in g["members"]:
            del g["members"][member_id]
            g["generation"] += 1
            self._update_group(group, g)

    def group_state(self, group: str) -> dict:
        return self._group(group)

    def commit_offsets(self, group: str, member_id: str, generation: int,
                       offsets: dict[str, int]) -> None:
        g = self._group(group)
        if generation != g["generation"] or member_id not in g["members"]:
            raise CommitFailedException(
                f"member {member_id} fenced: commit at generation "
                f"{generation}, group at {g['generation']}")
        g["committed"].update({k: int(v) for k, v in offsets.items()})
        self._update_group(group, g)

    def committed(self, group: str, topic: str,
                  partition: int) -> int | None:
        return self._group(group)["committed"].get(_tp(topic, partition))


def range_assignment(subscriptions: dict[str, list[str]],
                     partitions_by_topic: dict[str, list[int]]
                     ) -> dict[str, list[tuple[str, int]]]:
    """Kafka's RangeAssignor shape, PER TOPIC: each topic's sorted
    partitions are dealt in contiguous runs over the sorted member
    ids subscribed to THAT topic — so members with different
    subscriptions coexist in one group without orphaning partitions
    on non-subscribers. Deterministic."""
    out: dict[str, list[tuple[str, int]]] = {m: [] for m in subscriptions}
    for topic in sorted(partitions_by_topic):
        subs = sorted(m for m, ts in subscriptions.items()
                      if topic in ts)
        if not subs:
            continue
        tps = [(topic, p) for p in sorted(partitions_by_topic[topic])]
        per, extra = divmod(len(tps), len(subs))
        i = 0
        for j, m in enumerate(subs):
            take = per + (1 if j < extra else 0)
            out[m].extend(tps[i:i + take])
            i += take
    return out


class LocalKafkaConsumer:
    """Consumer-group member: subscribe / poll / commit / seek /
    pause / resume / close over ``LocalKafkaBroker`` state.

    ``poll()`` re-checks the group generation first and runs the
    rebalance protocol when stale: revoke listener → recompute range
    assignment → assign listener → position each gained partition at
    the group's committed offset (or ``auto_offset_reset``). Commits
    carry the member's generation and are REFUSED once fenced
    (CommitFailedException) — exactly the contract the reference's
    poll/flush/commitSync loop assumes."""

    def __init__(self, path: str, group_id: str, member_id: str,
                 auto_offset_reset: str = "latest") -> None:
        if auto_offset_reset not in ("latest", "earliest"):
            raise ValueError(f"auto_offset_reset {auto_offset_reset!r}")
        self._b = LocalKafkaBroker(path)
        self._group = group_id
        self._member = member_id
        self._reset = auto_offset_reset
        self._topics: list[str] = []
        self._listener = None
        self._generation: int | None = None
        self._assigned: list[tuple[str, int]] = []
        self._pos: dict[tuple[str, int], int] = {}
        self._paused: set[tuple[str, int]] = set()
        self._poll_rotation = 0

    # -- membership ----------------------------------------------------------

    def subscribe(self, topics: list[str], listener=None) -> None:
        self._topics = list(topics)
        self._listener = listener
        self._b.join_group(self._group, self._member, self._topics)
        # assignment materializes on the first poll (Kafka's shape:
        # subscribe is lazy, the join completes inside poll); a
        # CHANGED subscription bumped the generation above, so the
        # next poll rebalances onto the new topics

    def close(self) -> None:
        self._b.leave_group(self._group, self._member)
        self._assigned, self._pos = [], {}
        self._generation = None

    # -- rebalance protocol ----------------------------------------------------

    def _ensure_assignment(self) -> None:
        g = self._b.group_state(self._group)
        if self._generation == g["generation"]:
            return
        if self._listener is not None and self._assigned:
            self._listener.on_partitions_revoked(list(self._assigned))
        all_topics = sorted({t for ts in g["members"].values()
                             for t in ts})
        pbt = {t: self._b.partitions_for(t) for t in all_topics}
        mine = range_assignment(g["members"], pbt).get(self._member, [])
        self._assigned = mine
        self._generation = g["generation"]
        # EAGER rebalance semantics (the classic protocol the range
        # assignor pairs with): every assigned partition — including
        # ones this member held before — repositions at the group's
        # COMMITTED offset, discarding the in-memory position. This is
        # precisely what redelivers poll-but-not-committed records
        # after a rebalance (at-least-once), and also the documented
        # footgun that auto.offset.reset=latest with no commits skips
        # them instead.
        pos = {}
        for (t, p) in mine:
            committed = g["committed"].get(_tp(t, p))
            if committed is not None:
                pos[(t, p)] = committed
            elif self._reset == "earliest":
                pos[(t, p)] = 0
            else:
                pos[(t, p)] = self._b._end_offset(t, p)
        self._pos = pos
        self._paused &= set(mine)
        if self._listener is not None and mine:
            self._listener.on_partitions_assigned(list(mine))

    # -- consumption -----------------------------------------------------------

    def poll(self, max_records: int = 500) -> dict[tuple[str, int], list[dict]]:
        self._ensure_assignment()
        out: dict[tuple[str, int], list[dict]] = {}
        budget = max_records
        # fetch fairness: rotate which partition is served first each
        # poll — real Kafka's fetcher does the same, and a fixed order
        # would let one hot partition exhaust the budget every round
        # and starve the rest indefinitely
        n = len(self._assigned)
        start = self._poll_rotation % n if n else 0
        self._poll_rotation += 1
        for (t, p) in self._assigned[start:] + self._assigned[:start]:
            if budget <= 0:
                break
            if (t, p) in self._paused:
                continue
            recs = self._b.fetch(t, p, self._pos[(t, p)], budget)
            if recs:
                out[(t, p)] = recs
                self._pos[(t, p)] = recs[-1]["offset"] + 1
                budget -= len(recs)
        return out

    def assignment(self) -> list[tuple[str, int]]:
        self._ensure_assignment()
        return list(self._assigned)

    def position(self, tp: tuple[str, int]) -> int:
        return self._pos[tp]

    def seek(self, tp: tuple[str, int], offset: int) -> None:
        if tp not in self._pos:
            raise UnknownTopicOrPartitionError(str(tp))
        self._pos[tp] = int(offset)

    def pause(self, tps: list[tuple[str, int]]) -> None:
        self._paused |= {tuple(tp) for tp in tps}

    def resume(self, tps: list[tuple[str, int]]) -> None:
        self._paused -= {tuple(tp) for tp in tps}

    # -- offsets -----------------------------------------------------------------

    def commit(self, offsets: dict[tuple[str, int], int]) -> None:
        """commitSync: ``offsets`` values are NEXT-offset-to-read
        (Kafka's convention — callers following the reference pass
        ``max consumed + 1``, see ``commit_sync_max_plus_one``)."""
        if self._generation is None:
            self._ensure_assignment()
        self._b.commit_offsets(
            self._group, self._member, self._generation,
            {_tp(t, p): off for (t, p), off in offsets.items()})

    def committed(self, tp: tuple[str, int]) -> int | None:
        return self._b.committed(self._group, tp[0], tp[1])


def commit_sync_max_plus_one(consumer: LocalKafkaConsumer,
                             polled: dict[tuple[str, int], list[dict]]
                             ) -> None:
    """The reference's commit discipline (KafkaUtil.java:90-124):
    track the MAX offset consumed per (topic, partition) across the
    flushed batch, commit ``max + 1`` per partition. Applied after the
    batch is durably flushed — commit-after-flush is what makes the
    loop at-least-once instead of at-most-once."""
    latest: dict[tuple[str, int], int] = {}
    for tp, recs in polled.items():
        for r in recs:
            if tp not in latest or r["offset"] > latest[tp]:
                latest[tp] = r["offset"]
    if latest:
        consumer.commit({tp: off + 1 for tp, off in latest.items()})
