"""Property-based fuzz of the kinesis_py consumption protocol (pure
Python, no Spark): for ANY interleaving of put / split / merge /
read-batch operations, draining the stream through the reader's
offset protocol delivers EVERY record EXACTLY once, in per-shard
sequence order, with every parent shard's records delivered before
any descendant shard's — the KCL contract the reference's per-shard
processors rely on (KinesisRecordProcessor.java:77-117 ordering,
KinesisShardSyncer parent-before-child).
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from rakam_api_collector_spark.sources.kinesis import \
    _KinesisSimpleStreamReader
from rakam_api_collector_spark.sources.kinesis_local import \
    LocalKinesisClient

# op stream: each entry drives one mutation or a reader batch.
# Integers are interpreted mod the current choice space, so any list
# of (kind, n) pairs is a valid scenario.
_OPS = st.lists(
    st.tuples(st.sampled_from(["put", "split", "merge", "read"]),
              st.integers(0, 10 ** 6)),
    min_size=1, max_size=25)


@settings(max_examples=40, deadline=None)
@given(ops=_OPS, n_shards=st.integers(1, 3),
       fault=st.sampled_from([None, ("fault_empty_every", 2),
                              ("fault_empty_every", 3),
                              ("fault_throttle_every", 2),
                              ("fault_throttle_every", 4)]))
def test_any_reshard_interleaving_delivers_exactly_once(
        ops, n_shards, fault):
    work = tempfile.mkdtemp(prefix="kinfuzz_")
    try:
        cl = LocalKinesisClient(work)
        cl.create_stream("s", ShardCount=n_shards)
        reader = _KinesisSimpleStreamReader(
            {"streamname": "s", "endpoint": f"local:{work}"})
        if fault is not None:
            # the reader's own client injects wire faults (empty
            # mid-stream pages / throttles); exactly-once and the
            # ordering contract must survive ANY such interleaving
            faulty = LocalKinesisClient(work)
            setattr(faulty, fault[0], fault[1])
            reader._cl = faulty

        put_payloads: list[bytes] = []
        lineage: dict[str, list[str]] = {}      # child -> its parents
        seen_rows: list[tuple] = []
        offset = reader.initialOffset()
        counter = 0

        def open_shards():
            return [s["ShardId"] for s in
                    cl.list_shards("s")["Shards"]
                    if "EndingSequenceNumber"
                    not in s["SequenceNumberRange"]]

        def do_read():
            nonlocal offset
            rows, nxt = reader.read(offset)
            rows = list(rows)
            # replay determinism: the committed range refetches the
            # exact same rows (at-least-once's exactly-once half)
            replay = list(reader.readBetweenOffsets(offset, nxt))
            assert sorted(r[1] for r in replay) \
                == sorted(r[1] for r in rows)
            seen_rows.extend(rows)
            offset = nxt

        for kind, n in ops:
            alive = open_shards()
            if kind == "put" and alive:
                counter += 1
                payload = f"p{counter}".encode()
                put_payloads.append(payload)
                cl.put_records("s", [{"Data": payload,
                                      "PartitionKey": "k",
                                      "ShardId": alive[n % len(alive)]}])
            elif kind == "split" and alive:
                sid = alive[n % len(alive)]
                for kid in cl.split_shard("s", sid)["ChildShards"]:
                    lineage[kid] = [sid]
            elif kind == "merge" and len(alive) >= 2:
                a = alive[n % len(alive)]
                b = alive[(n + 1) % len(alive)]
                if a == b:
                    continue
                kid = cl.merge_shards("s", a, b)["ChildShards"][0]
                lineage[kid] = [a, b]   # BOTH parents must gate
            elif kind == "read":
                do_read()

        # final drain: read until consecutive empty batches (a
        # throttled live read legitimately returns 0 rows and
        # resumes next batch, so faulted runs need a deeper margin)
        empties, need = 0, 2 if fault is None else 6
        for _ in range(60):
            before = len(seen_rows)
            do_read()
            empties = empties + 1 if len(seen_rows) == before else 0
            if empties >= need:
                break

        # exactly once, nothing lost
        assert sorted(r[3] for r in seen_rows) == sorted(put_payloads)
        # per-shard sequence order across batches
        per_shard: dict[str, list[int]] = {}
        for r in seen_rows:
            per_shard.setdefault(r[0], []).append(int(r[1]))
        for seqs in per_shard.values():
            assert seqs == sorted(seqs)
        # parent-before-child: all of an ancestor's rows precede all
        # of its descendant's rows in delivery order
        first_at = {}
        last_at = {}
        for i, r in enumerate(seen_rows):
            first_at.setdefault(r[0], i)
            last_at[r[0]] = i
        for child, parents in lineage.items():
            for parent in parents:
                if child in first_at and parent in last_at:
                    assert last_at[parent] < first_at[child], \
                        f"{parent} rows delivered after child {child}"
    finally:
        shutil.rmtree(work, ignore_errors=True)
