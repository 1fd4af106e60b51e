"""ObjectMetadataStore OCC suite against moto's S3 — the real-wire-
shape run closing the last adapter seam: the in-repo ``_FakeS3Client``
is boto3-SHAPED, but moto serves actual S3 REST semantics through
botocore (conditional PUT ``If-None-Match: *`` → 412
``PreconditionFailed`` ClientError, ListObjectsV2 Delimiter +
continuation-token pagination, batched DeleteObjects, DeleteObject
idempotence), so every status-code and response-dict assumption the
adapter makes is exercised against the library AWS itself documents
against. Skips cleanly where moto is absent.
"""

from __future__ import annotations

import threading
from datetime import datetime

import pytest

moto = pytest.importorskip("moto")

import boto3  # noqa: E402  (moto implies boto3)
from moto import mock_aws  # noqa: E402

from rakam_api_collector_spark.manifest import (  # noqa: E402
    LocalMetadataStore, ManifestedTable, ObjectMetadataStore)


@pytest.fixture()
def s3():
    with mock_aws():
        c = boto3.client("s3", region_name="us-east-1")
        c.create_bucket(Bucket="bkt")
        yield c


def test_object_store_ops_against_moto(s3):
    """The six-op suite (tests/test_manifest.py
    test_object_metadata_store_ops) verbatim against moto: key
    mapping, CAS win/loss via real 412s, children-only listing
    through real Delimiter/CommonPrefixes, prefix probe, idempotent
    delete, tree delete."""
    s = ObjectMetadataStore(s3, "bkt")
    base = "s3://bkt/warehouse/proj/events"

    assert s.put_if_absent(f"{base}/_versions/v1.json", '{"v":1}')
    assert not s.put_if_absent(f"{base}/_versions/v1.json", "loser")
    assert s.read(f"{base}/_versions/v1.json") == '{"v":1}'
    for i in range(2, 6):
        assert s.put_if_absent(f"{base}/_versions/v{i}.json", "{}")
    assert s.put_if_absent(f"{base}/_batches/b0/part-0.parquet", "d")
    assert sorted(s.list(f"{base}/_versions")) == [
        f"v{i}.json" for i in range(1, 6)]
    assert sorted(s.list(base)) == ["_batches", "_versions"]
    assert s.is_dir(f"{base}/_versions")
    assert s.is_dir(f"{base}/_batches/b0")
    assert not s.is_dir(f"{base}/_nope")
    assert s.mtime(f"{base}/_versions/v1.json") > 0
    s.delete(f"{base}/_versions/v5.json")
    s.delete(f"{base}/_versions/v5.json")   # idempotent on the wire
    assert sorted(s.list(f"{base}/_versions")) == [
        f"v{i}.json" for i in range(1, 5)]
    s.delete_tree(f"{base}/_batches")
    assert not s.is_dir(f"{base}/_batches")
    assert s.is_dir(f"{base}/_versions")


def test_conditional_put_loss_is_a_real_412_client_error(s3):
    """Pin the exact wire shape the adapter's status matcher relies
    on: botocore raises ClientError with Error.Code
    'PreconditionFailed' and HTTPStatusCode 412 — the dict paths
    _http_status walks."""
    s3.put_object(Bucket="bkt", Key="k", Body=b"x", IfNoneMatch="*")
    with pytest.raises(Exception) as ei:
        s3.put_object(Bucket="bkt", Key="k", Body=b"y",
                      IfNoneMatch="*")
    resp = ei.value.response
    assert resp["Error"]["Code"] == "PreconditionFailed"
    assert resp["ResponseMetadata"]["HTTPStatusCode"] == 412
    assert ObjectMetadataStore._http_status(ei.value) == 412
    # the loser never clobbered the winner
    assert s3.get_object(Bucket="bkt", Key="k")["Body"].read() == b"x"


def test_version_protocol_against_moto(spark, tmp_path, s3):
    """Racing committers through the REAL botocore client: 8 writers,
    every version CAS served by moto's conditional PUT; reads, time
    travel, and the usurper loss all through the adapter."""
    from concurrent.futures import ThreadPoolExecutor

    class Hybrid(ObjectMetadataStore):
        """Version objects on S3 through the real adapter; batch data
        on POSIX, as a deployment delegates it to Hadoop/Arrow."""
        posix = LocalMetadataStore()

        def _is_meta(self, path):
            return "_versions" in path

        def list(self, d):
            return (super().list(d) if self._is_meta(d)
                    else self.posix.list(d))

        def is_dir(self, path):
            return (super().is_dir(path) if self._is_meta(path)
                    else self.posix.is_dir(path))

        def read(self, path):
            return (super().read(path) if self._is_meta(path)
                    else self.posix.read(path))

        # moto's in-process request handler is NOT thread-atomic for
        # conditional PUT (two racing writers can both observe
        # key-absent inside its pure-Python read-check-write) — real
        # S3 enforces the condition server-side, and the in-repo
        # _FakeS3Client suite covers true-concurrency CAS under a
        # lock. Serialize the moto call so this test stays about the
        # WIRE SEMANTICS per request, not about moto's threading
        # (pre-r16 the race window was just narrow enough to flake
        # only on a contended box).
        _cas_lock = threading.Lock()

        def put_if_absent(self, path, content):
            if self._is_meta(path):
                with self._cas_lock:
                    return super().put_if_absent(path, content)
            return self.posix.put_if_absent(path, content)

        def delete(self, path):
            if self._is_meta(path):
                super().delete(path)
            else:
                self.posix.delete(path)

        def delete_tree(self, d):
            if self._is_meta(d):
                super().delete_tree(d)
            else:
                self.posix.delete_tree(d)

        def mtime(self, path):
            return (super().mtime(path) if self._is_meta(path)
                    else self.posix.mtime(path))

    store = Hybrid(s3, "bkt", strip_prefix="")

    def _df(ids):
        return spark.createDataFrame(
            [(i, datetime.fromisoformat("2024-03-01T10:00:00"))
             for i in ids],
            "id long, _time timestamp")

    def write_one(i):
        ManifestedTable(str(tmp_path), "proj", "events",
                        meta=store).write(_df([i]), batch_id=f"w{i}")

    with ThreadPoolExecutor(8) as ex:
        list(ex.map(write_one, range(8)))

    t = ManifestedTable(str(tmp_path), "proj", "events", meta=store)
    assert t.current_version() == 8
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(8))
    # a write to an already-committed version loses with False (the
    # moto-served 412), never clobbers
    key = f"{tmp_path}/proj/events/_versions/v{8:010d}.json"
    assert store.put_if_absent(key, "usurper") is False
    assert store.read(key) != "usurper"


def test_put_and_read_if_exists_against_moto(s3):
    """The r16 seam additions against real wire semantics: ``put`` is
    an unconditional overwrite (plain S3 PUT), and ``read_if_exists``
    maps the REAL botocore NoSuchKey ClientError (status 404 in the
    response dict) to None — the shape the in-repo fake can only
    imitate."""
    s = ObjectMetadataStore(s3, "bkt")
    assert s.read_if_exists("s3://bkt/a/rec.json") is None  # real 404
    s.put("s3://bkt/a/rec.json", "v1")
    s.put("s3://bkt/a/rec.json", "v2")       # overwrite, no condition
    assert s.read_if_exists("s3://bkt/a/rec.json") == "v2"


def test_minhash_store_compact_cycle_against_moto(spark, s3, tmp_path):
    """The signature store's full compact/replay protocol with its
    JSON records served by moto's actual S3 REST semantics through
    the real adapter (the test_store_meta Hybrid, fake swapped for
    moto): ingest x2, compact to one blob, merged-replay returns the
    stored verdict, and no protocol JSON ever touches disk."""
    from rakam_api_collector_spark.operators.sigstore import \
        MinHashStore
    from test_store_meta import _HybridStore, DOC_A, DOC_A_NEAR, DOC_B

    class MotoHybrid(_HybridStore):
        pass

    meta = MotoHybrid(s3, "bkt", strip_prefix="")
    path = str(tmp_path / "s")
    store = MinHashStore(spark, path, threshold=0.5, meta_store=meta)

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    store.ingest(docs([(1, DOC_A), (2, DOC_B)]), "doc_id", "text",
                 ingest_id="e0")
    v = store.ingest(docs([(3, DOC_A_NEAR)]), "doc_id", "text",
                     ingest_id="e1").collect()[0]
    assert not v.keep and v.matched_id == 1
    assert store.compact() == 2
    assert not (tmp_path / "s" / "_merged.json").exists()
    assert store.merged_ids() == {"e0", "e1"}     # served by moto
    rep = store.ingest(docs([(3, DOC_A_NEAR)]), "doc_id", "text",
                       ingest_id="e1").collect()[0]
    assert not rep.keep and rep.matched_id == 1
    assert store.stored_sigs().count() == 2
