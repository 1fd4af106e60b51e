"""The persisted stores on the object-store metadata seam (r16,
VERDICT r15 item 1): MinHashStore and DsirFeatureStore route their
PROTOCOL state — ``_meta.json``, the ``_merged`` record, blob
``_inputs.json`` commit markers — through a
:class:`~rakam_api_collector_spark.manifest.MetadataStore`, so the
100 TB operators' persistent state (and its compaction, the thing that
keeps per-epoch LIST/HEAD costs bounded) can live where 100 TB lives.

The tests run the FULL compact/replay/crash protocol with the JSON
records riding the real :class:`ObjectMetadataStore` adapter against
the in-memory S3 fake (conditional PUT enforced server-side, 404s,
pagination — ``tests/test_manifest._FakeS3Client``), while data-dir
listings/deletes delegate to POSIX exactly as a deployment delegates
parquet IO to the Hadoop filesystem — the ``test_manifest`` Hybrid
pattern applied to the stores.
"""

from __future__ import annotations

import json

import pytest

from rakam_api_collector_spark.manifest import (LocalMetadataStore,
                                                ObjectMetadataStore)
from rakam_api_collector_spark.operators.dsir import DsirFeatureStore
from rakam_api_collector_spark.operators.sigstore import MinHashStore
from test_manifest import _FakeS3Client

_META_NAMES = ("_meta.json", "_merged.json", "_inputs.json",
               "_centroids.json", "_pq_books.json")


class _HybridStore(ObjectMetadataStore):
    """JSON protocol records through the REAL S3 adapter against the
    fake service; data-dir listings/probes/deletes through POSIX (in a
    deployment both address the same bucket, so listings see Spark's
    parquet output — locally Spark writes to disk, so the split)."""

    posix = LocalMetadataStore()

    @staticmethod
    def _is_meta(path: str) -> bool:
        return path.rsplit("/", 1)[-1] in _META_NAMES

    def list(self, d):
        return self.posix.list(d)

    def is_dir(self, path):
        return self.posix.is_dir(path)

    def mtime(self, path):
        return (super().mtime(path) if self._is_meta(path)
                else self.posix.mtime(path))

    def read(self, path):
        return (super().read(path) if self._is_meta(path)
                else self.posix.read(path))

    def put(self, path, content):
        if self._is_meta(path):
            super().put(path, content)
        else:
            self.posix.put(path, content)

    def put_if_absent(self, path, content):
        if self._is_meta(path):
            return super().put_if_absent(path, content)
        return self.posix.put_if_absent(path, content)

    def delete(self, path):
        if self._is_meta(path):
            super().delete(path)
        else:
            self.posix.delete(path)

    def delete_tree(self, d):
        self.posix.delete_tree(d)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


DOC_A = ("the quick brown fox jumps over the lazy dog and then "
         "wanders off into the deep green forest looking for food")
DOC_A_NEAR = ("the quick brown fox jumps over the lazy dog and then "
              "wanders off into the deep green forest hunting for food")
DOC_B = ("completely different content about distributed query "
         "engines shuffling partitioned columnar data across executors")
DOC_C = ("a third unrelated document discussing tokenizer vocabularies "
         "and byte pair encoding merge tables for language models")


def test_minhash_store_protocol_on_object_store(spark, tmp_path):
    """ingest → compact → merged-replay with the merged record and the
    blob's commit marker living in the fake S3 service through the
    real adapter: no _merged.json / _inputs.json ever touches disk,
    verdicts and the replay contract are identical to the POSIX
    store's, and a crashed compact (marker landed, record lost) rolls
    forward from the S3-resident marker."""
    client = _FakeS3Client()
    meta = _HybridStore(client, "bkt", strip_prefix="")
    path = str(tmp_path / "s")

    store = MinHashStore(spark, path, threshold=0.5, meta_store=meta)
    v1 = store.ingest(_docs(spark, [(1, DOC_A), (2, DOC_B)]),
                      "doc_id", "text", ingest_id="e0")
    assert {r.doc_id: r.keep for r in v1.collect()} == {1: True,
                                                        2: True}
    v2 = store.ingest(_docs(spark, [(3, DOC_A_NEAR), (4, DOC_C)]),
                      "doc_id", "text", ingest_id="e1")
    got = {r.doc_id: r for r in v2.collect()}
    assert not got[3].keep and got[3].matched_id == 1
    assert got[4].keep

    assert store.compact() == 2
    # the protocol state lives in the service, not on disk
    assert not (tmp_path / "s" / "_merged.json").exists()
    merged_key = f"{path.lstrip('/')}/_merged.json"
    assert set(json.loads(client.objects[merged_key][0])["ids"]) \
        == {"e0", "e1"}
    blob = [d for d in (tmp_path / "s" / "sigs").iterdir()
            if d.name.startswith("_ingest=_c-")]
    assert len(blob) == 1
    assert not (blob[0] / "_inputs.json").exists()
    assert any(k.endswith("_inputs.json") for k in client.objects)

    # replay of a merged ingest returns the STORED verdict
    rep = store.ingest(_docs(spark, [(3, DOC_A_NEAR), (4, DOC_C)]),
                       "doc_id", "text", ingest_id="e1")
    got = {r.doc_id: r for r in rep.collect()}
    assert not got[3].keep and got[3].matched_id == 1 and got[4].keep

    # crash roll-forward from the S3-resident record/marker: lose the
    # merged record, reopen (passive), reads stay exact; ingest
    # converges
    client.objects.pop(merged_key)
    s2 = MinHashStore(spark, path, threshold=0.5, meta_store=meta)
    assert s2.merged_ids() == set()
    assert s2.stored_sigs().count() == 3          # reads resolve
    s2.ingest(_docs(spark, [(5, DOC_C + " extra words here")]),
              "doc_id", "text", ingest_id="e2")   # recovery runs here
    assert {"e0", "e1"} <= s2.merged_ids()


def test_dsir_store_protocol_on_object_store(spark, tmp_path):
    """Same drill for the DSIR feature store: _meta.json CAS create +
    param verify, epoch ingest, compact with its single-object commit
    marker, merged replay no-op, and select equality across all of it
    — every JSON record in the fake service through the real
    adapter."""
    client = _FakeS3Client()
    meta = _HybridStore(client, "bkt", strip_prefix="")
    path = str(tmp_path / "d")
    raw = [(0, "the cat sat on the mat"),
           (1, "stock market prices rose sharply today"),
           (2, "the dog sat on the log"),
           (3, "a cat and a dog sat together")]
    target = _docs(spark, [(100, "the cat sat quietly"),
                           (101, "a dog sat on the mat")])

    store = DsirFeatureStore(spark, path, n=2, buckets=64,
                             meta_store=meta)
    # _meta.json rode the conditional PUT, not the disk
    assert not (tmp_path / "d" / "_meta.json").exists()
    assert f"{path.lstrip('/')}/_meta.json" in client.objects
    # a mismatched reopen still raises, reading meta from the service
    with pytest.raises(ValueError, match="bucket spaces"):
        DsirFeatureStore(spark, path, n=2, buckets=128,
                         meta_store=meta)

    store.ingest(_docs(spark, raw[:2]), "doc_id", "text",
                 ingest_id="epoch-a")
    store.ingest(_docs(spark, raw[2:]), "doc_id", "text",
                 ingest_id="epoch-b")
    want = [(r["_id"], round(r["score"], 9)) for r in
            store.select(target, "doc_id", "text", k=4, alpha=0.5,
                         seed=7, temperature=2.0).collect()]

    assert store.compact() == 2
    assert not (tmp_path / "d" / "_merged.json").exists()
    assert set(json.loads(
        client.objects[f"{path.lstrip('/')}/_merged.json"][0])["ids"]) \
        == {"epoch-a", "epoch-b"}
    got = [(r["_id"], round(r["score"], 9)) for r in
           store.select(target, "doc_id", "text", k=4, alpha=0.5,
                        seed=7, temperature=2.0).collect()]
    assert got == want

    # merged replay: no-op through the service-resident record
    assert store.ingest(_docs(spark, raw[:2]), "doc_id", "text",
                        ingest_id="epoch-a") == 0


def test_uri_path_requires_explicit_meta_store(spark, tmp_path):
    """A URI store path without a meta_store fails LOUDLY at open —
    the pre-r16 guards' contract, now with the escape hatch named."""
    with pytest.raises(ValueError, match="meta_store"):
        MinHashStore(spark, "s3://bucket/store")
    with pytest.raises(ValueError, match="meta_store"):
        DsirFeatureStore(spark, "s3://bucket/store")


def test_metadata_store_put_and_read_if_exists(tmp_path):
    """The two r16 seam additions, both implementations: ``put`` is an
    atomic last-writer-wins overwrite; ``read_if_exists`` maps POSIX
    FileNotFoundError and S3-wire 404/NoSuchKey (and the fake's
    KeyError) to None, propagating everything else."""
    local = LocalMetadataStore()
    p = str(tmp_path / "sub" / "rec.json")
    assert local.read_if_exists(p) is None
    local.put(p, "v1")
    assert local.read(p) == "v1"
    local.put(p, "v2")                       # overwrite, no error
    assert local.read_if_exists(p) == "v2"

    obj = ObjectMetadataStore(_FakeS3Client(), "bkt", strip_prefix="")
    assert obj.read_if_exists("a/rec.json") is None
    obj.put("a/rec.json", "v1")
    obj.put("a/rec.json", "v2")
    assert obj.read_if_exists("a/rec.json") == "v2"

    class Shaped404(_FakeS3Client):
        def get_object(self, Bucket, Key):
            e = RuntimeError("NoSuchKey")
            e.response = {"Error": {"Code": "NoSuchKey"},
                          "ResponseMetadata": {"HTTPStatusCode": 404}}
            raise e

    assert ObjectMetadataStore(Shaped404(), "bkt", strip_prefix="") \
        .read_if_exists("a/rec.json") is None

    class Shaped403(_FakeS3Client):
        def get_object(self, Bucket, Key):
            e = RuntimeError("AccessDenied")
            e.response = {"Error": {"Code": "AccessDenied"},
                          "ResponseMetadata": {"HTTPStatusCode": 403}}
            raise e

    with pytest.raises(RuntimeError, match="AccessDenied"):
        ObjectMetadataStore(Shaped403(), "bkt",
                            strip_prefix="").read_if_exists("a/x")


def test_ivf_index_model_artifacts_on_object_store(spark, tmp_path):
    """The persisted ANN indexes ride the same seam (r16): model
    artifacts (_centroids.json, _pq_books.json) are written/read
    through the real ObjectMetadataStore adapter against the fake S3
    service — build, append, search, footer-audit, and the streaming
    maintainer's introspection all work with NO model JSON on disk —
    and a URI index path without a meta_store refuses loudly."""
    from rakam_api_collector_spark.operators import similarity as S
    from rakam_api_collector_spark.streaming.annindex import \
        start_ann_index_stream

    client = _FakeS3Client()
    meta = _HybridStore(client, "bkt", strip_prefix="")
    rows = [(i, [float((i * 7 + j * 3) % 11) + 0.1 for j in range(8)])
            for i in range(64)]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    S.build_ivf_index(emb.filter("vec_id < 48"), "vec_id", "embedding",
                      path, n_cells=4, meta_store=meta)
    assert not (tmp_path / "ivf" / "_centroids.json").exists()
    assert any(k.endswith("_centroids.json") for k in client.objects)

    # streaming maintainer introspects + appends through the seam
    src = tmp_path / "arrivals"
    emb.filter("vec_id >= 48").coalesce(1) \
        .write.parquet(str(src / "c0"))
    flat = tmp_path / "flat"
    flat.mkdir()
    import shutil
    for i, f in enumerate((src / "c0").glob("*.parquet")):
        shutil.copy(f, flat / f"{i}.parquet")
    start_ann_index_stream(
        spark, str(flat), path, "vec_id", "embedding",
        str(tmp_path / "ckpt"), meta_store=meta).awaitTermination(120)

    got = S.ivf_index_topk(spark, path, emb.filter("vec_id < 2"),
                           "vec_id", "embedding", k=3, nprobe=4,
                           meta_store=meta).collect()
    assert len(got) == 6
    stats = S.ivf_cell_stats(path, meta_store=meta)
    assert stats["n_cells"] == 4 and stats["rows"] == 64

    with pytest.raises(ValueError, match="meta_store"):
        S.ivf_cell_stats("s3://bucket/ivf")
    with pytest.raises(ValueError, match="meta_store"):
        start_ann_index_stream(spark, str(flat), "s3://bucket/ivf",
                               "vec_id", "embedding",
                               str(tmp_path / "ckpt2"))


def test_catalog_and_checkpoint_offsets_on_object_store(spark, tmp_path):
    """K5's schema registry and S2's checkpoint-lag reader ride the
    seam too (r16): the catalog JSON persists through the real adapter
    into the fake service and reloads from it; checkpointed_offsets
    lists/reads a checkpoint living entirely in the service; both
    refuse URI paths without an explicit store."""
    from pyspark.sql import types as T

    from rakam_api_collector_spark.ingest.catalog import Catalog
    from rakam_api_collector_spark.sources.kafka import (
        checkpoint_lag, checkpointed_offsets)

    client = _FakeS3Client()
    meta = ObjectMetadataStore(client, "bkt", strip_prefix="")

    cat = Catalog("s3://bkt/cat.json".replace("s3://bkt/", ""),
                  meta_store=meta)
    cat.create_table("proj", "pages",
                     [T.StructField("url", T.StringType())])
    assert "cat.json" in client.objects          # persisted to service
    cat2 = Catalog("cat.json", meta_store=meta)  # reloads from service
    assert [f.name for f in cat2.get_columns("proj", "pages")] \
        == [f.name for f in cat.get_columns("proj", "pages")]
    with pytest.raises(ValueError, match="meta_store"):
        Catalog("s3://bucket/cat.json")

    # a checkpoint whose offsets live only in the service
    ck = "ckpts/q1"
    meta.put(f"{ck}/offsets/0", 'v1\n{"batchTimestampMs":1}\n'
             '{"offsets": {"t 0": 3}}')
    meta.put(f"{ck}/offsets/1", 'v1\n{"batchTimestampMs":2}\n'
             '{"offsets": {"t 0": 7, "t 1": 9}}')
    assert checkpointed_offsets(ck, meta_store=meta) \
        == {"t 0": 7, "t 1": 9}

    class _B:
        def end_offsets(self, t):
            return {0: 10, 1: 9}

    assert checkpoint_lag(ck, _B(), ["t"], meta_store=meta) == 3
    with pytest.raises(ValueError, match="meta_store"):
        checkpointed_offsets("s3://bucket/ck")


def test_checkpoint_offsets_degrade_on_wire_errors(tmp_path):
    """r17 (ADVICE r16), narrowed r18 (ADVICE r17): the documented
    "unreadable checkpoint reads as no-progress-yet" contract covers
    EXACTLY the object-store permission shape — a 403 AccessDenied
    degrades to None as the POSIX PermissionError it mirrors — while
    a 5xx that survived the adapter's capped retries PROPAGATES (a
    drain-gate poll must see a persistent store failure, not wait
    forever on a silent None), as does a non-wire bug."""
    from rakam_api_collector_spark.sources.kafka import \
        checkpointed_offsets

    class _Wire(Exception):
        def __init__(self, status, code="AccessDenied"):
            self.response = {"Error": {"Code": code},
                             "ResponseMetadata":
                                 {"HTTPStatusCode": status}}

    class _Denied(LocalMetadataStore):
        def list(self, d):
            raise _Wire(403)

    class _Down(LocalMetadataStore):
        def list(self, d):
            raise _Wire(500, "InternalError")

    class _Buggy(LocalMetadataStore):
        def list(self, d):
            raise KeyError("not a wire error")

    assert checkpointed_offsets(str(tmp_path / "ck"),
                                meta_store=_Denied()) is None
    with pytest.raises(_Wire):
        checkpointed_offsets(str(tmp_path / "ck"),
                             meta_store=_Down())
    with pytest.raises(KeyError):
        checkpointed_offsets(str(tmp_path / "ck"),
                             meta_store=_Buggy())


def test_dsir_store_reopen_is_read_only(spark, tmp_path):
    """r17 (ADVICE r16): opening an EXISTING DsirFeatureStore is a
    pure GET — no conditional PUT on every open, so a read-only IAM
    role can open it; and a reader pointed at an empty/wrong path
    fails on the create instead of silently making a store."""
    class _ReadOnly(LocalMetadataStore):
        puts = 0

        def put(self, path, content):
            _ReadOnly.puts += 1
            raise PermissionError("read-only role")

        def put_if_absent(self, path, content):
            _ReadOnly.puts += 1
            raise PermissionError("read-only role")

    path = str(tmp_path / "dstore")
    DsirFeatureStore(spark, path, n=2, buckets=64)   # creates
    ro = _ReadOnly()
    st = DsirFeatureStore(spark, path, n=2, buckets=64, meta_store=ro)
    assert _ReadOnly.puts == 0                       # pure GET open
    assert (st.n, st.buckets) == (2, 64)
    with pytest.raises(ValueError, match="n=2"):
        # parameter-mismatch verify still fires on a read-only reopen
        DsirFeatureStore(spark, path, n=3, buckets=64, meta_store=ro)
    with pytest.raises(PermissionError):
        DsirFeatureStore(spark, str(tmp_path / "nope"), n=2,
                         buckets=64, meta_store=ro)  # no silent create
