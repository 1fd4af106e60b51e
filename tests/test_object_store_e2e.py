"""The COMPOSED object-store story (r17, VERDICT r16 item 5): one run
of the streaming curation path — dedup stream → DSIR feature store →
selection → exact token budget → governed manifested table — plus a
versioned ANN index maintainer, with EVERY protocol-state surface
riding a real :class:`ObjectMetadataStore` served by moto's actual S3
REST semantics (conditional-PUT CAS, 404s, listings), not the
in-memory fake. ``tests/test_store_meta.py`` proves the pieces; this
proves the composition, with one moto-served 412 CAS loss injected
into the table's version commit (the OCC loop retries and wins) and
one crash-replay (a re-ingested DSIR epoch) inside the run.

Data files stay on POSIX (locally Spark writes to disk; in a
deployment both sides address the same bucket) — the split every
store-seam suite uses (test_store_meta._HybridStore).
"""

from __future__ import annotations

import json
import threading

import pytest
from pyspark.sql import functions as F

moto = pytest.importorskip("moto")

import boto3  # noqa: E402  (moto implies boto3)
from moto import mock_aws  # noqa: E402

from rakam_api_collector_spark.manifest import (  # noqa: E402
    LocalMetadataStore, ManifestedTable, ObjectMetadataStore,
    run_maintenance)
from rakam_api_collector_spark.operators.dsir import \
    DsirFeatureStore  # noqa: E402
from rakam_api_collector_spark.operators import \
    similarity as S  # noqa: E402
from rakam_api_collector_spark.operators.indexroot import \
    VersionedIndex  # noqa: E402
from rakam_api_collector_spark.streaming.annindex import \
    start_ann_index_stream  # noqa: E402
from rakam_api_collector_spark.streaming.dedupstream import \
    start_corpus_dedup_stream  # noqa: E402
from rakam_api_collector_spark.streaming.dsirstream import \
    start_dsir_feature_stream  # noqa: E402
from rakam_api_collector_spark.tables import load_table  # noqa: E402
from test_streaming_curation_e2e import DOCS, B, N  # noqa: E402

SF = "/root/testdata/sf0.001"
_META_NAMES = ("_meta.json", "_merged.json", "_inputs.json",
               "_centroids.json", "_pq_books.json")


class _E2EStore(ObjectMetadataStore):
    """Protocol state (store records, index model artifacts, EVERY
    ``_versions`` log — table and index alike) through the real S3
    adapter against moto; data-dir listings/probes through POSIX.
    Conditional PUTs serialize under a lock because moto's in-process
    handler is not thread-atomic (the test_manifest_moto rule) —
    per-request WIRE semantics are what this suite pins."""

    posix = LocalMetadataStore()
    _cas_lock = threading.Lock()

    @staticmethod
    def _is_meta(path: str) -> bool:
        return ("_versions" in path
                or path.rsplit("/", 1)[-1] in _META_NAMES)

    def list(self, d):
        return (super().list(d) if "_versions" in d
                else self.posix.list(d))

    def is_dir(self, path):
        return (super().is_dir(path) if "_versions" in path
                else self.posix.is_dir(path))

    def read(self, path):
        return (super().read(path) if self._is_meta(path)
                else self.posix.read(path))

    def mtime(self, path):
        return (super().mtime(path) if self._is_meta(path)
                else self.posix.mtime(path))

    def put(self, path, content):
        if self._is_meta(path):
            super().put(path, content)
        else:
            self.posix.put(path, content)

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
        # a generation/table dir holds POSIX data AND S3-side records
        # under the same prefix — reclaim both
        try:
            self.posix.delete_tree(d)
        except FileNotFoundError:
            pass
        super().delete_tree(d)


@pytest.fixture()
def s3():
    with mock_aws():
        c = boto3.client("s3", region_name="us-east-1")
        c.create_bucket(Bucket="bkt")
        yield c


def test_streaming_curation_composed_on_object_store(spark, s3,
                                                     tmp_path):
    meta = _E2EStore(s3, "bkt", strip_prefix="")

    class Inject412(_E2EStore):
        """First version CAS for the training table loses to a rival
        committed through the same moto bucket — a REAL 412 on the
        wire — and the OCC loop must retry and win."""
        rivaled = 0

        def put_if_absent(self, path, content):
            if ("corpus/train/_versions" in path
                    and Inject412.rivaled == 0):
                Inject412.rivaled = 1
                rival = json.loads(content)
                rival["batches"] = []
                super().put_if_absent(path, json.dumps(rival))
            return super().put_if_absent(path, content)

    # arrivals: one file per epoch
    flat = tmp_path / "arrivals"
    flat.mkdir()
    for i, chunk in enumerate([DOCS[:7], DOCS[7:]]):
        spark.createDataFrame(chunk, ["doc_id", "text"]) \
            .coalesce(1).write.mode("append").parquet(str(flat))

    # 1) dedup stream — sig-store protocol on moto
    start_corpus_dedup_stream(
        spark, str(flat), str(tmp_path / "sigs"), "doc_id", "text",
        str(tmp_path / "ck_dedup"),
        survivors_dir=str(tmp_path / "survivors"),
        max_files_per_trigger=1, n=3, threshold=0.5,
        compact_every_n_epochs=2, meta_store=meta,
    ).awaitTermination(180)
    survivors = spark.read.parquet(str(tmp_path / "survivors"))
    kept_ids = {r["doc_id"] for r in survivors.select("doc_id")
                .collect()}
    assert len(kept_ids) == 12                  # both near-dups dropped
    assert not (tmp_path / "sigs" / "_merged.json").exists()

    # 2) DSIR feature stream — store protocol on moto
    start_dsir_feature_stream(
        spark, str(tmp_path / "survivors"), str(tmp_path / "store"),
        "doc_id", "text", str(tmp_path / "ck_feats"),
        n=N, buckets=B, max_files_per_trigger=1, meta_store=meta,
    ).awaitTermination(180)
    store = DsirFeatureStore(spark, str(tmp_path / "store"),
                             n=N, buckets=B, meta_store=meta)
    assert {r["_id"] for r in store.feats().select("_id").collect()} \
        == kept_ids

    # 3) selection from features only
    target = spark.createDataFrame(
        [(100, "market prices rose and traders expect rates to move")],
        ["doc_id", "text"])
    sel_kw = dict(k=8, alpha=0.5, seed=7, temperature=2.0)
    sel = [r["_id"] for r in
           store.select(target, "doc_id", "text", **sel_kw).collect()]

    # CRASH-REPLAY inside the run: re-ingest a committed epoch (what a
    # crash between store write and offset commit replays) — the
    # partition overwrites in place, nothing double-counts, the
    # selection is bit-identical
    eid = sorted(i for i in store.ingest_ids()
                 if not i.startswith("_c-"))[0]
    eid_ids = [r["_id"] for r in
               spark.read.parquet(str(tmp_path / "store" / "feats"))
               .filter(F.col("_ingest") == eid)
               .select("_id").distinct().collect()]
    replay_src = (survivors.filter(F.col("doc_id").isin(eid_ids))
                  .select("doc_id", "text"))
    assert store.ingest(replay_src, "doc_id", "text",
                        ingest_id=eid) == len(eid_ids)
    assert [r["_id"] for r in
            store.select(target, "doc_id", "text",
                         **sel_kw).collect()] == sel

    # 4) exact token budget → the governed table, whose version CAS
    # takes the injected moto-served 412 and retries through it
    from rakam_api_collector_spark.operators.sampling import \
        sample_token_budget
    from rakam_api_collector_spark.operators.text import tokens
    pool = (survivors.select("doc_id", "text")
            .filter(F.col("doc_id").isin(sel))
            .withColumn("src", F.lit("all"))
            .withColumn("n_tok", F.size(tokens(F.col("text")))
                        .cast("long")))
    train = sample_token_budget(pool, "doc_id", "src", "n_tok",
                                {"all": 1.0}, 40, seed=3) \
        .select("doc_id", "text")
    t = ManifestedTable(str(tmp_path), "corpus", "train",
                        meta=Inject412(s3, "bkt", strip_prefix=""))
    t.write(train, batch_id="sel-1", partition_by_day=False)
    assert Inject412.rivaled == 1
    assert t.current_version() == 2             # rival v1 + retry v2
    got = {r["doc_id"] for r in t.read(spark).collect()}
    assert got == {r["doc_id"] for r in train.collect()} and got

    # 5) the ANN index maintainer on a versioned root — version log +
    # model artifacts on moto, generations on POSIX; compact cadence
    # swaps generations mid-stream
    emb = load_table(spark, SF, "embeddings")
    root = VersionedIndex(str(tmp_path / "idx"), meta_store=meta)
    gen1 = root.new_generation_path()
    S.build_ivf_index(emb.filter("vec_id < 100"), "vec_id",
                      "embedding", gen1, n_cells=16, meta_store=meta)
    root.publish(gen1)
    inc = tmp_path / "vec_arrivals"
    for lo, hi in [(100, 300), (300, 500)]:
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)) \
            .coalesce(1).write.mode("append").parquet(str(inc))
    start_ann_index_stream(
        spark, str(inc), index_root=root, id_col="vec_id",
        vec_col="embedding", checkpoint=str(tmp_path / "ck_ann"),
        max_files_per_trigger=1, meta_store=meta,
        compact_every_n_epochs=2).awaitTermination(180)
    assert [root._read_version(n)["action"]
            for n in root._version_numbers()] \
        == ["publish", "append", "append", "compact"]
    assert spark.read.parquet(root.current_path()).count() \
        == emb.count()
    # no version JSON or model artifact on local disk — all on moto
    assert not (tmp_path / "idx" / "_versions").exists()
    assert not any((tmp_path / "idx").glob("*/_centroids.json"))
    q = emb.filter("vec_id < 3")
    assert root.topk(spark, q, "vec_id", "embedding",
                     k=5, nprobe=16).count() == 15

    # 6) one cadence owns all maintenance: the sweep reads the table
    # through moto AND reports the index's health row; gc reclaims the
    # superseded generation on both sides of the split store
    reports = run_maintenance(spark, str(tmp_path), min_batches=99,
                              meta=meta, index_roots=[root])
    assert reports[-1]["index"] == root.root
    assert reports[-1]["rows"] == emb.count()
    assert reports[-1]["rebuild_due"] is False
    removed = root.gc(keep_versions=1, grace_seconds=0.0)
    assert removed == [gen1]
    assert not (tmp_path / "idx" / "gen-000001").exists()
    assert root.topk(spark, q, "vec_id", "embedding",
                     k=5, nprobe=16).count() == 15
