"""Streaming ANN index maintenance (streaming/annindex.py): a built
IVF / IVF-PQ index grows from a parquet file stream via the persisted
model artifacts — checkpointed (no reprocessing on restart), layout-
introspecting (flat vs PQ, codes-only vs stored-vector), and
at-least-once-safe (replays collapse at search time).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators import similarity as S
from rakam_api_collector_spark.streaming import start_ann_index_stream
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _split_embeddings(spark, tmp_path, cuts=(100, 150)):
    """Built-from corpus (id < cuts[0]) + stream files for the rest,
    one parquet file per (cuts[i], cuts[i+1]) id slice."""
    emb = load_table(spark, SF, "embeddings")
    first = emb.filter(F.col("vec_id") < cuts[0])
    src = tmp_path / "incoming"
    bounds = list(cuts) + [None]
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        part = emb.filter(F.col("vec_id") >= lo)
        if hi is not None:
            part = part.filter(F.col("vec_id") < hi)
        (part.coalesce(1).write.mode("append")
         .parquet(str(src)))
    return emb, first, str(src)


def test_ann_stream_grows_flat_index_and_checkpoints(spark, tmp_path):
    """Draining the stream equals in-memory search over the union
    corpus with the build-time centroids; a restart on the same
    checkpoint with no new files appends nothing; a NEW file after
    restart flows through."""
    emb, first, src = _split_embeddings(spark, tmp_path)
    path = str(tmp_path / "ivf")
    S.build_ivf_index(first, "vec_id", "embedding", path, n_cells=16)

    class Counter:
        n = 0

        def add(self, k):
            Counter.n += k

    kw = dict(index_path=path, id_col="vec_id", vec_col="embedding",
              checkpoint=str(tmp_path / "ckpt"), stats=Counter())
    start_ann_index_stream(spark, src, **kw).awaitTermination(120)
    total = emb.count()
    assert Counter.n == total - 100
    assert spark.read.parquet(path).count() == total

    q = emb.filter(F.col("vec_id") < 5)
    got = {(r.q, r.neighbor, r.rnk) for r in
           S.ivf_index_topk(spark, path, q, "vec_id", "embedding",
                            k=10, nprobe=4).collect()}
    import numpy as np
    cents_rows = (first.filter(F.col("vec_id") < 16)
                  .select("vec_id", "embedding").collect())
    cents = np.asarray([[float(x) for x in r.embedding] for r in
                        sorted(cents_rows, key=lambda r: r.vec_id)])
    mem = {(r.q, r.neighbor, r.rnk) for r in
           S.ivf_topk(emb, q, "vec_id", "embedding", k=10,
                      n_cells=16, nprobe=4, centroids=cents).collect()}
    assert got == mem and len(got) == 50

    # restart, nothing new: checkpoint prevents re-appending
    start_ann_index_stream(spark, src, **kw).awaitTermination(120)
    assert spark.read.parquet(path).count() == total

    # a new file after restart flows through (re-keyed ids so the
    # growth is visible as count, not collapsed duplicates)
    (emb.filter(F.col("vec_id") < 10)
     .select((F.col("vec_id") + 100_000).alias("vec_id"), "embedding")
     .coalesce(1).write.mode("append").parquet(src))
    start_ann_index_stream(spark, src, **kw).awaitTermination(120)
    assert spark.read.parquet(path).count() == total + 10


def test_ann_stream_introspects_pq_layout(spark, tmp_path):
    """With _pq_books.json beside the index the stream appends PQ
    codes (encoded with the persisted codebooks), carrying the stored
    vector iff the index was built with store_vectors — rerank then
    works over STREAMED rows."""
    emb, first, src = _split_embeddings(spark, tmp_path)
    books = S.train_pq_codebooks(first, "vec_id", "embedding",
                                 m=16, nbits=4)
    path = str(tmp_path / "ivfpq")
    S.build_ivf_pq_index(first, "vec_id", "embedding", path,
                         n_cells=16, books=books, store_vectors=True)
    start_ann_index_stream(
        spark, src, index_path=path, id_col="vec_id",
        vec_col="embedding",
        checkpoint=str(tmp_path / "ckpt")).awaitTermination(120)

    idx = spark.read.parquet(path)
    assert idx.count() == emb.count()
    assert "codes" in idx.columns and "_cv" in idx.columns
    assert idx.filter(F.col("_cv").isNull()).count() == 0

    q = emb.filter(F.col("vec_id") < 5)
    refined = S.ivf_pq_index_topk(spark, path, q, "vec_id",
                                  "embedding", k=5, nprobe=8,
                                  rerank_factor=5)
    exact = {(r.q, r.neighbor) for r in
             S.cosine_topk(emb, q, "vec_id", "embedding", k=5).collect()}
    ref = {(r.q, r.neighbor) for r in refined.collect()}
    assert len(ref & exact) / len(exact) >= 0.6


def test_ann_stream_refuses_unbuilt_index(spark, tmp_path):
    """The stream maintains an index, it never trains one: a missing
    _centroids.json raises instead of freezing first-batch vectors as
    an accidental model."""
    with pytest.raises(ValueError, match="no built index"):
        start_ann_index_stream(
            spark, str(tmp_path / "incoming"),
            index_path=str(tmp_path / "nope"), id_col="vec_id",
            vec_col="embedding", checkpoint=str(tmp_path / "ckpt"))
    assert not os.path.exists(str(tmp_path / "nope"))
