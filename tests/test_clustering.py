"""k-means: convergence, determinism, empty-cluster handling, and the
map-only assignment plan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.clustering import (
    assign_clusters, kmeans, update_centroids, _with_assignment)
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _inertia(df):
    return df.agg(F.sum("dist")).first()[0]


def test_inertia_non_increasing_over_iterations(spark):
    emb = load_table(spark, SF, "embeddings")
    prev = None
    for it in range(3):
        res = kmeans(emb, "vec_id", "embedding", k=4, iters=it)
        cur = _inertia(res)
        if prev is not None:
            assert cur <= prev + 1e-9, (it, cur, prev)
        prev = cur


def test_assignment_deterministic_under_repartition(spark):
    emb = load_table(spark, SF, "embeddings")
    a = {r.vec_id: r.cluster for r in
         kmeans(emb, "vec_id", "embedding", k=4, iters=1).collect()}
    b = {r.vec_id: r.cluster for r in
         kmeans(emb.repartition(7), "vec_id", "embedding",
                k=4, iters=1).collect()}
    assert a == b


def test_empty_cluster_keeps_old_centroid(spark):
    # two far groups, three centroids; the third centroid is unreachable
    # (every point is closer to c0/c1) so its cluster stays empty
    rows = [(i, [0.0, 0.0]) for i in range(3)] + \
           [(i, [10.0, 10.0]) for i in range(3, 6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.0, 0.0], [10.0, 10.0], [100.0, 100.0]]
    assigned = _with_assignment(emb, "vec_id", "embedding", cents)
    new = update_centroids(assigned, old=cents)
    assert new[2] == [100.0, 100.0]           # untouched
    assert new[0] == [0.0, 0.0] and new[1] == [10.0, 10.0]


def test_assignment_is_map_only(spark):
    emb = load_table(spark, SF, "embeddings")
    buf = io.StringIO()
    with redirect_stdout(buf):
        assign_clusters(emb, "vec_id", "embedding",
                        [[0.0] * 64, [1.0] * 64]).explain("simple")
    plan = buf.getvalue()
    assert "Exchange" not in plan              # no shuffle: pure map
    assert "CartesianProduct" not in plan
