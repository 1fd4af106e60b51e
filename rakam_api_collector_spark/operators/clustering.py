"""Lloyd's k-means over an embedding column as declarative DataFrame
ops — the iterative-algorithm pattern for a 100 TB corpus.

Scale shape (the same one MLlib uses):
- ASSIGNMENT is a pure map: centroids are a k×dim literal broadcast
  inside the plan; each row computes k sequential-fold distances and an
  argmin — no shuffle, no UDF, whole-stage codegen, one corpus scan
  per iteration (the vector rides into the update aggregate; no
  corpus-to-assignment self-join).
- UPDATE is one partial+final aggregation per iteration: posexplode to
  (cluster, pos, val) and mean per (cluster, pos) — the only shuffle,
  k×dim result rows.
- The driver holds ONLY k×dim floats between iterations (bounded,
  never data-sized) — the legitimate use of collect().

Cross-engine determinism (the oracle replays iterations in SQL):
- per-dim means accumulate in DECIMAL (exact, shuffle-order-free),
  then cast to double and round to 6 places before becoming the next
  centroid literal;
- distances fold left-to-right over the dim index in both engines, so
  double rounding is bit-identical;
- argmin takes the FIRST minimal index (array_position semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, cent: list[float]) -> Column:
    """Sequential-fold squared L2 distance to one literal centroid."""
    c = F.array(*[F.lit(float(v)) for v in cent])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)


def _with_assignment(emb: DataFrame, id_col: str, vec_col: str,
                     centroids: list[list[float]]) -> DataFrame:
    """(_id, _v, cluster, dist) — assignment with the vector retained
    so the update aggregate needs no join back to the corpus."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    df = emb.select(F.col(id_col).alias("_id"), vec.alias("_v"))
    dists = F.array(*[_sq_dist(F.col("_v"), c) for c in centroids])
    return (df.withColumn("_d", dists)
            .select("_id", "_v",
                    (F.array_position(F.col("_d"),
                                      F.array_min(F.col("_d"))) - 1)
                    .cast("int").alias("cluster"),
                    F.array_min(F.col("_d")).alias("dist")))


def assign_clusters(emb: DataFrame, id_col: str, vec_col: str,
                    centroids: list[list[float]]) -> DataFrame:
    """(id, cluster, dist): nearest centroid (first index wins ties)
    for each row. Map-only — centroids travel inside the plan."""
    return (_with_assignment(emb, id_col, vec_col, centroids)
            .select(F.col("_id").alias(id_col), "cluster", "dist"))


def update_centroids(assigned_with_vec: DataFrame, *,
                     old: list[list[float]]) -> list[list[float]]:
    """One Lloyd update from a ``_with_assignment`` frame:
    decimal-exact per-dim means per cluster, rounded to 6 places.
    Empty clusters keep their old centroid."""
    rows = (assigned_with_vec
            .select("cluster", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg((F.sum(F.col("val").cast("decimal(28,12)"))
                  .cast("double") / F.count("*")).alias("m"))
            .collect())                      # k*dim rows — bounded
    cents = [list(c) for c in old]
    dims: dict[int, dict[int, float]] = {}
    for r in rows:
        dims.setdefault(r["cluster"], {})[r["pos"]] = round(r["m"], 6)
    for ci, by_pos in dims.items():
        cents[ci] = [by_pos[p] for p in sorted(by_pos)]
    return cents


def kmeans(emb: DataFrame, id_col: str, vec_col: str, *, k: int = 8,
           iters: int = 2,
           init: list[list[float]] | None = None) -> DataFrame:
    """k-means with deterministic init (first k rows by id order unless
    ``init`` given). Returns the final assignment (id, cluster, dist).

    ``iters`` assignment+update rounds run, then one final assignment
    against the last centroids — so the output reflects the updated
    centroids (matching an unrolled replay of the same steps)."""
    if init is None:
        first = (emb.orderBy(id_col).limit(k)
                 .select(F.transform(F.col(vec_col),
                                     lambda x: F.round(x.cast("double"),
                                                       6))
                         .alias("_v")).collect())
        init = [list(r["_v"]) for r in first]
    cents = kmeans_centroids(emb, id_col, vec_col, init=init,
                             iters=iters)
    return assign_clusters(emb, id_col, vec_col, cents)


def kmeans_centroids(emb: DataFrame, id_col: str, vec_col: str, *,
                     init: list[list[float]], iters: int = 2
                     ) -> list[list[float]]:
    """The trained model half of kmeans: run the assignment+update
    rounds and return the final centroid list (k x dim driver state) —
    the persisted artifact an IVF index builds its cells from
    (similarity.py:ivf_topk(centroids=...))."""
    cents = init
    for _ in range(iters):
        assigned = _with_assignment(emb, id_col, vec_col, cents)
        cents = update_centroids(assigned, old=cents)
    return cents
