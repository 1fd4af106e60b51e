"""Deterministic sampling / split operators for training-data pipelines.

``sample()``-style random sampling is seed-deterministic only for a
fixed partitioning — repartition the corpus and the sample changes. A
training pipeline needs splits that are a PURE FUNCTION OF THE ROW
(reproducible across runs, engines, partitionings, and as the corpus
grows: a document's split assignment never changes when other documents
are added). The standard construction: bucket a stable key's hash and
threshold the bucket.

md5 is the hash here — not for speed but because the split must be
REPRODUCIBLE OUTSIDE SPARK (the DuckDB oracle, a Python reader, a
different engine): every engine has md5; xxhash64 seeds differ across
implementations. For hot paths where cross-engine reproducibility is
not needed, pass ``hash_expr=F.xxhash64(...)``-style overrides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): first 8 md5 hex digits of the
    key's string form, mod buckets. Pure function of the key value."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10) \
            .cast("long") % buckets


def hash_split(df: DataFrame, key: str, frac_pct: int = 10,
               buckets: int = 100) -> tuple[DataFrame, DataFrame]:
    """(selected, rest): rows whose hash bucket < frac_pct — the
    train/test split primitive. Row-local predicate: no shuffle, pushes
    into the scan stage, and each row's assignment is permanent."""
    b = hash_bucket(F.col(key), buckets)
    return df.filter(b < frac_pct), df.filter(b >= frac_pct)


def uniform_unit(key: Column) -> Column:
    """Deterministic u ∈ [0,1): first 8 md5 hex digits / 2³² — the
    cross-engine-reproducible uniform (module docstring rationale)."""
    return (F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
            .cast("double") / F.lit(float(1 << 32)))


def mixture_sample(df: DataFrame, key: str, group_col: str,
                   weights: dict[str, float]) -> DataFrame:
    """Deterministic domain-mixture downsampling: keep the LARGEST
    corpus whose group shares match ``weights`` without upsampling —
    total T = min_g(n_g / w_g), per-group keep rate w_g·T / n_g, row
    kept iff ``uniform_unit(key) < rate`` (exact in expectation,
    hash-stable row selection). Groups absent from ``weights`` drop.

    Scale: one group-count aggregate (rows = #groups) broadcast back;
    the keep predicate is row-local, so at 100 TB this is a scan +
    filter with NO data shuffle — the canonical mixture-reweighting
    step before sequence packing."""
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    counts = (df.groupBy(group_col).agg(F.count("*").alias("_n"))
              .withColumn("_w", wmap[F.col(group_col)].cast("double"))
              .filter(F.col("_w").isNotNull()))
    t = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_t"))
    rates = (counts.crossJoin(F.broadcast(t))
             .select(group_col,
                     F.least(F.lit(1.0),
                             F.col("_w") * F.col("_t") / F.col("_n"))
                     .alias("_rate")))
    return (df.join(F.broadcast(rates), group_col)
            .filter(uniform_unit(F.col(key)) < F.col("_rate"))
            .drop("_rate"))


def training_order(df: DataFrame, key: str, n_shards: int,
                   seed: int = 0) -> DataFrame:
    """Deterministic global training-order shuffle + sharding: adds
    ``shard`` (which output file/worker the row belongs to) and ``pos``
    (its position within that shard). The order is a pure function of
    (seed, key) — reproducible across runs, engines, and input
    partitionings, and re-seedable per epoch (seed = epoch number gives
    a fresh permutation with zero state).

    Shard assignment is the md5 bucket of the seeded key; within-shard
    order is the full md5 (key as tie-break against the ~2⁻³² truncated-
    digest collisions). Scale shape: shard assignment is row-local; the
    ONLY shuffle is the partitionBy(shard) window exchange — rows move
    once, straight to the executor that writes their shard, and no
    global total order is ever materialized (a global orderBy would add
    a range exchange for an ordering no trainer needs: shards are the
    unit of consumption)."""
    h = F.md5(F.concat_ws(":", F.lit(str(seed)),
                          F.col(key).cast("string")))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10)
             .cast("long") % n_shards).cast("int")
    w = (Window.partitionBy("shard")
         .orderBy(F.col("_h"), F.col(key)))
    return (df.withColumn("_h", h).withColumn("shard", shard)
            .withColumn("pos", F.row_number().over(w))
            .drop("_h"))
