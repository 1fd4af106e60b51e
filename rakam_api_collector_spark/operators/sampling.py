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
    step before sequence packing. T = min_g(n_g / w_g) is a separate
    ``counts.agg(min)`` broadcast: although its build shares the
    group-count lineage, AQE reuses the identical hash-partitioned
    exchange at runtime, so the corpus is scanned once (measured r18:
    replacing it with an unpartitioned window over the count table
    was 0.65 -> 0.86 s at sf0.1 — the window's single-partition
    exchange costs more than the already-reused aggregate)."""
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


def seeded_unit(key: Column, seed: int = 0) -> Column:
    """Deterministic u ∈ [0,1) keyed by (seed, key) — uniform_unit
    with a re-seedable permutation (seed = run/epoch number), the
    training_order seeding convention."""
    return (F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)), key.cast("string"))),
        1, 8), 16, 10).cast("double") / F.lit(float(1 << 32)))


def sample_token_budget(df: DataFrame, key: str, group_col: str,
                        tokens_col: str, weights: dict[str, float],
                        budget: int, seed: int = 0,
                        boundary_buckets: int = 4096) -> DataFrame:
    """Deterministic TOKEN-budget mixture sampling — the unit a
    training run actually budgets. For each group g in ``weights``,
    target_g = w_g·budget tokens; the group's documents are ordered
    by the seeded uniform hash (u, key) and the PREFIX is kept while
    the running token total before a document is still under
    target_g — so the crossing document is included (the take-until-
    met rule: the sample reaches the target unless the group runs
    out), the kept set is a pure function of (corpus, weights,
    budget, seed) on any engine, and growing the budget only ever
    ADDS documents (a prefix of a longer prefix). Groups absent from
    ``weights`` drop; null token counts count as 0.

    Scale shape (why this is not a per-group global sort): the
    canonical order is (u, key), and bucket = ⌊u·B⌋ is monotone in u
    — so phase A reduces the corpus to a (group, bucket) token-sum
    table (≤ groups·B rows, map-side combined), finds each group's
    boundary bucket and remaining token allowance with a window over
    that TINY table, and phase B is a row-local filter for every
    bucket strictly inside the cutoff plus an ordered cumsum over
    ONLY the ~1/B of each group that lands in its boundary bucket.
    Identical output to the one-window definition (the DuckDB oracle
    form), at the cost of one tiny aggregate plus a 1/B-sized window
    instead of ordering whole groups.

    ``mixture_sample`` is the doc-count sibling (keep-rates, no
    ordering at all); this is the exact-token form."""
    if budget <= 0:
        raise ValueError(f"budget must be > 0 (got {budget})")
    if boundary_buckets < 1:
        raise ValueError(f"boundary_buckets must be >= 1 "
                         f"(got {boundary_buckets})")
    wmap = F.create_map(*[F.lit(x) for kv in weights.items()
                          for x in kv])
    cols = df.columns
    tok = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    # materialized once (lazy localCheckpoint): three consumers read
    # this frame — the phase-A bucket sums plus BOTH union branches of
    # phase B — and without it each branch replayed the full upstream
    # lineage (scan + the caller's tokenize for the token counts):
    # three corpus passes for one sampling pass (guide §2.4). Lazy, so
    # the phase-A aggregate is the materializing job, not an extra one.
    tagged = (df.withColumn("_w", wmap[F.col(group_col)].cast("double"))
              .filter(F.col("_w").isNotNull())
              .withColumn("_u", seeded_unit(F.col(key), seed))
              .withColumn("_b", F.floor(F.col("_u")
                                        * boundary_buckets).cast("int"))
              .localCheckpoint(eager=False))
    # phase A: boundary bucket + remaining allowance per group, over
    # the tiny (group, bucket) token-sum table
    bsum = (tagged.groupBy(group_col, "_b")
            .agg(F.sum(tok).alias("_tok")))
    cum = (bsum.withColumn("_cum", F.sum("_tok").over(
        Window.partitionBy(group_col).orderBy("_b")))
        .withColumn("_target",
                    wmap[F.col(group_col)].cast("double")
                    * F.lit(float(budget))))
    bound = (cum.filter(F.col("_cum") >= F.col("_target"))
             .groupBy(group_col)
             .agg(F.min("_b").alias("_cb"),
                  F.min_by(F.col("_cum") - F.col("_tok"),
                           F.col("_b")).alias("_before"),
                  F.first("_target").alias("_t"))
             .withColumn("_rem", F.col("_t") - F.col("_before"))
             .select(group_col, "_cb", "_rem"))
    sel = tagged.join(F.broadcast(bound), group_col, "left")
    # phase B: groups that never cross keep everything; inside-cutoff
    # buckets are a row-local filter; the boundary bucket pays the
    # only ordered cumsum, over ~1/B of its group
    full = sel.filter(F.col("_cb").isNull()
                      | (F.col("_b") < F.col("_cb")))
    wb = (Window.partitionBy(group_col)
          .orderBy("_u", F.col(key).cast("string")))
    edge = (sel.filter(F.col("_b") == F.col("_cb"))
            .withColumn("_pc", F.sum(tok).over(wb) - tok)
            .filter(F.col("_pc") < F.col("_rem")))
    return full.select(*cols).unionByName(edge.select(*cols))
