"""Embedding similarity search: exact top-k, LSH-bucketed ANN, IVF ANN.

Exact path: broadcast the (small) query set against the corpus — a
broadcast nested-loop the optimizer keeps map-side, so the corpus is
scanned once with no shuffle; per-pair cosine is a JVM ``zip_with`` +
``aggregate`` fold (no UDF, stays in codegen). Top-k per query is a
window over the (|queries| × k)-bounded candidate set.

ANN path (the 100 TB design): random-hyperplane LSH (Charikar'02) —
``tables`` independent hash tables of ``bits``-bit sign signatures;
query and corpus bucket-join per table, exact cosine only within
buckets. Recall for vectors at angle θ per table ≈ (1 - θ/π)^bits;
multiple tables OR together. Hyperplanes are seeded-deterministic and
shipped as literal arrays (broadcast-variable analog).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization — the 4× storage /
    bandwidth cut that makes a 100 TB embedding store joinable:
    scale = max|x| / 127, q_i = round(x_i / scale) ∈ [-127, 127].
    Returns struct(scale double, q array<int>); all-zero vectors get
    scale 0 and an all-zero q. Pure per-row map, deterministic
    cross-engine (round = half away from zero in Spark and DuckDB)."""
    v = F.transform(vec, lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, F.abs))
    scale = mx / F.lit(127.0)
    q = F.when(mx > 0, F.transform(
        v, lambda x: F.round(x / scale).cast("int"))
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize(qs: Column) -> Column:
    """Reconstruct doubles from a quantize_int8 struct."""
    return F.transform(qs["q"],
                       lambda x: x.cast("double") * qs["scale"])


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _unit(df: DataFrame, id_col: str, id_alias: str, vec_col: str,
          out: str) -> DataFrame:
    """(id_alias, out): vectors cast to double and scaled to unit norm
    once per row — every downstream pair then costs a single dot fold
    instead of dot + two norm folds (|pairs| ≫ |rows|)."""
    return (df.select(F.col(id_col).alias(id_alias),
                      _as_double(vec_col).alias("_v"))
            .withColumn("_n", l2_norm(F.col("_v")))
            .select(id_alias,
                    F.transform("_v", lambda x: x / F.col("_n"))
                    .alias(out)))


def cosine_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                vec_col: str, k: int = 10,
                exclude_self: bool = True) -> DataFrame:
    """Exact brute-force cosine top-k: returns (q, neighbor, cos, rnk).
    Vectors are cast float→double element-wise and pre-normalized before
    arithmetic so results are reproducible against double-precision
    oracles and each pair costs one fold."""
    c = _unit(corpus, id_col, "neighbor", vec_col, "_cv")
    q = _unit(queries, id_col, "q", vec_col, "_qv")
    pairs = c.join(F.broadcast(q),
                   F.col("neighbor") != F.col("q") if exclude_self
                   else F.lit(True))
    scored = pairs.select(
        "q", "neighbor", dot(F.col("_qv"), F.col("_cv")).alias("cos"))
    w = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("neighbor"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def cosine_topk_blocked(corpus: DataFrame, queries: DataFrame,
                        id_col: str, vec_col: str, k: int = 10,
                        exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k, blocked form — the scale path: the query
    set (small by design, same bound as cosine_topk's broadcast)
    ships into an Arrow-batched corpus scan; each batch scores with
    ONE numpy matmul and emits only its LOCAL top-k per query, so the
    global top-k window receives ≤ #batches × |queries| × k narrow
    rows instead of |corpus| × |queries| scored pairs. Same results
    as cosine_topk up to float summation order (matmul accumulates
    SIMD-blocked; the fold accumulates sequentially) — use
    cosine_topk where bit-exact oracle parity of the cosine VALUES
    matters, this form where the top-k SET is the product. Ids must
    be long-castable and non-null (the numpy id vectors require it;
    the fold form has no such constraint)."""
    import pandas as pd
    from pyspark.sql import types as T_

    out_t = T_.StructType([
        T_.StructField("q", T_.LongType()),
        T_.StructField("neighbor", T_.LongType()),
        T_.StructField("cos", T_.DoubleType()),
    ])

    q_rows = (queries.select(F.col(id_col).cast("long").alias("_id"),
                             _as_double(vec_col).alias("_v"))
              .collect())                      # bounded: the query set
    if not q_rows:
        # empty query set: empty result, stable schema (the fold form's
        # behavior)
        return (corpus.sparkSession.createDataFrame([], out_t)
                .withColumn("rnk", F.lit(0).cast("int")))
    if any(r._id is None for r in q_rows):
        raise ValueError(f"{id_col} must be long-castable and non-null "
                         "for the blocked top-k")
    q_ids = np.asarray([r._id for r in q_rows], dtype=np.int64)
    qm = np.asarray([r._v for r in q_rows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue    # empty Arrow batch: norm(axis=1) on a
            #                 (0,)-shaped matrix would raise AxisError
            if pdf["_id"].isna().any():
                raise ValueError(
                    "corpus ids must be long-castable and non-null "
                    "for the blocked top-k")
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            m = np.asarray(pdf["_v"].tolist(), dtype=np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            s = m @ qm.T                       # (n, nq)
            rows = []
            for j in range(len(q_ids)):
                col = s[:, j]
                nbr = ids
                if exclude_self:
                    keep = nbr != q_ids[j]
                    col, nbr = col[keep], nbr[keep]
                if not len(col):
                    continue
                # local top-k with deterministic ties (cos desc,
                # neighbor asc) — global top-k ⊆ union of local top-ks
                order = np.lexsort((nbr, -col))[:k]
                rows.extend((int(q_ids[j]), int(nbr[i]), float(col[i]))
                            for i in order)
            yield pd.DataFrame(rows, columns=["q", "neighbor", "cos"])

    narrow = corpus.select(F.col(id_col).cast("long").alias("_id"),
                           _as_double(vec_col).alias("_v"))
    scored = narrow.mapInPandas(score, out_t)
    w = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("neighbor"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def random_hyperplanes(dim: int, bits: int, tables: int,
                       seed: int = 42) -> list[list[list[float]]]:
    """Deterministic Gaussian hyperplanes [tables][bits][dim]."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, bits, dim)).tolist()


def _sig_matrix(m: "np.ndarray", weights: "np.ndarray",
                packer: "np.ndarray", tables: int, bits: int):
    """(n, dim) → (n, tables) packed sign signatures: one matmul, sign
    bits packed into one long per table (bit i ← plane i)."""
    signs = (m @ weights) >= 0                           # (n, t*b)
    per_tbl = signs.reshape(len(m), tables, bits)
    return (per_tbl * packer).sum(axis=2)                # (n, tables)


def _probe_cube(m: "np.ndarray", weights: "np.ndarray",
                packer: "np.ndarray", tables: int, bits: int,
                probe_bits: int):
    """(n, dim) → (n, tables, 2^probe_bits) query-directed multi-probe
    signatures (Lv et al., VLDB'07 §4): per table, the exact bucket plus
    every subset of flips over the ``probe_bits`` LOWEST-|margin| planes
    — the planes whose projection was closest to zero, i.e. exactly the
    sign bits a true near neighbor is most likely to differ on.
    2^probe_bits probe signatures per table instead of bits+1 exhaustive
    Hamming-1 probes, with nearly all of the Hamming-1 recall mass
    (high-margin flips almost never rescue a neighbor)."""
    proj = (m @ weights).reshape(len(m), tables, bits)
    packed = ((proj >= 0) * packer).sum(axis=2)          # (n, t)
    order = np.argsort(np.abs(proj), axis=2)[:, :, :probe_bits]
    # perturbation masks over the probe_bits lowest-margin bit *slots*:
    # all 2^probe_bits subsets, exact bucket (mask 0) first
    subsets = np.arange(1 << probe_bits)
    # flip masks: for subset s, XOR of (1<<order[..., j]) for j in s
    flips = np.zeros((len(m), tables, len(subsets)), dtype=np.int64)
    for j in range(probe_bits):
        bitmask = ((subsets >> j) & 1).astype(bool)      # (2^pb,)
        flips[:, :, bitmask] ^= (1 << order[:, :, j])[:, :, None]
    return packed[:, :, None] ^ flips                    # (n, t, 2^pb)


def _signatures_udf(planes_flat: "np.ndarray", tables: int, bits: int):
    """Arrow-batched sign-signature computation: one numpy matmul per
    batch ((batch × dim) @ (dim × tables·bits)) via _sig_matrix.
    ~1000× fewer expression nodes than unrolled JVM folds, and the
    matmul is the realistic vectorized path at scale."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    weights = np.ascontiguousarray(planes_flat.T)      # (dim, tables*bits)
    packer = (1 << np.arange(bits, dtype=np.int64))    # bit i ← plane i

    def sigs(vecs):
        m = np.asarray(vecs.tolist(), dtype=np.float64)      # (n, dim)
        return pd.Series(list(_sig_matrix(m, weights, packer,
                                          tables, bits)))

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf's signature inspection rejects — attach real objects.
    sigs.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(sigs, "array<long>")


def _probe_sigs_udf(planes_flat: "np.ndarray", tables: int, bits: int,
                    probe_bits: int):
    """Arrow-batched query-directed multi-probe signatures — _probe_cube
    per batch; one matmul + argsort."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    weights = np.ascontiguousarray(planes_flat.T)      # (dim, tables*bits)
    packer = (1 << np.arange(bits, dtype=np.int64))

    def probes(vecs):
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        return pd.Series(list(_probe_cube(m, weights, packer,
                                          tables, bits, probe_bits)))

    probes.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(probes, "array<array<long>>")


def ann_lsh_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                 vec_col: str, k: int = 10, bits: int = 12,
                 tables: int = 8, dim: int | None = None,
                 seed: int = 42, exclude_self: bool = True,
                 probe_radius: int = 0,
                 probe_bits: int | None = None) -> DataFrame:
    """Approximate top-k: per-table signature bucket join, exact cosine
    on candidates only. Corpus signatures are one narrow projection —
    at scale they'd be precomputed and bucket-partitioned on write.

    Multi-probe LSH (Lv et al., VLDB'07): each query probes its exact
    bucket PLUS nearby buckets per table, so equal recall needs ~4-5×
    fewer tables — the corpus-side signature volume (the expensive
    side: n rows × tables) shrinks by that factor while the probe
    fan-out lands on the tiny broadcast query side. Two modes:

    - ``probe_bits=p`` (preferred): query-directed — flip only subsets
      of the p lowest-|margin| sign bits (2^p probes/table), the bits a
      near neighbor actually differs on. p=2 ≈ Hamming-1 recall at
      ~half the fan-out.
    - ``probe_radius=1``: exhaustive Hamming-1 (bits+1 probes/table),
      kept as the margin-blind baseline.

    The corpus is scanned ONCE and never shuffled: the scan computes
    signatures and the unit vector together, the bucket join broadcasts
    the tiny probe side (with unit query vectors attached), and cosine
    is scored inline on the map side. A (q, neighbor) pair surfacing
    from multiple tables/probes scores the identical cosine, so the
    groupBy that dedups pairs is the first (and only) shuffle before
    the per-query top-k window — both move narrow scored pairs, never
    embedding payloads. This assumes the per-batch query set fits a
    broadcast (the stated small-query-set design); for huge query sets
    drop the broadcast hint and Spark falls back to a shuffle join.

    (Measured dead end, kept out on purpose: computing query-side probe
    signatures driver-side from a bounded collect and shipping them as
    a local relation was ~0.3 s SLOWER per call at bench scale — the
    eager collect job is not overlapped with anything, while the
    distributed probe build it replaces rides the same job as the
    broadcast exchange. Interleaved A/B, min-of-5: 1.33 s distributed
    vs 1.62 s collected.)"""
    if probe_radius not in (0, 1):
        raise ValueError("probe_radius supports 0 (exact bucket) or 1 "
                         "(all single-bit flips)")
    if probe_bits is not None and not (0 < probe_bits <= bits):
        raise ValueError("probe_bits must be in (0, bits]")
    if probe_bits is not None and probe_radius != 0:
        raise ValueError("probe_bits and probe_radius are mutually "
                         "exclusive probing modes — pass one")
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = np.asarray(random_hyperplanes(dim, bits, tables, seed))
    flat = planes.reshape(tables * bits, dim)
    sig_udf = _signatures_udf(flat, tables, bits)

    # single corpus scan: signatures + unit vector together; posexplode
    # replicates the vector tables× in the map-side stream only (never
    # shuffled — the bucket join below broadcasts the other side)
    cs = (_unit(corpus, id_col, "neighbor", vec_col, "_cv")
          .select("neighbor", "_cv",
                  F.posexplode(sig_udf(F.col("_cv")))
                  .alias("tbl", "sig")))
    qv = _unit(queries, id_col, "q", vec_col, "_qv")
    if probe_bits is not None:
        probe_udf = _probe_sigs_udf(flat, tables, bits, probe_bits)
        qs = (qv.select("q", "_qv",
                        F.posexplode(probe_udf(F.col("_qv")))
                        .alias("tbl", "_sigs"))
              .select("q", "_qv", "tbl", F.explode("_sigs").alias("sig")))
    else:
        qs = qv.select("q", "_qv",
                       F.posexplode(sig_udf(F.col("_qv")))
                       .alias("tbl", "sig"))
        if probe_radius == 1:
            flips = F.array(F.col("sig"), *[
                F.col("sig").bitwiseXOR(F.lit(1 << j))
                for j in range(bits)])
            qs = qs.select("q", "_qv", "tbl",
                           F.explode(flips).alias("sig"))
    # bucket join + inline cosine: a pair surfacing from multiple
    # tables/probes scores the identical value, so max() under the
    # pair-dedup groupBy is exact, not an approximation
    scored = (cs.join(F.broadcast(qs), ["tbl", "sig"])
              .filter(F.col("neighbor") != F.col("q") if exclude_self
                      else F.lit(True))
              .select("q", "neighbor",
                      dot(F.col("_qv"), F.col("_cv")).alias("cos"))
              .groupBy("q", "neighbor").agg(F.max("cos").alias("cos")))
    w = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("neighbor"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def _cells_udf(cents: "np.ndarray", nprobe: int):
    """Arrow-batched cell selection against unit centroids: one matmul
    per batch, argmax (nprobe=1 → int cell) or top-nprobe cells ordered
    (score desc, cell asc) so ties are deterministic."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    weights = np.ascontiguousarray(cents.T)            # (dim, n_cells)
    idx = np.arange(cents.shape[0])

    def cells(vecs):
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        scores = m @ weights                           # (n, n_cells)
        if nprobe == 1:
            return pd.Series(scores.argmax(axis=1).astype("int32"))
        out = []
        for row in scores:
            order = np.lexsort((idx, -row))            # desc score, asc cell
            out.append(order[:nprobe].astype("int32"))
        return pd.Series(out)

    cells.__annotations__ = {"vecs": pd.Series,
                             "return": pd.Series}
    return pandas_udf(cells, "int" if nprobe == 1 else "array<int>")


def ivf_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, k: int = 10, n_cells: int = 16,
             nprobe: int = 4, exclude_self: bool = True,
             centroids: "np.ndarray | None" = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``n_cells`` Voronoi cells around unit centroids, probe only the
    ``nprobe`` best cells per query, exact cosine within probed cells.

    Default centroids are the first ``n_cells`` corpus vectors by id —
    deterministic, so the result is exactly reproducible by a SQL oracle
    (an IVF index is approximate by construction but not random). Pass
    ``centroids`` (an (n_cells, dim) array, e.g. the driver-state
    output of ``operators/clustering.py:kmeans``) for the trained
    variant used at scale, where centroids are a persisted model
    artifact; cell assignment is one narrow matmul pass and the cell id
    becomes the partition key on write, so a query's probe touches
    nprobe/n_cells of the corpus (the IVF-flat layout, Johnson et al.,
    "Billion-scale similarity search with GPUs", 2017).

    Same single-scan shape as ann_lsh_topk: the corpus scan computes
    the cell id and unit vector together, the probe side broadcasts
    with its unit query vectors attached, cosine scores inline — the
    corpus never shuffles; the only exchange is the per-query top-k
    window. Cell assignment is scale-invariant (argmax of dot against
    UNIT centroids), so assigning from the unit vector is identical to
    assigning from the raw one."""
    if centroids is None:
        cents_rows = (corpus.filter(F.col(id_col) < n_cells)
                      .select(F.col(id_col).alias("_cid"),
                              _as_double(vec_col).alias("_v"))
                      .collect())                      # bounded by n_cells
        centroids = np.asarray([r._v for r in
                                sorted(cents_rows, key=lambda r: r._cid)])
    cents = np.asarray(centroids, dtype=np.float64)
    if cents.shape[0] != n_cells:
        raise ValueError(f"centroids rows {cents.shape[0]} != {n_cells}")
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    assign = _cells_udf(cents, 1)
    probe = _cells_udf(cents, nprobe)
    corpus_cells = (_unit(corpus, id_col, "neighbor", vec_col, "_cv")
                    .select("neighbor", "_cv",
                            assign(F.col("_cv")).alias("cell")))
    qv = _unit(queries, id_col, "q", vec_col, "_qv")
    probes = qv.select(
        "q", "_qv", F.explode(probe(F.col("_qv"))).alias("cell"))
    # a vector lives in exactly one cell and probes are distinct cells,
    # so (q, neighbor) pairs are already unique — no dedup shuffle
    scored = (corpus_cells.join(F.broadcast(probes), "cell")
              .filter(F.col("neighbor") != F.col("q") if exclude_self
                      else F.lit(True))
              .select("q", "neighbor",
                      dot(F.col("_qv"), F.col("_cv")).alias("cos")))
    w = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("neighbor"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


# ---------------------------------------------------------------------------
# persisted IVF index: the cell-partitioned layout the docstrings promise

def _model_meta(path: str, meta_store):
    """Resolve the MetadataStore for an index's MODEL artifacts
    (``_centroids.json`` / ``_pq_books.json``) — the manifest seam
    applied to the persisted ANN indexes (r16, the sigstore/DSIR-store
    port's sibling): the records ride ``put``/``read_if_exists``, so
    an object-store index passes an ``ObjectMetadataStore`` and the
    model lives beside the data (parquet IO already resolves URIs
    through Spark/pyarrow's own filesystems). Default POSIX; a URI
    path without an explicit store refuses loudly."""
    from rakam_api_collector_spark.manifest import resolve_meta_store
    return resolve_meta_store(path, meta_store, "index model")


def _read_model(meta, path: str, name: str) -> "np.ndarray":
    import json

    raw = meta.read_if_exists(f"{path}/{name}")
    if raw is None:
        raise FileNotFoundError(f"{path}/{name}")
    return np.asarray(json.loads(raw), dtype=np.float64)


def _write_model(meta, path: str, name: str, arr) -> None:
    import json

    meta.put(f"{path}/{name}", json.dumps(np.asarray(arr).tolist()))


def build_ivf_index(corpus: DataFrame, id_col: str, vec_col: str,
                    path: str, n_cells: int = 16,
                    centroids: "np.ndarray | None" = None,
                    meta_store=None) -> None:
    """Materialize the IVF-flat layout: unit vectors written as parquet
    PARTITIONED BY cell id, centroids saved beside the data
    (``_centroids.json``). This is the pay-once step that turns probing
    into physical partition pruning — a search for nprobe cells reads
    nprobe/n_cells of the files, enforced by the storage layout rather
    than a runtime filter over everything."""
    meta = _model_meta(path, meta_store)
    if centroids is None:
        rows = (corpus.filter(F.col(id_col) < n_cells)
                .select(F.col(id_col).alias("_cid"),
                        _as_double(vec_col).alias("_v")).collect())
        centroids = np.asarray([r._v for r in
                                sorted(rows, key=lambda r: r._cid)])
    cents = np.asarray(centroids, dtype=np.float64)
    if cents.shape[0] != n_cells:
        raise ValueError(f"centroids rows {cents.shape[0]} != {n_cells}")
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    assign = _cells_udf(cents, 1)
    (_unit(corpus, id_col, "neighbor", vec_col, "_cv")
     .withColumn("cell", assign(F.col("_cv")))
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    _write_model(meta, path, "_centroids.json", cents)


def append_to_ivf_index(corpus: DataFrame, id_col: str, vec_col: str,
                        path: str, meta_store=None) -> None:
    """Incremental index maintenance: assign NEW vectors to cells with
    the index's PERSISTED centroids and append them partition-wise —
    the ingest path never re-reads or rewrites existing index files
    (the sigstore incremental rule applied to ANN). Cell membership
    stays exactly what build-time assignment would give, so searches
    over the grown index keep the nprobe/n_cells read fraction.
    Centroid drift is the operator's responsibility: retrain + rebuild
    when the corpus distribution moves (the IVF-flat convention).

    Appends are at-least-once (plain ``mode("append")``): a retried
    append lands the same vectors twice. ``ivf_index_topk`` collapses
    duplicate (q, neighbor) pairs before ranking so retries degrade
    storage, never result correctness; run periodic rebuilds (or an
    exact-dedup pass on ids) to reclaim the space."""
    cents = _read_model(_model_meta(path, meta_store), path,
                        "_centroids.json")
    assign = _cells_udf(cents, 1)
    (_unit(corpus, id_col, "neighbor", vec_col, "_cv")
     .withColumn("cell", assign(F.col("_cv")))
     .write.mode("append").partitionBy("cell").parquet(path))


def ivf_index_topk(spark, path: str, queries: DataFrame, id_col: str,
                   vec_col: str, k: int = 10, nprobe: int = 4,
                   exclude_self: bool = True,
                   meta_store=None) -> DataFrame:
    """Search a ``build_ivf_index`` table: probe cells are computed for
    the query batch, their union (bounded by |queries|·nprobe ≤
    n_cells) becomes a PARTITION FILTER on the index scan — unprobed
    cells' files are never opened — and scoring is the same broadcast
    + inline-cosine + top-k window shape as ivf_topk."""
    cents = _read_model(_model_meta(path, meta_store), path,
                        "_centroids.json")
    probe = _cells_udf(cents, nprobe)
    qv = _unit(queries, id_col, "q", vec_col, "_qv")
    probes = qv.select("q", "_qv",
                       F.explode(probe(F.col("_qv"))).alias("cell"))
    # bounded driver collect: ≤ n_cells distinct probed cells
    cells = [r.cell for r in probes.select("cell").distinct().collect()]
    idx = (spark.read.parquet(path)
           .filter(F.col("cell").isin(cells))
           .withColumn("cell", F.col("cell").cast("int")))
    scored = (idx.join(F.broadcast(probes), "cell")
              .filter(F.col("neighbor") != F.col("q") if exclude_self
                      else F.lit(True))
              .select("q", "neighbor",
                      dot(F.col("_qv"), F.col("_cv")).alias("cos"))
              # duplicate ids (an at-least-once append retry) score the
              # identical cosine — collapse them so a duplicate cannot
              # occupy two of the k result slots; same max-under-dedup
              # rule as ann_lsh_topk, and the groupBy rides the shuffle
              # the top-k window needs anyway
              .groupBy("q", "neighbor").agg(F.max("cos").alias("cos")))
    w = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("neighbor"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


# ---------------------------------------------------------------------------
# product quantization: IVF-PQ, the billion-scale memory shape

def train_pq_codebooks(corpus: DataFrame, id_col: str, vec_col: str,
                       *, m: int = 4, nbits: int = 4,
                       iters: int = 2,
                       init_vecs: "list[list[float]] | None" = None
                       ) -> "np.ndarray":
    """(m, 2^nbits, dim/m) PQ codebooks (Jégou et al., "Product
    quantization for nearest neighbor search", TPAMI 2011): split each
    UNIT vector into ``m`` subvectors and k-means each subspace
    independently (``operators/clustering.py`` — deterministic first-k
    init, so the trained model is reproducible). Driver state is
    m × 2^nbits × dim/m floats — a model artifact, like IVF centroids.

    Why PQ at 100 TB: a float64 embedding column is dim×8 bytes/row;
    PQ codes are m bytes/row (dim=16, m=4 → 32× smaller), and ADC
    scoring needs only the codes — the full vectors never leave the
    training/encode passes.

    All ``m`` subspace k-means run FUSED: the subspaces are
    independent, so one job per Lloyd iteration computes every
    subspace's assignment and one aggregate yields all
    m × 2^nbits × dim/m decimal-exact means. Total Spark jobs:
    1 init collect + ``iters`` update collects — the corpus is
    scanned ``iters`` times, not ``m × iters`` times (the
    per-subspace loop was measured at ~50 sequential driver-
    round-trip jobs for m=16, a 10× wall-clock tax locally and a
    10× corpus-rescan tax on a cluster).

    The assignment step IS ``_pq_encode_udf`` — the same Arrow-
    vectorized numpy argmin the encode pass uses (FAISS trains PQ the
    same way: batched matmul against the codebooks). Besides being
    ~10× faster than a 256-HOF Catalyst expression tree (whose
    optimizer/codegen time dominated the measured 18 s), it makes
    training assignment and encoding share ONE argmin definition, so
    a vector can never train into cell A and encode into cell B at an
    FP tie. The means stay JVM-side decimal(28,12)-exact with the
    clustering.py round-to-6 rule; empty cells keep old centroids.

    Determinism contract (r9 advice, documented by design): the model
    artifact is MACHINE-LOCAL-deterministic. The E-step argmin runs
    through BLAS (``-2·sub@books.T``), whose SIMD-blocked reduction
    order is fixed on one platform but may differ across BLAS builds,
    so a near-tie assignment — and hence the trained codebooks — can
    diverge in the last ulp across machines; additionally the encoder
    re-normalizes the already-unit Spark vectors, so assignment sees
    ulp-different values than the decimal M-step means. Within one
    session/platform the artifact is bit-stable (pinned by
    test_similarity's same-session equality), which is what the
    train-once / persist / encode-many lifecycle needs — recall gates
    (llm49) certify the INDEX's behavior, never codebook bytes. If a
    future consumer needs cross-machine byte-parity, swap the E-step
    to a fixed-order reduction (``((sub[:,None,:]-books[j])**2)
    .sum(-1)``) and skip the re-normalization for pre-normalized
    input — at ~k× the encode FLOPs."""
    k = 1 << nbits
    unit = _unit(corpus, id_col, "_id", vec_col, "_v")
    if init_vecs is None:
        init_rows = (unit.orderBy("_id").limit(k)
                     .select(F.transform(
                         F.col("_v"),
                         lambda x: F.round(x, 6)).alias("_v")).collect())
        init_vecs = [list(r["_v"]) for r in init_rows]
    else:
        # pre-collected first-k rounded unit vectors (callers that also
        # need coarse centroids fuse both reads into ONE head collect —
        # ivf_pq_topk; guide §2.4: one fewer sequential driver job)
        init_vecs = [list(v) for v in init_vecs[:k]]
    if len(init_vecs) < k:
        raise ValueError(f"corpus smaller than 2^nbits={k}")
    # dim comes from the init collect itself — a separate first() probe
    # was one more sequential driver job / corpus pass (guide §2.4)
    dim = len(init_vecs[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # slicing the rounded full vector == rounding the slice: round is
    # elementwise, so this init is bit-identical to the per-subspace
    # orderBy/limit/round collect it replaces
    books = [[v[j * dsub:(j + 1) * dsub]
              for v in init_vecs] for j in range(m)]
    # materialize the normalized frame ONCE for the Lloyd iterations
    # (r19, guide §2.4/§5): each iteration re-ran scan + normalize
    # from lineage — ``iters`` corpus passes where one suffices. Lazy:
    # iteration 1's aggregate is the materializing job (no extra
    # sequential job); placed AFTER the init collect so the default
    # path's bounded orderBy/limit head read stays on raw lineage
    # (a checkpoint below a limit would materialize the whole corpus
    # to serve k rows). Local wall flat at sf0.1 (min-of-3 4.15 vs
    # 4.12 s in-suite) — kept for the at-scale scan-count reduction.
    unit = unit.localCheckpoint(eager=False)
    for _ in range(iters):
        enc = _pq_encode_udf(np.asarray(books, dtype=np.float64))
        assigned = unit.select(enc(F.col("_v")).alias("_codes"), "_v")
        per_j = F.array(*[
            F.struct(F.lit(j).alias("j"),
                     F.element_at("_codes", j + 1).alias("cl"),
                     F.slice("_v", j * dsub + 1, dsub).alias("s"))
            for j in range(m)])
        rows = (assigned.select(F.explode(per_j).alias("e"))
                .select("e.j", "e.cl",
                        F.posexplode("e.s").alias("pos", "val"))
                .groupBy("j", "cl", "pos")
                .agg((F.sum(F.col("val").cast("decimal(28,12)"))
                      .cast("double") / F.count("*")).alias("m"))
                .collect())               # m * 2^nbits * dsub — bounded
        by_cell: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            by_cell.setdefault((r["j"], r["cl"]), {})[r["pos"]] = \
                round(r["m"], 6)
        for (j, cl), by_pos in by_cell.items():
            books[j][cl] = [by_pos[p] for p in sorted(by_pos)]
    return np.asarray(books, dtype=np.float64)


def _pq_encode_udf(books: "np.ndarray"):
    """Vectorized encoder: per Arrow batch, per subspace, argmin
    distance to the 2^nbits codebook entries."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, _k, dsub = books.shape

    def enc(vecs):
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        if mat.size == 0:
            return pd.Series([])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1,
                                              keepdims=True), 1e-30)
        codes = np.empty((mat.shape[0], m), dtype=np.int64)
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            # ||x - c||² = ||x||² - 2x·c + ||c||²; argmin over c
            d = -2.0 * sub @ books[j].T \
                + (books[j] ** 2).sum(axis=1)[None, :]
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf's signature inspection rejects — attach real objects.
    enc.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(enc, "array<int>")


def pq_encode(corpus: DataFrame, id_col: str, vec_col: str,
              books: "np.ndarray") -> DataFrame:
    """(id, codes array<int>) — the m-byte representation ADC scores
    against. Map-only (one Arrow pass, no shuffle)."""
    enc = _pq_encode_udf(books)
    return (corpus.select(F.col(id_col).alias("_id"),
                          _as_double(vec_col).alias("_v"))
            .select("_id", enc(F.col("_v")).alias("codes")))


def _pq_lut_udf(books: "np.ndarray"):
    """Per-query ADC lookup table, flattened to m*2^nbits doubles:
    lut[j*K + c] = q_sub_j · codebook[j][c], so the approximate cosine
    of a coded neighbor is a pure table-lookup sum."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, k, dsub = books.shape

    def lut(vecs):
        out = []
        for v in vecs:
            q = np.asarray(v, dtype=np.float64)
            q = q / max(np.linalg.norm(q), 1e-30)
            t = np.empty(m * k)
            for j in range(m):
                t[j * k:(j + 1) * k] = \
                    books[j] @ q[j * dsub:(j + 1) * dsub]
            out.append(t)
        return pd.Series(out)

    lut.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(lut, "array<double>")


def _adc_expr(codes: Column, lut: Column, m: int, kk: int) -> Column:
    """Asymmetric-distance score: sum over subspaces j of
    lut[j*kk + code_j] — pure Catalyst (aggregate + element_at), the
    single definition both the in-memory and persisted searches use
    so the 1-based index arithmetic can never drift between them."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(int(m) - 1)), F.lit(0.0),
        lambda acc, j: acc + F.element_at(
            lut, (j * kk + F.element_at(codes, j + 1) + 1)
            .cast("int")))


def _topk_with_rerank(scored: DataFrame, k: int,
                      rerank_factor: int | None) -> DataFrame:
    """Rank by ADC score; with rerank, keep the top r·k per query and
    re-rank ONLY those by the exact cosine of the carried vectors."""
    w = Window.partitionBy("q").orderBy(F.desc("score"),
                                       F.asc("neighbor"))
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    if not rerank_factor:
        return ranked.filter(F.col("rnk") <= k).drop("rnk")
    cand = (ranked.filter(F.col("rnk") <= k * rerank_factor)
            .select("q", "neighbor",
                    dot(F.col("_qv"), F.col("_cv")).alias("score")))
    w2 = Window.partitionBy("q").orderBy(F.desc("score"),
                                        F.asc("neighbor"))
    return (cand.withColumn("rnk", F.row_number().over(w2))
            .filter(F.col("rnk") <= k).drop("rnk"))


def ivf_pq_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                vec_col: str, k: int = 10, n_cells: int = 16,
                nprobe: int = 4, m: int = 4, nbits: int = 4,
                books: "np.ndarray | None" = None,
                centroids: "np.ndarray | None" = None,
                exclude_self: bool = True,
                rerank_factor: int | None = None) -> DataFrame:
    """IVF-PQ (the FAISS IVFADC layout, Jégou'11 §IV): coarse IVF
    cells bound WHICH neighbors are scored, PQ codes bound WHAT is
    read per neighbor, and the asymmetric-distance score is a pure
    JVM expression — ``aggregate(sequence(0, m-1), ...)`` summing
    ``element_at(lut, j*K + code_j + 1)`` — so the scoring hot path
    touches m bytes per candidate, never the vector, with no Python.

    Plan shape (the 100 TB property, same as ivf_topk): ONE corpus
    scan computes cell + codes; probes broadcast with their per-query
    LUTs attached; the only exchange is the per-query top-k window.
    Python appears exactly twice, in bounded places: encoding the
    corpus (one Arrow pass) and building |queries| LUTs.

    Approximation stacks IVF recall × PQ distance distortion;
    ``rerank_factor=r`` adds the standard two-stage serve path
    (FAISS's refine step): ADC keeps the top r·k candidates per
    query, and ONLY those are scored with the exact cosine against
    the true vector (carried through the cell join, never shuffled on
    its own) — boundary exactness at r·k exact scores per query
    instead of |cell| ones."""
    if books is None and centroids is None:
        # both defaults read the same corpus head (first 2^nbits rows by
        # id for PQ init, ids < n_cells for coarse centroids): ONE
        # bounded head collect serves both instead of two sequential
        # driver jobs over the corpus (guide §2.4). The rounded unit
        # expression round(x/_n, 6) is value-identical to the nested
        # transform(unit)∘round the separate init collect computed.
        kk0 = 1 << nbits
        head = (corpus.select(F.col(id_col).alias("_cid"),
                              _as_double(vec_col).alias("_v"))
                .withColumn("_n", l2_norm(F.col("_v")))
                .select("_cid", "_v",
                        F.transform("_v",
                                    lambda x: F.round(x / F.col("_n"), 6))
                        .alias("_u"))
                .orderBy("_cid").limit(max(kk0, n_cells)).collect())
        head = sorted(head, key=lambda r: r._cid)
        books = train_pq_codebooks(
            corpus, id_col, vec_col, m=m, nbits=nbits,
            init_vecs=[list(r._u) for r in head])
        cents_rows = [r for r in head if r._cid < n_cells]
        centroids = np.asarray([r._v for r in cents_rows])
    if books is None:
        books = train_pq_codebooks(corpus, id_col, vec_col,
                                   m=m, nbits=nbits)
    m, kk, _dsub = books.shape
    if centroids is None:
        cents_rows = (corpus.filter(F.col(id_col) < n_cells)
                      .select(F.col(id_col).alias("_cid"),
                              _as_double(vec_col).alias("_v"))
                      .collect())                  # bounded by n_cells
        centroids = np.asarray([r._v for r in
                                sorted(cents_rows, key=lambda r: r._cid)])
    cents = np.asarray(centroids, dtype=np.float64)
    if cents.ndim != 2 or cents.shape[0] != n_cells:
        raise ValueError(
            f"centroids rows {cents.shape[0] if cents.ndim == 2 else 0}"
            f" != n_cells={n_cells} (corpus ids must cover "
            f"0..{n_cells - 1} for the deterministic default)")
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    assign = _cells_udf(cents, 1)
    probe = _cells_udf(cents, nprobe)
    enc = _pq_encode_udf(books)
    lut = _pq_lut_udf(books)

    keep_vec = ["_cv"] if rerank_factor else []
    corpus_cells = (_unit(corpus, id_col, "neighbor", vec_col, "_cv")
                    .select("neighbor",
                            assign(F.col("_cv")).alias("cell"),
                            enc(F.col("_cv")).alias("_codes"),
                            *keep_vec))
    qv = _unit(queries, id_col, "q", vec_col, "_qv")
    probes = (qv.select("q", lut(F.col("_qv")).alias("_lut"),
                        *(["_qv"] if rerank_factor else []),
                        F.explode(probe(F.col("_qv"))).alias("cell")))

    adc = _adc_expr(F.col("_codes"), F.col("_lut"), m, kk)
    scored = (corpus_cells.join(F.broadcast(probes), "cell")
              .filter(F.col("neighbor") != F.col("q") if exclude_self
                      else F.lit(True))
              .select("q", "neighbor", adc.alias("score"),
                      *(["_qv", "_cv"] if rerank_factor else [])))
    return _topk_with_rerank(scored, k, rerank_factor)


# ---------------------------------------------------------------------------
# persisted IVF-PQ: cell-partitioned CODES — the layout where both the
# read fraction (nprobe/n_cells via partition pruning) and the bytes
# per read row (m codes vs dim×8) shrink

def build_ivf_pq_index(corpus: DataFrame, id_col: str, vec_col: str,
                       path: str, n_cells: int = 16, m: int = 4,
                       nbits: int = 4,
                       centroids: "np.ndarray | None" = None,
                       books: "np.ndarray | None" = None,
                       store_vectors: bool = False,
                       meta_store=None) -> None:
    """Materialize the IVFADC layout: PQ codes written as parquet
    PARTITIONED BY cell, model artifacts (coarse centroids + PQ
    codebooks) saved beside the data. A search reads nprobe/n_cells of
    the files AND only m bytes of payload per row — the two
    compressions multiply. ``store_vectors=True`` additionally keeps
    the unit vector per row for index-local exact rerank (trading the
    32× size win for refine locality; the codes-only default is the
    memory shape that motivates PQ)."""
    meta = _model_meta(path, meta_store)
    if centroids is None and books is None:
        # one bounded head collect serves both model defaults — the
        # same fusion as ivf_pq_topk (guide §2.4: one fewer sequential
        # driver job on the rebuild path)
        kk0 = 1 << nbits
        head = (corpus.select(F.col(id_col).alias("_cid"),
                              _as_double(vec_col).alias("_v"))
                .withColumn("_n", l2_norm(F.col("_v")))
                .select("_cid", "_v",
                        F.transform("_v",
                                    lambda x: F.round(x / F.col("_n"), 6))
                        .alias("_u"))
                .orderBy("_cid").limit(max(kk0, n_cells)).collect())
        head = sorted(head, key=lambda r: r._cid)
        books = train_pq_codebooks(
            corpus, id_col, vec_col, m=m, nbits=nbits,
            init_vecs=[list(r._u) for r in head])
        centroids = np.asarray(
            [r._v for r in head if r._cid < n_cells])
    if centroids is None:
        rows = (corpus.filter(F.col(id_col) < n_cells)
                .select(F.col(id_col).alias("_cid"),
                        _as_double(vec_col).alias("_v")).collect())
        centroids = np.asarray([r._v for r in
                                sorted(rows, key=lambda r: r._cid)])
    cents = np.asarray(centroids, dtype=np.float64)
    if cents.shape[0] != n_cells:
        raise ValueError(f"centroids rows {cents.shape[0]} != {n_cells}")
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    if books is None:
        books = train_pq_codebooks(corpus, id_col, vec_col,
                                   m=m, nbits=nbits)
    assign = _cells_udf(cents, 1)
    enc = _pq_encode_udf(books)
    cols = ["neighbor", "codes", "cell"] + (
        ["_cv"] if store_vectors else [])
    (_unit(corpus, id_col, "neighbor", vec_col, "_cv")
     .withColumn("cell", assign(F.col("_cv")))
     .withColumn("codes", enc(F.col("_cv")))
     .select(*cols)
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    for name, arr in (("_centroids.json", cents), ("_pq_books.json",
                                                   books)):
        _write_model(meta, path, name, arr)


def append_to_ivf_pq_index(corpus: DataFrame, id_col: str,
                           vec_col: str, path: str,
                           meta_store=None) -> None:
    """Incremental IVFADC maintenance: encode NEW vectors with the
    index's PERSISTED model artifacts (coarse centroids + PQ
    codebooks) and append them partition-wise — the ingest path never
    re-reads or rewrites existing index files, so the nprobe/n_cells
    read fraction and the m-byte payload hold over the grown index.
    Appending never updates the model: that is the standard FAISS
    add-with-fixed-codebooks contract (Jégou'11 IVFADC) — retrain +
    rebuild when the corpus distribution drifts, exactly as
    ``append_to_ivf_index`` documents for the flat layout.

    The appended rows MATCH the built layout: the stored-vector column
    is introspected from the existing index schema, so a
    ``store_vectors=True`` index keeps exact-rerank capability over
    appended rows (a codes-only append into such an index would
    silently exempt new rows from the refine stage — and break the
    scan with a ragged schema).

    Appends are at-least-once (plain ``mode("append")``): a retried
    append lands the same codes twice. ``ivf_pq_index_topk`` collapses
    duplicate (q, neighbor) pairs before ranking, so retries degrade
    storage, never result correctness."""
    meta = _model_meta(path, meta_store)
    cents = _read_model(meta, path, "_centroids.json")
    books = _read_model(meta, path, "_pq_books.json")
    store_vectors = "_cv" in corpus.sparkSession.read.parquet(
        path).columns
    assign = _cells_udf(cents, 1)
    enc = _pq_encode_udf(books)
    cols = ["neighbor", "codes", "cell"] + (
        ["_cv"] if store_vectors else [])
    (_unit(corpus, id_col, "neighbor", vec_col, "_cv")
     .withColumn("cell", assign(F.col("_cv")))
     .withColumn("codes", enc(F.col("_cv")))
     .select(*cols)
     .write.mode("append").partitionBy("cell").parquet(path))


def ivf_pq_index_topk(spark, path: str, queries: DataFrame,
                      id_col: str, vec_col: str, k: int = 10,
                      nprobe: int = 4, exclude_self: bool = True,
                      rerank_factor: int | None = None,
                      meta_store=None) -> DataFrame:
    """Search a ``build_ivf_pq_index`` table: probed cells become a
    physical PartitionFilter (unprobed files never open), ADC scoring
    is the same JVM aggregate-over-lookups as ivf_pq_topk, and
    ``rerank_factor`` refines against the stored unit vectors (raises
    if the index was built codes-only — refusing beats silently
    returning unrefined results under the caller's exactness
    assumption)."""
    meta = _model_meta(path, meta_store)
    cents = _read_model(meta, path, "_centroids.json")
    books = _read_model(meta, path, "_pq_books.json")
    m, kk, _dsub = books.shape
    probe = _cells_udf(cents, nprobe)
    lut = _pq_lut_udf(books)
    qv = _unit(queries, id_col, "q", vec_col, "_qv")
    probes = (qv.select("q", lut(F.col("_qv")).alias("_lut"),
                        *(["_qv"] if rerank_factor else []),
                        F.explode(probe(F.col("_qv"))).alias("cell")))
    # the distinct-cells collect runs a CHEAP projection (cell udf
    # only) so the heavier per-query LUT udf evaluates exactly once,
    # inside the join
    cells = [r.cell for r in
             qv.select(F.explode(probe(F.col("_qv"))).alias("cell"))
             .distinct().collect()]
    idx = (spark.read.parquet(path)
           .filter(F.col("cell").isin(cells)))
    if rerank_factor and "_cv" not in idx.columns:
        raise ValueError("index was built codes-only "
                         "(store_vectors=False) — rerank needs the "
                         "stored vectors")
    adc = _adc_expr(F.col("codes"), F.col("_lut"), m, kk)
    scored = (idx.join(F.broadcast(probes), "cell")
              .filter(F.col("neighbor") != F.col("q") if exclude_self
                      else F.lit(True))
              .select("q", "neighbor", adc.alias("score"),
                      *(["_qv", "_cv"] if rerank_factor else []))
              # at-least-once append retries collapse (same rule as
              # ivf_index_topk) — identical codes score identically
              .groupBy("q", "neighbor",
                       *(["_qv", "_cv"] if rerank_factor else []))
              .agg(F.max("score").alias("score")))
    return _topk_with_rerank(scored, k, rerank_factor)


# ---------------------------------------------------------------------------
# index maintenance: cell-balance audit + retrain/rebuild (r16)

def ivf_cell_stats(path: str, meta_store=None, spark=None,
                   parallel_threshold: int = 4096) -> dict:
    """Cell-balance audit of a persisted IVF / IVF-PQ index from
    parquet FOOTERS alone — no data pages, no Spark job: per-cell row
    counts, max, median (over ALL cells, empty ones included), and
    ``imbalance`` = max/median.

    Why this exists: persisted indexes FREEZE their centroids by
    design (the Jégou'11 IVFADC contract — re-assigning old vectors on
    every append would rewrite the index), so at stream scale a
    drifted corpus silently piles new vectors into a few hot cells.
    Recall then degrades without any error: nprobe cells no longer
    cover the distribution, and the probed-cell read fraction grows
    past nprobe/n_cells. This function turns the documented
    retrain+rebuild contract into an OPERABLE one — poll it from the
    maintenance cadence and rebuild when :func:`ivf_needs_rebuild`
    fires. Cost: one footer read per index file (KBs each).

    The footer walk is a serial driver loop — fine to thousands of
    files, a single-threaded stall at a 10⁵-10⁶-file index (r17,
    VERDICT r16). Pass ``spark`` to switch to a DISTRIBUTED count
    above ``parallel_threshold`` files: a scan projected to the
    partition column alone reads zero data columns (row counts come
    from the same footers, read executor-parallel). A URI index path
    prefers the Spark branch whenever ``spark`` is given — Spark
    resolves its own filesystems there. Without it, schemes pyarrow
    understands natively (``s3://``, ``gs://``, ``file://``) fall to
    its filesystem support (own credentials required); Spark-ONLY
    schemes (``s3a://``, ``abfss://``, ``wasbs://``, …) refuse with
    the remedy named — handing them to pyarrow would surface an
    opaque "unrecognized filesystem" where "pass spark=" is the fix.
    """
    import json as _json
    import re as _re

    raw = _model_meta(path, meta_store).read_if_exists(
        f"{path}/_centroids.json")
    n_cells = len(_json.loads(raw)) if raw is not None else None
    counts: dict[int, int] = {}
    scheme = path.split("://", 1)[0] if "://" in path else None
    if scheme is not None and spark is not None:
        frags = []
        use_spark = True
    elif scheme in ("s3a", "s3n", "abfs", "abfss", "wasb", "wasbs",
                    "oss", "cosn"):
        raise ValueError(
            f"index at {path!r} uses the Spark-only scheme "
            f"{scheme}:// — pass spark= so the cell audit runs "
            "through Spark's filesystems")
    else:
        import pyarrow.dataset as _ds
        dataset = _ds.dataset(path, format="parquet",
                              partitioning="hive")
        frags = list(dataset.get_fragments())
        use_spark = (spark is not None
                     and len(frags) > parallel_threshold)
    if use_spark:
        from pyspark.sql import functions as _F
        counts = {int(r["cell"]): r["n"] for r in
                  spark.read.parquet(path)
                  .groupBy(_F.col("cell").cast("int").alias("cell"))
                  .agg(_F.count("*").alias("n"))
                  .collect()}               # ≤ n_cells rows
        frags = []
    for frag in frags:
        # segment-anchored, LAST match: a 'cell=N' substring in an
        # ancestor directory of the index path must not shadow the
        # real partition dir
        ms = _re.findall(r"(?:^|/)cell=(\d+)(?=/|$)", frag.path)
        if not ms:
            continue
        c = int(ms[-1])
        # count_rows() on an unfiltered parquet fragment is served
        # from row-group metadata — footer only
        counts[c] = counts.get(c, 0) + frag.count_rows()
    if n_cells is None:
        n_cells = (max(counts) + 1) if counts else 0
    per = sorted(counts.get(i, 0) for i in range(n_cells))
    mx = per[-1] if per else 0
    if not per:
        median = 0.0
    elif len(per) % 2:
        median = float(per[len(per) // 2])
    else:
        median = (per[len(per) // 2 - 1] + per[len(per) // 2]) / 2.0
    if mx == 0:
        imbalance = 0.0
    elif median == 0:
        imbalance = float("inf")          # >half the cells are empty
    else:
        imbalance = round(mx / median, 4)
    return {"n_cells": n_cells, "rows": sum(per), "max": mx,
            "median": median, "imbalance": imbalance,
            "empty_cells": sum(1 for v in per if v == 0),
            "counts": counts}


def ivf_needs_rebuild(stats: dict, max_over_median: float = 8.0) -> bool:
    """The drift trigger: True when the hottest cell holds more than
    ``max_over_median``× the median cell's rows (or when more than
    half the cells are empty while data exists — imbalance inf). A
    balanced index sits near 1; a corpus whose distribution moved
    after the centroids froze climbs steadily. 8× default: far above
    natural k-means spread, far below the hot-cell regime where a
    probe must read a data-sized fraction of the index."""
    return stats["imbalance"] > max_over_median


def _index_vectors(spark, path: str, meta) -> "tuple":
    """(rows, books) for a maintenance rewrite: the deduplicated
    (neighbor, _cv) rows plus the PQ codebooks when the index is
    IVFADC. A codes-only PQ index cannot be rewritten from itself
    (codes are not invertible) — refuse loudly instead of silently
    writing an index the PQ search path can no longer read."""
    import json

    raw = meta.read_if_exists(f"{path}/_pq_books.json")
    books = (np.asarray(json.loads(raw), dtype=np.float64)
             if raw is not None else None)
    idx = spark.read.parquet(path)
    if books is not None and "_cv" not in idx.columns:
        raise ValueError(
            f"IVF-PQ index at {path} was built codes-only "
            "(store_vectors=False): its vectors cannot be recovered "
            "from the codes — re-run build_ivf_pq_index over the "
            "source corpus instead")
    return (idx.select("neighbor", "_cv")
            .dropDuplicates(["neighbor"]), books)


def compact_ivf_index(spark, path: str, dest: str, *,
                      meta_store=None) -> None:
    """The FILE-compaction half of index maintenance (r16): rewrite
    the index at ``dest`` with the SAME model — cell membership
    unchanged (assignment is deterministic in the model), every id
    preserved, at-least-once append duplicates collapsed — so a
    month of per-epoch streaming appends (≥1 small file per touched
    cell per epoch) folds back to one file set per cell without
    retraining anything. ``rebuild_ivf_index`` is the RETRAIN form
    (drift response); this is the run_maintenance rhythm. Writes to a
    new path (the manifest swap rule). An IVF-PQ index built
    ``store_vectors=True`` compacts too (codes re-encoded with the
    SAME codebooks — bit-identical); codes-only refuses."""
    meta = _model_meta(path, meta_store)
    cents = _read_model(meta, path, "_centroids.json")
    idx, books = _index_vectors(spark, path, meta)
    if books is not None:
        build_ivf_pq_index(idx, "neighbor", "_cv", dest,
                           n_cells=cents.shape[0],
                           m=books.shape[0],
                           centroids=cents, books=books,
                           store_vectors=True, meta_store=meta_store)
    else:
        build_ivf_index(idx, "neighbor", "_cv", dest,
                        n_cells=cents.shape[0], centroids=cents,
                        meta_store=meta_store)


def _seed_rows(idx: DataFrame, targets: list) -> DataFrame:
    """The rebuild seed-pick plan: the (cell, rank) targets join as a
    TINY BROADCAST side against the per-cell row_number — not a
    k-element literal array scanned per row (r17, VERDICT r16: the
    literal form cost O(rows·k) comparisons and bloated the plan at
    n_cells ≈ 10⁴⁺; the hash join is O(rows) probes and the plan
    stays k-independent). Plan shape pinned in tests/test_plans.py."""
    tgt = idx.sparkSession.createDataFrame(targets,
                                           "_oldcell int, _rn int")
    w = Window.partitionBy("_oldcell").orderBy("neighbor")
    return (idx.withColumn("_rn", F.row_number().over(w))
            .join(F.broadcast(tgt), ["_oldcell", "_rn"])
            .orderBy("_oldcell", "_rn")
            .select(F.transform(F.col("_cv"),
                                lambda x: F.round(x, 6)).alias("_v")))


def rebuild_ivf_index(spark, path: str, dest: str, *,
                      n_cells: int | None = None,
                      iters: int = 2, meta_store=None) -> None:
    """Retrain centroids on the index's CURRENT contents and rebuild
    at ``dest`` — the rebuild half of the drift contract. Every
    (neighbor, vector) row is preserved (at-least-once append
    duplicates collapse — the reclamation append_to_ivf_index's
    docstring promises). Writes to a NEW path: readers switch after
    the rebuild lands (the manifest swap rule — an in-place overwrite
    would break concurrent frozen plans).

    Seeding is MASS-PROPORTIONAL, not a warm start from the old
    centroids: warm-started Lloyd iterations cannot split a hot cell
    (a tight drifted blob stays nearest to the one centroid that
    moved into it — the imbalance survives retraining). Instead each
    old cell gets seeds in proportion to its row count (largest
    remainder), drawn evenly through the cell by id order — so the
    drifted mass seeds many centroids and splits, empty cells lose
    their centroid, and the Lloyd rounds then refine. Deterministic
    end to end (id-ordered seed picks, the clustering module's
    fold/rounding rules).

    An IVF-PQ index built ``store_vectors=True`` rebuilds too — the
    coarse centroids retrain, the PQ codebooks carry over (they
    quantize vectors, not cells) and every row's codes re-encode;
    codes-only refuses (codes alone cannot re-train)."""
    meta = _model_meta(path, meta_store)
    old = _read_model(meta, path, "_centroids.json").tolist()
    # validates codes-only early + surfaces the PQ codebooks
    _, books = _index_vectors(spark, path, meta)
    k = n_cells or len(old)
    idx = (spark.read.parquet(path)
           .select("neighbor", "_cv", F.col("cell").cast("int")
                   .alias("_oldcell"))
           .dropDuplicates(["neighbor"]))
    counts = {r["_oldcell"]: r["n"] for r in
              idx.groupBy("_oldcell").agg(F.count("*").alias("n"))
              .collect()}                     # ≤ n_cells rows
    total = sum(counts.values())
    if total < k:
        raise ValueError(
            f"index holds {total} distinct vectors < n_cells={k}")
    # largest-remainder seat allocation, capped at each cell's rows
    quota = {c: k * n / total for c, n in counts.items()}
    seats = {c: min(int(q), counts[c]) for c, q in quota.items()}
    rema = sorted(counts, key=lambda c: (-(quota[c] - seats[c]), c))
    i = 0
    while sum(seats.values()) < k:
        c = rema[i % len(rema)]
        if seats[c] < counts[c]:
            seats[c] += 1
        i += 1
    # evenly-spaced picks through each cell (id order): rank targets
    targets = [(c, int((j + 0.5) * counts[c] / s) + 1)
               for c, s in seats.items() if s
               for j in range(s)]
    seeds = _seed_rows(idx, targets).collect()    # exactly k rows
    init = [list(r["_v"]) for r in seeds]
    from rakam_api_collector_spark.operators.clustering import \
        kmeans_centroids
    cents = kmeans_centroids(idx, "neighbor", "_cv", init=init,
                             iters=iters)
    cents = np.asarray(cents, dtype=np.float64)
    if books is not None:
        build_ivf_pq_index(idx.drop("_oldcell"), "neighbor", "_cv",
                           dest, n_cells=k, m=books.shape[0],
                           centroids=cents, books=books,
                           store_vectors=True, meta_store=meta_store)
    else:
        build_ivf_index(idx.drop("_oldcell"), "neighbor", "_cv", dest,
                        n_cells=k, centroids=cents,
                        meta_store=meta_store)
