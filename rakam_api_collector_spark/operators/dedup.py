"""Deduplication operators for large text corpora.

Five families, all shuffle-on-key or bucket-join — never an unbounded
cross product:

- **exact_dedup** — hash groupBy/window; the batch form of the
  reference's (user, time) dedup (Deduplicator.java:26-88).
- **ngram_jaccard_pairs** — exact n-gram-shingle Jaccard via an
  inverted-index self-join (pairs share ≥1 shingle); the oracle-checkable
  exact path.
- **minhash_lsh_pairs** — MinHash signatures + banded LSH bucket join,
  then exact-Jaccard verification of candidates only. The 100 TB path:
  cost is O(docs × perms) signature build + bucket-local pairing.
- **simhash64** — 64-bit SimHash fingerprint; near-dup = small Hamming
  distance, found via chunk-banding (Charikar'02; pigeonhole: d ≤ 3 →
  some 16-bit chunk equal).
- **embedding_cosine_pairs** — semantic near-dup over an embedding
  column: random-hyperplane LSH buckets (similarity.py) prune the pair
  space, exact cosine verifies candidates.

Everything is built from JVM higher-order functions on token arrays —
no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.text import tokens


def exact_dedup(df: DataFrame, key_cols: list[str],
                order_cols: list[str] | None = None) -> DataFrame:
    """Keep the first row per key (row_number over a shuffle on key).
    With no order columns, ties are arbitrary-but-single (groupBy
    semantics) — at scale prefer passing a stable order column."""
    if order_cols:
        w = Window.partitionBy(*key_cols).orderBy(*order_cols)
        return (df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
    return df.dropDuplicates(key_cols)


def shingles_from_tokens(t: Column, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined) from an ALREADY
    MATERIALIZED token-array column. ``t`` must be a plain column
    reference, not the tokenizer expression: Catalyst does not eliminate
    common subexpressions inside higher-order-function lambdas, so an
    inlined ``tokens(text)`` here would re-run the regex split once per
    shingle position — O(tokens²) per document."""
    return F.when(
        F.size(t) >= n,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.array_join(F.slice(t, i + 1, n), " ")))
    ).otherwise(F.array(F.array_join(t, " ")))


def token_shingles(text: Column, n: int = 3) -> Column:
    """Expression-form shingles straight from text — convenient for
    one-shot projections; operators that explode shingles should
    two-step through a materialized token column instead (see
    shingles_from_tokens)."""
    return shingles_from_tokens(tokens(text), n)


def _exploded_shingles(docs: DataFrame, id_col: str, text_col: str,
                       n: int, max_shingle_freq: int | None,
                       hashed: bool = False) -> DataFrame:
    """(_id, _sh) — or (_id, _h) with ``hashed=True`` — inverted-index
    rows, with tokens materialized once per row and the stop-shingle cap
    applied as a broadcast anti-join: the over-represented shingle list
    is tiny by construction (shingles in > max_shingle_freq docs), so
    the cap never shuffles the index. Consumers that only need shingle
    *identity* (MinHash) take the hashed form — every downstream
    exchange then moves longs, not shingle strings."""
    sh = (docs.select(F.col(id_col).alias("_id"),
                      tokens(F.col(text_col)).alias("_t"))
          .select("_id", F.explode(shingles_from_tokens(F.col("_t"), n))
                  .alias("_sh")))
    key = "_sh"
    if hashed:
        sh = sh.select("_id", F.xxhash64("_sh").alias("_h"))
        key = "_h"
    if max_shingle_freq:
        stop = (sh.groupBy(key).agg(F.count("*").alias("_f"))
                .filter(F.col("_f") > max_shingle_freq).select(key))
        sh = sh.join(F.broadcast(stop), key, "left_anti")
    return sh


def ngram_jaccard_pairs(docs: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5,
                        max_shingle_freq: int | None = 10_000) -> DataFrame:
    """Exact Jaccard-similar pairs (a < b) via inverted index: explode
    shingles, self-join on shingle (only co-shingled pairs ever meet),
    count common, Jaccard = common / (|A| + |B| - common).

    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs (stop-shingles): at corpus scale a shingle shared by 10⁶ docs
    creates 10¹² pairs — pruning it changes Jaccard by at most
    1/|smallest doc|, standard practice. The default caps the worst
    per-shingle fan-out at ~10⁸ pairs (one stop-shingle's bucket);
    pass ``None`` only for oracle-exactness paths."""
    sh = _exploded_shingles(docs, id_col, text_col, n, max_shingle_freq)
    # the inverted index feeds three branches (self-join ×2 + sizes);
    # materialize once instead of re-tokenizing per branch
    sh = sh.cache()
    sh.count()
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_sz"))

    a, b = sh.alias("a"), sh.alias("b")
    common = (a.join(b, (F.col("a._sh") == F.col("b._sh"))
                     & (F.col("a._id") < F.col("b._id")))
              .groupBy(F.col("a._id").alias("ia"), F.col("b._id").alias("ib"))
              .agg(F.count("*").alias("_common")))
    sa = sizes.select(F.col("_id").alias("ia"), F.col("_sz").alias("_sa"))
    sb = sizes.select(F.col("_id").alias("ib"), F.col("_sz").alias("_sb"))
    return (common.join(sa, "ia").join(sb, "ib")
            .withColumn("jac", F.col("_common") /
                        (F.col("_sa") + F.col("_sb") - F.col("_common")))
            .filter(F.col("jac") >= threshold)
            .select(F.col("ia").alias("a"), F.col("ib").alias("b"), "jac"))


def _rand_odd_uint64(rng, shape) -> "object":
    import numpy as np
    return (rng.integers(0, 1 << 63, shape, dtype=np.uint64) << 1) | 1


def _minhash_bands_udf(num_perm: int, bands: int, seed: int = 7,
                       with_sig: bool = False):
    """Arrow-batched MinHash + banding from per-doc shingle-hash lists.

    Permutations are multiply-add universal hashes over the base
    ``xxhash64(shingle)`` (h_i(x) = a_i·x + b_i mod 2⁶⁴, a_i odd — the
    datasketch-style family); each band hash is a multiply-accumulate of
    its r signature lanes. One numpy pass replaces a 128-min-aggregate
    codegen'd plan whose *compilation alone* costs seconds; at corpus
    scale the vectorized batch path is also the faster steady state.

    ``with_sig=True`` additionally returns the raw signature lanes
    (struct<sig, bands>) — the persisted-store form, where lane
    agreement later estimates Jaccard without any text."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    r = num_perm // bands
    rng = np.random.default_rng(seed)
    A = _rand_odd_uint64(rng, num_perm)[:, None]       # (perm, 1)
    B = rng.integers(0, 1 << 63, num_perm, dtype=np.uint64)[:, None]
    M = _rand_odd_uint64(rng, r)                       # band mixer

    # Whole-batch vectorization: one (perm × hashes) multiply-add per
    # CHUNK of docs with a segment-min (np.minimum.reduceat) at doc
    # boundaries — numerically identical to the per-doc form but ~5-10×
    # faster (a per-doc loop pays numpy dispatch overhead on thousands
    # of ~50-element matrices per Arrow batch). CHUNK bounds the
    # intermediate at perm × CHUNK × 8 B ≈ 64 MB.
    CHUNK = 1 << 16

    def compute_batch(hls):
        n_docs = len(hls)
        sig = np.empty((n_docs, num_perm), dtype=np.uint64)
        lens = np.fromiter((len(h) for h in hls), dtype=np.int64,
                           count=n_docs)
        arrs = [np.asarray(h, dtype=np.int64) for h in hls]
        i = 0
        while i < n_docs:
            j, tot = i, 0
            while j < n_docs and (tot == 0 or tot + lens[j] <= CHUNK):
                tot += lens[j]
                j += 1
            seg = np.concatenate(arrs[i:j]).view(np.uint64)
            bounds = np.concatenate(([0], np.cumsum(lens[i:j - 1])))
            with np.errstate(over="ignore"):
                v = A * seg[None, :] + B               # (perm, tot)
            sig[i:j] = np.minimum.reduceat(v, bounds, axis=1).T
            i = j
        with np.errstate(over="ignore"):
            bh = (sig.reshape(n_docs, bands, r)
                  * M[None, None, :]).sum(axis=2, dtype=np.uint64)
        return sig.view(np.int64), bh.view(np.int64)

    if with_sig:
        def sig_bands_of(hash_lists: pd.Series) -> pd.DataFrame:
            sig, bh = compute_batch(list(hash_lists))
            return pd.DataFrame({"sig": list(sig), "bands": list(bh)})
        sig_bands_of.__annotations__ = {"hash_lists": pd.Series,
                                        "return": pd.DataFrame}
        return pandas_udf(sig_bands_of,
                          "struct<sig: array<long>, bands: array<long>>")

    def bands_of(hash_lists: pd.Series) -> pd.Series:
        return pd.Series(list(compute_batch(list(hash_lists))[1]))

    bands_of.__annotations__ = {"hash_lists": pd.Series,
                                "return": pd.Series}
    return pandas_udf(bands_of, "array<long>")


def minhash_signatures(docs: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 128, n: int = 3,
                       bands: int = 64,
                       max_shingle_freq: int | None = None,
                       with_sig: bool = False) -> DataFrame:
    """(_id, _bands) — or (_id, _sig, _bands) with ``with_sig=True``:
    per-doc banded MinHash band hashes — deliberately
    NARROW (two columns, one array of ``bands`` longs) because this is
    the signature table that rides every downstream shuffle and, at
    scale, gets persisted (see signature_store). Shingles are hashed
    JVM-side (one xxhash64 per shingle); signatures and band hashes come
    from one Arrow-batched numpy pass (_minhash_bands_udf).

    ``max_shingle_freq`` drops stop-shingles (appearing in more docs
    than the cap) before signing — at corpus scale a universal shingle
    floods every band bucket."""
    sh = _exploded_shingles(docs, id_col, text_col, n, max_shingle_freq,
                            hashed=True)
    hx = sh.groupBy("_id").agg(F.collect_list("_h").alias("_hx"))
    if with_sig:
        udf = _minhash_bands_udf(num_perm, bands, with_sig=True)
        return hx.select("_id", udf("_hx").alias("_s")) \
                 .select("_id", F.col("_s.sig").alias("_sig"),
                         F.col("_s.bands").alias("_bands"))
    udf = _minhash_bands_udf(num_perm, bands)
    return hx.select("_id", udf("_hx").alias("_bands"))


def minhash_lsh_pairs(docs: DataFrame, id_col: str, text_col: str,
                      n: int = 3, threshold: float = 0.5,
                      num_perm: int = 128, bands: int = 64,
                      max_shingle_freq: int | None = 10_000,
                      broadcast_verify: bool = True,
                      max_bucket: int | None = 10_000) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH + exact verification.

    rows-per-band r = num_perm // bands; candidate recall at similarity s
    is 1 - (1 - s^r)^bands (r=2, b=64, s=0.5 → miss ≈ 1e-8), so the
    verified output equals the exact ngram_jaccard_pairs result with
    overwhelming probability while never forming the cross product.

    Scale shape: candidate discovery moves only (_id, band, bh) longs;
    exact-Jaccard verification recomputes shingle sets for *candidate
    docs only* (a semi-join of the source table against the candidate id
    set), so the full corpus's shingle sets never ride a shuffle or sit
    in cache. ``broadcast_verify`` hints the candidate id/shingle-set
    frames into broadcast joins — right when candidates ≪ corpus (the
    usual case); pass False on a candidate-heavy corpus to let AQE pick
    the join strategy from runtime sizes.

    ``max_bucket`` guards the band-bucket self-join against a
    mass-duplication flood: N byte-identical documents share EVERY
    band hash, so each of the 64 band buckets would go O(N²) —
    flooded buckets degrade to the star join
    (phash._capped_bucket_pairs): each member pairs with the bucket's
    min-id representative, and since flood members are (near-)
    identical the star pairs verify at Jaccard ≈ 1, keeping the whole
    flood one connected dedup cluster. Below the cap behavior is
    exact; None restores unbounded all-pairs."""
    from rakam_api_collector_spark.operators.phash import \
        _capped_bucket_pairs

    # cached: both bucket-join sides read it, and a lazy cache would
    # let each side recompute the signature lineage. With the bucket
    # cap armed, the hot-key probe inside _capped_bucket_pairs is the
    # materializing action (its pre-shuffle aggregate reads EVERY sig
    # partition, filling the cache) — an explicit count() first was
    # one more sequential job over the same rows (guide §2.4). Only
    # the uncapped path still needs the count.
    sig = minhash_signatures(docs, id_col, text_col, num_perm, n,
                             bands, max_shingle_freq).cache()
    if max_bucket is None:
        sig.count()
    buckets = (sig.select("_id", F.posexplode("_bands")
                          .alias("band", "bh")))

    # EAGER localCheckpoint, not cache() (r19): cand feeds the ids
    # broadcast build AND the final verify probe, sets feeds the sa and
    # sb broadcast builds — and broadcast-build jobs are submitted
    # CONCURRENTLY, so a lazy cache let each build recompute the whole
    # candidate chain (bucket join + semi-join + tokenize + shingle)
    # before any cache block landed (measured on llm09: the 66-task
    # sets stage ran 3× per query, resubmitted within 10 ms of each
    # other). One eager job per frame materializes it once; every
    # consumer reads checkpoint blocks. Shingle sets and candidate
    # pairs are pure functions of the docs, so results are unchanged.
    cand = (_capped_bucket_pairs(buckets, ["band", "bh"], max_bucket,
                                 with_hamming=False)
            .select(F.col("a").alias("ia"), F.col("b").alias("ib"))
            .distinct()
            .localCheckpoint())

    ids = (cand.select(F.explode(F.array("ia", "ib")).alias("_id"))
           .distinct())
    if broadcast_verify:
        ids = F.broadcast(ids)
    need = (docs.select(F.col(id_col).alias("_id"),
                        F.col(text_col).alias("_t"))
            .join(ids, "_id", "left_semi"))
    sets = (need.select("_id", tokens(F.col("_t")).alias("_tk"))
            .select("_id", shingles_from_tokens(F.col("_tk"), n)
                    .alias("_shset"))
            .localCheckpoint())

    sa = sets.select(F.col("_id").alias("ia"), F.col("_shset").alias("_seta"))
    sb = sets.select(F.col("_id").alias("ib"), F.col("_shset").alias("_setb"))
    if broadcast_verify:
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    return (cand.join(sa, "ia").join(sb, "ib")
            .withColumn("jac",
                        F.size(F.array_intersect("_seta", "_setb")) /
                        F.size(F.array_union("_seta", "_setb")))
            .filter(F.col("jac") >= threshold)
            .select(F.col("ia").alias("a"), F.col("ib").alias("b"), "jac"))


def simhash64(text: Column, n: int = 1) -> Column:
    """64-bit SimHash over (n-)token features: bit i is the sign of
    Σ_tokens (±1 per token's xxhash64 bit i). Entirely JVM; the 64-bit
    loop is unrolled in Python (shift amounts must be literals), yielding
    one wide codegen'd expression — linear in tokens, no shuffle.

    Column-expression form for embedding in arbitrary projections; the
    signature *table* build (simhash_signatures) uses the cheaper
    explode + 64-aggregate plan instead."""
    feats = tokens(text) if n == 1 else token_shingles(text, n)
    hashes = F.transform(feats, lambda t: F.xxhash64(t))

    def bit_merger(i: int):
        # closure factory: a default-arg lambda would change the visible
        # arity and make pyspark bind a third lambda variable
        return lambda acc, h: acc + \
            (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1)

    out = F.lit(0).cast("long")
    for i in range(64):
        bit_sum = F.aggregate(
            hashes, F.lit(0).cast("long"), bit_merger(i))
        out = out.bitwiseOR(
            F.when(bit_sum > 0,
                   F.lit(1 << i if i < 63 else -(1 << 63)).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return out


def _simhash_udf():
    """Arrow-batched SimHash packing from per-doc token-hash lists —
    bit-identical to the simhash64 column expression (bit i set iff
    Σ_tokens ±1 on xxhash64 bit i is positive), without the 64-aggregate
    codegen'd plan whose compilation costs seconds."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(64, dtype=np.uint64)
    powers = np.uint64(1) << shifts

    def pack(hash_lists: pd.Series) -> pd.Series:
        out = np.empty(len(hash_lists), dtype=np.int64)
        for j, hl in enumerate(hash_lists):
            x = np.asarray(hl, dtype=np.int64).view(np.uint64)
            bits = ((x[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            pos = (2 * bits - 1).sum(axis=0) > 0
            with np.errstate(over="ignore"):
                out[j] = (powers * pos).sum(dtype=np.uint64).astype(
                    np.int64, casting="unsafe")
        return pd.Series(out)

    pack.__annotations__ = {"hash_lists": pd.Series, "return": pd.Series}
    return pandas_udf(pack, "long")


def simhash_signatures(docs: DataFrame, id_col: str, text_col: str,
                       n: int = 1) -> DataFrame:
    """(_id, _sh): SimHash via one token explode + hash collect + numpy
    bit-count pass — identical values to simhash64 (pinned in
    tests/test_llm_ops.py) with a constant-size plan."""
    if n == 1:
        tok = docs.select(F.col(id_col).alias("_id"),
                          F.explode(tokens(F.col(text_col))).alias("_t"))
    else:
        tok = (docs.select(F.col(id_col).alias("_id"),
                           tokens(F.col(text_col)).alias("_tk"))
               .select("_id",
                       F.explode(shingles_from_tokens(F.col("_tk"), n))
                       .alias("_t")))
    udf = _simhash_udf()
    return (tok.groupBy("_id")
            .agg(F.collect_list(F.xxhash64("_t")).alias("_hx"))
            .select("_id", udf("_hx").alias("_sh")))


def embedding_cosine_pairs(docs: DataFrame, id_col: str, vec_col: str,
                           threshold: float = 0.9, bits: int = 8,
                           tables: int = 16, exact: bool = False,
                           seed: int = 42,
                           max_bucket: int | None = 10_000) -> DataFrame:
    """Semantic near-dup pairs (a < b, cos ≥ threshold) over an
    embedding column.

    Default path: random-hyperplane LSH self-bucket-join (one task per
    (table, signature) bucket) + exact cosine verification — the pair
    space is pruned to bucket-local candidates, never |corpus|².
    ``exact=True`` instead broadcasts one side whole (exact recall,
    usable when the corpus fits the broadcast budget — e.g. the oracle
    path at fixture scale).

    ``max_bucket`` guards the bucket self-join against a
    mass-duplication flood (N identical embeddings share EVERY table
    signature — the embedding twin of the SimHash/MinHash/pHash
    floods): flooded buckets degrade to the member→min-id star
    (phash._capped_bucket_pairs); star pairs verify at cos ≈ 1, so
    the flood stays one connected cluster. Exact below the cap; None
    restores unbounded all-pairs."""
    from rakam_api_collector_spark.operators import similarity as S

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = docs.select(F.col(id_col).alias("_id"), v.alias("_v"))
    if exact:
        a = base.select(F.col("_id").alias("a"), F.col("_v").alias("_va"))
        b = base.select(F.col("_id").alias("b"), F.col("_v").alias("_vb"))
        cand = a.join(F.broadcast(b), F.col("a") < F.col("b"))
    else:
        dim = len(base.select("_v").first()[0])
        planes = __import__("numpy").asarray(
            S.random_hyperplanes(dim, bits, tables, seed))
        sig_udf = S._signatures_udf(planes.reshape(tables * bits, dim),
                                    tables, bits)
        # narrow bucket join (ids + signature longs only); vectors join
        # back per distinct surviving pair — embeddings never ride
        # through the candidate-dedup shuffle
        from rakam_api_collector_spark.operators.phash import \
            _capped_bucket_pairs

        # eagerly materialized like the simhash/phash/minhash callers:
        # the capped bucket join references this lineage several times
        # (size probe, cold a/b sides, hot side, representatives) and
        # an uncached frame would re-run the hyperplane-signature UDF
        # per reference. Pinned until the session's next clearCache()
        # — the house trade for EXPENSIVE-to-recompute signature
        # frames (vs the tiny hot-keys aggregate in phash, which
        # deliberately does NOT cache); a lazy-composition caller
        # should unpersist after its terminal action
        sigs = base.select("_id",
                           F.posexplode(sig_udf(F.col("_v")))
                           .alias("tbl", "sig")).cache()
        if max_bucket is None:
            # with the cap armed the hot-key probe materializes the
            # cache (guide §2.4); only the uncapped path counts first
            sigs.count()
        ids = (_capped_bucket_pairs(sigs, ["tbl", "sig"], max_bucket,
                                    with_hamming=False)
               .select("a", "b").distinct())
        va = base.select(F.col("_id").alias("a"), F.col("_v").alias("_va"))
        vb = base.select(F.col("_id").alias("b"), F.col("_v").alias("_vb"))
        cand = ids.join(va, "a").join(vb, "b")
    return (cand.select("a", "b",
                        S.cosine(F.col("_va"), F.col("_vb")).alias("cos"))
            .filter(F.col("cos") >= threshold))


def semantic_dedup_pairs(docs: DataFrame, id_col: str, vec_col: str,
                         threshold: float = 0.92, k: int = 16,
                         iters: int = 2,
                         centroids: list[list[float]] | None = None,
                         pair_budget: int | None = None) -> DataFrame:
    """SemDeDup-shaped semantic near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540, public paper): k-means-cluster the embedding
    space, then compare cosines WITHIN clusters only — pairs (a < b,
    cluster, cos ≥ threshold).

    This is the scale path for semantic dedup at corpus size: the
    cluster id plays the bucket role (one shuffle on a k-ary key; the
    pair space is Σ n_c², bounded by cluster granularity — raise ``k``
    as the corpus grows, exactly as the paper does at 100 k clusters.
    Concretely: for balanced clusters of target size s, Σ n_c² ≈ n·s,
    so pick ``k ≈ n / s`` with s sized to what one task can pair —
    s = 10⁴ keeps every cluster's pair block under ~10⁸ dots),
    and the assignment itself is map-only with the k×dim centroid
    literal riding inside the plan (operators/clustering.py). True
    near-duplicates embed near-identically, so they land in the same
    cluster with overwhelming probability — cross-cluster misses at
    Voronoi boundaries are the approximation SemDeDup accepts by
    construction (embedding_cosine_pairs' hyperplane-LSH path is the
    alternative when table-based recall control matters more).

    ``centroids`` reuses a trained model (kmeans_centroids /
    the persisted IVF index's cells) instead of re-clustering —
    the incremental-batch shape.

    ``pair_budget`` guards the formula above against adversarial
    clustering (a mode-collapsed corpus where one cluster swallows
    everything and the "within-cluster" join degenerates toward n²):
    when set, ONE extra bounded job (k cluster counts) estimates
    Σ n_c² after assignment and raises ValueError before the pair
    join is ever scheduled if it exceeds the budget — the fix is a
    larger ``k`` or pre-splitting the hot mode, and the error says
    so. None (default) skips the extra job."""
    from rakam_api_collector_spark.operators import clustering as C
    from rakam_api_collector_spark.operators import similarity as S

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = docs.select(F.col(id_col).alias("_id"), v.alias("_v"))
    if centroids is None:
        first = (base.orderBy("_id").limit(k)
                 .select(F.transform(F.col("_v"),
                                     lambda x: F.round(x, 6))
                         .alias("_c")).collect())     # bounded: k rows
        centroids = C.kmeans_centroids(
            base, "_id", "_v", init=[list(r["_c"]) for r in first],
            iters=iters)
    assigned = C._with_assignment(base, "_id", "_v", centroids)
    if pair_budget is not None:
        sizes = assigned.groupBy("cluster").count().collect()  # ≤ k rows
        est = sum(r["count"] * r["count"] for r in sizes)
        if est > pair_budget:
            worst = max(sizes, key=lambda r: r["count"])
            raise ValueError(
                f"semantic_dedup_pairs: estimated pair space "
                f"sum(n_c^2)={est} exceeds pair_budget={pair_budget} "
                f"(largest cluster {worst['cluster']} has "
                f"{worst['count']} rows); raise k (~n/target_size) or "
                f"pre-split the hot mode before the pair join")
    # normalize ONCE per row so each pair costs a single dot fold
    # instead of dot + two norm folds (|pairs| = Σ n_c² ≫ |rows|; the
    # same amortization _unit gives the similarity operators).
    # Materialized once (lazy localCheckpoint, r18): both sides of the
    # within-cluster self-join read this frame, and without it each
    # side replayed the scan + k-way assignment + normalization —
    # two full assignment passes for one clustering (guide §2.4)
    unit = (assigned
            .withColumn("_n", S.l2_norm(F.col("_v")))
            .withColumn("_u", F.transform(
                "_v", lambda x: x / F.col("_n")))
            .select("_id", "cluster", "_u")
            .localCheckpoint(eager=False))
    a = unit.select(F.col("_id").alias("a"), "cluster",
                    F.col("_u").alias("_ua"))
    b = unit.select(F.col("_id").alias("b"), "cluster",
                    F.col("_u").alias("_ub"))
    return (a.join(b, "cluster")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", "cluster",
                    S.dot(F.col("_ua"), F.col("_ub")).alias("cos"))
            .filter(F.col("cos") >= threshold))


def connected_components(pairs: DataFrame, a: str = "a", b: str = "b",
                         max_iter: int = 20) -> DataFrame:
    """(node, cluster_id) connected components of a near-dup pair graph
    via min-label propagation: every node starts labeled with its own id;
    each round a node takes the min of its own and its neighbors' labels;
    at the fixed point cluster_id == min doc id in the component.

    Scale shape: each round is one equi-join (edges × labels, both
    shuffled on node id) + one groupBy min — never a cross product — and
    the number of rounds is the component *diameter*, which for near-dup
    graphs is small (copies cluster around a common original; the
    reference pipeline analog is transitive pair closure). Labels are
    ``localCheckpoint``-ed every round so the plan stays constant-size
    across iterations; on a real cluster use a reliable checkpoint dir.
    Early-stops when no label changes.
    """
    edges = (pairs.select(F.col(a).alias("s"), F.col(b).alias("d"))
             .unionByName(
                 pairs.select(F.col(b).alias("s"), F.col(a).alias("d")))
             .localCheckpoint(eager=False))   # materializes in round 1's
    #            join job — an eager checkpoint was one extra sequential
    #            job before any propagation work (guide §2.4)
    # initial labels stay LAZY and undeduplicated — the first round's
    # min-agg absorbs both (an extra distinct + checkpoint here costs a
    # full materialization for nothing)
    labels = edges.select(F.col("s").alias("node"),
                          F.col("s").alias("label"))
    # Convergence via a one-stage aggregate instead of a labels⨝labels
    # join: min-propagation only ever DECREASES labels, so the label sum
    # is strictly monotone until the fixed point — equal consecutive
    # sums ⇔ no label changed. decimal(38,0) so 100 TB id sums can't
    # wrap.
    prev_sum = None
    for _ in range(max_iter):
        msgs = (edges.join(labels, edges["s"] == labels["node"])
                .select(F.col("d").alias("node"), "label"))
        # lazy checkpoint: the label-sum action below materializes the
        # round's labels AND computes the convergence probe in ONE job
        # (eager checkpoint + separate sum was 2 sequential jobs per
        # round — guide §2.4; at scale, one fewer pass per round)
        labels = (msgs.unionByName(labels)
                  .groupBy("node").agg(F.min("label").alias("label"))
                  .localCheckpoint(eager=False))
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("node", F.col("label").alias("cluster_id"))


def dedup_verdict(docs: DataFrame, id_col: str, pairs: DataFrame,
                  a: str = "a", b: str = "b",
                  max_iter: int = 20) -> DataFrame:
    """(id, cluster_id, keep): per-document survivor verdict — the step
    that turns a pair report into a pipeline stage. Documents in no pair
    are their own singleton cluster (keep=true); within a component the
    min doc id survives. Left join back to the full corpus so every
    input document gets exactly one verdict row."""
    cc = connected_components(pairs, a, b, max_iter)
    lab = F.coalesce("cluster_id", F.col(id_col))
    return (docs.select(id_col)
            .join(cc, F.col(id_col) == F.col("node"), "left")
            .select(F.col(id_col),
                    lab.alias("cluster_id"),
                    (lab == F.col(id_col)).alias("keep")))


def dedup_verdict_best(docs: DataFrame, id_col: str, score_col: str,
                       pairs: DataFrame, a: str = "a", b: str = "b",
                       max_iter: int = 20) -> DataFrame:
    """(id, cluster_id, keep): survivor verdict keeping the BEST-scored
    document per near-dup cluster (ties → lowest id) instead of the
    min-id — what a curation pipeline actually wants: when a perturbed
    copy scores higher than its original (cleaner text, fewer artifacts)
    the copy survives. The row_number window runs ONLY over documents
    that appear in a connected component (bounded by the near-dup pair
    report, a tiny fraction of the corpus); singletons take the
    pair-less fast path — a null cluster label after the left join maps
    straight to keep=true with no window state or sort. Both branches
    reuse the same join exchange."""
    cc = connected_components(pairs, a, b, max_iter)
    labeled = (docs.select(id_col, score_col)
               .join(cc, F.col(id_col) == F.col("node"), "left")
               .select(id_col, score_col, "cluster_id"))
    w = Window.partitionBy("cluster_id").orderBy(F.desc(score_col),
                                                F.asc(id_col))
    best = (labeled.filter(F.col("cluster_id").isNotNull())
            .select(F.col(id_col), F.col("cluster_id"),
                    (F.row_number().over(w) == 1).alias("keep")))
    singles = (labeled.filter(F.col("cluster_id").isNull())
               .select(F.col(id_col),
                       F.col(id_col).alias("cluster_id"),
                       F.lit(True).alias("keep")))
    return best.unionByName(singles)


def simhash_candidates(docs: DataFrame, id_col: str, text_col: str,
                       chunks: int = 4,
                       max_bucket: int | None = 10_000) -> DataFrame:
    """Near-dup candidate pairs = equal 16-bit SimHash chunk (pigeonhole
    for Hamming ≤ chunks-1 BELOW the bucket cap); returns
    (a, b, hamming) for ranking. A flooded chunk bucket (N identical
    documents share ONE SimHash — the text twin of the near-black
    thumbnail flood measured in STRESS.md's phash_hot cells) degrades
    past ``max_bucket`` to the O(n) star join
    (phash._capped_bucket_pairs): every member still connects through
    the bucket's min-id representative for downstream clustering;
    behavior below the cap is exact, ``max_bucket=None`` restores
    unbounded all-pairs."""
    from rakam_api_collector_spark.operators.phash import \
        _capped_bucket_pairs

    w = 64 // chunks
    sh = simhash_signatures(docs, id_col, text_col)
    chunk_arr = F.array(*[
        F.struct(F.lit(ci).alias("chunk"),
                 F.shiftright("_sh", ci * w)
                 .bitwiseAND(F.lit((1 << w) - 1)).alias("ck"))
        for ci in range(chunks)])
    buckets = (sh.select("_id", F.col("_sh").alias("_ph"),
                         F.explode(chunk_arr).alias("_c"))
               .select("_id", "_ph", "_c.chunk", "_c.ck")).cache()
    if max_bucket is None:
        # the simhash UDF must run once, not per join side; with the
        # cap armed the hot-key probe materializes the cache instead
        # (its aggregate reads every partition — guide §2.4)
        buckets.count()
    return (_capped_bucket_pairs(buckets, ["chunk", "ck"], max_bucket)
            .select("a", "b", "hamming")
            .distinct())


def duplicate_span_removal(docs: DataFrame, id_col: str, text_col: str,
                           k: int = 50) -> DataFrame:
    """EXACT duplicate-substring removal (Lee et al., ACL 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): any k-token window whose exact token sequence
    occurs at more than one site in the corpus is a duplicated
    substring; ONE canonical copy survives (the site with the lowest
    (doc id, position) — deterministic, SQL-replayable) and every
    other occurrence is cut from its document. Overlapping duplicated
    windows merge naturally: a token is removed iff ANY marked window
    covers it. Returns (id, text, n_tokens_removed, n_tokens_kept) —
    the cleaned text is the kept tokens re-joined on single spaces
    (the operator is defined over the token stream, like the packing /
    truncation operators; the paper's suffix arrays index exactly this
    normalized stream).

    Spark shape (the paper's suffix array is a single-machine
    construction; a Spark corpus wants the equivalent by windows):
    - ONE pass explodes each document into its n-k+1 rolling windows,
      keyed by ``xxhash64`` of the window's token span — narrow
      (id, pos, whash) rows, never window text.
    - One TWO-PHASE aggregate on whash — ``min(struct(id, pos))`` +
      site count — names each duplicated hash's canonical site. Both
      measures combine map-side, so a hot k-gram (the operator's own
      target input: a boilerplate span at 10⁴+ sites) reduces to one
      narrow row per map partition instead of concentrating every
      site in a single window-sort task, which is exactly what the
      earlier ``row_number``-over-(doc,pos) formulation did.
    - The canon rows (duplicated hashes only) join BACK onto the
      window rows by whash — a shuffled hash join, no per-key sort —
      and every site ≠ canon is marked. AQE's skew-join split can
      fan a hot hash's probe rows across tasks; a window rank never
      could. No distinct-vs-distinct join, no candidate pairs:
      duplication stays a per-key property.
    - One shuffle back on doc id collects each document's marked
      positions (small by construction — only duplicated sites
      travel), then a map-only rebuild: token j survives iff no
      marked position p has p ≤ j < p+k (an ``exists`` fold over the
      per-doc marked list, all JVM).
    The window rows are derived twice (canon aggregate + probe side);
    both derivations are map-only tokenize/hash scans that pipeline
    with their shuffles, and trading that linear recompute for the
    map-side-combining aggregate is what removes the hot-key wall —
    persist the window frame first if the scan dominates.
    At 100 TB the whash shuffle is the cost, and it is the minimal
    one: every window must meet its duplicates exactly once."""
    from rakam_api_collector_spark.operators.text import tokens

    if k < 1:
        raise ValueError("k must be >= 1")
    # EAGER localCheckpoints (r19, guide §2.4): base has three
    # consumers (both window-hash derivations + the final rebuild
    # join) and wins two (the canon-site aggregate and the mark-join
    # probe) — all materialized CONCURRENTLY by AQE inside the one
    # action, so without checkpoints the corpus was tokenized 3× and
    # window-hashed 2× per run (measured: two ~equal 33-task 1.2-1.3 s
    # jobs submitted 60 ms apart). Two sequential jobs now compute
    # tokenize and hash exactly once; every consumer reads blocks.
    # Pure per-row functions — results unchanged at any partitioning.
    base = (docs.select(F.col(id_col).alias("_id"),
                        tokens(F.col(text_col)).alias("_t"))
            .withColumn("_n", F.size("_t"))
            .localCheckpoint())
    wins = (base.filter(F.col("_n") >= k)
            .select("_id", F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - k + 1),
                    lambda s: F.xxhash64(
                        F.concat_ws("\x1f", F.slice(F.col("_t"),
                                                    s, k)))))
                .alias("_pos0", "_wh"))
            .select("_id", (F.col("_pos0") + 1).alias("_pos"), "_wh")
            .localCheckpoint())
    canon = (wins.groupBy("_wh")
             .agg(F.min(F.struct("_id", "_pos")).alias("_canon"),
                  F.count(F.lit(1)).alias("_sites"))
             .filter(F.col("_sites") > 1)
             .select("_wh", "_canon"))
    marked = (wins
              .join(canon.hint("shuffle_hash"), "_wh")
              .filter((F.col("_id") != F.col("_canon._id"))
                      | (F.col("_pos") != F.col("_canon._pos")))
              .groupBy("_id")
              .agg(F.array_sort(F.collect_list("_pos")).alias("_cut")))
    covered = lambda j: F.exists(       # noqa: E731 — plan fragment
        F.col("_cut"), lambda p: (p <= j) & (j < p + k))
    kept = F.filter(
        F.transform(F.col("_t"),
                    lambda t, j: F.when(~covered(j + 1), t)),
        lambda t: t.isNotNull())
    return (base.join(marked, "_id", "left")
            .withColumn("_cut", F.coalesce(
                F.col("_cut"), F.array().cast("array<int>")))
            .select(F.col("_id").alias(id_col),
                    F.array_join(kept, " ").alias(text_col),
                    (F.col("_n") - F.size(kept))
                    .alias("n_tokens_removed"),
                    F.size(kept).alias("n_tokens_kept")))
