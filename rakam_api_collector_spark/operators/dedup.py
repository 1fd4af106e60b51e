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


def token_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined), JVM-side:
    transform over a sequence of start offsets."""
    t = tokens(text)
    return F.when(
        F.size(t) >= n,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.array_join(F.slice(t, i + 1, n), " ")))
    ).otherwise(F.array(F.array_join(t, " ")))


def ngram_jaccard_pairs(docs: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5,
                        max_shingle_freq: int | None = None) -> DataFrame:
    """Exact Jaccard-similar pairs (a < b) via inverted index: explode
    shingles, self-join on shingle (only co-shingled pairs ever meet),
    count common, Jaccard = common / (|A| + |B| - common).

    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs (stop-shingles): at corpus scale a shingle shared by 10⁶ docs
    creates 10¹² pairs — pruning it changes Jaccard by at most
    1/|smallest doc|, standard practice; None keeps exactness."""
    sh = docs.select(F.col(id_col).alias("_id"),
                     F.explode(token_shingles(F.col(text_col), n))
                     .alias("_sh"))
    if max_shingle_freq:
        freq = (sh.groupBy("_sh").agg(F.count("*").alias("_f"))
                .filter(F.col("_f") <= max_shingle_freq).select("_sh"))
        sh = sh.join(freq, "_sh")
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


def minhash_signatures(docs: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 128, n: int = 3) -> DataFrame:
    """(_id, _shset, _sig): per-doc shingle set + num_perm MinHash values.

    Shingles are exploded once and each permutation is a
    ``min(xxhash64(seed, shingle))`` aggregate — num_perm partial-min
    aggregations in a single scan with map-side combine (shuffles one
    row of num_perm longs per doc), instead of num_perm array passes
    inside one giant codegen'd expression."""
    sh = docs.select(F.col(id_col).alias("_id"),
                     F.explode(token_shingles(F.col(text_col), n))
                     .alias("_sh"))
    aggs = [F.min(F.xxhash64(F.lit(i), "_sh")).alias(f"_h{i}")
            for i in range(num_perm)]
    return (sh.groupBy("_id")
            .agg(F.collect_set("_sh").alias("_shset"), *aggs)
            .select("_id", "_shset",
                    F.array(*[f"_h{i}" for i in range(num_perm)])
                    .alias("_sig")))


def minhash_lsh_pairs(docs: DataFrame, id_col: str, text_col: str,
                      n: int = 3, threshold: float = 0.5,
                      num_perm: int = 128, bands: int = 64) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH + exact verification.

    rows-per-band r = num_perm // bands; candidate recall at similarity s
    is 1 - (1 - s^r)^bands (r=2, b=64, s=0.5 → miss ≈ 1e-8), so the
    verified output equals the exact ngram_jaccard_pairs result with
    overwhelming probability while never forming the cross product.
    """
    r = num_perm // bands
    # eagerly materialized: referenced four times below (both bucket-join
    # sides + both verify sides), and a lazy cache would let every branch
    # recompute the signature lineage on the first action. At corpus
    # scale this is the signature table you'd persist to storage anyway.
    sig = minhash_signatures(docs, id_col, text_col, num_perm, n).cache()
    sig.count()
    band_arr = F.array(*[
        F.struct(F.lit(bi).alias("band"),
                 F.xxhash64(F.slice("_sig", bi * r + 1, r)).alias("bh"))
        for bi in range(bands)])
    buckets = (sig.select("_id", F.explode(band_arr).alias("_b"))
               .select("_id", "_b.band", "_b.bh"))

    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("ia"), F.col("b._id").alias("ib"))
            .distinct())

    sa = sig.select(F.col("_id").alias("ia"), F.col("_shset").alias("_seta"))
    sb = sig.select(F.col("_id").alias("ib"), F.col("_shset").alias("_setb"))
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


def simhash_signatures(docs: DataFrame, id_col: str, text_col: str,
                       n: int = 1) -> DataFrame:
    """(_id, _sh): SimHash via one token explode + 64 sum aggregates
    (map-side partial, one shuffled row per doc) — identical values to
    simhash64 but a ~64× smaller expression tree."""
    feats = tokens(F.col(text_col)) if n == 1 \
        else token_shingles(F.col(text_col), n)
    tok = docs.select(F.col(id_col).alias("_id"),
                      F.explode(feats).alias("_t"))
    h = F.xxhash64("_t")
    aggs = [F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1)
            .alias(f"_b{i}") for i in range(64)]
    packed = F.lit(0).cast("long")
    for i in range(64):
        packed = packed.bitwiseOR(
            F.when(F.col(f"_b{i}") > 0,
                   F.lit(1 << i if i < 63 else -(1 << 63)).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return tok.groupBy("_id").agg(*aggs).select("_id", packed.alias("_sh"))


def embedding_cosine_pairs(docs: DataFrame, id_col: str, vec_col: str,
                           threshold: float = 0.9, bits: int = 8,
                           tables: int = 16, exact: bool = False,
                           seed: int = 42) -> DataFrame:
    """Semantic near-dup pairs (a < b, cos ≥ threshold) over an
    embedding column.

    Default path: random-hyperplane LSH self-bucket-join (one task per
    (table, signature) bucket) + exact cosine verification — the pair
    space is pruned to bucket-local candidates, never |corpus|².
    ``exact=True`` instead broadcasts one side whole (exact recall,
    usable when the corpus fits the broadcast budget — e.g. the oracle
    path at fixture scale)."""
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
        sigs = base.select("_id",
                           F.posexplode(sig_udf(F.col("_v")))
                           .alias("tbl", "sig"))
        sa = sigs.select(F.col("_id").alias("a"), "tbl", "sig")
        sb = sigs.select(F.col("_id").alias("b"), "tbl", "sig")
        ids = (sa.join(sb, ["tbl", "sig"])
               .filter(F.col("a") < F.col("b"))
               .select("a", "b").distinct())
        va = base.select(F.col("_id").alias("a"), F.col("_v").alias("_va"))
        vb = base.select(F.col("_id").alias("b"), F.col("_v").alias("_vb"))
        cand = ids.join(va, "a").join(vb, "b")
    return (cand.select("a", "b",
                        S.cosine(F.col("_va"), F.col("_vb")).alias("cos"))
            .filter(F.col("cos") >= threshold))


def simhash_candidates(docs: DataFrame, id_col: str, text_col: str,
                       chunks: int = 4) -> DataFrame:
    """Near-dup candidate pairs = equal 16-bit SimHash chunk (pigeonhole
    for Hamming ≤ chunks-1); returns (a, b, hamming) for ranking."""
    w = 64 // chunks
    sh = simhash_signatures(docs, id_col, text_col)
    chunk_arr = F.array(*[
        F.struct(F.lit(ci).alias("chunk"),
                 F.shiftright("_sh", ci * w)
                 .bitwiseAND(F.lit((1 << w) - 1)).alias("ck"))
        for ci in range(chunks)])
    buckets = (sh.select("_id", "_sh", F.explode(chunk_arr).alias("_c"))
               .select("_id", "_sh", "_c.chunk", "_c.ck")).cache()
    buckets.count()   # the 64-aggregate simhash runs once, not per side
    a, b = buckets.alias("a"), buckets.alias("b")
    return (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.ck") == F.col("b.ck"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("a"), F.col("b._id").alias("b"),
                    F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh")))
                    .alias("hamming"))
            .distinct())
