"""Operator scaling study — measured evidence for the 100 TB claims.

Correctness runs at sf0.01 prove operators right; this harness proves
they SCALE: each headline operator runs against its sf0.1 input
amplified in-plan ×1 / ×4 / ×16 (crossJoin with a broadcast K-row
range; keys shifted per replica so join/group cardinality scales with
the data), and the per-operator scaling exponent
``log(wall_x16 / wall_x4) / log 4`` is reported — ~1.0 means linear
work growth (what a shuffle-on-key / map-side plan must show), ~2.0
would expose an all-pairs or recursive blow-up hiding behind small
fixtures. The two largest points are used so per-query fixed overhead
(job scheduling, Python worker spin-up) doesn't flatter the exponent.

Similarity workloads are amplified into DISJOINT problem spaces so the
matching structure stays constant per replica instead of exploding
quadratically across replicas:

- text (MinHash / exact dedup): every token is suffixed with the
  replica id, giving replica-disjoint vocabularies — cross-replica
  Jaccard is 0 by construction, so pairs scale ×K, not ×K².
- embeddings (LSH ANN): each replica applies its own deterministic
  per-dimension sign flip — an orthogonal transform, so intra-replica
  cosines (and the true-neighbor structure) are preserved exactly
  while cross-replica directions decorrelate; replica 0 is the
  identity so the fixed query vectors keep their true neighbors.

Amplification happens in-plan, so parquet IO does not scale with K —
the study isolates operator compute/shuffle scaling (IO scaling is the
cluster's problem; operator scaling is this repo's).

Usage: python scripts/scaling_study.py [op ...]   (default: all)
Prints one JSON line per operator; paste the table into STRESS.md.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import rakam_api_collector_spark.operators.dedup as D
import rakam_api_collector_spark.operators.similarity as S
import rakam_api_collector_spark.operators.text as T
from rakam_api_collector_spark.session import get_spark
from rakam_api_collector_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
SCALES = (1, 4, 16)


def amplified(spark, df: DataFrame, k: int,
              shifts: dict[str, int]) -> DataFrame:
    """×k replicas with per-replica key shifts; keeps `_rep` for
    further per-replica transforms."""
    reps = F.broadcast(spark.range(k).withColumnRenamed("id", "_rep"))
    out = df.crossJoin(reps)
    for c, stride in shifts.items():
        out = out.withColumn(c, F.col(c) + F.col("_rep") * F.lit(stride))
    return out


def rep_tokens(text_col: str) -> F.Column:
    """Replica-disjoint vocabulary: every token suffixed with _rep."""
    return F.array_join(
        F.transform(T.tokens(F.col(text_col)),
                    lambda x: F.concat(x, F.lit("·"),
                                       F.col("_rep").cast("string"))),
        " ")


def rep_signs(vec_col: str) -> F.Column:
    """Per-replica orthogonal transform: deterministic sign flip per
    dimension; replica 0 is the identity."""
    return F.transform(
        F.col(vec_col),
        lambda x, i: x * F.when(F.col("_rep") == 0, F.lit(1.0))
        .otherwise(F.when(F.pmod(F.hash(F.col("_rep"), i), 2) == 0,
                          F.lit(1.0)).otherwise(F.lit(-1.0))))


def op_agg_q1(spark, k: int) -> DataFrame:
    """TPC-H Q1 shape (dq08): map-side-combine hash agg — shuffle rows
    stay at #groups regardless of K."""
    li = amplified(spark, load_table(spark, SF_DIR, "lineitem"), k,
                   {"l_orderkey": 10_000_000})
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.sum("l_extendedprice").alias("sum_base"),
                 F.avg("l_discount").alias("avg_disc"),
                 F.count("*").alias("n")))


def op_join_orders(spark, k: int) -> DataFrame:
    """Fact-fact shuffle join: both sides ×K with aligned key shifts, so
    matches scale ×K (disjoint replica key ranges)."""
    li = amplified(spark, load_table(spark, SF_DIR, "lineitem"), k,
                   {"l_orderkey": 10_000_000})
    orders = amplified(spark, load_table(spark, SF_DIR, "orders"), k,
                       {"o_orderkey": 10_000_000})
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.sum("l_extendedprice").alias("rev")))


def op_window_dedup(spark, k: int) -> DataFrame:
    """Window + dedup-first (dq16/17 shape): one shuffle on the
    partition key; keys ×K so partition count scales, size doesn't."""
    ev = amplified(spark, load_table(spark, SF_DIR, "events"), k,
                   {"user_id": 1_000_000})
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), "event_id")
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .groupBy("event_type").agg(F.count("*").alias("n"),
                                       F.sum("value").alias("sv")))


def op_exact_dedup(spark, k: int) -> DataFrame:
    """Exact dedup (llm07 shape): hash-groupBy on content key."""
    docs = amplified(spark, load_table(spark, SF_DIR, "documents"), k,
                     {"doc_id": 10_000_000})
    docs = docs.withColumn("text", rep_tokens("text"))
    return (docs.groupBy(F.xxhash64("text").alias("h"))
            .agg(F.min("doc_id").alias("keep"),
                 F.count("*").alias("copies"))
            .groupBy().agg(F.count("*").alias("groups"),
                           F.sum("copies").alias("docs")))


def op_minhash(spark, k: int) -> DataFrame:
    """MinHash-LSH near-dup pairs (llm09 shape) over replica-disjoint
    vocabularies: banded candidates scale ×K."""
    docs = amplified(spark, load_table(spark, SF_DIR, "documents"), k,
                     {"doc_id": 10_000_000})
    docs = docs.select("doc_id", rep_tokens("text").alias("text"))
    return (D.minhash_lsh_pairs(docs, "doc_id", "text", n=3,
                                threshold=0.5, num_perm=128, bands=64)
            .groupBy().agg(F.count("*").alias("pairs")))


def _embedding_workload(spark, k: int):
    """Shared ANN/exact-top-k inputs: corpus ×K under per-replica
    orthogonal transforms, fixed 5-query probe side."""
    base = load_table(spark, SF_DIR, "embeddings")
    corpus = (amplified(spark, base, k, {"vec_id": 10_000_000})
              .select("vec_id", rep_signs("embedding").alias("embedding")))
    return corpus, base.filter(F.col("vec_id") < 5)


def op_ann_lsh(spark, k: int) -> DataFrame:
    """LSH ANN (llm12 shape) — the corpus-signature side is what
    scales at 100 TB."""
    corpus, queries = _embedding_workload(spark, k)
    return (S.ann_lsh_topk(corpus, queries, "vec_id", "embedding",
                           k=10, bits=6, tables=8, dim=64, probe_bits=3)
            .groupBy().agg(F.count("*").alias("hits")))


def op_exact_topk_blocked(spark, k: int) -> DataFrame:
    """Blocked exact cosine top-k (llm12's gate / the exact-pass scale
    shape): per-batch matmul + local top-k keeps the window input at
    batches×|q|×k rows, so wall must scale with the scan."""
    corpus, queries = _embedding_workload(spark, k)
    return (S.cosine_topk_blocked(corpus, queries, "vec_id",
                                  "embedding", k=10)
            .groupBy().agg(F.count("*").alias("hits")))


_PQ_BOOKS = None


def op_ivf_pq(spark, k: int) -> DataFrame:
    """IVF-PQ ADC search (the persisted-index scoring shape): model
    trained ONCE on the base corpus (a model artifact, not per-run
    work), then cell-assign + encode + JVM table-lookup scoring over
    the ×K corpus — encode is the only Python pass and is map-only,
    so wall must scale with the scan like the other single-scan ops."""
    global _PQ_BOOKS
    corpus, queries = _embedding_workload(spark, k)
    if _PQ_BOOKS is None:
        _PQ_BOOKS = S.train_pq_codebooks(
            load_table(spark, SF_DIR, "embeddings"), "vec_id",
            "embedding", m=16, nbits=4)
    return (S.ivf_pq_topk(corpus, queries, "vec_id", "embedding",
                          k=10, n_cells=16, nprobe=4, m=16, nbits=4,
                          books=_PQ_BOOKS)
            .groupBy().agg(F.count("*").alias("hits")))


def op_dup_span(spark, k: int) -> DataFrame:
    """Exact duplicate-substring removal (llm50 shape) over replica-
    disjoint vocabularies: every window hash is replica-local, so
    duplicated sites (and the rank exchange feeding them) scale ×K —
    a super-linear exponent here would expose the window explode or
    the per-doc coverage rebuild going all-pairs."""
    docs = amplified(spark, load_table(spark, SF_DIR, "documents"), k,
                     {"doc_id": 10_000_000})
    docs = docs.select("doc_id", rep_tokens("text").alias("text"))
    return (D.duplicate_span_removal(docs, "doc_id", "text", k=8)
            .groupBy().agg(F.count("*").alias("docs"),
                           F.sum("n_tokens_removed").alias("cut")))


def op_dup_span_hotkey(spark, k: int) -> DataFrame:
    """Adversarial HOT-KEY cell (the r9 skew finding): every document
    in every replica ends with the SAME un-suffixed tail, so a couple
    of window hashes accumulate 5000×K sites each (~10⁴ at ×4, ~10⁵
    at ×16 — the operator's own target input: corpus-wide boilerplate
    spans). The r10 two-phase canonical aggregate must keep this
    ~linear: partial min/count combine the hot hash map-side and the
    join-back is AQE-skew-splittable, where the old per-hash
    row_number rank concentrated every site in one task."""
    docs = amplified(spark, load_table(spark, SF_DIR, "documents"), k,
                     {"doc_id": 10_000_000})
    hot = (" every single replica shares this exact nine token tail")
    docs = docs.select(
        "doc_id",
        F.concat(rep_tokens("text"), F.lit(hot)).alias("text"))
    return (D.duplicate_span_removal(docs, "doc_id", "text", k=8)
            .groupBy().agg(F.count("*").alias("docs"),
                           F.sum("n_tokens_removed").alias("cut")))


def op_boilerplate(spark, k: int) -> DataFrame:
    """Corpus-level boilerplate line removal (llm47 shape): replica-
    suffixed tokens keep recurring lines replica-local, so the
    distinct-doc line counts and the broadcast set scale ×K."""
    from rakam_api_collector_spark.operators.scrub import \
        remove_boilerplate_lines

    docs = amplified(spark, load_table(spark, SF_DIR, "documents"), k,
                     {"doc_id": 10_000_000})
    synth = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("navigation menu block replica "),
                     F.col("_rep").cast("string")),
            rep_tokens("text"),
            F.concat(F.lit("copyright footer replica "),
                     F.col("_rep").cast("string"), F.lit(" variant "),
                     (F.col("doc_id") % 5).cast("string"))).alias("text"))
    return (remove_boilerplate_lines(synth, "doc_id", "text",
                                     min_docs=3)
            .groupBy().agg(F.count("*").alias("docs"),
                           F.sum("lines_removed").alias("cut")))


_UNI_MODEL = None


def op_unigram_encode(spark, k: int) -> DataFrame:
    """Unigram-LM Viterbi encode (llm51's apply half): the model is
    trained ONCE (a driver-side artifact over the bounded word table),
    then the ×K corpus is encoded by the Arrow-batched Viterbi UDF —
    map-only, so wall must scale with the scan."""
    global _UNI_MODEL
    from rakam_api_collector_spark.operators import unigram as U
    if _UNI_MODEL is None:
        _UNI_MODEL = U.learn_unigram(
            load_table(spark, SF_DIR, "documents")
            .filter(F.col("doc_id") < 300), "text",
            vocab_size=150, seed_size=800)
    docs = amplified(spark, load_table(spark, SF_DIR, "documents"), k,
                     {"doc_id": 10_000_000})
    return (docs.select(F.size(U.unigram_segment(
        F.col("text"), _UNI_MODEL)).alias("n"))
        .groupBy().agg(F.sum("n").alias("pieces"),
                       F.count("*").alias("docs")))


def op_html_extract(spark, k: int) -> DataFrame:
    """HTML → text extraction (operators/html.py shape): a pure
    per-row Arrow map — the exponent must be ~linear with zero
    shuffle; replica id baked into the markup so output rows are
    distinct."""
    from rakam_api_collector_spark.operators.html import html_to_text

    docs = amplified(spark, load_table(spark, SF_DIR, "documents"), k,
                     {"doc_id": 10_000_000})
    pages = docs.select(
        "doc_id",
        F.concat(F.lit("<html><head><title>t</title></head><body>"
                       "<nav><a href='/'>Home</a><a href='/a'>About"
                       "</a></nav><h1>rep "),
                 F.col("_rep").cast("string"),
                 F.lit("</h1><p>"), F.col("text"),
                 F.lit("</p><footer><a href='/t'>Terms</a></footer>"
                       "</body></html>")).alias("page"))
    return (html_to_text(pages, "doc_id", "page")
            .groupBy().agg(F.count("*").alias("docs"),
                           F.sum("n_links").alias("links"),
                           F.sum(F.length("text")).alias("chars")))


def _image_corpus(spark, k: int, hot_every: int = 10) -> DataFrame:
    """(img_id, image) with a PLANTED hot bucket: every ``hot_every``-th
    id carries the IDENTICAL all-black 32×32 PNG (the mass-duplication
    flood — one pHash, every chunk bucket saturated), the rest carry
    per-id seeded noise (uniform pHash spread). Synthesis is in-plan
    (mapInPandas), so the study scales decode+join, not parquet IO."""
    from pyspark.sql import types as T_

    docs = amplified(spark,
                     load_table(spark, SF_DIR, "documents")
                     .select("doc_id"), k, {"doc_id": 10_000_000})
    out = T_.StructType([T_.StructField("img_id", T_.LongType()),
                         T_.StructField("image", T_.BinaryType())])

    def build(batches):
        import numpy as np
        import pandas as pd

        from rakam_api_collector_spark.operators.multimodal import \
            png_encode
        black = png_encode(bytes(32 * 32), 32, 32, 1)
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % hot_every == 0:
                    rows.append((i, black))
                else:
                    px = np.random.default_rng(i).integers(
                        0, 256, 32 * 32, dtype=np.uint8).tobytes()
                    rows.append((i, png_encode(px, 32, 32, 1)))
            yield pd.DataFrame(rows, columns=["img_id", "image"])

    return docs.select("doc_id").mapInPandas(build, out)


def op_phash_hot_capped(spark, k: int) -> DataFrame:
    """Image near-dup with the adversarial flood UNDER the bucket cap:
    the flooded buckets degrade to the O(n) star join
    (operators/phash.py:_capped_bucket_pairs) — the exponent must stay
    ~linear even though 10% of the corpus shares one pHash."""
    from rakam_api_collector_spark.operators.phash import \
        phash_candidates

    imgs = _image_corpus(spark, k)
    return (phash_candidates(imgs, "img_id", "image", max_bucket=100)
            .groupBy().agg(F.count("*").alias("pairs"),
                           F.sum("hamming").alias("ham_sum")))


def op_phash_hot_uncapped(spark, k: int) -> DataFrame:
    """The SAME flood with the cap off — the measured degeneracy the
    cap exists for: the flooded bucket's all-pairs join grows O(n²),
    so the exponent should visibly exceed 1 (documented in STRESS.md
    as the failure mode, not a regression)."""
    from rakam_api_collector_spark.operators.phash import \
        phash_candidates

    imgs = _image_corpus(spark, k)
    return (phash_candidates(imgs, "img_id", "image", max_bucket=None)
            .groupBy().agg(F.count("*").alias("pairs"),
                           F.sum("hamming").alias("ham_sum")))


def op_video_phash_hot_capped(spark, k: int) -> DataFrame:
    """Video near-dup flood under the cap: every hot id is the same
    2-frame black clip, so every (position, chunk) bucket saturates;
    the star degradation must hold the exponent ~linear."""
    from pyspark.sql import types as T_

    from rakam_api_collector_spark.operators.phash import \
        video_phash_candidates

    docs = amplified(spark,
                     load_table(spark, SF_DIR, "documents")
                     .select("doc_id"), k, {"doc_id": 10_000_000})
    out = T_.StructType([T_.StructField("vid_id", T_.LongType()),
                         T_.StructField("video", T_.BinaryType())])

    def build(batches):
        import numpy as np
        import pandas as pd

        from rakam_api_collector_spark.operators.multimodal import (
            pack_video, png_encode)
        black = pack_video([png_encode(bytes(32 * 32), 32, 32, 1)] * 2)
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 10 == 0:
                    rows.append((i, black))
                else:
                    rng = np.random.default_rng(i)
                    frames = [png_encode(
                        rng.integers(0, 256, 32 * 32,
                                     dtype=np.uint8).tobytes(),
                        32, 32, 1) for _ in range(2)]
                    rows.append((i, pack_video(frames)))
            yield pd.DataFrame(rows, columns=["vid_id", "video"])

    vids = docs.select("doc_id").mapInPandas(build, out)
    return (video_phash_candidates(vids, "vid_id", "video",
                                   n_frames=2, max_bucket=100)
            .groupBy().agg(F.count("*").alias("pairs")))


def op_simhash_hot_capped(spark, k: int) -> DataFrame:
    """Text near-dup flood under the cap (the phash_hot text twin):
    every 10th document is byte-identical — one SimHash, every chunk
    bucket flooded — the rest replica-disjoint; the star degradation
    must hold the exponent ~linear."""
    import rakam_api_collector_spark.operators.dedup as DD

    docs = amplified(spark, load_table(spark, SF_DIR, "documents"), k,
                     {"doc_id": 10_000_000})
    flooded = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0,
               F.lit("alpha beta gamma delta epsilon zeta eta theta "
                     "iota kappa lambda mu nu xi omicron pi rho"))
        .otherwise(rep_tokens("text")).alias("text"))
    return (DD.simhash_candidates(flooded, "doc_id", "text",
                                  max_bucket=100)
            .groupBy().agg(F.count("*").alias("pairs"),
                           F.sum("hamming").alias("ham_sum")))


def op_dsir_select(spark, k: int) -> DataFrame:
    """DSIR importance-resampling selection end-to-end
    (operators/dsir.py): two corpus-collapse LM aggregates (map-side
    combine straight to ≤10k bucket rows), the broadcast Δlogp
    per-occurrence weight sum (one id-keyed exchange), Gumbel-top-k
    (TakeOrderedAndProject) — every stage linear-or-better in the raw
    corpus, so the exponent must hold ~linear as raw grows ×K while
    the target stays fixed (the production shape: small trusted
    target, huge raw pool)."""
    from rakam_api_collector_spark.operators.dsir import dsir_select

    docs = load_table(spark, SF_DIR, "documents")
    raw = (amplified(spark, docs, k, {"doc_id": 10_000_000})
           .select("doc_id", "text"))
    target = (docs.filter(F.col("doc_id") % 7 == 0)
              .select("doc_id", "text"))
    return dsir_select(spark, raw, target, "doc_id", "text",
                       k=1000, n=2, buckets=10_000)


def op_token_budget(spark, k: int) -> DataFrame:
    """sample_token_budget (r15): exact token-budget mixture sampling
    — phase A is a map-side-combined (group, bucket) token-sum
    aggregate, phase B a row-local filter plus an ordered window over
    ~1/B of each group. Budget scales with K so the selection stays a
    constant fraction; the exponent must stay ~linear (the whole
    point of the bucket cutoff is never ordering whole groups)."""
    from rakam_api_collector_spark.operators.sampling import \
        sample_token_budget

    # inner ×16 base amplification: the operator is column-pruned
    # integer work, so the raw 5k-row table is fixed-overhead noise —
    # scale the BASE so compute dominates and ×1/×4/×16 stay relative
    docs = (amplified(spark, load_table(spark, SF_DIR, "documents"),
                      k * 16, {"doc_id": 10_000_000})
            .select("doc_id", "source",
                    F.col("n_chars").alias("n_tok")))
    weights = {f"src{i}": 1 / 8 for i in range(8)}
    out = sample_token_budget(docs, "doc_id", "source", "n_tok",
                              weights, budget=4_800_000 * k, seed=1)
    return out.groupBy("source").agg(
        F.count("*").alias("n"), F.sum("n_tok").alias("tok"))


def op_dsir_store_cycle(spark, k: int) -> DataFrame:
    """DsirFeatureStore end-to-end (r15): ingest the raw corpus
    (tokenize once → persisted integer features + B-row count
    partial) then select from the store — the ingest-time twin of
    op_dsir_select. Ingest is the linear-in-grams write; select never
    re-reads text, so the cycle's exponent must stay ~linear and its
    select share shrinks relative to op_dsir_select as K grows."""
    import shutil
    import tempfile

    from rakam_api_collector_spark.operators.dsir import \
        DsirFeatureStore

    docs = load_table(spark, SF_DIR, "documents")
    raw = (amplified(spark, docs, k, {"doc_id": 10_000_000})
           .select("doc_id", "text"))
    target = (docs.filter(F.col("doc_id") % 7 == 0)
              .select("doc_id", "text"))
    base = tempfile.mkdtemp(prefix="dsir_store_")
    try:
        store = DsirFeatureStore(spark, base, n=2, buckets=10_000)
        store.ingest(raw, "doc_id", "text", ingest_id="cell")
        rows = store.select(target, "doc_id", "text",
                            k=1000).count()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame([(rows,)], "selected long")


def op_ivf_rebuild_cycle(spark, k: int) -> DataFrame:
    """IVF index maintenance cycle (r16): build the cell-partitioned
    index over the xK corpus, footer-audit it (ivf_cell_stats — one
    footer read per file, never data pages), and REBUILD it with the
    mass-proportional reseeding (one distinct pass + a seat-pick
    window over cell-local ranks + 2 Lloyd rounds + one partitioned
    rewrite). Every stage is one-or-two corpus passes with k x dim
    driver state, so the cycle's exponent must stay ~linear — the
    claim behind "rebuild when the drift trigger fires" being an
    operable contract at 100 TB rather than a luxury."""
    import shutil
    import tempfile

    from rakam_api_collector_spark.operators import similarity as S

    corpus, _q = _embedding_workload(spark, k)
    base = tempfile.mkdtemp(prefix="ivf_rebuild_")
    try:
        S.build_ivf_index(corpus, "vec_id", "embedding",
                          f"{base}/ivf", n_cells=16)
        stats = S.ivf_cell_stats(f"{base}/ivf")
        S.rebuild_ivf_index(spark, f"{base}/ivf", f"{base}/ivf2")
        s2 = S.ivf_cell_stats(f"{base}/ivf2")
        rows = s2["rows"]
        assert rows == stats["rows"]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame([(rows,)], "indexed long")


def op_trim_silence(spark, k: int) -> DataFrame:
    """trim_silence (multimodal.py) over in-plan-synthesized WAV clips
    — the r14 operator that re-encodes every kept clip's bytes: each
    clip is 0.2 s silence + 0.8 s seeded noise + 0.2 s silence at
    8 kHz mono, so every clip decodes, trims both pads, and re-encodes
    ~2/3 of its bytes. One numpy pass per clip, no shuffle — the
    exponent must stay ~linear in clip count."""
    from pyspark.sql import types as T_

    from rakam_api_collector_spark.operators.multimodal import \
        trim_silence

    docs = amplified(spark,
                     load_table(spark, SF_DIR, "documents")
                     .select("doc_id"), k, {"doc_id": 10_000_000})
    out = T_.StructType([T_.StructField("id", T_.LongType()),
                         T_.StructField("blob", T_.BinaryType())])

    def build(batches):
        import numpy as np
        import pandas as pd

        from rakam_api_collector_spark.operators.multimodal import \
            wav_encode
        sil = np.zeros(1600, dtype="<i2")
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                body = np.random.default_rng(i).integers(
                    -12000, 12000, 6400).astype("<i2")
                samples = np.concatenate([sil, body, sil]).tobytes()
                rows.append((i, wav_encode(samples, 8000, 1)))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    clips = docs.select("doc_id").mapInPandas(build, out)
    return (trim_silence(clips, "id")
            .groupBy().agg(F.count("*").alias("n"),
                           F.sum("n_frames").alias("frames"),
                           F.sum(F.length("blob")).alias("out_bytes")))


def op_constraint_write(spark, k: int) -> DataFrame:
    """ManifestedTable.write with 4 CHECK constraints installed — the
    r15 fused enforcement path (ONE aggregate pre-pass over a
    localCheckpointed frame regardless of N) plus the batch file
    write itself; the exponent must stay ~linear in rows (the
    pre-r15 shape was N scans per write — constant in N now)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from rakam_api_collector_spark.manifest import ManifestedTable

    li = amplified(spark,
                   load_table(spark, SF_DIR, "lineitem")
                   .select("l_orderkey", "l_quantity",
                           "l_extendedprice"),
                   k, {"l_orderkey": 100_000_000}).drop("_rep")
    base = tempfile.mkdtemp(prefix="constraint_cell_")
    try:
        t = ManifestedTable(base, "study", "lineitem")
        for i, c in enumerate(["l_orderkey >= 0", "l_quantity >= 0",
                               "l_quantity < 1000",
                               "l_extendedprice >= 0"]):
            t.add_constraint(f"c{i}", c)
        t.write(li, batch_id=_uuid.uuid4().hex,
                partition_by_day=False)
        rows = t.rows()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame([(rows,)], "rows long")


OPS = {
    "agg_q1": (op_agg_q1, "lineitem", 600_000),
    "join_orders": (op_join_orders, "lineitem+orders", 750_000),
    "window_dedup": (op_window_dedup, "events", 100_000),
    "exact_dedup": (op_exact_dedup, "documents", 5_000),
    "minhash_pairs": (op_minhash, "documents", 5_000),
    "ann_lsh": (op_ann_lsh, "embeddings", 2_000),
    "exact_topk_blocked": (op_exact_topk_blocked, "embeddings", 2_000),
    "ivf_pq": (op_ivf_pq, "embeddings", 2_000),
    "dup_span": (op_dup_span, "documents", 5_000),
    "dup_span_hotkey": (op_dup_span_hotkey, "documents", 5_000),
    "boilerplate": (op_boilerplate, "documents", 5_000),
    "unigram_encode": (op_unigram_encode, "documents", 5_000),
    "html_extract": (op_html_extract, "documents", 5_000),
    "phash_hot_capped": (op_phash_hot_capped, "documents", 5_000),
    "phash_hot_uncapped": (op_phash_hot_uncapped, "documents", 5_000),
    "video_phash_hot_capped": (op_video_phash_hot_capped,
                               "documents", 5_000),
    "simhash_hot_capped": (op_simhash_hot_capped, "documents", 5_000),
    "dsir_select": (op_dsir_select, "documents", 5_000),
    "dsir_store_cycle": (op_dsir_store_cycle, "documents", 5_000),
    "token_budget": (op_token_budget, "documents", 5_000),
    "ivf_rebuild_cycle": (op_ivf_rebuild_cycle, "embeddings", 2_000),
    "trim_silence": (op_trim_silence, "documents", 5_000),
    "constraint_write": (op_constraint_write, "lineitem", 600_000),
}


def main() -> None:
    names = sys.argv[1:] or list(OPS)
    spark = get_spark("scaling_study")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: scan machinery, python workers, codegen
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load_table(spark, SF_DIR, t).count()

    for name in names:
        fn, base_table, base_rows = OPS[name]
        walls: dict[int, float] = {}
        for k in SCALES:
            best = math.inf
            for _ in range(2):                       # min-of-2 vs noise
                # ops that persist intermediates (dsir share_scan)
                # must pay their materialization EVERY rep — the
                # CacheManager matches canonicalized plans, so rep 2
                # would otherwise read rep 1's cache and the exponent
                # would measure only post-cache work
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, k).collect()
                best = min(best, time.perf_counter() - t0)
            walls[k] = round(best, 2)
        exp = round(math.log(walls[16] / walls[4]) / math.log(4), 2)
        print(json.dumps({
            "op": name,
            "base": f"{base_table}@sf0.1 ({base_rows} rows)",
            "wall_sec": {f"x{k}": walls[k] for k in SCALES},
            "rows_per_sec_x16": round(base_rows * 16 / walls[16], 0),
            "scaling_exponent": exp,
        }), flush=True)


if __name__ == "__main__":
    main()
