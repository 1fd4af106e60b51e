"""CurationPipeline: the composed training-data path — stage fusion,
determinism, funnel audit, and end-state equivalence with the staged
operators run one by one."""

from __future__ import annotations

from pyspark.sql import functions as F

from rakam_api_collector_spark import curation as C
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (load_table(spark, SF, "documents")
            .select("doc_id", "text", "source")
            .filter(F.col("doc_id") < 120))


def test_pipeline_composes_and_is_deterministic(spark):
    pipe = C.CurationPipeline([
        C.gopher_filter(),
        C.exact_dedup(),
        C.head_truncate(30),
        C.training_order(n_shards=4, seed=1),
    ])
    docs = _docs(spark)
    a = {(r.doc_id, r.shard, r.pos, r.n_tokens)
         for r in pipe.run(docs).collect()}
    b = {(r.doc_id, r.shard, r.pos, r.n_tokens)
         for r in pipe.run(docs.repartition(7)).collect()}
    assert a == b and len(a) > 0
    assert all(n <= 30 for (_, _, _, n) in a)


def test_pipeline_audit_funnel_counts(spark):
    docs = _docs(spark)
    pipe = C.CurationPipeline([C.gopher_filter(), C.exact_dedup()])
    df, funnel = pipe.run(docs, audit=True)
    names = [n for n, _ in funnel]
    counts = [c for _, c in funnel]
    assert names[0] == "input" and counts[0] == docs.count()
    assert counts[0] >= counts[1] >= counts[2]   # filters only remove
    assert counts[2] == df.count()
    # each stage equals running its operator alone on the prior output
    manual = C.exact_dedup()(C.gopher_filter()(docs))
    assert counts[2] == manual.count()


def test_pipeline_minhash_and_mixture_stages(spark):
    from rakam_api_collector_spark.operators.text import tokens

    docs = _docs(spark).filter(F.col("doc_id") < 40)
    t = tokens(F.col("text"))
    pert = docs.select((F.col("doc_id") + 10000).alias("doc_id"),
                       F.array_join(F.slice(t, 3, F.greatest(
                           F.size(t) - 2, F.lit(0))), " ").alias("text"),
                       "source")
    corpus = docs.unionByName(pert)
    out = C.CurationPipeline([
        C.minhash_dedup(threshold=0.5),
    ]).run(corpus)
    ids = {r.doc_id for r in out.collect()}
    # every planted near-dup collapses to its min-id original; natural
    # dups among the originals may collapse too (hence >=, not ==)
    assert all(i < 10000 for i in ids) and 38 <= len(ids) <= 40

    weights = {"src0": 0.5, "src1": 0.5}
    mixed = C.CurationPipeline([C.mixture(weights)]).run(_docs(spark))
    srcs = {r.source for r in mixed.collect()}
    assert srcs <= set(weights)


def test_semantic_dedup_stage_and_operator(spark):
    """SemDeDup (Abbas et al. 2023): cluster-scoped embedding near-dup
    removal. Ground truth: (1) every pair the operator reports is a
    TRUE cos >= tau pair (checked against the exact all-pairs path —
    no false positives, identical cosines); (2) planted exact copies
    (identical embeddings, higher ids) are always caught (identical
    vectors assign to identical clusters deterministically); (3) the
    stage keeps the min-id member per semantic group and is
    partitioning-invariant."""
    import pytest
    from rakam_api_collector_spark.operators import dedup as D

    emb = (load_table(spark, SF, "embeddings")
           .filter(F.col("vec_id") < 120)
           .select("vec_id", "embedding"))
    copies = emb.filter(F.col("vec_id") < 15).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(copies)

    pairs = D.semantic_dedup_pairs(corpus, "vec_id", "embedding",
                                   threshold=0.9, k=8).collect()
    exact = {(r.a, r.b): r.cos
             for r in D.embedding_cosine_pairs(
                 corpus, "vec_id", "embedding",
                 threshold=0.9, exact=True).collect()}
    assert pairs, "no pairs found at all"
    for r in pairs:
        assert (r.a, r.b) in exact            # no false positive
        assert abs(r.cos - exact[(r.a, r.b)]) < 1e-9
    found = {(r.a, r.b) for r in pairs}
    assert all((i, i + 10000) in found for i in range(15))

    # the stage: copies drop, originals survive, embedding col required
    docs = (load_table(spark, SF, "documents")
            .filter(F.col("doc_id") < 120).select("doc_id", "text"))
    with_vecs = docs.join(
        corpus.select(F.col("vec_id").alias("doc_id"), "embedding"),
        "doc_id")
    planted = with_vecs.unionByName(
        with_vecs.filter(F.col("doc_id") < 15)
        .select((F.col("doc_id") + 10000).alias("doc_id"),
                "text", "embedding"))
    pipe = C.CurationPipeline([C.semantic_dedup(threshold=0.9, k=8)])
    kept = {r.doc_id for r in pipe.run(planted).collect()}
    kept2 = {r.doc_id
             for r in pipe.run(planted.repartition(5)).collect()}
    assert kept == kept2
    assert all(i + 10000 not in kept for i in range(15))
    assert all(i in kept for i in range(15))     # min-id survives
    with pytest.raises(ValueError, match="embedding"):
        pipe.run(docs)


def test_semantic_dedup_pair_budget_guard(spark):
    """The pair_budget guard (auto-k guidance made enforceable): an
    adversarial mode-collapsed corpus — every embedding identical —
    lands in ONE cluster, so the within-cluster pair space is n² no
    matter what k says; the guard must estimate sum(n_c^2) from the
    bounded cluster-count job and raise BEFORE the pair join runs,
    naming the hot cluster. A healthy corpus under the same budget
    sails through, and budget=None never runs the extra job."""
    import pytest
    from rakam_api_collector_spark.operators import dedup as D

    n = 200
    one = (spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i % 3 + 1)) for i in range(8)])
        .alias("embedding")))
    with pytest.raises(ValueError, match="pair_budget"):
        D.semantic_dedup_pairs(one, "vec_id", "embedding", k=4,
                               iters=1, pair_budget=n * 50)
    # spread corpus: k=8 clusters over the real fixture stays under
    # the same per-cluster-quadratic budget and must NOT raise
    emb = (load_table(spark, SF, "embeddings")
           .filter(F.col("vec_id") < 120)
           .select("vec_id", "embedding"))
    out = D.semantic_dedup_pairs(emb, "vec_id", "embedding",
                                 threshold=0.9, k=8,
                                 pair_budget=120 * 120)
    assert out.count() >= 0


def test_span_dedup_stage(spark):
    """The sub-document dedup stage: a licence block pasted into many
    documents is cut from every non-canonical site while the documents
    themselves (which differ, so whole-doc dedup keeps them all)
    survive with their unique content intact; composition with
    gopher_filter runs as one pipeline."""
    block = ("this software is provided as is without warranty of "
             "any kind express or implied")
    # every non-block 8-token window carries a doc-unique token, so
    # ONLY the licence block is a duplicated span
    rows = [(i, f"doc{i} alpha{i} bravo{i} charlie{i} delta{i} "
                f"sentence number {i} {block} tail{i} echo{i} "
                f"foxtrot{i} golf{i} hotel{i} india{i}")
            for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pipe = C.CurationPipeline([C.span_dedup(k=8)])
    out = {r.doc_id: r for r in pipe.run(docs).collect()}
    assert len(out) == 6                      # no documents dropped
    assert block in out[0].text               # canonical copy survives
    for i in range(1, 6):
        assert "without warranty" not in out[i].text
        assert f"sentence number {i}" in out[i].text
        assert out[i].n_tokens_removed > 0
    assert out[0].n_tokens_removed == 0


def test_html_extract_front_stage(spark):
    """Web-corpus entry: html_extract turns markup into the (doc_id,
    text) frame every later stage assumes, and the link-density
    filter drops chrome-dominated pages before they pollute quality
    stats downstream."""
    from rakam_api_collector_spark.tables import load_table

    docs = (load_table(spark, SF, "documents").limit(12)
            .select("doc_id", F.concat(
                F.lit("<html><head><title>T</title></head><body>"
                      "<nav><a href='/'>Home</a></nav><p>"),
                F.col("text"),
                F.lit("</p></body></html>")).alias("html")))
    linkfarm = spark.createDataFrame(
        [(9_999, "<html><body>" + "".join(
            f"<a href='/{i}'>A really long navigation entry {i}</a>"
            for i in range(30)) + "<p>tiny</p></body></html>")],
        "doc_id long, html string")

    pipe = C.CurationPipeline([
        C.html_extract(),
        C.gopher_filter(min_tokens=1),
        C.exact_dedup(),
    ])
    out = pipe.run(docs.unionByName(linkfarm)).collect()
    ids = {r.doc_id for r in out}
    assert 9_999 not in ids                   # link farm filtered
    assert len(ids) > 0
    originals = {r.doc_id: r.text for r in
                 load_table(spark, SF, "documents").limit(12).collect()}
    for r in out:
        want = " ".join(originals[r.doc_id].split())
        assert " ".join(r.text.split("\n")[1].split()) == want
        assert r.title == "T"


def test_dsir_select_stage(spark):
    """The DSIR stage keeps exactly the operator's selected ids as
    FULL document rows (all input columns survive the semi join), is
    partitioning-invariant, and composes after dedup: the stage's
    pool — and therefore its selection — is the deduped corpus."""
    from rakam_api_collector_spark.operators import dsir

    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") % 11 == 0)

    stage = C.dsir_select(target, k=9, buckets=256, seed=3)
    got = stage(docs).collect()
    want = {r["doc_id"] for r in dsir.dsir_select(
        spark, docs, target, "doc_id", "text", k=9,
        buckets=256, seed=3).collect()}
    assert {r["doc_id"] for r in got} == want and len(got) == 9
    assert set(got[0].asDict()) == {"doc_id", "text", "source"}

    rep = {r["doc_id"] for r in stage(docs.repartition(7)).collect()}
    assert rep == want

    pipe = C.CurationPipeline([
        C.exact_dedup(),
        C.dsir_select(target, k=9, buckets=256, seed=3),
    ])
    deduped = C.exact_dedup()(docs)
    want_post = {r["doc_id"] for r in dsir.dsir_select(
        spark, deduped, target, "doc_id", "text", k=9,
        buckets=256, seed=3).collect()}
    assert {r["doc_id"] for r in pipe.run(docs).collect()} == want_post


def test_token_budget_stage(spark):
    """The token-budget stage (r15) equals the operator over the same
    frame, composes after a token-count projection inside one
    pipeline, and each kept group's token total reaches its share of
    the budget (or exhausts the group)."""
    from rakam_api_collector_spark.operators.sampling import \
        sample_token_budget
    from rakam_api_collector_spark.operators.text import token_count

    docs = _docs(spark).withColumn("n_tok",
                                   token_count(F.col("text")))
    weights = {"src0": 0.6, "src1": 0.4}
    budget = 600

    stage = C.token_budget(weights, budget, seed=2)
    got = stage(docs).collect()
    want = {r["doc_id"] for r in sample_token_budget(
        docs, "doc_id", "source", "n_tok", weights, budget,
        seed=2).collect()}
    assert {r["doc_id"] for r in got} == want
    assert set(got[0].asDict()) == {"doc_id", "text", "source",
                                    "n_tok"}
    by_src = {}
    for r in got:
        by_src[r["source"]] = by_src.get(r["source"], 0) + r["n_tok"]
    pool = {r["source"]: r["tot"] for r in docs.groupBy("source")
            .agg(F.sum("n_tok").alias("tot")).collect()}
    for g, w in weights.items():
        assert by_src.get(g, 0) >= min(w * budget, pool.get(g, 0))

    # composes in one pipeline after the projection stage
    pipe = C.CurationPipeline([
        lambda df: df.withColumn("n_tok", token_count(F.col("text"))),
        C.token_budget(weights, budget, seed=2),
    ])
    assert {r["doc_id"] for r in pipe.run(_docs(spark)).collect()} \
        == want
