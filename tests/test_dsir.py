"""DSIR importance resampling (operators/dsir.py; Xie et al. NeurIPS
2023) — exact pure-Python replay of the full weight math (the md5
bucketing and seeded Gumbel noise are cross-engine reproducible BY
DESIGN, so the reference implementation here shares no Spark code),
plus the selection-semantics properties and the physical-plan pins the
100 TB shape depends on (broadcast Δlogp join, top-k never a sort)."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select,
    gumbel_noise,
    hashed_ngram_counts,
    ngram_bucket_logprobs,
)

RAW = [
    (0, "the cat sat on the mat"),
    (1, "stock market prices rose sharply today"),
    (2, "the dog sat on the log"),
    (3, "quantum flux capacitors invert the polarity"),
    (4, "a cat and a dog sat together"),
    (5, ""),                                   # zero grams: logw = 0
    (6, "market prices fell"),
]
TARGET = [
    (100, "the cat sat quietly"),
    (101, "a dog sat on the mat"),
    (102, "the cat and the dog"),
]
B = 64          # small bucket count so collisions are exercised
N = 2
ALPHA = 0.5


def _toks(text):
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def _grams(text, n=N):
    t = _toks(text)
    out = []
    for k in range(1, n + 1):
        out += [" ".join(t[i:i + k]) for i in range(len(t) - k + 1)]
    return out


def _bucket(g, buckets=B):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets


def _logprobs(corpus, buckets=B, alpha=ALPHA):
    c = [0] * buckets
    for _, text in corpus:
        for g in _grams(text):
            c[_bucket(g)] += 1
    tot = sum(c)
    return [math.log((cb + alpha) / (tot + alpha * buckets)) for cb in c]


def _logw(text, lt, lr):
    return sum(lt[_bucket(g)] - lr[_bucket(g)] for g in _grams(text))


def _gumbel(key, seed=0):
    h = int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8], 16)
    return -math.log(-math.log((h + 0.5) / (1 << 32)))


@pytest.fixture(scope="module")
def corpora(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    return raw, target


def test_hashed_ngram_counts_exact(spark, corpora):
    """The feature extractor's (id, bucket, cnt) rows equal the
    pure-Python featurization exactly — tokenization, 1..n-gram
    construction, and md5 bucketing all replayed off-Spark."""
    raw, _ = corpora
    got = {(r["doc_id"], r["bucket"]): r["cnt"]
           for r in hashed_ngram_counts(raw, "doc_id", "text",
                                        N, B).collect()}
    want: dict = {}
    for i, text in RAW:
        for g in _grams(text):
            key = (i, _bucket(g))
            want[key] = want.get(key, 0) + 1
    assert got == want


def test_logprobs_densified_and_normalized(spark, corpora):
    """Every bucket 0..B-1 is present (unseen buckets carry smoothed
    mass — the weight join must never drop a one-sided gram), the
    values match the replay, and the probabilities sum to 1 minus the
    mass the smoothing reserves for nothing (i.e. exactly 1)."""
    _, target = corpora
    rows = ngram_bucket_logprobs(spark, target, "doc_id", "text",
                                 N, B, ALPHA).collect()
    assert sorted(r["bucket"] for r in rows) == list(range(B))
    want = _logprobs(TARGET)
    for r in rows:
        assert r["logp"] == pytest.approx(want[r["bucket"]], abs=1e-12)
    assert sum(math.exp(r["logp"]) for r in rows) == pytest.approx(1.0)


def test_log_weights_exact_replay(spark, corpora):
    """logw of every raw doc equals Σ_b c_b·Δlogp_b replayed in pure
    Python; the empty doc is present with logw 0 (kept via the
    pre-explode frame, never dropped by the join)."""
    raw, target = corpora
    t_lp = ngram_bucket_logprobs(spark, target, "doc_id", "text",
                                 N, B, ALPHA)
    r_lp = ngram_bucket_logprobs(spark, raw, "doc_id", "text",
                                 N, B, ALPHA)
    got = {r["doc_id"]: r["logw"]
           for r in dsir_log_weights(raw, t_lp, r_lp, "doc_id", "text",
                                     N, B).collect()}
    lt, lr = _logprobs(TARGET), _logprobs(RAW)
    assert set(got) == {i for i, _ in RAW}
    for i, text in RAW:
        assert got[i] == pytest.approx(_logw(text, lt, lr), abs=1e-9)
    assert got[5] == 0.0


def test_weights_rank_on_distribution_docs_higher(spark, corpora):
    """The semantic contract: raw docs sharing the target's vocabulary
    (cat/dog/sat) outweigh the off-distribution ones (stock market,
    quantum) — the reason the operator exists."""
    raw, target = corpora
    t_lp = ngram_bucket_logprobs(spark, target, "doc_id", "text",
                                 N, B, ALPHA)
    r_lp = ngram_bucket_logprobs(spark, raw, "doc_id", "text", N, B,
                                 ALPHA)
    w = {r["doc_id"]: r["logw"]
         for r in dsir_log_weights(raw, t_lp, r_lp, "doc_id", "text",
                                   N, B).collect()}
    assert min(w[0], w[2], w[4]) > max(w[1], w[3], w[6])


def test_select_deterministic_and_exact(spark, corpora):
    """dsir_select returns exactly the top-k of the replayed
    score = logw/T + Gumbel(seed, id), highest first; same seed →
    identical selection across runs, different seed → same id
    universe, independently perturbed order."""
    raw, target = corpora
    got = dsir_select(spark, raw, target, "doc_id", "text", k=3,
                      n=N, buckets=B, alpha=ALPHA, seed=7,
                      temperature=2.0).collect()
    lt, lr = _logprobs(TARGET), _logprobs(RAW)
    scores = sorted(
        ((_logw(t, lt, lr) / 2.0 + _gumbel(i, 7), i) for i, t in RAW),
        key=lambda s: (-s[0], s[1]))
    assert [r["doc_id"] for r in got] == [i for _, i in scores[:3]]
    for r, (s, _) in zip(got, scores):
        assert r["score"] == pytest.approx(s, abs=1e-9)
    again = dsir_select(spark, raw, target, "doc_id", "text", k=3,
                        n=N, buckets=B, alpha=ALPHA, seed=7,
                        temperature=2.0).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in got]


def test_gumbel_noise_finite_and_seed_keyed(spark):
    """The +0.5 shift keeps u strictly inside (0,1): noise is finite
    for adversarial keys, and reseeding re-perturbs every key."""
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    rows = df.select(gumbel_noise(F.col("k"), 0).alias("g0"),
                     gumbel_noise(F.col("k"), 1).alias("g1")).collect()
    assert all(math.isfinite(r["g0"]) and math.isfinite(r["g1"])
               for r in rows)
    assert sum(1 for r in rows if r["g0"] != r["g1"]) > 1900


def test_plan_pins_broadcast_and_topk(spark, corpora):
    """The 100 TB shape: the Δlogp join is a BROADCAST hash join (the
    corpus scan never shuffles on bucket), and selection plans as
    TakeOrderedAndProject — a bounded per-partition heap, never a
    global Sort."""
    raw, target = corpora
    sel = dsir_select(spark, raw, target, "doc_id", "text", k=2,
                      n=N, buckets=B, alpha=ALPHA)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_validation_raises(spark, corpora):
    raw, target = corpora
    with pytest.raises(ValueError, match="alpha"):
        ngram_bucket_logprobs(spark, raw, "doc_id", "text", N, B, 0.0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_select(spark, raw, target, "doc_id", "text", k=1,
                    temperature=0.0)
    with pytest.raises(ValueError, match="k must"):
        dsir_select(spark, raw, target, "doc_id", "text", k=0)


DUCKDB_DSIR_SQL = f"""
WITH
raw_toks AS (
  SELECT doc_id, list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
           t -> t <> '') AS t FROM raw_docs),
tgt_toks AS (
  SELECT doc_id, list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
           t -> t <> '') AS t FROM target_docs),
raw_grams AS (
  SELECT doc_id, g FROM (
    SELECT doc_id, unnest(t) AS g FROM raw_toks
    UNION ALL
    SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
    FROM raw_toks, unnest(generate_series(1, len(t) - 1)) AS s(i))),
tgt_grams AS (
  SELECT doc_id, g FROM (
    SELECT doc_id, unnest(t) AS g FROM tgt_toks
    UNION ALL
    SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
    FROM tgt_toks, unnest(generate_series(1, len(t) - 1)) AS s(i))),
all_buckets AS (
  SELECT unnest(generate_series(0, {B - 1})) AS bucket),
raw_c AS (
  SELECT CAST('0x' || substring(md5(g), 1, 8) AS UBIGINT) % {B}
           AS bucket, count(*) AS c
  FROM raw_grams GROUP BY 1),
tgt_c AS (
  SELECT CAST('0x' || substring(md5(g), 1, 8) AS UBIGINT) % {B}
           AS bucket, count(*) AS c
  FROM tgt_grams GROUP BY 1),
raw_lp AS (
  SELECT b.bucket,
         ln(COALESCE(rc.c, 0) + {ALPHA})
           - ln((SELECT COALESCE(sum(c), 0) FROM raw_c)
                + {ALPHA * B}) AS lp
  FROM all_buckets b LEFT JOIN raw_c rc USING (bucket)),
tgt_lp AS (
  SELECT b.bucket,
         ln(COALESCE(tc.c, 0) + {ALPHA})
           - ln((SELECT COALESCE(sum(c), 0) FROM tgt_c)
                + {ALPHA * B}) AS lp
  FROM all_buckets b LEFT JOIN tgt_c tc USING (bucket)),
dlp AS (
  SELECT t.bucket, t.lp - r.lp AS d
  FROM tgt_lp t JOIN raw_lp r USING (bucket)),
occ AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(g), 1, 8) AS UBIGINT) % {B}
           AS bucket
  FROM raw_grams),
sums AS (
  SELECT doc_id, sum(d) AS logw
  FROM occ JOIN dlp USING (bucket) GROUP BY doc_id),
w AS (
  SELECT ids.doc_id, COALESCE(s.logw, 0.0) AS logw
  FROM (SELECT DISTINCT doc_id FROM raw_docs) ids
  LEFT JOIN sums s USING (doc_id)),
scored AS (
  SELECT doc_id, logw,
         logw / 2.0 + (-ln(-ln(
           (CAST('0x' || substring(
              md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8)
            AS UBIGINT) + 0.5) / 4294967296.0))) AS score
  FROM w)
SELECT doc_id, logw, score FROM scored
ORDER BY score DESC, doc_id LIMIT 5
"""


def test_duckdb_sql_replay_cross_engine(spark, corpora):
    """The promotion-readiness pin behind the registry's r15 plan: the
    ENTIRE dsir_select math — tokenization, 1..2-gram construction,
    md5 bucketing, smoothed LM fits, Δlogp weights, seeded Gumbel
    noise, top-k — replays as ONE DuckDB SQL statement and selects the
    same ids in the same order with matching values. Cross-engine
    reproducibility is the module's design claim (md5 everywhere);
    this test is the proof, and the SQL is the future driver oracle."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    raw, target = corpora
    got = dsir_select(spark, raw, target, "doc_id", "text", k=5,
                      n=N, buckets=B, alpha=ALPHA, seed=7,
                      temperature=2.0).collect()

    con = duckdb.connect()
    con.register("raw_docs", pd.DataFrame(RAW, columns=["doc_id", "text"]))
    con.register("target_docs",
                 pd.DataFrame(TARGET, columns=["doc_id", "text"]))
    rows = con.execute(DUCKDB_DSIR_SQL).fetchall()

    assert [r[0] for r in rows] == [r["doc_id"] for r in got]
    for (_, logw, score), g in zip(rows, got):
        assert logw == pytest.approx(g["logw"], abs=1e-9)
        assert score == pytest.approx(g["score"], abs=1e-9)


def test_log_weights_fuzz_vs_python_reference(spark):
    """Hypothesis fuzz: for arbitrary printable-ASCII corpora (mixed
    case, digits, punctuation runs, empty and whitespace-only docs,
    duplicated texts), every logw matches the pure-Python replay —
    pinning the tokenize → k-gram → md5-bucket → smoothed-LM → Δ-sum
    chain far beyond the fixed fixture. ASCII alphabet by design: the
    [^a-z0-9]+ tokenizer contract is ASCII, and non-ASCII lower()
    edge cases (e.g. U+0130) are engine-locale quicksand the operator
    deliberately never depends on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list("abcXYZ019 .,!-_\t"))

    @settings(max_examples=10, deadline=None)
    @given(
        raw_texts=st.lists(st.text(alphabet, max_size=40),
                           min_size=1, max_size=8),
        tgt_texts=st.lists(st.text(alphabet, max_size=40),
                           min_size=1, max_size=4),
    )
    def check(raw_texts, tgt_texts):
        raw_rows = list(enumerate(raw_texts))
        tgt_rows = [(100 + i, t) for i, t in enumerate(tgt_texts)]
        raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
        tgt = spark.createDataFrame(tgt_rows, ["doc_id", "text"])
        t_lp = ngram_bucket_logprobs(spark, tgt, "doc_id", "text",
                                     N, B, ALPHA)
        r_lp = ngram_bucket_logprobs(spark, raw, "doc_id", "text",
                                     N, B, ALPHA)
        got = {r["doc_id"]: r["logw"]
               for r in dsir_log_weights(raw, t_lp, r_lp, "doc_id",
                                         "text", N, B).collect()}
        lt, lr = _logprobs(tgt_rows), _logprobs(raw_rows)
        assert set(got) == {i for i, _ in raw_rows}
        for i, text in raw_rows:
            assert got[i] == pytest.approx(_logw(text, lt, lr),
                                           abs=1e-9)

    check()


def test_select_fraction_matches_exact_topk(spark, corpora):
    """The cluster-scale form: with an exact sketch (relative_error 0)
    the fraction cutoff keeps precisely the top-⌈fraction·n⌉ docs of
    the exact-k form — same ids, same scores — while planning only a
    sketch pass plus a row-local filter (no ordered driver merge);
    fraction=1.0 short-circuits to every doc, and out-of-range
    fractions raise."""
    from rakam_api_collector_spark.operators.dsir import \
        dsir_select_fraction

    raw, target = corpora
    frac = dsir_select_fraction(spark, raw, target, "doc_id", "text",
                                fraction=3 / 7, n=N, buckets=B,
                                alpha=ALPHA, seed=7, temperature=2.0,
                                relative_error=0.0).collect()
    exact4 = dsir_select(spark, raw, target, "doc_id", "text", k=4,
                         n=N, buckets=B, alpha=ALPHA, seed=7,
                         temperature=2.0).collect()
    # the contract is fraction·n ± the sketch's RANK error (±1 row at
    # n=7 even with an exact sketch — quantile rank convention): the
    # kept set is a prefix of the exact score order, never a drop of
    # a higher-scored doc in favor of a lower one
    kept = {r["doc_id"] for r in frac}
    order = [r["doc_id"] for r in exact4]
    assert 3 <= len(kept) <= 4
    assert kept == set(order[:len(kept)])
    everything = dsir_select_fraction(spark, raw, target, "doc_id",
                                      "text", fraction=1.0, n=N,
                                      buckets=B, alpha=ALPHA)
    assert everything.count() == len(RAW)
    with pytest.raises(ValueError, match="fraction"):
        dsir_select_fraction(spark, raw, target, "doc_id", "text",
                             fraction=0.0)


def test_trigram_weights_exact_replay(spark, corpora):
    """General-k evidence: the n=3 path (uni+bi+tri-grams) matches the
    pure-Python replay — _kgrams' sequence/slice construction is not
    bigram-special-cased."""
    raw, target = corpora
    t_lp = ngram_bucket_logprobs(spark, target, "doc_id", "text",
                                 3, B, ALPHA)
    r_lp = ngram_bucket_logprobs(spark, raw, "doc_id", "text",
                                 3, B, ALPHA)
    got = {r["doc_id"]: r["logw"]
           for r in dsir_log_weights(raw, t_lp, r_lp, "doc_id", "text",
                                     3, B).collect()}

    def logprobs3(corpus):
        c = [0] * B
        for _, text in corpus:
            for g in _grams(text, n=3):
                c[_bucket(g)] += 1
        tot = sum(c)
        return [math.log((cb + ALPHA) / (tot + ALPHA * B)) for cb in c]

    lt, lr = logprobs3(TARGET), logprobs3(RAW)
    for i, text in RAW:
        want = sum(lt[_bucket(g)] - lr[_bucket(g)]
                   for g in _grams(text, n=3))
        assert got[i] == pytest.approx(want, abs=1e-9)


def test_select_fraction_empty_corpus_returns_empty(spark):
    """ADVICE r14: an empty raw corpus produces an empty scored-weight
    frame; approxQuantile over it returns no quantile, and the
    selection must be the empty frame (matching dsir_select's
    behavior), not an IndexError."""
    from rakam_api_collector_spark.operators.dsir import \
        dsir_select_fraction

    empty = spark.createDataFrame([], "doc_id long, text string")
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    out = dsir_select_fraction(spark, empty, target, "doc_id", "text",
                               fraction=0.5, n=N, buckets=B,
                               alpha=ALPHA)
    assert out.count() == 0
    assert out.columns == ["doc_id", "logw", "score"]
    k_form = dsir_select(spark, empty, target, "doc_id", "text", k=3,
                         n=N, buckets=B, alpha=ALPHA)
    assert k_form.count() == 0


def test_select_fraction_persist_shares_one_weight_pass(spark, corpora):
    """The pay-the-corpus-scan-once escape (r14 verdict item 4):
    with persist=True the cutoff pass materializes the weight frame
    and the filter pass reads the CACHE — the result's plan scans
    InMemoryTableScan, not the raw corpus — with values identical to
    the unpersisted path. Precomputed ``weights=`` skips the chain
    entirely (same plan shape: no re-featurization)."""
    from rakam_api_collector_spark.operators.dsir import (
        dsir_scored_weights,
        dsir_select_fraction,
    )

    raw, target = corpora
    base = dsir_select_fraction(spark, raw, target, "doc_id", "text",
                                fraction=3 / 7, n=N, buckets=B,
                                alpha=ALPHA, seed=7, temperature=2.0,
                                relative_error=0.0)
    cached = dsir_select_fraction(spark, raw, target, "doc_id", "text",
                                  fraction=3 / 7, n=N, buckets=B,
                                  alpha=ALPHA, seed=7, temperature=2.0,
                                  relative_error=0.0, persist=True)
    try:
        got = {(r["doc_id"], round(r["score"], 9))
               for r in cached.collect()}
        # the filter pass consumes the cache, never the corpus again
        plan = cached._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        assert got == {(r["doc_id"], round(r["score"], 9))
                       for r in base.collect()}
    finally:
        spark.catalog.clearCache()

    # caller-materialized weights: the chain is never re-built
    w = dsir_scored_weights(spark, raw, target, "doc_id", "text",
                            n=N, buckets=B, alpha=ALPHA, seed=7,
                            temperature=2.0).localCheckpoint()
    via_weights = dsir_select_fraction(
        spark, raw, target, "doc_id", "text", fraction=3 / 7,
        relative_error=0.0, weights=w)
    assert {r["doc_id"] for r in via_weights.collect()} \
        == {p[0] for p in got}
    exact_via_weights = dsir_select(spark, raw, target, "doc_id",
                                    "text", k=4, weights=w)
    exact = dsir_select(spark, raw, target, "doc_id", "text", k=4,
                        n=N, buckets=B, alpha=ALPHA, seed=7,
                        temperature=2.0)
    assert [r["doc_id"] for r in exact_via_weights.collect()] \
        == [r["doc_id"] for r in exact.collect()]


def test_feature_store_matches_batch_select_exactly(spark, tmp_path):
    """The r15 ingest-time twin (DsirFeatureStore): RAW ingested in
    three chunks, selection from the persisted integer features +
    incremental LM counts — identical ids, logw, score, and ORDER to
    dsir_select over the full text corpus (same md5 chain end to end),
    zero-gram docs included."""
    from rakam_api_collector_spark.operators.dsir import \
        DsirFeatureStore

    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])

    store = DsirFeatureStore(spark, str(tmp_path / "store"),
                             n=N, buckets=B)
    chunks = [RAW[:3], RAW[3:5], RAW[5:]]      # includes the "" doc
    for i, chunk in enumerate(chunks):
        df = spark.createDataFrame(chunk, ["doc_id", "text"])
        assert store.ingest(df, "doc_id", "text",
                            ingest_id=f"epoch-{i}") == len(chunk)

    got = store.select(target, "doc_id", "text", k=5, alpha=ALPHA,
                       seed=7, temperature=2.0).collect()
    want = dsir_select(spark, raw, target, "doc_id", "text", k=5,
                       n=N, buckets=B, alpha=ALPHA, seed=7,
                       temperature=2.0).collect()
    assert [r["_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["logw"] == pytest.approx(w["logw"], abs=1e-12)
        assert g["score"] == pytest.approx(w["score"], abs=1e-12)
    # the zero-gram doc (id 5) is present and selectable
    feats_ids = {r["_id"] for r in store.feats().collect()}
    assert feats_ids == {i for i, _ in RAW}


def test_feature_store_replay_idempotent_and_meta_frozen(spark, tmp_path):
    """At-least-once replay overwrites the ingest partition in place
    (weights unchanged after a double ingest of the same epoch id);
    reopening the store with a different bucket space raises; invalid
    ingest ids are refused before any write."""
    from rakam_api_collector_spark.operators.dsir import \
        DsirFeatureStore

    store = DsirFeatureStore(spark, str(tmp_path / "s"), n=N, buckets=B)
    df = spark.createDataFrame(RAW[:4], ["doc_id", "text"])
    store.ingest(df, "doc_id", "text", ingest_id="epoch-7")
    before = {(r["_id"], r["bucket"], r["cnt"])
              for r in store.feats().collect()}
    lp_before = {r["bucket"]: r["logp"]
                 for r in store.raw_logprobs(ALPHA).collect()}

    store.ingest(df, "doc_id", "text", ingest_id="epoch-7")  # replay
    assert {(r["_id"], r["bucket"], r["cnt"])
            for r in store.feats().collect()} == before
    lp_after = {r["bucket"]: r["logp"]
                for r in store.raw_logprobs(ALPHA).collect()}
    assert lp_after == pytest.approx(lp_before)

    with pytest.raises(ValueError, match="bucket spaces"):
        DsirFeatureStore(spark, str(tmp_path / "s"), n=N,
                         buckets=B * 2)
    with pytest.raises(ValueError, match="invalid ingest_id"):
        store.ingest(df, "doc_id", "text", ingest_id="../evil")


def test_dsir_feature_stream_e2e(spark, tmp_path):
    """start_dsir_feature_stream: a checkpointed availableNow drain
    over a parquet directory featurizes every document once (epoch-
    keyed, replay-idempotent writes), after which store.select equals
    the batch dsir_select over the same corpus; a second drain with
    the same checkpoint ingests nothing new."""
    from rakam_api_collector_spark.operators.dsir import \
        DsirFeatureStore
    from rakam_api_collector_spark.streaming.dsirstream import \
        start_dsir_feature_stream

    src_dir = tmp_path / "docs"
    for i, chunk in enumerate([RAW[:4], RAW[4:]]):
        spark.createDataFrame(chunk, ["doc_id", "text"]) \
            .write.parquet(str(src_dir / f"part{i}"))
    # one flat source dir of files
    files_dir = tmp_path / "flat"
    files_dir.mkdir()
    import shutil
    n_f = 0
    for sub in sorted(src_dir.iterdir()):
        for f in sub.glob("*.parquet"):
            shutil.copy(f, files_dir / f"{n_f}.parquet")
            n_f += 1

    class Counter:
        total = 0

        def add(self, n):
            Counter.total += n

    q = start_dsir_feature_stream(
        spark, str(files_dir), str(tmp_path / "store"), "doc_id",
        "text", str(tmp_path / "ckpt"), n=N, buckets=B,
        max_files_per_trigger=1, stats=Counter())
    q.awaitTermination(120)
    assert Counter.total == len(RAW)

    store = DsirFeatureStore(spark, str(tmp_path / "store"),
                             n=N, buckets=B)
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    got = store.select(target, "doc_id", "text", k=4, alpha=ALPHA,
                       seed=7, temperature=2.0).collect()
    want = dsir_select(spark, raw, target, "doc_id", "text", k=4,
                       n=N, buckets=B, alpha=ALPHA, seed=7,
                       temperature=2.0).collect()
    assert [r["_id"] for r in got] == [r["doc_id"] for r in want]

    # resumed drain with the same checkpoint: nothing re-ingests
    q2 = start_dsir_feature_stream(
        spark, str(files_dir), str(tmp_path / "store"), "doc_id",
        "text", str(tmp_path / "ckpt"), n=N, buckets=B)
    q2.awaitTermination(120)
    assert Counter.total == len(RAW)
    assert {r["_id"] for r in store.feats().collect()} \
        == {i for i, _ in RAW}


def test_dsir_stream_scheduled_compaction(spark, tmp_path):
    """compact_every_n_epochs (r16, VERDICT r15 item 4): a multi-epoch
    drain with the hook on ends with ONE compacted partition pair, the
    selection identical to the batch form, and the replay contract
    intact across the mid-stream compactions — a resumed drain with
    the same checkpoint re-ingests nothing."""
    import os

    from rakam_api_collector_spark.operators.dsir import \
        DsirFeatureStore
    from rakam_api_collector_spark.streaming.dsirstream import \
        start_dsir_feature_stream

    files_dir = tmp_path / "flat"
    files_dir.mkdir()
    chunks = [RAW[:2], RAW[2:4], RAW[4:6], RAW[6:]]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, ["doc_id", "text"]) \
            .coalesce(1).write.parquet(str(tmp_path / f"tmp{i}"))
        import shutil
        f = next((tmp_path / f"tmp{i}").glob("*.parquet"))
        shutil.copy(f, files_dir / f"{i}.parquet")

    q = start_dsir_feature_stream(
        spark, str(files_dir), str(tmp_path / "store"), "doc_id",
        "text", str(tmp_path / "ckpt"), n=N, buckets=B,
        max_files_per_trigger=1, compact_every_n_epochs=2)
    q.awaitTermination(180)

    # one compacted pair, regardless of epoch count
    feats_parts = [d for d in os.listdir(tmp_path / "store" / "feats")
                   if d.startswith("_ingest=")]
    counts_parts = [d for d in os.listdir(tmp_path / "store" / "counts")
                    if d.startswith("_ingest=")]
    assert len(feats_parts) == 1 and feats_parts == counts_parts
    assert feats_parts[0].startswith("_ingest=_c-")

    store = DsirFeatureStore(spark, str(tmp_path / "store"),
                             n=N, buckets=B)
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    got = store.select(target, "doc_id", "text", k=4, alpha=ALPHA,
                       seed=7, temperature=2.0).collect()
    want = dsir_select(spark, raw, target, "doc_id", "text", k=4,
                       n=N, buckets=B, alpha=ALPHA, seed=7,
                       temperature=2.0).collect()
    assert [r["_id"] for r in got] == [r["doc_id"] for r in want]

    # replay across the compactions: resumed drain ingests nothing
    q2 = start_dsir_feature_stream(
        spark, str(files_dir), str(tmp_path / "store"), "doc_id",
        "text", str(tmp_path / "ckpt"), n=N, buckets=B,
        compact_every_n_epochs=2)
    q2.awaitTermination(120)
    assert {r["_id"] for r in store.feats().collect()} \
        == {i for i, _ in RAW}


def test_dsir_store_rejects_null_or_non_numeric_ids(spark, tmp_path):
    """The numeric-id contract (r16, ADVICE r15 medium): ids that are
    NULL or do not cast to long raise at ingest BEFORE any write —
    silently collapsing them to one null row would corrupt the store
    while the batch twin kept working on the raw values."""
    from rakam_api_collector_spark.operators.dsir import \
        DsirFeatureStore

    store = DsirFeatureStore(spark, str(tmp_path / "s"), n=N,
                             buckets=B)
    bad = spark.createDataFrame([("doc-x", "some text"),
                                 ("7", "numeric string ok")],
                                "doc_id string, text string")
    with pytest.raises(ValueError, match="null or non-numeric"):
        store.ingest(bad, "doc_id", "text", ingest_id="e0")
    nullid = spark.createDataFrame([(None, "text")],
                                   "doc_id long, text string")
    with pytest.raises(ValueError, match="null or non-numeric"):
        store.ingest(nullid, "doc_id", "text", ingest_id="e1")
    # nothing landed
    assert store.feats().count() == 0
    # numeric strings cast losslessly and are accepted
    ok = spark.createDataFrame([("7", "numeric string ok")],
                               "doc_id string, text string")
    assert store.ingest(ok, "doc_id", "text", ingest_id="e2") == 1


def test_feature_store_compact_lifecycle(spark, tmp_path):
    """compact() merges every epoch partition pair into one blob with
    results bit-identical (feats rows, LM, selection), the replay
    contract surviving THROUGH compaction (a replayed merged epoch is
    a no-op), post-compact epochs landing beside the blob, and a
    second compact folding blob + new epochs together."""
    from rakam_api_collector_spark.operators.dsir import \
        DsirFeatureStore

    store = DsirFeatureStore(spark, str(tmp_path / "s"), n=N, buckets=B)
    for i, chunk in enumerate([RAW[:3], RAW[3:5], RAW[5:]]):
        store.ingest(spark.createDataFrame(chunk, ["doc_id", "text"]),
                     "doc_id", "text", ingest_id=f"epoch-{i}")
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    feats_before = {(r["_id"], r["bucket"], r["cnt"])
                    for r in store.feats().collect()}
    sel_before = [(r["_id"], r["logw"], r["score"]) for r in
                  store.select(target, "doc_id", "text", k=5,
                               alpha=ALPHA, seed=7,
                               temperature=2.0).collect()]

    assert store.compact() == 3
    import os
    feats_parts = [d for d in os.listdir(tmp_path / "s" / "feats")
                   if d.startswith("_ingest=")]
    counts_parts = [d for d in os.listdir(tmp_path / "s" / "counts")
                    if d.startswith("_ingest=")]
    assert len(feats_parts) == 1 and feats_parts == counts_parts
    assert {(r["_id"], r["bucket"], r["cnt"])
            for r in store.feats().collect()} == feats_before
    assert [(r["_id"], r["logw"], r["score"]) for r in
            store.select(target, "doc_id", "text", k=5, alpha=ALPHA,
                         seed=7, temperature=2.0).collect()] \
        == sel_before

    # replay of a merged epoch: no-op, nothing double-counts
    assert store.ingest(
        spark.createDataFrame(RAW[:3], ["doc_id", "text"]),
        "doc_id", "text", ingest_id="epoch-0") == 0
    assert {(r["_id"], r["bucket"], r["cnt"])
            for r in store.feats().collect()} == feats_before

    # compact is a no-op on a single partition; a fresh epoch lands
    # beside the blob and a second compact folds them together
    assert store.compact() == 0
    extra = [(100, "the cat sat on the mat")]
    store.ingest(spark.createDataFrame(extra, ["doc_id", "text"]),
                 "doc_id", "text", ingest_id="epoch-3")
    assert store.compact() == 2
    ids = {r["_id"] for r in store.feats().collect()}
    assert ids == {i for i, _ in RAW} | {100}
    with pytest.raises(ValueError, match="invalid ingest_id"):
        store.ingest(spark.createDataFrame(extra, ["doc_id", "text"]),
                     "doc_id", "text", ingest_id="_c-fake")


def test_feature_store_compact_crash_recovery(spark, tmp_path):
    """r16 contract: store OPENS are passive (an open can never roll
    back another process's live compaction — ADVICE r15) and READS
    resolve every crash state from the metadata alone — a pre-commit
    blob (no counts twin), a resurrected merged-input dir, and a blob
    whose merged record was lost are all invisible or exactly-once to
    reads the moment the store opens. The destructive convergence
    (roll back / roll forward / sweep) runs inside ingest()/compact(),
    the operations the single-writer window already serializes."""
    import json as _json
    import os

    from rakam_api_collector_spark.operators.dsir import \
        DsirFeatureStore

    base = tmp_path / "s"
    store = DsirFeatureStore(spark, str(base), n=N, buckets=B)
    for i, chunk in enumerate([RAW[:4], RAW[4:]]):
        store.ingest(spark.createDataFrame(chunk, ["doc_id", "text"]),
                     "doc_id", "text", ingest_id=f"epoch-{i}")
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    want = [(r["_id"], round(r["score"], 9)) for r in
            store.select(target, "doc_id", "text", k=5, alpha=ALPHA,
                         seed=7, temperature=2.0).collect()]

    def reopen():
        return DsirFeatureStore(spark, str(base), n=N, buckets=B)

    def sel(s):
        return [(r["_id"], round(r["score"], 9)) for r in
                s.select(target, "doc_id", "text", k=5, alpha=ALPHA,
                         seed=7, temperature=2.0).collect()]

    # (a) pre-commit crash: feats blob + manifest, NO counts twin —
    # dead to reads on a passive open; compact() rolls it back (and
    # sweeps the pre-r16 staging leftover) then folds the epochs
    dead = base / "feats" / "_ingest=_c-dead"
    spark.createDataFrame([(1, 2, 3)], "_id long, bucket int, cnt long") \
        .write.parquet(str(dead))
    with open(dead / "_inputs.json", "w") as f:
        _json.dump({"ids": ["epoch-0", "epoch-1"]}, f)
    (base / "counts" / ".staging-_ingest=_c-dead").mkdir()
    s2 = reopen()
    assert dead.exists()                           # open is passive
    assert sel(s2) == want                         # ...reads resolve
    assert s2.compact() == 2
    assert not dead.exists()                       # rolled back
    assert not (base / "counts" / ".staging-_ingest=_c-dead").exists()
    assert sel(s2) == want

    # (b) delete-step crash: re-create a merged input dir post-compact
    # — dead to reads immediately; the next compact() sweeps it
    blob = [d for d in os.listdir(base / "feats")][0]
    leftover = base / "feats" / "_ingest=epoch-0"
    spark.createDataFrame([(1, 2, 3)], "_id long, bucket int, cnt long") \
        .write.parquet(str(leftover))
    s3 = reopen()
    assert leftover.exists()                       # open is passive
    assert sel(s3) == want                         # ...reads resolve
    assert s3.compact() == 0                       # sweep only
    assert not leftover.exists()                   # swept
    assert sel(s3) == want

    # (c) lost merged record with blob + twin live: reads derive the
    # folded set from the blob's own _inputs manifest (resurrected
    # input stays dead, no double-count); ingest-time recovery
    # re-records, sweeps, and the replayed merged epoch is a no-op
    with open(base / "_merged.json", "w") as f:
        _json.dump({"ids": []}, f)
    spark.createDataFrame([(1, 2, 3)], "_id long, bucket int, cnt long") \
        .write.parquet(str(leftover))
    s4 = reopen()
    assert s4.merged_ids() == set()                # record really lost
    assert sel(s4) == want                         # ...reads resolve
    assert s4.ingest(
        spark.createDataFrame(RAW[:4], ["doc_id", "text"]),
        "doc_id", "text", ingest_id="epoch-0") == 0   # recovery here
    assert {"epoch-0", "epoch-1"} <= s4.merged_ids()
    assert not leftover.exists()
    assert sel(s4) == want
    assert blob in os.listdir(base / "feats")      # blob untouched


def test_feature_store_fuzz_chunked_equals_batch(spark, tmp_path):
    """Hypothesis fuzz over the store: arbitrary printable-ASCII
    corpora ingested under ARBITRARY chunkings (including single-doc
    and whole-corpus chunks, empty/whitespace docs) select identically
    — ids, logw, score — to batch dsir_select over the same corpus;
    an EMPTY store selects the empty frame."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rakam_api_collector_spark.operators.dsir import \
        DsirFeatureStore

    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    empty = DsirFeatureStore(spark, str(tmp_path / "empty"),
                             n=N, buckets=B)
    out = empty.select(target, "doc_id", "text", k=3, alpha=ALPHA)
    assert out.count() == 0

    alphabet = st.sampled_from(list("abcXYZ019 .,!-_\t"))
    counter = {"i": 0}

    @settings(max_examples=6, deadline=None)
    @given(
        raw_texts=st.lists(st.text(alphabet, max_size=40),
                           min_size=1, max_size=8),
        cuts=st.lists(st.integers(min_value=1, max_value=7),
                      max_size=3),
        data=st.data(),
    )
    def check(raw_texts, cuts, data):
        raw_rows = list(enumerate(raw_texts))
        bounds = sorted({c for c in cuts if c < len(raw_rows)})
        chunks, prev = [], 0
        for b in bounds + [len(raw_rows)]:
            if b > prev:
                chunks.append(raw_rows[prev:b])
                prev = b
        counter["i"] += 1
        store = DsirFeatureStore(
            spark, str(tmp_path / f"s{counter['i']}"), n=N, buckets=B)
        for j, chunk in enumerate(chunks):
            store.ingest(
                spark.createDataFrame(chunk, ["doc_id", "text"]),
                "doc_id", "text", ingest_id=f"e{j}")
        k = min(4, len(raw_rows))
        got = store.select(target, "doc_id", "text", k=k, alpha=ALPHA,
                           seed=7, temperature=2.0).collect()
        raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
        want = dsir_select(spark, raw, target, "doc_id", "text", k=k,
                           n=N, buckets=B, alpha=ALPHA, seed=7,
                           temperature=2.0).collect()
        assert [r["_id"] for r in got] == [r["doc_id"] for r in want]
        for g, w in zip(got, want):
            assert g["logw"] == pytest.approx(w["logw"], abs=1e-9)
            assert g["score"] == pytest.approx(w["score"], abs=1e-9)

    check()


def test_feature_store_select_fraction(spark, tmp_path):
    """store.select_fraction: the sketch-cutoff form over persisted
    features keeps exactly the exact-k prefix with an exact sketch —
    the dsir_select_fraction contract fed from the store."""
    from rakam_api_collector_spark.operators.dsir import \
        DsirFeatureStore

    store = DsirFeatureStore(spark, str(tmp_path / "s"), n=N, buckets=B)
    store.ingest(spark.createDataFrame(RAW, ["doc_id", "text"]),
                 "doc_id", "text", ingest_id="e0")
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    frac = store.select_fraction(target, "doc_id", "text",
                                 fraction=3 / 7, alpha=ALPHA, seed=7,
                                 temperature=2.0,
                                 relative_error=0.0).collect()
    exact = store.select(target, "doc_id", "text", k=4, alpha=ALPHA,
                         seed=7, temperature=2.0).collect()
    kept = {r["_id"] for r in frac}
    order = [r["_id"] for r in exact]
    assert 3 <= len(kept) <= 4
    assert kept == set(order[:len(kept)])
