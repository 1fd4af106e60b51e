"""Unigram-LM tokenizer induction (operators/unigram.py, Kudo ACL'18).

Pins the Viterbi-EM training loop's determinism, single-char coverage,
the encoder/trainer consistency (segments reconstruct the token stream
exactly, even for unseen words/characters), and that the fitted model
actually compresses (frequent whole words become single pieces)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rakam_api_collector_spark.operators import unigram as U
from rakam_api_collector_spark.operators.text import tokens
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_learn_unigram_hand_checkable(spark):
    """A corpus dominated by 'tokenization': the fitted vocabulary
    keeps a long piece covering it (EM concentrates mass on pieces the
    Viterbi path actually uses), the model is byte-identical across
    runs, and every single character present in the corpus stays in
    the vocabulary (total coverage)."""
    docs = spark.createDataFrame(
        [(i, "tokenization " * 5 + f"rare{i}") for i in range(6)],
        "doc_id long, text string")
    model = U.learn_unigram(docs, "text", vocab_size=40,
                            seed_size=200, max_piece_len=6)
    assert model == U.learn_unigram(docs, "text", vocab_size=40,
                                    seed_size=200, max_piece_len=6)
    pieces = {p for p, _ in model}
    corpus_chars = set("tokenizationrare012345")
    assert corpus_chars <= pieces           # coverage never pruned
    assert any(len(p) >= 4 for p in pieces)  # learned long pieces
    # the dominant word segments into FEW pieces (compression), and
    # log-probs are valid (negative, finite)
    seg = U._viterbi("tokenization", dict(model),
                     max(len(p) for p in pieces), -20.0)
    assert "".join(seg) == "tokenization"
    assert len(seg) <= 4
    assert all(lp < 0 for _, lp in model)


def test_unigram_segment_lossless_and_total(spark):
    """Arrow-batched encoder: joined segments equal the token stream
    byte-for-byte on real fixture text, INCLUDING words and characters
    the training corpus never saw (single-char fallback)."""
    docs = load_table(spark, SF, "documents").limit(120)
    model = U.learn_unigram(docs, "text", vocab_size=150,
                            seed_size=800)
    out = (docs.select(
        U.unigram_segment(F.col("text"), model).alias("u"),
        tokens(F.col("text")).alias("t"))
        .select((F.concat_ws("", "u") == F.concat_ws("", "t"))
                .alias("ok"),
                (F.size("u") >= F.size("t")).alias("ge_words"))
        .collect())
    assert all(r.ok for r in out)
    # a word is never segmented ACROSS word boundaries
    assert all(r.ge_words for r in out)
    # unseen chars fall back to singles, still lossless
    alien = spark.createDataFrame([(1, "zzqqxx 7unseen7")],
                                  "i long, text string")
    got = alien.select(
        U.unigram_segment(F.col("text"), model).alias("u")).first().u
    assert "".join(got) == "zzqqxx7unseen7"


def test_unigram_trains_on_word_table_not_corpus(spark):
    """Duplicating every document leaves the learned model unchanged
    up to counts scaling — the fit reads the word-frequency table, so
    corpus size only changes weights proportionally (the 100 TB scale
    property bpe.py pins the same way)."""
    base = load_table(spark, SF, "documents").limit(60)
    doubled = base.unionByName(
        base.select((F.col("doc_id") + 100000).alias("doc_id"),
                    *[c for c in base.columns if c != "doc_id"]))
    m1 = U.learn_unigram(base, "text", vocab_size=80, seed_size=400)
    m2 = U.learn_unigram(doubled, "text", vocab_size=80, seed_size=400)
    assert [p for p, _ in m1] == [p for p, _ in m2]
