"""BPE tokenizer induction (operators/bpe.py, Sennrich ACL'16).

Pins the training loop's determinism and classical behavior on a
hand-checkable corpus, the encoder/trainer consistency (segmenting
with the learned table reconstructs the token stream exactly), and
the word-table-not-corpus scale property."""

from __future__ import annotations

from pyspark.sql import functions as F

from rakam_api_collector_spark.operators import bpe as B
from rakam_api_collector_spark.operators.text import tokens
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_learn_bpe_hand_checkable(spark):
    """'low' ×5 and 'lower' ×2: the weighted pair (l,o) dominates
    with count 7 — classical BPE merges it first, then (lo,w). The
    learned table is byte-identical across runs."""
    docs = spark.createDataFrame(
        [(0, "low low low low low"), (1, "lower lower")],
        "doc_id long, text string")
    merges = B.learn_bpe(docs, "text", n_merges=3)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    assert merges == B.learn_bpe(docs, "text", n_merges=3)

    # 'low' (count 5) wins the next merge: low + </w>
    assert merges[2] == ("low", B._EOW)

    # encode: 'low' is one unit; 'lower' starts with the 'low' unit;
    # an unseen word falls back to finer units without error
    seg = spark.createDataFrame(
        [(0, "low lower lowest unseen")], "i long, text string") \
        .select(B.bpe_segment(F.col("text"), merges).alias("u")) \
        .first().u
    assert seg[0] == "low"
    assert seg[1:3] == ["low", "e"] or seg[1] == "low"
    assert "".join(seg).startswith("lowlow")


def test_bpe_segment_reconstructs_token_stream(spark):
    """Lossless segmentation: concatenating each doc's subword units
    equals concatenating its tokens() — the encoder applies the exact
    word rule the trainer (and llm01's tokenizer) uses, on real
    corpus text."""
    docs = (load_table(spark, SF, "documents")
            .filter(F.col("doc_id") < 40).select("doc_id", "text"))
    merges = B.learn_bpe(docs, "text", n_merges=30)
    assert 0 < len(merges) <= 30

    got = (docs.select(
        F.concat_ws("", B.bpe_segment(F.col("text"), merges))
        .alias("joined"),
        F.concat_ws("", tokens(F.col("text"))).alias("expected"))
        .filter(F.col("joined") != F.col("expected")).count())
    assert got == 0

    # merged units actually appear: some doc contains a multi-char unit
    multi = (docs.select(F.explode(
        B.bpe_segment(F.col("text"), merges)).alias("u"))
        .filter((F.length("u") > 1) & (F.col("u") != B._EOW)).count())
    assert multi > 0


def test_min_pair_count_stops_memorization(spark):
    """Merges below the frequency floor never happen: a corpus of
    hapax words yields an empty merge table at min_pair_count=2 (a
    merge per unique spelling would memorize the corpus), while the
    repeated word trains normally."""
    hapax = spark.createDataFrame(
        [(0, "abcd efgh ijkl")], "doc_id long, text string")
    assert B.learn_bpe(hapax, "text", n_merges=5,
                       min_pair_count=2) == []
    rep = spark.createDataFrame(
        [(0, "aa bb aa"), (1, "aa bb cc")], "doc_id long, text string")
    merges = B.learn_bpe(rep, "text", n_merges=2, min_pair_count=2)
    # (a,a) and (a,</w>) tie at weighted count 3; the deterministic
    # count-then-lexical rule picks (a,</w>) ('<' sorts first), then
    # (a, a</w>) — two merges make 'aa' a single unit either way
    assert merges == [("a", B._EOW), ("a", "a" + B._EOW)]
    # the encoder strips the sentinel from emitted units
    seg = rep.select(B.bpe_segment(F.col("text"), merges)
                     .alias("u")).collect()
    assert all("aa" in r.u for r in seg)
