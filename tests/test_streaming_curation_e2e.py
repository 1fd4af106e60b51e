"""The composed STREAMING training-data story the r15 features exist
for, end to end: documents arrive as a checkpointed stream, the dedup
stream drops near-duplicates and materializes survivors per epoch, the
DSIR feature stream tokenizes each survivor ONCE into the persisted
store, selection builds the training subcorpus WITHOUT re-reading any
text, and the result lands in a constraint-gated, tagged manifested
table whose zero-copy clone survives the source's retention sweep
(the r15 clone-aware gc). Every joint is pinned against its batch
twin — the streaming path must produce exactly what the batch path
would have.

This is the streaming sibling of tests/test_training_run_e2e.py (the
r14 batch composition)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rakam_api_collector_spark.manifest import (ConstraintViolation,
                                                ManifestedTable)
from rakam_api_collector_spark.operators.dsir import (DsirFeatureStore,
                                                      dsir_select)
from rakam_api_collector_spark.streaming.dedupstream import \
    start_corpus_dedup_stream
from rakam_api_collector_spark.streaming.dsirstream import \
    start_dsir_feature_stream

import pytest

# 12 originals + 2 planted near-verbatim duplicates (ids 20, 21)
DOCS = [
    (0, "the cat sat on the mat while rain fell outside the window"),
    (1, "stock market prices rose sharply as traders bought tech"),
    (2, "a recipe for bread needs flour water salt and patient time"),
    (3, "the dog chased the ball across the wet garden grass"),
    (4, "quantum processors require error correction at every gate"),
    (5, "market analysts expect prices to fall when rates rise"),
    (6, "she walked the narrow path between the cliffs at dawn"),
    (7, "the cat and the dog shared the mat by the warm fire"),
    (8, "new tariffs moved grain prices in the futures market"),
    (9, "fold the dough gently and let it rest for an hour"),
    (10, "telescopes capture light that left its star long ago"),
    (11, "the committee approved the budget after a long debate"),
    (20, "the cat sat on the mat while rain fell outside the window!"),
    (21, "stock market prices rose sharply as traders bought tech..."),
]
N, B, ALPHA = 2, 64, 0.5


def test_streaming_curation_to_training_table(spark, tmp_path):
    docs_dir = tmp_path / "arrivals"
    for i, lo_hi in enumerate([(0, 7), (7, 99)]):
        chunk = [d for d in DOCS if lo_hi[0] <= DOCS.index(d) < lo_hi[1]]
        spark.createDataFrame(chunk, ["doc_id", "text"]) \
            .coalesce(1).write.parquet(str(docs_dir / f"c{i}"),
                                       mode="overwrite")
    flat = tmp_path / "flat"
    flat.mkdir()
    import shutil
    n_f = 0
    for sub in sorted(docs_dir.iterdir()):
        for f in sub.glob("*.parquet"):
            shutil.copy(f, flat / f"{n_f}.parquet")
            n_f += 1

    # 1) streaming dedup: near-verbatim copies never reach the corpus
    start_corpus_dedup_stream(
        spark, str(flat), str(tmp_path / "sigs"), "doc_id", "text",
        str(tmp_path / "ckpt_dedup"),
        survivors_dir=str(tmp_path / "survivors"),
        max_files_per_trigger=1, n=3, threshold=0.5,
    ).awaitTermination(120)
    survivors = spark.read.parquet(str(tmp_path / "survivors"))
    kept_ids = {r["doc_id"] for r in survivors.select("doc_id")
                .collect()}
    # exactly ONE of each planted near-dup pair survives (which one
    # depends on epoch arrival order — not part of the contract);
    # every non-duplicated doc survives
    for pair in ({0, 20}, {1, 21}):
        assert len(kept_ids & pair) == 1, (pair, kept_ids)
    assert {i for i, _ in DOCS if 2 <= i <= 11} <= kept_ids
    assert len(kept_ids) == 12

    # 2) streaming DSIR featurization over the survivor stream:
    # tokenize once, never re-read text afterwards
    start_dsir_feature_stream(
        spark, str(tmp_path / "survivors"), str(tmp_path / "store"),
        "doc_id", "text", str(tmp_path / "ckpt_feats"),
        n=N, buckets=B, max_files_per_trigger=1,
    ).awaitTermination(120)
    store = DsirFeatureStore(spark, str(tmp_path / "store"),
                             n=N, buckets=B)
    assert {r["_id"] for r in store.feats().select("_id").collect()} \
        == kept_ids

    # 3) selection toward a market-news target, from features only —
    # pinned against the batch twin over the same survivor corpus
    target = spark.createDataFrame(
        [(100, "market prices rose and traders expect rates to move"),
         (101, "futures prices fell in the grain market")],
        ["doc_id", "text"])
    sel = store.select(target, "doc_id", "text", k=8, alpha=ALPHA,
                       seed=7, temperature=2.0).collect()
    batch = dsir_select(spark,
                        survivors.select("doc_id", "text"), target,
                        "doc_id", "text", k=8, n=N, buckets=B,
                        alpha=ALPHA, seed=7, temperature=2.0).collect()
    assert [r["_id"] for r in sel] == [r["doc_id"] for r in batch]
    selected = {r["_id"] for r in sel}

    # 3b) the trainer's unit is TOKENS, not documents (r16, VERDICT
    # r15 item 7): the selected subcorpus is cut to an exact per-group
    # token budget — seeded-uniform prefix per group, crossing doc
    # included — before anything lands in the governed table
    from rakam_api_collector_spark.operators.sampling import \
        sample_token_budget
    from rakam_api_collector_spark.operators.text import tokens
    WEIGHTS, BUDGET, SEED = {"even": 0.5, "odd": 0.5}, 40, 3
    pool = (survivors.select("doc_id", "text")
            .filter(F.col("doc_id").isin(list(selected)))
            .withColumn("src", F.when(F.col("doc_id") % 2 == 0,
                                      "even").otherwise("odd"))
            .withColumn("n_tok", F.size(tokens(F.col("text")))
                        .cast("long")))
    train = sample_token_budget(pool, "doc_id", "src", "n_tok",
                                WEIGHTS, BUDGET, seed=SEED)
    rows = {r["doc_id"]: r for r in train.collect()}
    picked = set(rows)
    assert picked <= selected and picked

    # the budget property on the final table's contents: each group
    # reaches its token target (or ran out of docs), and dropping its
    # last kept doc falls back under — target + one crossing doc, never
    # more
    import hashlib
    pool_rows = {r["doc_id"]: r for r in pool.collect()}

    def u(k):
        h = hashlib.md5(f"{SEED}:{k}".encode()).hexdigest()[:8]
        return int(h, 16) / (1 << 32)

    for g, wt in WEIGHTS.items():
        target_toks = wt * BUDGET
        kept_g = sorted((i for i in picked
                         if rows[i]["src"] == g),
                        key=lambda i: (u(i), str(i)))
        total = sum(rows[i]["n_tok"] for i in kept_g)
        group_all = [i for i, r in pool_rows.items() if r["src"] == g]
        if set(kept_g) == set(group_all):
            pass                            # group exhausted: keep all
        else:
            assert total >= target_toks     # target reached
        if kept_g:
            assert total - rows[kept_g[-1]]["n_tok"] < target_toks

    # 4) the training table: constraint-gated before anything lands,
    # tagged for reproducibility, cloned zero-copy for the experiment
    train = train.select("doc_id", "text")
    t = ManifestedTable(str(tmp_path), "corpus", "train")
    t.add_constraint("nonempty", "length(text) > 0", spark=spark)
    t.write(train, batch_id="sel-1", partition_by_day=False)
    t.tag("run-r15")
    with pytest.raises(ConstraintViolation):
        t.write(spark.createDataFrame([(99, "")], ["doc_id", "text"]),
                batch_id="bad", partition_by_day=False)

    clone = ManifestedTable(str(tmp_path), "corpus", "train_fork")
    clone.clone_from(t)
    assert clone.constraints == {"nonempty": "length(text) > 0"}

    # the corpus moves on and the source's retention sweeps — the
    # clone still reads (r15 clone-aware gc), the tag still resolves
    t.delete_where(spark, F.col("doc_id") >= 0)     # source empties
    t.gc(keep_versions=1, grace_seconds=0)
    assert {r["doc_id"] for r in clone.read(spark).collect()} == picked
    assert {r["doc_id"]
            for r in t.read(spark, version="run-r15").collect()} \
        == picked
