"""The composed training-data story the r14 table/selection features
exist for, end to end: curate a corpus into a manifested table, TAG
the exact snapshot a training run consumed, let the corpus move on and
retention sweep, reproduce the run's input by name, fork an
experiment as a zero-copy CLONE guarded by a CHECK constraint, and
DSIR-select its subcorpus toward a target — every step an OCC commit,
every read reproducible."""

from __future__ import annotations

from pyspark.sql import functions as F

from rakam_api_collector_spark import curation as C
from rakam_api_collector_spark.manifest import ManifestedTable
from rakam_api_collector_spark.operators.dsir import dsir_select
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_reproducible_training_run_snapshot(spark, tmp_path):
    docs = (load_table(spark, SF, "documents")
            .select("doc_id", "text", "source"))
    curated = C.CurationPipeline([
        C.gopher_filter(),
        C.exact_dedup(),
    ]).run(docs.filter(F.col("doc_id") < 150))
    n_curated = curated.count()
    assert n_curated > 0

    t = ManifestedTable(str(tmp_path), "corpus", "docs")
    t.write(curated, batch_id="ingest-1")
    t.tag("run-2026-08-16")

    # the corpus moves on and retention sweeps — the tagged snapshot
    # survives both, and reproduces the run's input row set exactly
    t.write(docs.filter((F.col("doc_id") >= 150)
                        & (F.col("doc_id") < 200)), batch_id="ingest-2")
    t.gc(keep_versions=1, grace_seconds=0)
    run_input = t.read(spark, version="run-2026-08-16")
    assert ({r["doc_id"] for r in run_input.collect()}
            == {r["doc_id"] for r in curated.collect()})
    assert t.rows() > n_curated              # head kept moving

    # experiment fork: zero-copy clone, then a CHECK constraint the
    # head table never had — refusing junk appends only on the fork
    exp = ManifestedTable(str(tmp_path), "corpus", "docs_exp")
    exp.clone_from(t)
    exp.add_constraint("has_text", "length(text) > 0", spark=spark)
    assert exp.rows() == t.rows() and not exp.meta.list(exp.batches_dir)

    # target-distribution selection over the fork, deterministic for
    # fixed (corpora, params, seed) — the subcorpus recipe is replayable
    target = docs.filter(F.col("doc_id") % 9 == 0)
    pool = exp.read(spark).select("doc_id", "text")
    sel = dsir_select(spark, pool, target, "doc_id", "text",
                      k=20, buckets=512, seed=11)
    ids = [r["doc_id"] for r in sel.collect()]
    pool_ids = {r["doc_id"] for r in pool.select("doc_id").collect()}
    assert len(ids) == 20 and set(ids) <= pool_ids
    again = dsir_select(spark, pool, target, "doc_id", "text",
                        k=20, buckets=512, seed=11)
    assert [r["doc_id"] for r in again.collect()] == ids
