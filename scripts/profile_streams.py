"""Per-epoch cost profile of the streaming operators (r18 guide §1).

Each stream wrapper runs a fixed number of availableNow epochs
(maxFilesPerTrigger=1 over a pre-split source), and the profile
records, PER EPOCH, wall seconds and how many Spark jobs the epoch
scheduled (driver round-trips: the measured ~90-210 ms/job fixed
latency is the per-epoch overhead lever, exactly as job-count was for
the batch queries). Job counts come from the driver's own REST API
(localhost UI) — job boundaries are attributed to epochs by
timestamps captured around each foreachBatch call.

r19 (ADVICE r18): every cell drives the REAL wrapper
(start_corpus_dedup_stream / start_dsir_feature_stream /
start_ann_index_stream) through a scoped foreachBatch intercept, so
the measured jobs/epoch come from the shipped code path and cannot
silently drift from it as the wrappers evolve.

Usage: python scripts/profile_streams.py [dedup|dsir|ann]...
Prints one JSON line per cell.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from rakam_api_collector_spark.session import get_spark
from rakam_api_collector_spark.tables import load_table

N_EPOCHS = 4
SF_DIR = "/root/testdata/sf0.1"


def _jobs(spark) -> int:
    """Total jobs submitted so far, from the driver REST API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/jobs?status=succeeded"
            "&status=failed&status=running") as r:
        return len(json.loads(r.read()))


class EpochClock:
    """foreachBatch hook: wraps a process fn, records per-epoch wall
    and the job-counter reading before/after each epoch."""

    def __init__(self, spark, fn):
        self.spark, self.fn, self.rows = spark, fn, []

    def __call__(self, batch, epoch_id):
        j0, t0 = _jobs(self.spark), time.monotonic()
        self.fn(batch, epoch_id)
        self.rows.append({"epoch": epoch_id,
                          "wall": round(time.monotonic() - t0, 3),
                          "jobs": _jobs(self.spark) - j0})


def _split_source(df, work: str, n: int, name: str = "src") -> str:
    """Write df as exactly n files so maxFilesPerTrigger=1 yields n
    epochs."""
    src = f"{work}/{name}"
    df.repartition(n).write.parquet(src)
    return src


def _clocked_start(session, starter, **kw):
    """Drive the REAL stream wrapper: a scoped
    DataStreamWriter.foreachBatch intercept wraps whatever process fn
    the wrapper installs with the EpochClock. The intercept lives only
    for the duration of the starter call; the returned query runs the
    wrapper's own closure, clocked."""
    from pyspark.sql.streaming import DataStreamWriter

    captured: dict = {}
    orig = DataStreamWriter.foreachBatch

    def patched(writer, fn):
        clock = EpochClock(session, fn)
        captured["clock"] = clock
        return orig(writer, clock)

    DataStreamWriter.foreachBatch = patched
    try:
        q = starter(**kw)
    finally:
        DataStreamWriter.foreachBatch = orig
    return q, captured["clock"]


def profile_dedup(spark, work: str) -> None:
    from rakam_api_collector_spark.streaming.dedupstream import \
        start_corpus_dedup_stream
    docs = (load_table(spark, SF_DIR, "documents")
            .select("doc_id", "text").limit(2000))
    src = _split_source(docs, work, N_EPOCHS, "src_dedup")
    q, clock = _clocked_start(
        spark, start_corpus_dedup_stream, spark=spark, source_dir=src,
        store_path=f"{work}/sigstore", id_col="doc_id", text_col="text",
        checkpoint=f"{work}/ckpt_dedup",
        verdicts_dir=f"{work}/verdicts",
        survivors_dir=f"{work}/survivors",
        max_files_per_trigger=1)
    q.awaitTermination(600)
    print(json.dumps({"cell": "dedupstream", "epochs": clock.rows}),
          flush=True)


def profile_dsir(spark, work: str) -> None:
    from rakam_api_collector_spark.streaming.dsirstream import \
        start_dsir_feature_stream
    docs = (load_table(spark, SF_DIR, "documents")
            .select("doc_id", "text").limit(2000))
    src = _split_source(docs, work, N_EPOCHS, "src_dsir")
    q, clock = _clocked_start(
        spark, start_dsir_feature_stream, spark=spark, source_dir=src,
        store_path=f"{work}/dsirstore", id_col="doc_id",
        text_col="text", checkpoint=f"{work}/ckpt_dsir",
        max_files_per_trigger=1)
    q.awaitTermination(600)
    print(json.dumps({"cell": "dsirstream", "epochs": clock.rows}),
          flush=True)


def profile_ann(spark, work: str) -> None:
    import rakam_api_collector_spark.operators.similarity as S
    from rakam_api_collector_spark.operators.indexroot import \
        VersionedIndex
    from rakam_api_collector_spark.streaming.annindex import \
        start_ann_index_stream

    emb = load_table(spark, SF_DIR, "embeddings")
    src = _split_source(
        emb.select((F.col("vec_id") + 10_000_000).alias("vec_id"),
                   "embedding"), work, N_EPOCHS, "src_ann")
    root = VersionedIndex(f"{work}/annroot")
    gen = root.new_generation_path()
    S.build_ivf_index(emb, "vec_id", "embedding", gen, n_cells=16)
    root.publish(gen, action="build")

    class Stats:
        total = 0

        def add(self, n):
            self.total += n

    stats = Stats()
    q, clock = _clocked_start(
        spark, start_ann_index_stream, spark=spark, source_dir=src,
        id_col="vec_id", vec_col="embedding",
        checkpoint=f"{work}/ckpt_ann", index_root=root, stats=stats,
        max_files_per_trigger=1)
    q.awaitTermination(600)
    print(json.dumps({"cell": "annstream_root",
                      "stats_total": stats.total,
                      "epochs": clock.rows}), flush=True)


def main() -> None:
    which = set(sys.argv[1:]) or {"dedup", "dsir", "ann"}
    # the tuned session disables the UI; the profile needs the REST
    # job counter, so re-enable it for this measurement session only
    spark = get_spark("profile-streams",
                      extra_conf={"spark.ui.enabled": "true"})
    work = tempfile.mkdtemp(prefix="streamprof_")
    try:
        if "dedup" in which:
            profile_dedup(spark, work)
        if "dsir" in which:
            profile_dsir(spark, work)
        if "ann" in which:
            profile_ann(spark, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
