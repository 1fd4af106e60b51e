"""Per-epoch cost profile of the streaming operators (r18 guide §1).

Each stream wrapper runs a fixed number of availableNow epochs
(maxFilesPerTrigger=1 over a pre-split source), and the profile
records, PER EPOCH, wall seconds and how many Spark jobs the epoch
scheduled (driver round-trips: the measured ~90-210 ms/job fixed
latency is the per-epoch overhead lever, exactly as job-count was for
the batch queries). Job counts come from the driver's own REST API
(localhost UI) — job boundaries are attributed to epochs by
timestamps captured around each foreachBatch call.

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


def profile_dedup(spark, work: str) -> None:
    from rakam_api_collector_spark.operators.sigstore import MinHashStore
    from rakam_api_collector_spark.streaming.dedupstream import \
        start_corpus_dedup_stream
    docs = (load_table(spark, SF_DIR, "documents")
            .select("doc_id", "text").limit(2000))
    src = _split_source(docs, work, N_EPOCHS, "src_dedup")
    store_path = f"{work}/sigstore"
    # run through the wrapper but intercept process via monkey-graft:
    # simplest faithful harness is to re-implement the wrapper's
    # process loop with the same store calls, clocked per epoch.
    store = MinHashStore(spark, store_path)
    clock = None

    def process(batch, epoch_id):
        if batch.isEmpty():
            return
        verdict = store.ingest(batch, "doc_id", "text",
                               ingest_id=f"epoch-prof-{epoch_id:012d}")
        (verdict.write.mode("overwrite")
         .parquet(f"{work}/verdicts/_epoch={epoch_id}"))
        kept = verdict.filter("keep").select("doc_id")
        (batch.join(F.broadcast(kept), "doc_id")
         .write.mode("overwrite")
         .parquet(f"{work}/survivors/_epoch={epoch_id}"))

    clock = EpochClock(spark, process)
    schema = spark.read.parquet(src).schema
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(clock)
         .option("checkpointLocation", f"{work}/ckpt_dedup")
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    print(json.dumps({"cell": "dedupstream", "epochs": clock.rows}),
          flush=True)


def profile_dsir(spark, work: str) -> None:
    from rakam_api_collector_spark.operators.dsir import DsirFeatureStore
    docs = (load_table(spark, SF_DIR, "documents")
            .select("doc_id", "text").limit(2000))
    src = _split_source(docs, work, N_EPOCHS, "src_dsir")
    store = DsirFeatureStore(spark, f"{work}/dsirstore")

    def process(batch, epoch_id):
        if batch.isEmpty():
            return
        store.ingest(batch, "doc_id", "text",
                     ingest_id=f"epoch-prof-{epoch_id:012d}")

    clock = EpochClock(spark, process)
    schema = spark.read.parquet(src).schema
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(clock)
         .option("checkpointLocation", f"{work}/ckpt_dsir")
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    print(json.dumps({"cell": "dsirstream", "epochs": clock.rows}),
          flush=True)


def profile_ann(spark, work: str) -> None:
    import rakam_api_collector_spark.operators.similarity as S
    from rakam_api_collector_spark.operators.indexroot import \
        VersionedIndex

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

    def process(batch, epoch_id):
        if batch.isEmpty():
            return
        from pyspark.sql import Observation
        obs = Observation()
        batch = batch.observe(obs, F.count(F.lit(1)).alias("n"))
        root.append(batch, "vec_id", "embedding")
        stats.add(obs.get["n"])

    clock = EpochClock(spark, process)
    schema = spark.read.parquet(src).schema
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(clock)
         .option("checkpointLocation", f"{work}/ckpt_ann")
         .trigger(availableNow=True).start())
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
