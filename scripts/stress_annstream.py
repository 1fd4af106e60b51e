"""ANN index maintenance scaling cell: append cost must be O(batch),
independent of the index size on disk.

``append_to_ivf_index`` / ``append_to_ivf_pq_index`` (and the
streaming wrapper ``start_ann_index_stream``) claim the ingest path
never re-reads or rewrites existing index files — only
``_centroids.json`` / ``_pq_books.json`` (KBs) are opened. If that
holds, appending the SAME batch to a ×1, ×16 and ×64 index shows flat
wall time; any hidden full-index read/compaction would surface as
growth with index size.

Index corpora are materialized (real parquet on disk, not in-plan
amplification) because the thing under test IS the on-disk index
interaction. Usage: python scripts/stress_annstream.py
Prints one JSON line per cell; paste the table into STRESS.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import rakam_api_collector_spark.operators.similarity as S
from rakam_api_collector_spark.session import get_spark
from rakam_api_collector_spark.streaming import start_ann_index_stream
from rakam_api_collector_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
SCALES = (1, 16, 64)


def main() -> None:
    spark = get_spark("stress-annstream")
    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    work = tempfile.mkdtemp(prefix="annstress_")
    try:
        # the append batch: same 2k vectors, ids in a disjoint range
        batch = emb.select((F.col("vec_id") + 10_000_000)
                           .alias("vec_id"), "embedding")
        batch_dir = f"{work}/batch"
        batch.write.parquet(batch_dir)
        books = S.train_pq_codebooks(emb, "vec_id", "embedding",
                                     m=16, nbits=4)
        cents_rows = (emb.filter(F.col("vec_id") < 16)
                      .select("vec_id", "embedding").collect())
        import numpy as np
        cents = np.asarray(
            [[float(x) for x in r.embedding] for r in
             sorted(cents_rows, key=lambda r: r.vec_id)])

        for k in SCALES:
            corpus = (emb.crossJoin(
                F.broadcast(spark.range(k).select(
                    F.col("id").alias("_rep"))))
                .select((F.col("vec_id") + F.col("_rep") * 100_000)
                        .alias("vec_id"), "embedding"))
            for flavor in ("flat", "pq"):
                path = f"{work}/idx_{flavor}_{k}"
                if flavor == "flat":
                    S.build_ivf_index(corpus, "vec_id", "embedding",
                                      path, n_cells=16,
                                      centroids=cents)
                else:
                    S.build_ivf_pq_index(corpus, "vec_id", "embedding",
                                         path, n_cells=16, books=books,
                                         centroids=cents)
                t0 = time.monotonic()
                if flavor == "flat":
                    S.append_to_ivf_index(
                        spark.read.parquet(batch_dir),
                        "vec_id", "embedding", path)
                else:
                    S.append_to_ivf_pq_index(
                        spark.read.parquet(batch_dir),
                        "vec_id", "embedding", path)
                wall = round(time.monotonic() - t0, 2)
                print(json.dumps({
                    "cell": f"append_{flavor}", "index_rows": n0 * k,
                    "batch_rows": n0, "wall_sec": wall}), flush=True)

        # one streamed micro-batch against the LARGEST flat index —
        # the wrapper's own overhead (checkpoint, offset log) on top
        path = f"{work}/idx_flat_{SCALES[-1]}"
        t0 = time.monotonic()
        start_ann_index_stream(
            spark, batch_dir, index_path=path, id_col="vec_id",
            vec_col="embedding",
            checkpoint=f"{work}/ckpt").awaitTermination(300)
        print(json.dumps({
            "cell": "streamed_batch_x%d" % SCALES[-1],
            "index_rows": n0 * SCALES[-1], "batch_rows": n0,
            "wall_sec": round(time.monotonic() - t0, 2)}), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
