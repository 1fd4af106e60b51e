"""Rebuild-under-live-appender scaling cell (r18, VERDICT r17 item 1
done-criterion): a catch-up round's cost must be O(delta) — flat in
the size of the live index — because the version log names the exact
files each concurrent append added and `_catchup` reads only them.

Measured head-to-head against the pre-r18 shape (a version state
WITHOUT `appended_files`, which forces the anti-join fallback that
scans and shuffles the whole live generation): same src index at
×1/×32/×256 the sf0.1 embeddings, same fixed one-table concurrent
append, one catch-up round into an equivalently-built dest.

Usage: python scripts/stress_indexroot_catchup.py
Prints one JSON line per cell; paste the table into STRESS.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

import rakam_api_collector_spark.operators.similarity as S
from rakam_api_collector_spark.operators.indexroot import VersionedIndex
from rakam_api_collector_spark.session import get_spark
from rakam_api_collector_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
SCALES = (1, 32, 256)


def main() -> None:
    spark = get_spark("stress-indexroot-catchup")
    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    cents_rows = (emb.filter(F.col("vec_id") < 16)
                  .select("vec_id", "embedding").collect())
    cents = np.asarray([[float(x) for x in r.embedding] for r in
                        sorted(cents_rows, key=lambda r: r.vec_id)])
    work = tempfile.mkdtemp(prefix="idxcatchup_")
    try:
        # the concurrent appender's fixed batch: same n0 vectors,
        # ids in a disjoint range — the DELTA is constant per cell
        batch = emb.select((F.col("vec_id") + 1_000_000_000)
                           .alias("vec_id"), "embedding")
        for k in SCALES:
            corpus = (emb.crossJoin(
                F.broadcast(spark.range(k).select(
                    F.col("id").alias("_rep"))))
                .select((F.col("vec_id") + F.col("_rep") * 1_000_000)
                        .alias("vec_id"), "embedding"))
            root = VersionedIndex(f"{work}/root_{k}")
            src = root.new_generation_path()
            S.build_ivf_index(corpus, "vec_id", "embedding", src,
                              n_cells=16, centroids=cents)
            root.publish(src)
            t0 = time.monotonic()
            root.append(batch, "vec_id", "embedding")     # v2, files
            t_append = round(time.monotonic() - t0, 2)
            # dest = what the rebuild worker snapshotted (pre-append)
            dest = root.new_generation_path()
            S.build_ivf_index(corpus, "vec_id", "embedding", dest,
                              n_cells=16, centroids=cents)

            t0 = time.monotonic()
            got = root._catchup(spark, src, dest, 1, 2)
            t_fast = round(time.monotonic() - t0, 2)
            assert got == n0, (got, n0)

            # the pre-r18 shape: strip the recording, same round —
            # the anti-join fallback must scan+shuffle all of src
            st = root._read_version(2)
            st.pop("appended_files")
            root.meta.put(root._log.path_of(2), json.dumps(st))
            dest2 = root.new_generation_path()
            S.build_ivf_index(corpus, "vec_id", "embedding", dest2,
                              n_cells=16, centroids=cents)
            t0 = time.monotonic()
            got = root._catchup(spark, src, dest2, 1, 2)
            t_legacy = round(time.monotonic() - t0, 2)
            assert got == n0, (got, n0)

            print(json.dumps({
                "cell": "catchup", "index_rows": n0 * k,
                "delta_rows": n0, "append_sec": t_append,
                "catchup_fast_sec": t_fast,
                "catchup_fallback_sec": t_legacy}), flush=True)
            shutil.rmtree(f"{work}/root_{k}", ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
