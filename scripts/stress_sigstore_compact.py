"""MinHashStore compaction benefit — per-batch ingest wall against a
store fragmented into many per-epoch partitions vs the same store
compacted to one blob.

The store-side match scan reads every sig partition per batch (driver
file listing + one scan); a long-running stream accretes one partition
per epoch, so the listing/footer overhead grows linearly with stream
age while the row count stays the corpus. compact() (r15) folds the
partitions into one blob. This harness ingests N_EPOCHS small batches,
times a probe batch against the fragmented store, compacts, and times
an identical probe against the blob — same rows, one directory.

Usage: python scripts/stress_sigstore_compact.py [n_epochs] [docs_per]
Prints one JSON line; paste into STRESS.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.sigstore import MinHashStore
from rakam_api_collector_spark.session import get_spark
from rakam_api_collector_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("sigstore_compact_stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (load_table(spark, SF_DIR, "documents")
            .select("doc_id", "text").limit(n_epochs * per + per)
            .collect())

    def frame(rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    base = tempfile.mkdtemp(prefix="sigstress_")
    try:
        # TWIN stores with identical contents — probing the same store
        # twice would dedup the second probe against the first one's
        # surviving docs
        stores = {}
        for name in ("frag", "blob"):
            s = MinHashStore(spark, f"{base}/{name}", threshold=0.5)
            for e in range(n_epochs):
                s.ingest(frame(docs[e * per:(e + 1) * per]),
                         "doc_id", "text", ingest_id=f"e{e}")
            stores[name] = s
        t0 = time.perf_counter()
        merged = stores["blob"].compact()
        compact_wall = round(time.perf_counter() - t0, 2)
        probe = frame(docs[n_epochs * per:])

        def timed_probe(name):
            # min-of-2 via a SAME-ID replay (recomputes with
            # self-exclusion — identical verdict, fresh timing);
            # verdicts compared in full, not by keep-count
            best, verdict = None, None
            for _ in range(2):
                t0 = time.perf_counter()
                v = stores[name].ingest(probe, "doc_id", "text",
                                        ingest_id="probe")
                verdict = {r.doc_id: (r.keep, r.matched_id)
                           for r in v.collect()}
                w = time.perf_counter() - t0
                best = w if best is None else min(best, w)
            return round(best, 2), verdict

        # blob first: any residual warm-up bias then works AGAINST
        # the compaction claim, not for it
        blob_wall, blob_verdict = timed_probe("blob")
        frag_wall, frag_verdict = timed_probe("frag")
        assert frag_verdict == blob_verdict
        print(json.dumps({
            "metric": "sigstore_compact_probe_wall_sec",
            "n_epochs": n_epochs, "docs_per_epoch": per,
            "stored_rows": stores["blob"].stored_sigs().count(),
            "fragmented_probe_sec": frag_wall,
            "compact_sweep_sec": compact_wall,
            "partitions_merged": merged,
            "compacted_probe_sec": blob_wall,
            "speedup": round(frag_wall / blob_wall, 2),
        }), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
