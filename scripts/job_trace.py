"""Per-query job attribution: run one registered query and print every
Spark job it submitted (job id, #stages, #tasks, duration, description)
via the driver REST API — the measurement tool behind the r18/r19
job-count reductions (guide §2.4: at ~0.1-0.3 s fixed latency per
sequential job, job count IS the local wall for the heavy tail, and
corpus passes at scale).

Usage: python scripts/job_trace.py <query_name> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rakam_api_collector_spark.session import get_spark


def main() -> int:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as mod
    qs = mod.queries()
    fn = qs[name]

    spark = get_spark("job_trace",
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from rakam_api_collector_spark.tables import TABLES, load_table
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def jobs_after(min_job: int):
        url = f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        with urllib.request.urlopen(url) as r:
            js = json.loads(r.read())
        return sorted((j for j in js if j["jobId"] >= min_job),
                      key=lambda j: j["jobId"])

    for rep in range(reps):
        tracker = sc.statusTracker()
        start_job = (max(tracker.getJobIdsForGroup(None) or [-1],
                         default=-1) + 1)
        # REST sees all jobs; track the boundary by current max id
        url = f"{ui}/api/v1/applications/{app_id}/jobs"
        with urllib.request.urlopen(url) as r:
            existing = json.loads(r.read())
        boundary = max((j["jobId"] for j in existing), default=-1) + 1
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        time.sleep(0.3)
        js = jobs_after(boundary)
        print(f"\n=== rep {rep}: {name} wall {dt:.3f}s, "
              f"{len(js)} jobs ===")
        for j in js:
            d = (j.get("description") or j.get("name") or "")[:110]
            dur = ""
            try:
                from datetime import datetime
                st = datetime.strptime(j["submissionTime"][:23],
                                       "%Y-%m-%dT%H:%M:%S.%f")
                en = datetime.strptime(j["completionTime"][:23],
                                       "%Y-%m-%dT%H:%M:%S.%f")
                dur = f"{(en - st).total_seconds():6.3f}s"
            except Exception:
                pass
        # second fetch including stage/task counts
            sub = j.get("submissionTime", "")[11:23]
            print(f"  job {j['jobId']:4d} stages={len(j['stageIds']):2d} "
                  f"tasks={j['numTasks']:4d} sub={sub} {dur} {d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
