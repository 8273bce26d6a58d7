"""Per-query Spark JOB profile: count + wall time of every job a query runs.

The r15 optimization work is increasingly about the JOB-COUNT floor
(~0.2-0.6 s of scheduler/round-trip cost per tiny job on this host),
not bytes. This tool makes that floor visible per query: it enables the
UI's REST API, runs each named query through the bench's noop-sink
methodology, and reports every Spark job the query submitted — wall
duration, stage count, task count, description — plus the gap between
the sum of job walls and the query's end-to-end time (planning +
driver-side work + scheduler gaps).

Usage:
    python tools/profile_jobs.py [sf_dir] q1,q2,...   > profile.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else []

    from bgg_data_warehouse_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        "profile-jobs", extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"}
    )
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1]) if sc.uiWebUrl else 4049
    app_id = sc.applicationId
    qs = entrymod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup (same as bench.py)
    force(qs["latest_snapshot"](spark, sf_dir))

    import gc

    for name in names or list(qs):
        fn = qs[name]
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        before = {j["jobId"] for j in _api(port, f"applications/{app_id}/jobs")}
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        time.sleep(0.2)
        jobs = [
            j
            for j in _api(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        out = []
        job_wall = 0.0
        for j in jobs:
            try:
                t_sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                t_end = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                frac = float(j["submissionTime"][20:23] or 0) / 1000.0
                frace = float(j["completionTime"][20:23] or 0) / 1000.0
                dur = (time.mktime(t_end) + frace) - (time.mktime(t_sub) + frac)
            except Exception:
                dur = -1.0
            job_wall += max(dur, 0.0)
            out.append(
                {
                    "job": j["jobId"],
                    "dur_s": round(dur, 3),
                    "stages": len(j.get("stageIds", [])),
                    "tasks": j.get("numTasks"),
                    "desc": (j.get("description") or j.get("name", ""))[:100],
                }
            )
        print(
            json.dumps(
                {
                    "query": name,
                    "wall_s": round(wall, 3),
                    "n_jobs": len(jobs),
                    "sum_job_wall_s": round(job_wall, 3),
                    "plan_and_gaps_s": round(wall - job_wall, 3),
                    "jobs": out,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
