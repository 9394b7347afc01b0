"""Per-query cost profiler: splits a queries() entry's wall time into
(a) DataFrame construction (py4j + analysis), (b) first execution
(includes codegen), (c) steady-state execution (min of N more runs),
and counts Spark jobs/stages/tasks triggered by one execution — the
job-wave number that dominates small-scale latency for iterative
plans.

    python tools_profile_query.py simhash_near_dup dup_spans ...

Env: SPARK_GRAFT_SF_DIR (default sf0.1), PROFILE_RUNS (default 2).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROFILE_RUNS", "2"))


def main() -> None:
    names = sys.argv[1:]
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(here, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    import eland_spark as es

    spark = es.get_session("profile_query")
    queries = entry.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm the session like bench.py does (parquet footers only — keep
    # this light; first-run numbers here deliberately INCLUDE codegen)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    results = {}
    for name in names:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter() - t0

        jobs_before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_first = time.perf_counter() - t0
        jobs_after = set(tracker.getJobIdsForGroup(None) or [])
        n_jobs = len(jobs_after - jobs_before)

        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            d2 = fn(spark, SF_DIR)
            d2.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)

        results[name] = {
            "build_s": round(t_build, 3),
            "first_exec_s": round(t_first, 3),
            "steady_total_s": round(best, 3),
            "jobs_per_exec": n_jobs,
        }
        print(f"{name}: {json.dumps(results[name])}", flush=True)

    print("PROFILE " + json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
