#!/usr/bin/env python
"""Iteration harness for single bench queries: warm-session median timing
plus job/stage counts from the status tracker (the per-job floor is the
dominant cost at toy scale, so job count is the lever to watch).

Usage: python tools/bench_one.py join_q3_topk join_star_q5 [...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def main() -> None:
    names = sys.argv[1:]
    from data_pipeline_package_for_python_spark.queries import QUERIES
    from data_pipeline_package_for_python_spark.session import get_spark

    spark = get_spark(app_name="bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # steady-state warm-up: run the whole set until pass time plateaus
    prev = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for n in names:
            QUERIES[n].spark_fn(spark, SF_DIR).toPandas()
        t = time.perf_counter() - t0
        if t > prev * 0.9:
            break
        prev = t

    for n in names:
        q = QUERIES[n]
        jobs0 = len(tracker.getJobIdsForGroup(None) or [])
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            q.spark_fn(spark, SF_DIR).toPandas()
            times.append(time.perf_counter() - t0)
        jobs1 = len(tracker.getJobIdsForGroup(None) or [])
        med = statistics.median(times)
        print(
            f"{n}: median={med*1000:.0f}ms  "
            f"jobs/run={(jobs1-jobs0)/RUNS:.1f}  "
            f"runs={[f'{t*1000:.0f}' for t in times]}"
        )


if __name__ == "__main__":
    main()
