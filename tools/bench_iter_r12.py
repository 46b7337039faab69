#!/usr/bin/env python
"""Round-12 probe: warm noop-sink medians + job/stage/task counters.

Per query: steady-state warm-up, then RUNS timed executions through the
noop sink (guide §1.4 — computes every column, no sink cost, full plan
in the SQL tab), with job/stage/task counts per run from the status
tracker.  Job count is the lever at fixture scale (the ~70-105 ms/job
local floor); stage count tracks exchanges.

Usage: [SPARK_GRAFT_SF_DIR=...] python tools/bench_iter_r12.py q1 q2 ...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def counters(tracker):
    jobs = tracker.getJobIdsForGroup(None) or []
    n_stages = 0
    n_tasks = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = tracker.getStageInfo(s)
            if si is not None:
                n_tasks += si.numTasks
        n_stages += len(info.stageIds)
    return len(jobs), n_stages, n_tasks


def main() -> None:
    names = sys.argv[1:]
    from data_pipeline_package_for_python_spark.queries import QUERIES
    from data_pipeline_package_for_python_spark.session import get_spark

    spark = get_spark(app_name="bench-iter-r12")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # steady-state warm-up over the whole set
    prev = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for n in names:
            noop(QUERIES[n].spark_fn(spark, SF_DIR))
        t = time.perf_counter() - t0
        if t > prev * 0.9:
            break
        prev = t

    for n in names:
        q = QUERIES[n]
        spark.sparkContext.setJobDescription(f"r12-probe: {n}")
        times = []
        j0, s0, t0c = counters(tracker)
        for _ in range(RUNS):
            t0 = time.perf_counter()
            noop(q.spark_fn(spark, SF_DIR))
            times.append(time.perf_counter() - t0)
        j1, s1, t1c = counters(tracker)
        spark.sparkContext.setJobDescription(None)
        med = statistics.median(times)
        print(
            f"{n}: median={med*1000:.0f}ms "
            f"jobs/run={(j1-j0)/RUNS:.1f} "
            f"stages/run={(s1-s0)/RUNS:.1f} "
            f"tasks/run={(t1c-t0c)/RUNS:.1f} "
            f"runs={[f'{t*1000:.0f}' for t in times]}"
        )


if __name__ == "__main__":
    main()
