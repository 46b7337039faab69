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


def max_job_id(tracker) -> int:
    jobs = tracker.getJobIdsForGroup(None) or []
    return max(jobs) if jobs else -1


def stage_counts(tracker, j_lo: int, j_hi: int) -> tuple[int, int, int]:
    """(jobs, stages, tasks) for job ids in (j_lo, j_hi].  Must be called
    right after the runs, before the UI store evicts them (the store
    retains only ~1000 jobs, so absolute counts over a long sweep go
    negative — job ids, however, are monotonic)."""
    n_jobs = j_hi - j_lo
    n_stages = 0
    n_tasks = 0
    for j in range(j_lo + 1, j_hi + 1):
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = tracker.getStageInfo(s)
            if si is not None:
                n_tasks += si.numTasks
        n_stages += len(info.stageIds)
    return n_jobs, n_stages, n_tasks


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
        nj = ns = nt = 0
        for _ in range(RUNS):
            j0 = max_job_id(tracker)
            t0 = time.perf_counter()
            noop(q.spark_fn(spark, SF_DIR))
            times.append(time.perf_counter() - t0)
            dj, ds, dt = stage_counts(tracker, j0, max_job_id(tracker))
            nj += dj
            ns += ds
            nt += dt
        spark.sparkContext.setJobDescription(None)
        med = statistics.median(times)
        print(
            f"{n}: median={med*1000:.0f}ms "
            f"jobs/run={nj/RUNS:.1f} "
            f"stages/run={ns/RUNS:.1f} "
            f"tasks/run={nt/RUNS:.1f} "
            f"runs={[f'{t*1000:.0f}' for t in times]}"
        )


if __name__ == "__main__":
    main()
