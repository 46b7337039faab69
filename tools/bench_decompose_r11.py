#!/usr/bin/env python
"""Decompose each bench query's per-run cost (guide §1):

  build    — q.spark_fn(spark, sf_dir): Python/py4j plan construction
  noop     — df.write.format("noop"): compute every column, discard
             (execution cost without the Arrow collect)
  topandas — df.toPandas(): the bench's timed action (execution +
             Arrow transfer + pandas build)

Each phase is warmed once and reported as the median of N runs, so the
deltas separate "what the engine computes" from "what the harness pays
to build and fetch".  Writes one JSON line; artifact committed as
BENCH_decompose_r11*.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

NAMES = (sys.argv[1:] or [
    "agg_q1", "filter_q6", "join_q3_topk", "join_star_q5",
    "window_running_sum", "window_topk_per_group", "agg_rollup",
    "func_array_explode_tf", "dedup_exact", "dedup_near_minhash",
])


def med(fn, runs: int = RUNS) -> float:
    fn()  # warm-up, discarded
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 4)


def main() -> None:
    from data_pipeline_package_for_python_spark.queries import QUERIES
    from data_pipeline_package_for_python_spark.session import get_spark

    spark = get_spark(app_name="dpp-bench-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    # steady-state warm-up: 2 full passes of every phase
    for _ in range(2):
        for name in NAMES:
            df = QUERIES[name].spark_fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            df.toPandas()

    out = {}
    for name in NAMES:
        q = QUERIES[name]
        spark.sparkContext.setJobDescription(f"decompose:{name}")
        build = med(lambda: q.spark_fn(spark, SF_DIR))
        noop = med(
            lambda: q.spark_fn(spark, SF_DIR)
            .write.format("noop").mode("overwrite").save()
        )
        topandas = med(lambda: q.spark_fn(spark, SF_DIR).toPandas())
        out[name] = {
            "build": build,
            "noop": noop,
            "topandas": topandas,
            "collect_delta": round(topandas - noop, 4),
        }
        print(f"{name}: build={build}s noop={noop}s "
              f"toPandas={topandas}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "metric": "bench_decompose",
        "sf_dir": SF_DIR,
        "runs": RUNS,
        "queries": out,
    }))


if __name__ == "__main__":
    main()
