#!/usr/bin/env python
"""Round-12 pure-build probe: plan-construction cost per query.

Times ``spark_fn(spark, SF_DIR)`` alone — no action, no noop sink — so
the number is pure driver-side Python/py4j/analyzer work (guide §4
applied at plan-build time; the r11 decomposition methodology).  Each
query is built WARMUP+RUNS times; the median of the last RUNS is
reported, so one-time costs (scan-handle load, gate memo fill) are
excluded — exactly the steady-state per-run cost a registry sweep pays.

Usage:
    [SPARK_GRAFT_CHECK_SF=...] [SPARK_GRAFT_BENCH_RUNS=9]
    python tools/bench_build_r12.py name [name ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "9"))
WARMUP = 2


def main() -> None:
    names = sys.argv[1:]
    from data_pipeline_package_for_python_spark.queries import QUERIES
    from data_pipeline_package_for_python_spark.session import get_spark

    spark = get_spark(app_name="bench-build-r12")
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for name in names:
        fn = QUERIES[name].spark_fn
        times = []
        for i in range(WARMUP + RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR)
            times.append(time.perf_counter() - t0)
        med = statistics.median(times[WARMUP:])
        out[name] = round(med, 4)
        print(
            f"{name}: build median={med*1000:.0f}ms "
            f"runs={[f'{t*1000:.0f}' for t in times]}",
            file=sys.stderr, flush=True,
        )
    print(json.dumps({
        "metric": "pure_build_seconds_median",
        "sf_dir": SF_DIR,
        "runs": RUNS,
        "queries": out,
        "total": round(sum(out.values()), 4),
    }))


if __name__ == "__main__":
    main()
