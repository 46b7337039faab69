#!/usr/bin/env python
"""Spark-only timing sweep over the whole registry (guide §1.4).

For each registry query: build the DataFrame and materialize it through
the noop sink (computes every column, no collect, no oracle).  Prints
one `name seconds` line per query and a JSON summary at the end.  This
is the outlier FINDER for the optimization round — correctness sweeps
(tools/check_correctness.py) remain the green gate.

Usage:
    SPARK_GRAFT_CHECK_SF=/root/testdata/sf0.01 python tools/time_all_queries.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")


def main() -> None:
    from data_pipeline_package_for_python_spark.queries import QUERIES
    from data_pipeline_package_for_python_spark.session import get_spark

    spark = get_spark(app_name="dpp-timing-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[1:] or list(QUERIES)
    out: dict[str, float] = {}
    for name in names:
        q = QUERIES[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        t0 = time.perf_counter()
        try:
            df = q.spark_fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            out[name] = round(dt, 3)
            print(f"{dt:8.3f}s  {name}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            dt = time.perf_counter() - t0
            out[name] = -round(dt, 3)
            print(f"{dt:8.3f}s  {name} ERR {e}", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "metric": "registry_noop_seconds",
        "sf_dir": SF_DIR,
        "n": len(out),
        "queries": out,
    }))


if __name__ == "__main__":
    main()
