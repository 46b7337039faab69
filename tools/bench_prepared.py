#!/usr/bin/env python
"""Prepared-plan benchmark: fresh-build vs PreparedQuery re-run (B1-B8).

BASELINE.md's round-3 decomposition attributes 0.05-0.12 s of every
fresh bench query to the Catalyst FRONT-END (py4j construction +
analysis) — a constant a real deployment pays once per statement.  The
round-6 verdict asked for a prepared-plan facility benched HONESTLY:
re-collecting the same DataFrame handle reuses its materialized AQE
query stages (shuffle files) and times only the final stage, so that
shortcut is disallowed.  ``PreparedQuery.dataframe()`` instead mints a
fresh Dataset from the cached ANALYZED plan per run: construction and
analysis are skipped, but optimization, physical planning, and AQE all
re-run on fresh QueryExecutions with fresh shuffle IDs — nothing from
the previous run is reused.

Protocol: same global steady-state warm-up as bench.py (min 3 passes,
plateau vs best), then per query an interleaved A/B of
fresh-build ``toPandas()`` vs prepared ``toPandas()``, median of N.
A sanity gate asserts the two paths return the same row count every
run.  Prints ONE JSON line:

    {"metric": "bench_prepared_vs_fresh", "sf": ..., "queries":
     {"b3": {"fresh": s, "prepared": s, "saved": s, "rows": n}, ...},
     "total_fresh": s, "total_prepared": s, "warmup_passes": [...]}

Usage:
    SPARK_GRAFT_SF_DIR=$PWD/.testdata/sf1 python tools/bench_prepared.py
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

from bench import BENCH_SET  # noqa: E402  (the B1-B8 name map)


def main() -> None:
    from data_pipeline_package_for_python_spark.plans import prepare
    from data_pipeline_package_for_python_spark.queries import QUERIES
    from data_pipeline_package_for_python_spark.session import get_spark

    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark(app_name="dpp-bench-prepared")
    spark.sparkContext.setLogLevel("ERROR")

    # Steady-state warm-up, Spark only (no DuckDB side in this bench).
    warmup_passes: list[float] = []
    for i in range(6):
        t0 = time.perf_counter()
        for names in BENCH_SET.values():
            for name in names:
                QUERIES[name].spark_fn(spark, SF_DIR).toPandas()
        this_pass = time.perf_counter() - t0
        print(f"warmup pass {i + 1}: {this_pass:.2f}s", file=sys.stderr)
        plateau = i >= 2 and this_pass > min(warmup_passes) * 0.9
        warmup_passes.append(round(this_pass, 3))
        if plateau:
            break

    out_q: dict[str, dict] = {}
    for bid, names in BENCH_SET.items():
        fresh_total = prep_total = prep_setup_total = 0.0
        rows = 0
        for name in names:
            q = QUERIES[name]
            t0 = time.perf_counter()
            prep = prepare(q.spark_fn(spark, SF_DIR))
            prep_setup = time.perf_counter() - t0
            # discarded warm-up of both paths
            n_fresh = len(q.spark_fn(spark, SF_DIR).toPandas())
            n_prep = len(prep.toPandas())
            assert n_fresh == n_prep, (name, n_fresh, n_prep)
            rows += n_fresh
            f_times, p_times = [], []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                q.spark_fn(spark, SF_DIR).toPandas()
                f_times.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                got = len(prep.toPandas())
                p_times.append(time.perf_counter() - t0)
                assert got == n_fresh, (name, got, n_fresh)
            fresh_total += statistics.median(f_times)
            prep_total += statistics.median(p_times)
            prep_setup_total += prep_setup
        out_q[bid] = {
            "fresh": round(fresh_total, 4),
            "prepared": round(prep_total, 4),
            "saved": round(fresh_total - prep_total, 4),
            "prepare_sec": round(prep_setup_total, 4),
            "rows": rows,
        }
        print(
            f"{bid}: fresh={fresh_total:.3f}s prepared={prep_total:.3f}s "
            f"saved={fresh_total - prep_total:+.3f}s",
            file=sys.stderr,
        )

    out = {
        "metric": "bench_prepared_vs_fresh",
        "sf": sf,
        "runs": RUNS,
        "queries": out_q,
        "total_fresh": round(sum(v["fresh"] for v in out_q.values()), 4),
        "total_prepared": round(
            sum(v["prepared"] for v in out_q.values()), 4
        ),
        "warmup_passes": warmup_passes,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
