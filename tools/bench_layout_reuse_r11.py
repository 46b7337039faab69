#!/usr/bin/env python
"""Layout amortization measured (round 11): the bucketed (orders,
lineitem) pair was built to close the Q3/Q5 residual — this session
quantifies what the SAME layout is worth to the OTHER orderkey
equijoins (Q12's inequality-lateness rollup, Q4's EXISTS-as-semi-join)
that reuse it for free.

Per query: shipped shuffle plan vs over-the-layout vs DuckDB,
interleaved A/B/C medians of N after a global warm-up to plateau, plus
plan-audit exchange counts.  The layout write is timed separately and
reported once — a session that already ran Q3/Q5 has ALREADY paid it,
so the marginal layout cost of Q12/Q4 is zero; the artifact makes the
amortization arithmetic (write cost ÷ per-query saving × query mix)
explicit.

Usage:  python tools/bench_layout_reuse_r11.py [sf_dir ...]
        default: /root/repo/.testdata/sf10
Env:    SPARK_GRAFT_BENCH_RUNS (default 5), SPARK_GRAFT_BUCKETS (32),
        SPARK_GRAFT_BENCH_TAG (artifact suffix, default
        "layout_reuse_r11")

Writes BENCH_<tag>.json (per-run suffixed — never overwrite a
committed artifact with different args).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
N_BUCKETS = int(os.environ.get("SPARK_GRAFT_BUCKETS", "32"))

# (label, shipped registry name, over-the-layout registry name)
PAIRS = (
    ("q12", "join_q12_late_priority", "join_q12_late_priority_bucketed"),
    ("q4", "join_exists_q4", "join_exists_q4_bucketed"),
    ("q18", "agg_having_q18", "agg_having_q18_bucketed"),
    ("q21", "join_q21_waiting_suppliers", "join_q21_semi_anti_bucketed"),
)


def main(argv) -> int:
    import duckdb

    from data_pipeline_package_for_python_spark import plans
    from data_pipeline_package_for_python_spark.queries import QUERIES
    from data_pipeline_package_for_python_spark.queries.relational import (
        bucketed_order_tables,
    )
    from data_pipeline_package_for_python_spark.session import get_spark

    sf_dirs = argv[1:] or [os.path.join(ROOT, ".testdata", "sf10")]

    spark = get_spark(app_name="bench-layout-reuse")
    spark.sparkContext.setLogLevel("ERROR")

    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG", "layout_reuse_r11")
    out = {"metric": f"bucketed_{tag}", "n_buckets": N_BUCKETS,
           "runs": RUNS, "pairs": [p[0] for p in PAIRS], "sf": {}}

    for sf_dir in sf_dirs:
        sf_name = os.path.basename(sf_dir.rstrip("/"))
        con = duckdb.connect()
        for t in ("orders", "lineitem", "customer", "supplier"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )

        # layout write (cached per session; a Q3/Q5 session already
        # paid this — reported so the amortization math is explicit)
        t0 = time.perf_counter()
        bucketed_order_tables(spark, sf_dir, N_BUCKETS)
        t_write = time.perf_counter() - t0

        sf_out = {"layout_write_sec": round(t_write, 2), "queries": {}}

        fns = {}
        for label, shipped_name, bucketed_name in PAIRS:
            sq, bq = QUERIES[shipped_name], QUERIES[bucketed_name]
            fns[label] = {
                "shipped": (lambda q=sq: q.spark_fn(
                    spark, sf_dir).toPandas()),
                "bucketed": (lambda q=bq: q.spark_fn(
                    spark, sf_dir).toPandas()),
                "duckdb": (lambda q=sq: con.execute(q.oracle).fetchall()),
            }
            sf_out["queries"][label] = {
                "shipped_exchanges": plans.plan_report(
                    sq.spark_fn(spark, sf_dir)).n_shuffles,
                "bucketed_exchanges": plans.plan_report(
                    bq.spark_fn(spark, sf_dir)).n_shuffles,
            }

        passes = []
        for i in range(6):
            t0 = time.perf_counter()
            for label in fns:
                for fn in fns[label].values():
                    fn()
            this_pass = time.perf_counter() - t0
            print(f"[{sf_name}] warmup pass {i+1}: {this_pass:.2f}s",
                  file=sys.stderr)
            plateau = i >= 2 and this_pass > min(passes) * 0.9
            passes.append(round(this_pass, 3))
            if plateau:
                break
        sf_out["warmup_passes"] = passes

        for label in fns:
            ts = {k: [] for k in fns[label]}
            for _ in range(RUNS):
                for variant, fn in fns[label].items():
                    t0 = time.perf_counter()
                    fn()
                    ts[variant].append(time.perf_counter() - t0)
            med = {k: statistics.median(v) for k, v in ts.items()}
            sf_out["queries"][label].update({
                "sec_shipped": round(med["shipped"], 3),
                "sec_bucketed": round(med["bucketed"], 3),
                "sec_duckdb": round(med["duckdb"], 3),
                "ratio_shipped": round(
                    med["shipped"] / med["duckdb"], 2),
                "ratio_bucketed": round(
                    med["bucketed"] / med["duckdb"], 2),
                "bucketed_speedup": round(
                    med["shipped"] / med["bucketed"], 2),
            })
            print(json.dumps(
                {"sf": sf_name, "q": label, **sf_out["queries"][label]}))
        out["sf"][sf_name] = sf_out
        con.close()

    with open(os.path.join(ROOT, f"BENCH_{tag}.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "sf"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
