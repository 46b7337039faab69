#!/usr/bin/env python
"""Co-partitioned layout session (round 10, VERDICT r9 #1): does paying
the Q3/Q5 fact-edge exchange ONCE at write time (bucketed layout) close
the B3/B4 join residual, and if not, what remains?

Protocol per scale factor:

  1. write orders+lineitem ``bucketBy(o/l_orderkey) sortBy`` into
     ``n_buckets`` buckets (TIMED — the one-time layout cost a 100 TB
     deployment pays at ingest);
  2. global warm-up passes over shipped + bucketed + DuckDB until
     plateau (JIT/codegen steady state, same as bench.py);
  3. interleaved A/B/C timing: shipped shuffle plan / bucketed plan /
     DuckDB, run-by-run, median of N (interleaving cancels drift —
     bench noise on this box is documented at ±20-40%% across
     sessions);
  4. plan audit: Exchange count in the optimized plan of each variant
     (bucketed Q3 must be 0, bucketed Q5 must be ≤1 — pinned by
     tests/test_bucketing.py; recorded here as evidence).

r11: adds the DENORMALIZED star tier (bucketed_star_tables — dims
pre-joined onto orders at ingest; zero dim side at query time) next to
the plain bucketed pair, and writes a per-run suffixed artifact so
repeat sessions never overwrite each other.

Usage:  python tools/bench_bucketed_join.py [sf_dir ...]
        default: /root/repo/.testdata/sf1
Env:    SPARK_GRAFT_BENCH_RUNS (default 5), SPARK_GRAFT_BUCKETS (32),
        SPARK_GRAFT_BENCH_TAG (artifact suffix, default "r11")

Writes BENCH_bucketed_<tag>.json.
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


def main(argv) -> int:
    import duckdb

    from data_pipeline_package_for_python_spark.queries import QUERIES
    from data_pipeline_package_for_python_spark.queries.relational import (
        bucketed_order_tables,
        bucketed_star_tables,
        q3_over_bucketed,
        q3_over_bucketed_star,
        q5_over_bucketed,
        q5_over_bucketed_star,
    )
    from data_pipeline_package_for_python_spark import plans
    from data_pipeline_package_for_python_spark.queries._registry import load
    from data_pipeline_package_for_python_spark.session import get_spark

    sf_dirs = argv[1:] or [os.path.join(ROOT, ".testdata", "sf1")]

    spark = get_spark(app_name="bench-bucketed")
    spark.sparkContext.setLogLevel("ERROR")

    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG", "r11")
    out = {"metric": f"bucketed_join_{tag}", "n_buckets": N_BUCKETS,
           "runs": RUNS, "sf": {}}
    for sf_dir in sf_dirs:
        sf_name = os.path.basename(sf_dir.rstrip("/"))
        con = duckdb.connect()
        for t in ("region", "nation", "customer", "orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )

        t0 = time.perf_counter()
        ob, lib = bucketed_order_tables(spark, sf_dir, N_BUCKETS)
        t_write = time.perf_counter() - t0
        t0 = time.perf_counter()
        ostar, _ = bucketed_star_tables(spark, sf_dir, N_BUCKETS)
        t_write_star = time.perf_counter() - t0

        shipped = {
            "q3": lambda: QUERIES["join_q3_topk"].spark_fn(
                spark, sf_dir).toPandas(),
            "q5": lambda: QUERIES["join_star_q5"].spark_fn(
                spark, sf_dir).toPandas(),
        }
        cust = load(spark, sf_dir, "customer")
        nat = load(spark, sf_dir, "nation")
        reg = load(spark, sf_dir, "region")
        bucketed = {
            "q3": lambda: q3_over_bucketed(spark, ob, lib, cust).toPandas(),
            "q5": lambda: q5_over_bucketed(
                spark, ob, lib, cust, nat, reg).toPandas(),
        }
        star = {
            "q3": lambda: q3_over_bucketed_star(spark, ostar, lib).toPandas(),
            "q5": lambda: q5_over_bucketed_star(spark, ostar, lib).toPandas(),
        }
        duck = {
            "q3": lambda: con.execute(
                QUERIES["join_q3_topk"].oracle).fetchall(),
            "q5": lambda: con.execute(
                QUERIES["join_star_q5"].oracle).fetchall(),
        }

        # plan audit (optimized plan exchange counts)
        audit = {}
        for qid in ("q3", "q5"):
            audit[qid] = {
                "shipped_exchanges": plans.plan_report(
                    QUERIES[
                        "join_q3_topk" if qid == "q3" else "join_star_q5"
                    ].spark_fn(spark, sf_dir)).n_shuffles,
                "bucketed_exchanges": plans.plan_report(
                    q3_over_bucketed(spark, ob, lib, cust) if qid == "q3"
                    else q5_over_bucketed(spark, ob, lib, cust, nat, reg)
                ).n_shuffles,
                "star_exchanges": plans.plan_report(
                    q3_over_bucketed_star(spark, ostar, lib) if qid == "q3"
                    else q5_over_bucketed_star(spark, ostar, lib)
                ).n_shuffles,
            }

        # global steady-state warm-up (same plateau rule as bench.py)
        passes = []
        for i in range(6):
            t0 = time.perf_counter()
            for qid in ("q3", "q5"):
                shipped[qid](); bucketed[qid](); star[qid](); duck[qid]()
            this_pass = time.perf_counter() - t0
            print(f"[{sf_name}] warmup pass {i+1}: {this_pass:.2f}s",
                  file=sys.stderr)
            plateau = i >= 2 and this_pass > min(passes) * 0.9
            passes.append(round(this_pass, 3))
            if plateau:
                break

        sf_out = {"layout_write_sec": round(t_write, 2),
                  "star_layout_extra_sec": round(t_write_star, 2),
                  "warmup_passes": passes, "queries": {}}
        for qid in ("q3", "q5"):
            ts = {"shipped": [], "bucketed": [], "star": [], "duckdb": []}
            for _ in range(RUNS):
                for label, fn in (("shipped", shipped[qid]),
                                  ("bucketed", bucketed[qid]),
                                  ("star", star[qid]),
                                  ("duckdb", duck[qid])):
                    t0 = time.perf_counter()
                    fn()
                    ts[label].append(time.perf_counter() - t0)
            med = {k: statistics.median(v) for k, v in ts.items()}
            sf_out["queries"][qid] = {
                "sec_shipped": round(med["shipped"], 3),
                "sec_bucketed": round(med["bucketed"], 3),
                "sec_star": round(med["star"], 3),
                "sec_duckdb": round(med["duckdb"], 3),
                "ratio_shipped": round(med["shipped"] / med["duckdb"], 2),
                "ratio_bucketed": round(med["bucketed"] / med["duckdb"], 2),
                "ratio_star": round(med["star"] / med["duckdb"], 2),
                "bucketed_speedup": round(
                    med["shipped"] / med["bucketed"], 2),
                "star_speedup": round(med["shipped"] / med["star"], 2),
                **audit[qid],
            }
            print(json.dumps({"sf": sf_name, "q": qid,
                              **sf_out["queries"][qid]}))
        out["sf"][sf_name] = sf_out
        con.close()

    with open(os.path.join(ROOT, f"BENCH_bucketed_{tag}.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "sf"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
