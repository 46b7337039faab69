#!/usr/bin/env python
"""Q5-bucketed residual decomposition (round 11, VERDICT r10 #1).

At sf10 the bucketed Q5 runs ~0.86-1.14 s vs DuckDB's ~0.33-0.38 s
(2.6-3.0x) and nobody has measured where the residual goes.  This times
each stage of the plan SEPARATELY via noop-format writes (full
materialization, no driver transfer, no file output):

  li_scan      lineitem_b projected scan alone (the irreducible floor)
  o_scan       orders_b date-filtered projected scan alone
  dims         customer x nation x region(ASIA) broadcast-dim build
  enriched     o JOIN broadcast(dims)
  fact         li JOIN enriched (no rollup)
  full         the complete Q5-bucketed (rollup included)

plus two candidate fixes, timed the same way:

  full_cached_dims  dims .cache()d once, query re-executed over the
                    memory-resident dim (kills the per-execution scan +
                    two dim joins; broadcast build itself remains)
  full_flat_dim     dims pre-joined ONCE into a flat parquet catalog
                    table (c_custkey, n_name, r_name); the query scans
                    it with the ASIA filter pushed down and broadcasts
                    the result — one flat scan instead of a 3-way join
                    per execution

Each label is timed interleaved round-robin, median of RUNS, after the
same warm-up plateau rule as bench.py.

Usage:  python tools/bench_q5_decompose_r11.py [sf_dir]
        default /root/repo/.testdata/sf10
Env:    SPARK_GRAFT_BENCH_RUNS (default 5), SPARK_GRAFT_BUCKETS (32)

Writes BENCH_q5_decompose_r11_<sfname>.json (per-run suffixed name).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F  # noqa: E402

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
N_BUCKETS = int(os.environ.get("SPARK_GRAFT_BUCKETS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main(argv) -> int:
    from data_pipeline_package_for_python_spark.queries._registry import (
        load,
        ssum,
    )
    from data_pipeline_package_for_python_spark.queries.relational import (
        bucketed_order_tables,
        q5_over_bucketed,
    )
    from data_pipeline_package_for_python_spark.session import get_spark

    sf_dir = argv[1] if len(argv) > 1 else os.path.join(
        ROOT, ".testdata", "sf10")
    sf_name = os.path.basename(sf_dir.rstrip("/"))

    spark = get_spark(app_name="bench-q5-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    ob, lib = bucketed_order_tables(spark, sf_dir, N_BUCKETS)
    t_layout = time.perf_counter() - t0

    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")

    def mk_dims():
        r = reg.filter(F.col("r_name") == "ASIA").select("r_regionkey")
        return (
            cust.select("c_custkey", "c_nationkey")
            .join(
                F.broadcast(
                    nat.select("n_nationkey", "n_regionkey", "n_name")
                ),
                F.col("c_nationkey") == F.col("n_nationkey"),
            )
            .join(F.broadcast(r),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select("c_custkey", "n_name")
        )

    def mk_o():
        return ob.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        ).select("o_orderkey", "o_custkey")

    def mk_li():
        return lib.select("l_orderkey", "l_extendedprice", "l_discount")

    def enriched_over(dims_df):
        o = mk_o()
        return o.join(
            F.broadcast(dims_df), o.o_custkey == dims_df.c_custkey
        ).select("o_orderkey", "n_name")

    def full_over(dims_df):
        li = mk_li()
        e = enriched_over(dims_df)
        return (
            li.join(e, li.l_orderkey == e.o_orderkey)
            .groupBy("n_name")
            .agg(ssum("l_extendedprice * (1 - l_discount)").alias("revenue"))
        )

    # cached-dims variant: materialize once up front
    dims_cached = mk_dims().cache()
    dims_cached.count()

    # flat-dim variant: pre-join customer x nation x region ONCE into a
    # parquet catalog table (ALL regions — generic layout, the query
    # filter prunes at scan); one-time cost recorded
    flat_name = "dpp_custdim_r11_decompose"
    spark.sql(f"DROP TABLE IF EXISTS {flat_name}")
    t0 = time.perf_counter()
    (
        cust.select("c_custkey", "c_nationkey")
        .join(F.broadcast(nat.select("n_nationkey", "n_regionkey",
                                     "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
        .write.mode("overwrite").saveAsTable(flat_name)
    )
    t_flat_write = time.perf_counter() - t0

    def mk_flat_dims():
        return (
            spark.table(flat_name)
            .filter(F.col("r_name") == "ASIA")
            .select("c_custkey", "n_name")
        )

    labels = {
        "li_scan": lambda: noop(mk_li()),
        "o_scan": lambda: noop(mk_o()),
        "dims": lambda: noop(mk_dims()),
        "enriched": lambda: noop(enriched_over(mk_dims())),
        "fact": lambda: noop(
            mk_li().join(enriched_over(mk_dims()),
                         F.col("l_orderkey") == F.col("o_orderkey"))
            .select("n_name", "l_extendedprice", "l_discount")
        ),
        "full": lambda: noop(q5_over_bucketed(
            spark, ob, lib, cust, nat, reg)),
        "full_cached_dims": lambda: noop(full_over(dims_cached)),
        "full_flat_dim": lambda: noop(full_over(mk_flat_dims())),
    }

    # warm-up to plateau
    passes = []
    for i in range(6):
        t0 = time.perf_counter()
        for fn in labels.values():
            fn()
        this_pass = time.perf_counter() - t0
        print(f"warmup pass {i + 1}: {this_pass:.2f}s", file=sys.stderr)
        plateau = i >= 2 and this_pass > min(passes) * 0.9
        passes.append(round(this_pass, 3))
        if plateau:
            break

    ts = {k: [] for k in labels}
    for _ in range(RUNS):
        for k, fn in labels.items():
            t0 = time.perf_counter()
            fn()
            ts[k].append(time.perf_counter() - t0)

    med = {k: round(statistics.median(v), 3) for k, v in ts.items()}
    out = {
        "metric": "q5_decompose_r11",
        "sf": sf_name,
        "n_buckets": N_BUCKETS,
        "runs": RUNS,
        "layout_write_or_lookup_sec": round(t_layout, 2),
        "flat_dim_write_once_sec": round(t_flat_write, 2),
        "warmup_passes": passes,
        "medians_sec": med,
        "derived": {
            "dim_build_over_full": round(med["dims"] / med["full"], 3),
            "fact_minus_enriched": round(
                med["fact"] - med["enriched"], 3),
            "rollup_cost": round(med["full"] - med["fact"], 3),
            "cached_dims_speedup": round(
                med["full"] / med["full_cached_dims"], 2),
            "flat_dim_speedup": round(
                med["full"] / med["full_flat_dim"], 2),
        },
        "all_runs_sec": {k: [round(x, 3) for x in v]
                         for k, v in ts.items()},
    }
    print(json.dumps(out["medians_sec"]))
    print(json.dumps(out["derived"]))
    path = os.path.join(ROOT, f"BENCH_q5_decompose_r11_{sf_name}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.sql(f"DROP TABLE IF EXISTS {flat_name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
