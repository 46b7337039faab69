"""SURVEY §2.2.7 facade checks: every declared family name resolves, and the
engine-composed helpers honor their determinism contracts."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_pipeline_package_for_python_spark import functions as dpf


def test_every_family_name_is_exported():
    for family, names in dpf.FAMILIES.items():
        for n in names:
            assert hasattr(dpf, n), f"{family}.{n} missing from facade"
            assert getattr(dpf, n) is getattr(F, n)


def test_exact_sum_is_partitioning_invariant(spark, tables):
    li = tables["lineitem"].select("l_extendedprice")
    a = li.repartition(1).agg(
        dpf.exact_sum("l_extendedprice").alias("s")
    ).first()["s"]
    b = li.repartition(37).agg(
        dpf.exact_sum("l_extendedprice").alias("s")
    ).first()["s"]
    assert a == b  # bit-identical, not approx — that's the whole point


def test_null_safe_div(spark):
    df = spark.createDataFrame([(1.0, 0.0), (4.0, 2.0)], "a double, b double")
    out = df.select(dpf.null_safe_div(F.col("a"), F.col("b")).alias("q"))
    vals = [r["q"] for r in out.collect()]
    assert vals == [None, 2.0]


def test_epoch_bucket_matches_window_start(spark, tables):
    ev = tables["events"]
    via_bucket = ev.select(
        dpf.epoch_bucket("ts", 3600).alias("w")
    )
    via_window = ev.select(F.window("ts", "1 hour").start.alias("w"))
    assert via_bucket.subtract(via_window).count() == 0
    assert via_window.subtract(via_bucket).count() == 0


def test_bucketed_is_stable_and_in_range(spark, tables):
    docs = tables["documents"].select(
        dpf.bucketed("doc_id", 16).alias("b1"),
        dpf.bucketed("doc_id", 16).alias("b2"),
    )
    agg = docs.agg(
        F.max(F.col("b1") != F.col("b2")).alias("any_diff"),
        F.min("b1").alias("lo"),
        F.max("b1").alias("hi"),
    ).first()
    assert agg["any_diff"] is False or agg["any_diff"] is None
    assert 0 <= agg["lo"] and agg["hi"] < 16


def test_profile_columns_single_scan_no_python(spark, tables):
    """The profiler's claim is cost = ONE pass: however many columns
    are profiled, the plan reads the table once (exact distincts are
    planned via Expand inside the same scan) and stays JVM-side."""
    from data_pipeline_package_for_python_spark import plans
    from data_pipeline_package_for_python_spark.operators.profile import (
        profile_columns,
    )

    out = profile_columns(
        tables["customer"],
        numeric_cols=("c_custkey", "c_nationkey", "c_acctbal"),
        other_cols=("c_mktsegment",),
    )
    r = plans.plan_report(out)
    assert len(r.read_schemas) == 1  # one scan feeds every statistic
    assert "BatchEvalPython" not in r.text
    rows = {(x["col_name"], x["metric"]): x["value"] for x in out.collect()}
    n = tables["customer"].count()
    assert rows[("c_custkey", "n")] == float(n)
    assert rows[("c_custkey", "n_distinct")] == float(n)  # key is unique
    assert rows[("c_mktsegment", "n_null")] == 0.0


def test_business_days_matches_python_weekday_count(spark, sf_dir):
    """The closed-form weekday counter replays Python's day-by-day
    weekday count over the fixture's (orderdate, shipdate) pairs."""
    import datetime as dt

    import duckdb

    from __spark_entry__ import queries

    got = {
        r["l_returnflag"]: (r["n"], r["total_bdays"], r["min_bdays"],
                            r["max_bdays"])
        for r in queries()["func_business_days"](spark, sf_dir).collect()
    }
    rows = duckdb.connect().execute(
        f"""SELECT l.l_returnflag, CAST(o.o_orderdate AS DATE),
             CAST(l.l_shipdate AS DATE)
           FROM '{sf_dir}/lineitem.parquet' l
           JOIN '{sf_dir}/orders.parquet' o
             ON o.o_orderkey = l.l_orderkey
           WHERE l.l_shipdate >= o.o_orderdate"""
    ).fetchall()

    def bdays(a, b):
        n, d = 0, a
        while d < b:
            if d.weekday() < 5:
                n += 1
            d += dt.timedelta(days=1)
        return n

    want = {}
    for f, a, b in rows:
        k = bdays(a, b)
        n, tot, mn, mx = want.get(f, (0, 0, 10**9, -1))
        want[f] = (n + 1, tot + k, min(mn, k), max(mx, k))
    assert got == want
