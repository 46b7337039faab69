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
