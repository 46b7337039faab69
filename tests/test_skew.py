"""Skew-mitigation operators: salted results must equal unsalted results.

Salting changes the PHYSICAL distribution only — every test here asserts
exact logical equivalence against the naive single-phase formulation.
"""

import pyspark.sql.functions as F
from pyspark.sql import Window

from data_pipeline_package_for_python_spark.operators.skew import (
    explode_salt_join,
    local_topk_per_group,
    salted_groupby_agg,
    salted_topk_per_group,
)


def test_salted_topk_equals_plain_window(spark, tables):
    j = (
        tables["orders"]
        .join(
            F.broadcast(tables["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    salted = salted_topk_per_group(
        j, ["c_mktsegment"], order, 3, salt_buckets=7
    )
    w = Window.partitionBy("c_mktsegment").orderBy(*order)
    plain = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
    key = ["c_mktsegment", "o_orderkey"]
    assert sorted(map(tuple, salted.select(*key).collect())) == sorted(
        map(tuple, plain.select(*key).collect())
    )
    # schema passes through untouched (no leaked __salt/__rn columns)
    assert salted.columns == j.columns


def test_local_topk_equals_salted_and_plain(spark, tables):
    """The zero-exchange Arrow combiner, the salted two-phase operator
    and the naive window must return identical rows; the combiner's
    phase 1 must add no Exchange."""
    from data_pipeline_package_for_python_spark import plans

    j = (
        tables["orders"]
        .join(
            F.broadcast(tables["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    local = local_topk_per_group(
        j, ["c_mktsegment"], [("o_totalprice", False), ("o_orderkey", True)], 3
    )
    salted = salted_topk_per_group(j, ["c_mktsegment"], order, 3)
    key = ["c_mktsegment", "o_orderkey"]
    assert sorted(map(tuple, local.select(*key).collect())) == sorted(
        map(tuple, salted.select(*key).collect())
    )
    assert local.columns == j.columns
    # one shuffle total: the survivors' final window — phase 1 is local.
    assert plans.plan_report(local).n_shuffles == 1


def test_local_topk_k_larger_than_group(spark, tables):
    small = tables["nation"].select("n_regionkey", "n_name", "n_nationkey")
    out = local_topk_per_group(
        small, ["n_regionkey"], [("n_nationkey", True)], 100
    )
    assert out.count() == small.count()


def test_salted_topk_k_larger_than_group(spark, tables):
    small = tables["nation"].select("n_regionkey", "n_name", "n_nationkey")
    out = salted_topk_per_group(
        small, ["n_regionkey"], [F.col("n_nationkey")], 100, salt_buckets=4
    )
    assert out.count() == small.count()


def test_salted_groupby_agg_equals_plain(spark, tables):
    li = tables["lineitem"].select("l_returnflag", "l_quantity")
    salted = salted_groupby_agg(
        li,
        ["l_returnflag"],
        {"l_quantity": "sum"},
        salt_buckets=8,
    ).withColumnRenamed("sum_l_quantity", "s")
    plain = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    a = {r.l_returnflag: r.s for r in salted.collect()}
    b = {r.l_returnflag: r.s for r in plain.collect()}
    assert a == b


def test_explode_salt_join_equals_plain(spark, tables):
    o = tables["orders"].select("o_custkey", "o_orderkey")
    c = tables["customer"].select("c_custkey", "c_mktsegment").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    salted = explode_salt_join(o, c, "o_custkey", salt_buckets=5)
    plain = o.join(c, "o_custkey")
    assert salted.count() == plain.count()
    assert sorted(salted.columns) == sorted(plain.columns)
