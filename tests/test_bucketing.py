"""Bucketed tables & sorted layouts: the write-time scale primitives.

Pins the payoff, not just the API: a join between two tables bucketed on
the join key must plan with ZERO exchanges (the shuffle was paid at write
time), and a range-layout write must produce files whose parquet min/max
statistics actually prune.
"""

import pyspark.sql.functions as F
import pytest

from data_pipeline_package_for_python_spark import plans
from data_pipeline_package_for_python_spark.sources import (
    write_bucketed,
    write_sorted_layout,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tables, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    write_bucketed(
        tables["orders"],
        "orders_b",
        bucket_by="o_custkey",
        n_buckets=8,
        sort_by="o_custkey",
        path=(wh / "orders_b").as_posix(),
    )
    write_bucketed(
        tables["customer"],
        "customer_b",
        bucket_by="c_custkey",
        n_buckets=8,
        sort_by="c_custkey",
        path=(wh / "customer_b").as_posix(),
    )
    yield spark.table("orders_b"), spark.table("customer_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    orders_b, customer_b = bucketed_pair
    # Force the sort-merge path (broadcast would trivially hide the
    # exchange) and assert bucketing removed BOTH shuffles.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = orders_b.join(
            customer_b, orders_b.o_custkey == customer_b.c_custkey
        )
        r = plans.plan_report(j)
        assert "SortMergeJoin" in r.joins
        assert r.n_shuffles == 0
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_is_shuffle_free(spark, bucketed_pair):
    orders_b, _ = bucketed_pair
    g = orders_b.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert plans.plan_report(g).n_shuffles == 0


def test_sorted_layout_roundtrip_and_pruning(spark, tables, tmp_path):
    path = (tmp_path / "orders_layout").as_posix()
    write_sorted_layout(
        tables["orders"], path, layout_by=["o_orderdate"], n_files=4
    )
    back = spark.read.parquet(path)
    assert back.count() == tables["orders"].count()
    # Predicate on the layout column must be pushed to the scan, where the
    # clustered min/max stats make it effective.
    r = plans.plan_report(
        back.filter(F.col("o_orderdate") < "1993-01-01")
    )
    assert any("o_orderdate" in f for fs in r.pushed_filters for f in fs)
