"""Column profiling: dataset statistics in ONE pass, any column count.

Data-quality profiling is a standing need of large-scale pipelines
(row counts, null rates, cardinalities, ranges — per column, per
ingest).  The naive implementation runs one job per column per metric;
this operator builds every statistic as an aggregate expression in a
SINGLE ``agg`` (one scan, one reduce — Spark plans the exact distinct
counts via Expand in the same job) and reshapes the one wide result
row to long (column, metric, value) format with ``unpivot``, which is
a map-side Expand over one row — free.

At 100 TB: profiling cost equals one aggregation scan of the table,
independent of how many columns are profiled; nothing is collected
except the final long-format stats frame (columns × metrics rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "NUMERIC_METRICS", "GENERIC_METRICS"]

GENERIC_METRICS = ("n", "n_null", "n_distinct")
NUMERIC_METRICS = GENERIC_METRICS + ("min", "max")


def profile_columns(
    df: DataFrame,
    numeric_cols: tuple[str, ...] = (),
    other_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Profile ``numeric_cols`` (count / nulls / distinct / min / max)
    and ``other_cols`` (count / nulls / distinct) into long format
    (col_name, metric, value DOUBLE).

    ``value`` is DOUBLE for a uniform long schema: counts are exact
    (≤2^53), numeric min/max cast losslessly; non-numeric min/max are
    type-heterogeneous and deliberately out of scope for this shape.
    """
    aggs = []
    for c in numeric_cols + other_cols:
        col = F.col(c)
        aggs += [
            F.count(col).cast("double").alias(f"{c} n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0))
            .cast("double")
            .alias(f"{c} n_null"),
            F.count_distinct(col).cast("double").alias(f"{c} n_distinct"),
        ]
        if c in numeric_cols:
            aggs += [
                F.min(col).cast("double").alias(f"{c} min"),
                F.max(col).cast("double").alias(f"{c} max"),
            ]
    wide = df.agg(*aggs)
    long = wide.unpivot(
        ids=[], values=list(wide.columns),
        variableColumnName="__key", valueColumnName="value",
    )
    split = F.split(F.col("__key"), " ")
    return long.select(
        split.getItem(0).alias("col_name"),
        split.getItem(1).alias("metric"),
        "value",
    )
