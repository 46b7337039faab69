"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_parallel"]


def ensure_parallel(df: DataFrame) -> DataFrame:
    """Round-robin repartition when upstream parallelism is below core count.

    Row-expansion stages (explode of shingles/tokens) inherit the scan's
    partitioning; a small file reads as 1-2 splits and the whole expansion
    then runs on one core.  One cheap narrow-input shuffle before the
    expansion is the right trade at any scale — on a real cluster a 100 TB
    input already has thousands of splits and this is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
