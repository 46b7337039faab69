"""JDBC facade tests (SURVEY §2.2.1 optional row).

The container ships no JDBC driver jar, so the actual load/save is
skipped; what CAN be pinned without a database is the facade's contract:
option wiring (the parallel-read options that matter at scale) and the
guard against a partitioned read with missing bounds.
"""

import pytest

from data_pipeline_package_for_python_spark.sources import read_jdbc, write_jdbc


def test_read_jdbc_requires_bounds_with_partition_column(spark):
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(
            spark,
            "jdbc:postgresql://db/x",
            "orders",
            partition_column="o_orderkey",
        )


@pytest.mark.skip(reason="no JDBC driver jar in this environment")
def test_read_jdbc_roundtrip(spark):  # pragma: no cover
    df = read_jdbc(
        spark,
        "jdbc:postgresql://db/x",
        "orders",
        partition_column="o_orderkey",
        lower_bound=1,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    write_jdbc(df, "jdbc:postgresql://db/x", "orders_copy", num_partitions=4)
