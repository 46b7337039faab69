"""Skew mitigation helpers (SURVEY §4.2: "engine exposes repartition/salting
helper for pathological keys").

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in our session factory) handles most skew at runtime; explicit
salting remains necessary for skewed *aggregations* and for joins where one
hot key dominates an entire executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "explode_salt_join",
    "local_topk_per_group",
    "salted_groupby_agg",
    "salted_topk_per_group",
]


def salted_topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    *,
    salt_buckets: int = 32,
) -> DataFrame:
    """Top-k rows per group when the group cardinality is LOW.

    A plain ``row_number().over(partitionBy(group))`` with, say, 5
    distinct groups serializes the entire table through 5 reducers — at
    100 TB that is 5 sort tasks of 20 TB each.  This runs two balanced
    phases instead:

    1. window over ``(group, salt)`` — every bucket sorts ~1/salt_buckets
       of its group and keeps its local top-k;
    2. window over ``group`` on the surviving ``groups × buckets × k``
       rows (tiny by construction) for the exact global per-group top-k.

    Exact, not approximate: any row in the global top-k is in its
    bucket's top-k, so phase 1 never discards a winner.  ``order_cols``
    must be a total order (include a tie-break key) for deterministic
    output.  The salt is the input partition id (free, already balanced,
    no ``rand()``), so the plan stays deterministic for a deterministic
    scan.
    """
    from pyspark.sql import Window

    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1", "__salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def local_topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_spec: list[tuple[str, bool]],
    k: int,
) -> DataFrame:
    """Top-k per low-cardinality group with ZERO phase-1 exchange.

    Same problem as :func:`salted_topk_per_group`, different phase-1
    physics: instead of shuffling the whole table onto (group, salt)
    reducers, each input partition combines DOWN to its local top-k per
    group in place via an Arrow batch scan (``mapInPandas``), and only
    the ``partitions × groups × k`` survivors go through the final
    (tiny) window.  The full table crosses NO network at all — the one
    case where the Python boundary beats a JVM window is when the JVM
    alternative is a full-fact shuffle and the Python side is a linear
    local scan (measured at sf0.1: ~30% faster than the 32-bucket
    salted form; the gap widens on a real cluster where phase-1 shuffle
    means disk + network).  Exact for the same reason salting is: a
    global top-k row is its partition's top-k row.

    ``order_spec`` is ``[(column, ascending)]`` — plain names, because
    the ordering must be expressible to pandas and Spark identically;
    include a tie-break column for a total order.  Use the salted form
    when the combiner state (groups × k) does not comfortably fit per
    task, or when order keys are computed expressions.
    """
    names = [c for c, _ in order_spec]
    asc = [a for _, a in order_spec]

    def combine(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(names, ascending=asc)
                    .groupby(group_cols, sort=False)
                    .head(k)
                )

    survivors = df.mapInPandas(combine, df.schema)
    # final (tiny) exact window as ONE sql() statement — the
    # withColumn/filter/drop chain costs three eager analyzer passes
    # per build for the same plan.
    grp = ", ".join(f"`{c}`" for c in group_cols)
    order_sql = ", ".join(
        f"`{c}` {'ASC' if a else 'DESC'}" for c, a in order_spec
    )
    cols = ", ".join(f"`{c}`" for c in df.columns)
    return df.sparkSession.sql(
        f"""
        SELECT {cols} FROM (
          SELECT *, row_number() OVER (
              PARTITION BY {grp} ORDER BY {order_sql}) AS __rn
          FROM {{survivors}}
        ) WHERE __rn <= {int(k)}
        """,
        survivors=survivors,
    )


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    *,
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (keys + random salt) so a hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 re-aggregates the partials.  Only
    decomposable aggregates are supported: sum, count, min, max.

    At 100 TB a single hot key (e.g. one dominant language in a documents
    table) can put >1 executor-memory of rows on one reducer; this caps the
    per-reducer volume at 1/salt_buckets of the hot key.
    """
    supported = {"sum", "count", "min", "max"}
    bad = {a for a in aggs.values() if a not in supported}
    if bad:
        raise ValueError(f"non-decomposable aggregates for salting: {bad}")

    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial_exprs = []
    for col, agg in aggs.items():
        if agg == "count":
            partial_exprs.append(F.count(col).alias(f"__p_{col}"))
        else:
            partial_exprs.append(getattr(F, agg)(col).alias(f"__p_{col}"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)

    final_exprs = []
    for col, agg in aggs.items():
        merge = "sum" if agg in ("sum", "count") else agg
        final_exprs.append(getattr(F, merge)(f"__p_{col}").alias(f"{agg}_{col}"))
    return partial.groupBy(*keys).agg(*final_exprs)


def explode_salt_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join: salt the skewed (large) side randomly, explode the
    small side once per salt value, join on (key, salt).  Row-multiplies the
    small side by ``salt_buckets`` — only use when `small` is genuinely
    small and the key distribution on `skewed` is pathological."""
    salted_big = skewed.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_big.join(exploded_small, [on, "__salt"], how)
    return out.drop("__salt")
