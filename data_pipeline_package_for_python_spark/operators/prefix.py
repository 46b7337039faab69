"""Distributed prefix aggregation — two-phase running sums.

A running sum over one global ``ORDER BY`` executes as a
SINGLE-PARTITION WindowExec: every row moves to one task, the
canonical 100 TB anti-pattern (the registry-wide plan pin in
tests/test_plans.py fails any query that does it unannounced).  This
module generalizes the two-phase pattern already used by
``ts_peak_concurrency`` (day buckets) and ``sorted_neighborhood_join``
(prefix ranges) into one engine primitive:

phase 1 — bucket every row with an expression MONOTONE NON-DECREASING
  in the leading sort column (equal sort values must share a bucket,
  and buckets must be contiguous intervals of the sort order — any
  floor-division / date-truncation / string-prefix qualifies), then
  compute bucket-LOCAL running sums in a bucket-partitioned window;

phase 2 — aggregate one total per bucket (a METADATA table, one row
  per bucket, orders of magnitude smaller than the data), turn it into
  exclusive bucket offsets with a cumsum over that metadata only, and
  broadcast-join the offsets back: global prefix = offset + local.

Exactness: bit-identical to the global window for integral / decimal
sums (addition is associative there).  For float columns the
reassociation can differ in the last ulp — keep floats off the hash
surface (repo discipline) or use one bucket.

The reference system has no ordered aggregation at all (its engine is
an eager scalar loop, /root/reference/dpp.py:283-296); this primitive
exists for the §2.2 engine contract's order-statistic family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["prefix_rank", "prefix_sums"]


def prefix_sums(
    df: DataFrame,
    *,
    order: list,
    cols: dict[str, str],
    bucket: Column,
    end: str = "current",
) -> DataFrame:
    """Add running-sum columns over one total order, without a global
    window.

    Parameters
    ----------
    order:
        Columns (names or Columns) defining the total order.  Rows with
        equal full order keys get frame-order-dependent running sums —
        same caveat as any ROWS-frame window; pre-aggregate to distinct
        keys (the usual shape) or include a tiebreaker.
    cols:
        ``{source_column: result_column}`` running sums to compute.
        NULL source values count as 0 (matching ``SUM``'s null-skipping
        semantics) — both in the running sum and in the per-bucket
        totals that become downstream bucket offsets.
    bucket:
        Expression monotone non-decreasing in ``order[0]`` whose level
        sets are contiguous sort intervals (e.g. ``F.expr("s div
        1000")``, ``F.date_trunc('day', ts)``, ``F.substring(v, 1,
        4)``).  Rows with equal ``order[0]`` MUST share a bucket.
    end:
        ``"current"`` — inclusive frame (UNBOUNDED PRECEDING..CURRENT
        ROW); ``"preceding"`` — exclusive (..1 PRECEDING), 0 on each
        bucket's first row before the offset is added.
    """
    if end not in ("current", "preceding"):
        raise ValueError(f"end='current'|'preceding', got {end!r}")
    frame_end = Window.currentRow if end == "current" else -1
    b = df.withColumn("__bkt", bucket)
    wl = (
        Window.partitionBy("__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, frame_end)
    )
    wn = Window.partitionBy("__bkt").orderBy(*order)
    out = b.withColumn("__rn", F.row_number().over(wn))
    for src, dst in cols.items():
        out = out.withColumn(
            dst, F.coalesce(F.sum(src).over(wl), F.lit(0))
        ).withColumn(
            # NULL src counts as 0 here, matching SUM's null-skipping:
            # an un-coalesced NULL on a bucket's LAST row would null the
            # max_by bucket total below and silently zero every later
            # bucket's offset via the join-back coalesce.
            f"__inc_{dst}",
            F.col(dst)
            + (
                F.lit(0)
                if end == "current"
                else F.coalesce(F.col(src), F.lit(0))
            ),
        )
    # Bucket metadata: one row per bucket; the unpartitioned cumsum
    # below runs over THIS table only, never over data rows.  The
    # bucket total is read OFF THE WINDOW OUTPUT — the inclusive
    # running sum at the bucket's last row (max_by over the in-window
    # row_number, direction-proof for mixed asc/desc orders) — NOT
    # re-aggregated from the input: a fresh sum(src) GROUP BY bucket
    # lets Catalyst eliminate the window and column-prune the second
    # subplan apart from the first, and the ENTIRE input pipeline
    # (scan included) runs twice with no ReusedExchange (observed on
    # ml_auc_exact: 4 parquet scans, 0 reuses).  Depending on the
    # window column keeps one shared scan→…→Exchange(__bkt)→Window
    # subplan; the groupBy consumes data already partitioned on __bkt.
    wm = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    totals = out.groupBy("__bkt").agg(
        *[
            F.max_by(F.col(f"__inc_{dst}"), F.col("__rn")).alias(
                f"__t_{dst}"
            )
            for dst in cols.values()
        ]
    )
    offs = totals.select(
        "__bkt",
        *[
            (F.sum(f"__t_{dst}").over(wm) - F.col(f"__t_{dst}")).alias(
                f"__o_{dst}"
            )
            for dst in cols.values()
        ],
    )
    res = out.join(F.broadcast(offs), "__bkt")
    for dst in cols.values():
        res = res.withColumn(
            dst, F.col(dst) + F.coalesce(F.col(f"__o_{dst}"), F.lit(0))
        )
    return res.drop(
        "__bkt",
        "__rn",
        *[f"__o_{dst}" for dst in cols.values()],
        *[f"__inc_{dst}" for dst in cols.values()],
    )


def prefix_rank(
    df: DataFrame,
    *,
    key: str,
    tiebreak: str,
    bucket: Column,
    descending: bool = False,
    out: str = "rk",
) -> DataFrame:
    """Exact global rank — ``row_number() OVER (ORDER BY key [DESC],
    tiebreak)`` — without a global window.

    rank(row) = (two-phase cumulative count of rows with a strictly
    smaller — or, ``descending``, strictly larger — ``key``, via
    :func:`prefix_sums` over per-distinct-key counts) + (``key``-
    partitioned ``row_number`` over ``tiebreak``).  Both passes are
    partitioned; the only unpartitioned work is the bucket-metadata
    cumsum inside :func:`prefix_sums`.  ``bucket`` follows the same
    contract as there, relative to ``key`` in the chosen direction.

    Precondition: ``key`` must be non-null on every row.  The
    cumulative counts join back with an inner equality join on ``key``,
    which silently DROPS null-key rows — unlike the documented
    ``row_number() OVER (ORDER BY key, tiebreak)`` equivalence, which
    ranks NULLs.  Filter or coalesce null keys before calling.

    Returns ``df`` plus a bigint ``out`` column.  Used by the
    order-statistic registry family (calibration deciles, Gini index,
    Pareto deciles) — compose with the exact ntile tile rule (first
    ``n mod B`` tiles take one extra row) for tiling.
    """
    per_key = df.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    order = [F.col(key).desc()] if descending else [key]
    cums = prefix_sums(
        per_key,
        order=order,
        cols={"__cnt": "__cb"},
        bucket=bucket,
        end="preceding",
    ).select(key, "__cb")
    w = Window.partitionBy(key).orderBy(tiebreak)
    return (
        df.join(cums, key)
        .withColumn(
            out,
            (F.col("__cb") + F.row_number().over(w)).cast("bigint"),
        )
        .drop("__cb")
    )
