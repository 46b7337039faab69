"""Distributed classic ML via sufficient statistics.

The scale pattern for closed-form models: never iterate over the data —
ONE pass computes exact sufficient statistics (here the augmented Gram
matrix X'X and moment vector X'y of ordinary least squares), the driver
holds O(d²) state, and the solve happens on d×d numbers, not rows.
This is how linear/ridge regression, ANOVA, and covariance-based
methods are actually trained at 100 TB — map-side partial sums in
whole-stage codegen, one reduce to a single row.

Exactness discipline (the engine's standard trick): features and label
are quantized to integer units (``floor(x·scale + 0.5)``), so every
Gram/moment entry is an exact BIGINT — order-independent, engine-
reproducible, and hash-checkable against a SQL twin replaying the same
sums.  The float part (the d×d solve) happens on the driver AFTER the
checkable surface.

Reference parity: the reference DSL (dpp.py) has no ML stage at all;
this is part of the §2.2.10 training-pipeline surface (SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ols_sufficient_stats", "ols_fit"]


def ols_sufficient_stats(
    df: DataFrame,
    feature_units: list[Column],
    label_units: Column,
    *,
    decimal: bool = False,
) -> DataFrame:
    """ONE-ROW frame of exact OLS sufficient statistics.

    ``feature_units`` are BIGINT unit columns (already quantized by the
    caller); an intercept term (constant 1) is prepended automatically.
    Output columns: ``n``, upper-triangle Gram entries ``g{i}{j}``
    (i ≤ j, over the augmented feature vector u0=1, u1, …), and moment
    entries ``b{i}`` = Σ u_i·y.  All BIGINT: one map-side-combined
    aggregate, a single reduce row, no shuffle of feature rows.

    Overflow discipline: with |u| ≤ U and |y| ≤ Y, entries are bounded
    by n·U² and n·U·Y — for unit scales ~1e4 and 1e9 rows that is
    ~1e17 < 2⁶³, but Spark's non-ANSI BIGINT sum WRAPS SILENTLY past
    that, so when n·U·Y approaches 2⁶³ (≳1e11 rows at warehouse unit
    scales) pass ``decimal=True``: operands are widened to
    DECIMAL(19,0) BEFORE the multiply (so the per-row product u_i·u_j
    cannot wrap either — protection starts at the product, not just
    the accumulation) and sums accumulate in DECIMAL(38,0) — exact and
    order-independent end-to-end, 1e38 of headroom — at a modest
    per-row cost.  The default stays BIGINT for codegen speed."""
    # With decimal=True the OPERANDS are widened before the multiply,
    # not just the accumulator: a BIGINT ui*uj product can itself wrap
    # silently when |u| > ~3e9, which would poison the exact DECIMAL
    # sum.  decimal(19,0) operands make Spark produce a decimal(38,0)
    # product — exact end-to-end.
    unit_t = "decimal(19,0)" if decimal else "bigint"
    acc = "decimal(38,0)" if decimal else "bigint"
    feats = [F.lit(1).cast(unit_t)] + [
        c.cast("bigint").cast(unit_t) for c in feature_units
    ]
    y = label_units.cast("bigint").cast(unit_t)
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, ui in enumerate(feats):
        for j, uj in enumerate(feats):
            if i <= j:
                aggs.append(
                    F.sum((ui * uj).cast(acc)).alias(f"g{i}{j}")
                )
    for i, ui in enumerate(feats):
        aggs.append(F.sum((ui * y).cast(acc)).alias(f"b{i}"))
    return df.agg(*aggs)


def ols_fit(stats_row, d: int, *, l2: float = 0.0) -> list[float]:
    """Solve the normal equations from one collected stats row:
    coefficients for the AUGMENTED feature vector (index 0 = intercept,
    in the caller's unit scales).  ``l2`` > 0 gives ridge regression —
    λ·n added to the non-intercept diagonal (the standard
    unpenalized-intercept convention), which needs NO new pass over
    the data: regularization is a property of the solve, not the
    statistics.  Driver-side d×d solve — the only float step, after
    the exact checkable surface."""
    import numpy as np

    g = np.zeros((d, d))
    b = np.zeros(d)
    for i in range(d):
        for j in range(d):
            key = f"g{min(i, j)}{max(i, j)}"
            g[i, j] = float(stats_row[key])
        b[i] = float(stats_row[f"b{i}"])
    if l2 > 0.0:
        n = float(stats_row["n"])
        for i in range(1, d):
            g[i, i] += l2 * n
    return [float(v) for v in np.linalg.solve(g, b)]
