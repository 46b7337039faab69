"""Time-series operators: hypertable-style rollups, gap-filling and
interpolation over event streams.

The reference engine's surface is pointwise (dpp.py's scalar DSL has no
native time-series layer), but a large-scale analytics engine needs the
timescale-style family: bucket → rollup → cascade to coarser grains →
densify (gap-fill) → fill (forward-fill / linear interpolation).  All of
it is expressed as plain DataFrame algebra so Catalyst keeps pushdown /
pruning / whole-stage codegen:

- **Bucketing** is epoch-floor arithmetic on ``unix_micros`` — a
  map-side expression, never a UDF, never a shuffle.
- **Rollup** is one hash aggregate on (bucket, keys) — the single
  fact-sized shuffle of the family.  Exact integer-unit sums
  (``sum_units``) make rollups *cascadable*: BIGINT unit sums re-
  aggregate associatively to any coarser grain with zero drift, which
  is the continuous-aggregate contract (hourly → daily → monthly reads
  the hourly rollup, not the fact table).
- **Gap-fill** builds the dense per-key spine distributively:
  a per-key (min, max) extent aggregate (tiny shuffle), then
  ``sequence()`` + ``explode`` map-side — the spine never routes
  through the driver.  Filling is one window per key ordered by
  bucket: ``last(ignorenulls)`` for forward-fill, last/first
  neighbor pairs for linear interpolation.

Scale posture at 100 TB: the rollup shuffle carries (bucket, key,
integer units) — fixed-width rows, orders of magnitude smaller than the
input; gap-fill's window puts one key's full series in one task, so the
bucket width chooses the per-key row bound (a year of hourly buckets is
8.8 K rows/key — trivial); a single degenerate hot key would need the
salted two-phase shape from operators/skew.py instead.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "width_seconds",
    "time_bucket",
    "rollup_time",
    "sum_units",
    "gap_fill",
    "histogram_rollup",
    "histogram_quantile_lo",
    "rolling_time_agg",
    "rolling_zscore_flags",
    "ewma_dyadic",
    "holt_linear",
    "keyed_ordered_fold",
    "ohlc",
    "series_correlation_pairs",
    "sessionize",
]

_UNIT_S = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 7 * 86400,
}


def width_seconds(width: str) -> int:
    """Parse ``'N unit'`` (``'6 hours'``, ``'1 day'``) to whole seconds.

    Calendar-irregular units (month/year) are deliberately rejected:
    epoch-floor bucketing is only meaningful for fixed-width intervals,
    and fixed widths are what make rollups cascadable.
    """
    m = re.fullmatch(r"\s*(\d+)\s*(second|minute|hour|day|week)s?\s*",
                     width.lower())
    if not m:
        raise ValueError(
            f"width must be 'N second|minute|hour|day|week[s]', got {width!r}"
        )
    return int(m.group(1)) * _UNIT_S[m.group(2)]


def time_bucket(ts: Column | str, width: str = "1 hour") -> Column:
    """Epoch-aligned floor of ``ts`` to ``width`` buckets, as TIMESTAMP.

    Pure column arithmetic (``unix_micros`` → integer floor-div →
    ``timestamp_micros``), so it stays inside whole-stage codegen and
    partition-prunes when the layout is bucket-sorted.  Equals DuckDB's
    ``time_bucket(INTERVAL width, ts)`` for positive epochs (integer
    ``div`` truncates toward zero, which is floor there — the 1970+
    domain of every table we ship).
    """
    col = F.col(ts) if isinstance(ts, str) else ts
    w_us = width_seconds(width) * 1_000_000
    return F.timestamp_micros(
        (F.unix_micros(col) / F.lit(w_us)).cast("long") * F.lit(w_us)
    )


def sum_units(col: Column | str, scale: int = 100) -> Column:
    """Exact integer-unit sum: ``sum(floor(x*scale + 0.5))`` as BIGINT.

    The cascadable building block: BIGINT unit sums re-aggregate to any
    coarser grain associatively (``sum`` of hourly units == units of the
    daily sum, exactly), unlike double sums whose value depends on
    addition order.  Divide once by ``scale`` at presentation time.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(
        F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    )


def rollup_time(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: tuple[str, ...] = (),
    aggs: dict[str, Column] | None = None,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Bucket ``ts_col`` to ``width`` and aggregate per (bucket, keys).

    One hash aggregate → one shuffle keyed on (bucket, keys); map-side
    partial aggregation compresses before the exchange.  To build a
    rollup *cascade*, aggregate with :func:`sum_units` / ``count`` /
    ``min`` / ``max`` and call ``rollup_time`` again on the output with
    a coarser ``width`` — re-aggregation is exact by construction.
    """
    bucket = time_bucket(ts_col, width).alias(bucket_name)
    out = df.groupBy(bucket, *[F.col(k) for k in keys])
    return out.agg(*[c.alias(n) for n, c in (aggs or {}).items()])


def gap_fill(
    df: DataFrame,
    bucket_col: str,
    width: str,
    keys: tuple[str, ...],
    value_col: str,
    how: str = "ffill",
    filled_name: str | None = None,
) -> DataFrame:
    """Densify a bucketed series to every ``width`` step between each
    key's first and last observation, filling ``value_col`` in gaps.

    ``how='ffill'``: last observed value carries forward.
    ``how='linear'``: interior gaps interpolate between the previous
    and next observed buckets, weighted by bucket distance; observed
    buckets pass through untouched.  Extent-bounded spines mean every
    gap has both neighbors, so no edge-null policy is needed.

    Distribution: extents are a per-key (min, max) aggregate; the spine
    is ``sequence(min, max, interval)`` exploded map-side (never a
    driver loop); the fill is one window per key ordered by bucket.
    Adds ``is_gap`` (1 for synthesized buckets).
    """
    if how not in ("ffill", "linear"):
        raise ValueError(f"how must be 'ffill' or 'linear', got {how!r}")
    out_name = filled_name or value_col
    step = F.expr(f"INTERVAL {width_seconds(width)} SECONDS")
    kcols = [F.col(k) for k in keys]

    extents = df.groupBy(*kcols).agg(
        F.min(bucket_col).alias("__mn"), F.max(bucket_col).alias("__mx")
    )
    spine = extents.select(
        *kcols,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), step)
        ).alias(bucket_col),
    )
    dense = spine.join(
        df.select(*kcols, bucket_col, value_col),
        on=[*keys, bucket_col],
        how="left",
    )

    w_past = (
        Window.partitionBy(*kcols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col)
    if how == "ffill":
        filled = F.last(v, ignorenulls=True).over(w_past)
    else:
        w_next = (
            Window.partitionBy(*kcols)
            .orderBy(bucket_col)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        known_s = F.when(v.isNotNull(), F.unix_timestamp(bucket_col))
        prev_v = F.last(v, ignorenulls=True).over(w_past)
        next_v = F.first(v, ignorenulls=True).over(w_next)
        prev_s = F.last(known_s, ignorenulls=True).over(w_past)
        next_s = F.first(known_s, ignorenulls=True).over(w_next)
        # identical IEEE op order to the SQL twin: frac first, then
        # prev + (next - prev) * frac — bit-identical across engines
        frac = (
            (F.unix_timestamp(bucket_col) - prev_s).cast("double")
            / (next_s - prev_s).cast("double")
        )
        filled = F.when(v.isNotNull(), v).otherwise(
            prev_v + (next_v - prev_v) * frac
        )

    return dense.select(
        *kcols,
        F.col(bucket_col),
        filled.alias(out_name),
        F.when(v.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )


def rolling_time_agg(
    df: DataFrame,
    ts_col: str,
    keys: tuple[str, ...],
    width: str,
    aggs: dict[str, Column],
) -> DataFrame:
    """Trailing time-based window aggregates: for every row, aggregate
    the rows of the same key whose ``ts`` lies in ``[ts - width, ts]``
    (both bounds inclusive — SQL ``RANGE BETWEEN INTERVAL width
    PRECEDING AND CURRENT ROW``).

    Implemented as ONE window per key ordered by ``unix_micros(ts)``
    with a ``rangeBetween`` frame in exact integer microseconds — no
    self-join (the naive ``e1 ⋈ e2 ON e2.ts BETWEEN e1.ts - w AND
    e1.ts`` shape multiplies the fact table by its own window density;
    the window form sorts each key once and slides).  At 100 TB one
    key's rows sit in one task: fine for per-user/per-device keys
    (bounded series), the wrong tool for a single global key — bucket
    first (``rollup_time``) and roll over buckets instead.

    ``aggs`` values are ordinary aggregate Columns (evaluated over the
    frame).  Frame aggregates over DOUBLE should go through integer
    units (see ``sum_units``) if the result must be engine-exact.
    """
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-width_seconds(width) * 1_000_000, 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    width: str,
    keys: tuple[str, ...] = (),
    tie_break: tuple[str, ...] = (),
) -> DataFrame:
    """Candlestick downsample: per (bucket, keys) emit
    open / high / low / close of ``value_col``.

    One hash aggregate (same single-shuffle shape as ``rollup_time``).
    Open/close are deterministic ordered picks via struct min/max —
    ``min(struct(ts, *tie_break, value))`` orders by event time with
    ``tie_break`` making the order total — not ``first()``, whose
    result depends on partition arrival order.  High/low are plain
    min/max.  All four are *picked* stored values (no arithmetic), so
    DOUBLE outputs hash-match across engines without unit scaling.
    """
    ts = F.col(ts_col)
    pick = F.struct(
        ts, *[F.col(c) for c in tie_break], F.col(value_col).alias("v")
    )
    bucket = time_bucket(ts_col, width).alias("bucket")
    return df.groupBy(bucket, *[F.col(k) for k in keys]).agg(
        F.min(pick)["v"].alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max(pick)["v"].alias("close"),
        F.count("*").alias("n"),
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: tuple[str, ...],
    gap: str = "30 minutes",
    order_tie: tuple[str, ...] = (),
) -> DataFrame:
    """Batch gap-based sessionization: rows of one key belong to one
    session while consecutive gaps stay ≤ ``gap``; a larger gap starts
    a new session.

    The classic two-window shape — ``lag(ts)`` flags session starts,
    a running ``sum`` of flags numbers sessions per key — both windows
    share ONE partitioning/ordering (key, ts, tie), so Spark plans a
    single sort + window exec, and each key's series stays in one task
    (same per-key boundedness argument as ``rolling_time_agg``).
    This is the batch twin of the streaming ``session_window``
    aggregation; use it when the data is at rest and sessions need
    arbitrary post-hoc stats.

    Returns the input plus ``session_id`` (1-based per key, ordered by
    time).
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_tie]]
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)
    gap_us = width_seconds(gap) * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    new_session = (
        F.when(F.lag(ts_us).over(w).isNull(), F.lit(1))
        .when(ts_us - F.lag(ts_us).over(w) > gap_us, F.lit(1))
        .otherwise(F.lit(0))
    )
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def ewma_dyadic(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: tuple[str, ...],
    *,
    depth: int = 8,
    scale: int = 100,
    tie_break: str | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average with α = 1/2, truncated at
    ``depth`` lags, in EXACT scaled-integer arithmetic.

    Adds two BIGINT columns: ``ewma_num`` = Σ_{k=0..depth-1}
    lag_k(floor(value·scale)) · 2^(depth-1-k) and ``ewma_den`` = the sum
    of the weights actually present (series shorter than ``depth`` get
    a smaller denominator, not zero-padding).  ``ewma_num / ewma_den``
    is the EWMA; the split keeps every checked value integer-exact so
    cross-engine hashes can't drift on float summation order.

    One window sort per key (``depth`` lag expressions share the same
    window spec — one physical Window operator, one shuffle).  The
    dyadic weight 2^-k is the α=1/2 special case where weights are
    exactly representable and the truncation error after ``depth`` lags
    is bounded by 2^-depth of the oldest mass — the standard trick for
    reproducible EWMA in fixed point.
    """
    order = [F.unix_micros(F.col(ts_col).cast("timestamp"))]
    if tie_break is not None:
        # ts collisions within a key make lag() order-ambiguous; a
        # unique tie-break column restores the total order the exact
        # cross-engine check needs.
        order.append(F.col(tie_break))
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    v = F.floor(F.col(value_col) * scale).cast("long")
    num_terms = []
    den_terms = []
    for k in range(depth):
        weight = 2 ** (depth - 1 - k)
        lagged = F.lag(v, k).over(w)
        num_terms.append(F.coalesce(lagged * weight, F.lit(0)))
        den_terms.append(
            F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
        )
    num = sum(num_terms[1:], num_terms[0]).cast("long")
    den = sum(den_terms[1:], den_terms[0]).cast("long")
    return df.withColumn("ewma_num", num).withColumn("ewma_den", den)


def keyed_ordered_fold(
    df: DataFrame,
    keys: tuple[str, ...],
    order_cols: list[Column],
    value: Column,
    zero: Column,
    step,
    *,
    state_col: str = "state",
    values_col: str = "n_values",
) -> DataFrame:
    """ENGINE PRIMITIVE for sequential recurrences — the shape behind
    ts_holt_linear, ts_clamped_balance, and analytics_kaplan_meier:
    gather each key's ``value`` expressions in ``order_cols`` order
    (one shuffle; per-key state bounded by series length) and fold
    them with ``aggregate(zero, step)`` entirely in-plan — no driver
    loop, no UDF, no window (frames cannot express state that feeds
    back into the next row).

    Cross-engine determinism contract: ``step`` must be a fixed
    expression tree of IEEE ops — both engines then evaluate the
    identical operation sequence, so even float accumulators are
    bit-identical and differential-hashable (DuckDB twin: list_reduce
    over list_prepend-seeded homogeneous lists).

    Returns one row per key: (keys…, ``values_col`` count,
    ``state_col`` = final accumulator)."""
    order_struct = F.struct(
        *[c.alias(f"__o{i}") for i, c in enumerate(order_cols)],
        value.alias("__v"),
    )
    g = df.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(order_struct)),
            lambda s: s["__v"],
        ).alias("__vals")
    )
    return g.select(
        *keys,
        F.size("__vals").cast("bigint").alias(values_col),
        F.aggregate(F.col("__vals"), zero, step).alias(state_col),
    )


def holt_linear(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: tuple[str, ...],
    *,
    scale: int = 100,
    tie_break: str | None = None,
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend, α = β = 1/2)
    per key series, as an IN-PLAN ordered fold — no driver loop, no
    UDF, no per-row Python.

        l_t = (y_t + l_{t-1} + b_{t-1}) / 2
        b_t = (l_t − l_{t-1} + b_{t-1}) / 2        (l_1 = y_1, b_1 = 0)

    The recurrence is sequential by nature, so it cannot be a window
    frame; instead each key's series is gathered into a sorted array
    (one shuffle, state bounded by series length) and folded with
    ``aggregate`` over [level, trend] accumulator pairs.  Every
    operation is a fixed expression tree of IEEE +,−,/2 evaluated in
    the identical order by any engine, so the resulting doubles are
    bit-identical and hash-checkable — the fold-not-float-sum
    discipline that makes iterative smoothing differential-testable.
    Values are pre-quantized with floor(value·scale) so the inputs
    match exactly too.

    Returns one row per key: (keys…, n_events, level, trend,
    forecast_next = level + trend)."""
    two = F.lit(2.0)
    folded = keyed_ordered_fold(
        df,
        keys,
        [
            F.unix_micros(F.col(ts_col).cast("timestamp")),
            F.col(tie_break) if tie_break is not None else F.lit(0),
        ],
        F.floor(F.col(value_col) * scale).cast("double"),
        F.array(F.lit(None).cast("double"), F.lit(0.0)),
        lambda acc, v: F.when(
            acc[0].isNull(), F.array(v, F.lit(0.0))
        ).otherwise(
            F.array(
                (v + acc[0] + acc[1]) / two,
                ((v + acc[0] + acc[1]) / two - acc[0] + acc[1]) / two,
            )
        ),
        values_col="n_events",
    )
    st = F.col("state")
    return folded.select(
        *keys,
        "n_events",
        st[0].alias("level"),
        st[1].alias("trend"),
        (st[0] + st[1]).alias("forecast_next"),
    )


def rolling_zscore_flags(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: tuple[str, ...],
    *,
    window_rows: int = 16,
    z_threshold: int = 3,
    scale: int = 100,
    min_baseline: int = 8,
    tie_break: str | None = None,
) -> DataFrame:
    """Rolling z-score anomaly flags in EXACT integer arithmetic —
    adds (n_base, dev, var_num, is_anomaly).

    Baseline = the ``window_rows`` rows BEFORE each row (the current
    value never contaminates its own baseline).  With v = floor(value·
    scale), n/s/q = count/Σv/Σv² over the baseline frame, the z-test
    ``|v − s/n| / σ > z`` rearranges to the integer inequality
    ``(n·v − s)² > z²·(n·q − s²)`` — no division, no sqrt, no floats,
    so the flags are bit-identical across engines and partitionings
    (σ here is the population std of the baseline).  Rows with fewer
    than ``min_baseline`` prior observations never flag (cold-start
    guard).

    One window sort per key (all three frame aggregates share the
    spec); the anomaly test itself is a map-side codegen expression.
    At 100 TB this is the streaming-monitoring shape at rest: per-key
    series sort once, flags fall out of the scan.
    """
    order = [F.unix_micros(F.col(ts_col).cast("timestamp"))]
    if tie_break is not None:
        order.append(F.col(tie_break))
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(-window_rows, -1)
    )
    v = F.floor(F.col(value_col) * scale).cast("long")
    out = (
        df.withColumn("__v", v)
        .withColumn("n_base", F.count("__v").over(w))
        .withColumn("__s", F.coalesce(F.sum("__v").over(w), F.lit(0)))
        .withColumn(
            "__q",
            F.coalesce(F.sum(F.col("__v") * F.col("__v")).over(w), F.lit(0)),
        )
    )
    dev = F.col("n_base") * F.col("__v") - F.col("__s")
    var_num = F.col("n_base") * F.col("__q") - F.col("__s") * F.col("__s")
    return (
        out.withColumn("dev", dev)
        .withColumn("var_num", var_num)
        .withColumn(
            "is_anomaly",
            (F.col("n_base") >= min_baseline)
            & (dev * dev > F.lit(z_threshold * z_threshold) * var_num),
        )
        .drop("__v", "__s", "__q")
    )


def histogram_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    width: str = "1 hour",
    bin_units: int = 5000,
    scale: int = 100,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Mergeable equi-width histogram per time bucket:
    (bucket, bin, n) with bin = floor(value·scale) div bin_units.

    The quantile twin of the HLL distinct rollup: histogram counts are
    EXACT integers and re-aggregate associatively to any coarser grain
    (daily = sum of hourly bins — never re-reads the fact table), which
    approx_percentile sketches cannot do through SQL.  Quantile error
    is bounded by one bin width, chosen by ``bin_units``; state per
    bucket is #occupied-bins rows, not a value list.  One hash
    aggregate, map-side combined."""
    v_bin = (
        F.floor(F.col(value_col) * scale).cast("long") / F.lit(bin_units)
    ).cast("long")
    return (
        df.groupBy(
            time_bucket(ts_col, width).alias(bucket_name),
            v_bin.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_quantile_lo(
    hist: DataFrame,
    group_cols: tuple[str, ...],
    quantiles: dict[str, tuple[int, int]],
    *,
    bin_units: int = 5000,
) -> DataFrame:
    """Per-group quantile LOWER BOUNDS from an equi-width histogram:
    for q = num/den, the smallest bin whose running count reaches
    ``ceil(q·n)`` — all integer arithmetic, so the estimate (bin lower
    edge in scaled units) is engine-exact while true-quantile error
    stays within one bin width.

    One window (cumulative count per group ordered by bin) + one
    aggregate; the cascade property means this can run on ANY grain of
    a :func:`histogram_rollup` without touching raw data."""
    kcols = [F.col(k) for k in group_cols]
    w_cum = (
        Window.partitionBy(*kcols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*kcols)
    cum = hist.withColumn("__cum", F.sum("n").over(w_cum)).withColumn(
        "__tot", F.sum("n").over(w_tot)
    )
    aggs = [F.sum("n").alias("n_rows")]
    for name, (num, den) in quantiles.items():
        need = F.expr(f"(__tot * {num} + {den} - 1) div {den}")
        aggs.append(
            F.min(
                F.when(F.col("__cum") >= need, F.col("bin") * bin_units)
            ).alias(name)
        )
    return cum.groupBy(*kcols).agg(*aggs)


def series_correlation_pairs(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    *,
    width: str = "6 hours",
    scale: int = 100,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Pairwise Pearson correlation between time series, computed
    relationally: (series_a, series_b, n, r) for every pair that shares
    at least two buckets.

    The similarity-search primitive for "which metrics move together":
    series are bucketed to a common grid (long format, never a dense
    driver-side matrix), aligned by an EQUALITY self-join on the bucket,
    and each pair's sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy² —
    all exact scaled integers) reduce in one hash aggregate; r is one
    double expression over exact moments, so both engines compute the
    identical value.  Join cost is Σ_bucket |series in bucket|² — linear
    for sparse/bursty series, quadratic only when every series covers
    every bucket.  For that dense regime at large |series| pass
    ``candidates`` (pairs to score, e.g. from the sign-LSH ANN over
    z-normalized series vectors — operators/similarity.py) and the same
    aggregation scores ONLY those pairs; the all-pairs default is the
    exact small-|series| path, the candidate path is the 100 TB one
    (prune with LSH, exact-score the survivors — the shape of
    distributed top-k series-similarity search in the literature)."""
    b = (
        df.select(
            F.col(series_col).alias("sid"),
            time_bucket(ts_col, width).alias("bucket"),
            F.col(value_col).alias("v"),
        )
        .groupBy("sid", "bucket")
        .agg(sum_units("v", scale).alias("vu"))
    )
    a_side = b.select(
        F.col("sid").alias("series_a"),
        "bucket",
        F.col("vu").alias("x"),
    )
    b_side = b.select(
        F.col("sid").alias("series_b"),
        "bucket",
        F.col("vu").alias("y"),
    )
    pairs = a_side.join(b_side, "bucket").filter(
        F.col("series_a") < F.col("series_b")
    )
    if candidates is not None:
        pairs = pairs.join(
            F.broadcast(candidates.select("series_a", "series_b")),
            ["series_a", "series_b"],
        )
    m = pairs.groupBy("series_a", "series_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    # r is computed over DOUBLE casts of the exact integer moments with
    # one fixed association (the oracle mirrors it token-for-token):
    # integer products like sx·sy would overflow LONG on Spark while
    # DuckDB widens to HUGEINT — casting each moment to double FIRST
    # gives both engines the identical IEEE sequence instead.
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    num = sxy * n - sx * sy
    den = F.sqrt((sxx * n - sx * sx) * (syy * n - sy * sy))
    return m.filter(F.col("n") >= 2).select(
        "series_a",
        "series_b",
        "n",
        (num / den).alias("r"),
    )
