"""SURVEY §2.2 extension: time-series rollup / gap-fill / interpolation.

Hypertable-style operators over the ``events`` table (the reference DSL
is pointwise and has no time-series layer; this family is part of the
"operations a large-scale pipeline needs" mandate).  Buckets surface as
whole-second TIMESTAMPs (never raw ns/µs event times — FIXTURES §C), all
value sums go through exact integer units, and the linear interpolation
runs the byte-identical IEEE formula on both engines so even the DOUBLE
outputs hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.timeseries import gap_fill, rollup_time, sum_units
from ._registry import dsum, load, query

# DuckDB twin of operators.timeseries.time_bucket (epoch-floor, µs-exact
# for positive epochs; make_timestamp keeps it a naive TIMESTAMP).
_BUCKET_SQL = (
    "make_timestamp(CAST(floor(epoch(ts) / {w}) AS BIGINT)"
    " * {w} * 1000000)"
)


@query(
    "ts_rollup_hourly",
    oracle=f"""
    SELECT {_BUCKET_SQL.format(w=3600)} AS bucket,
           event_type,
           count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup per event_type: ONE hash aggregate on
    (bucket, event_type) — the bucket is map-side epoch arithmetic, the
    shuffle carries fixed-width partials, and the exact-units sum keeps
    the DOUBLE output engine-identical."""
    ev = load(spark, sf_dir, "events")
    return rollup_time(
        ev, "ts", "1 hour", keys=("event_type",),
        aggs={"cnt": F.count("*"), "value_sum": dsum("value")},
    )


@query(
    "ts_rollup_cascade",
    oracle=f"""
    SELECT {_BUCKET_SQL.format(w=86400)} AS bucket,
           event_type,
           count(*) AS cnt,
           SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
               / CAST(100 AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade: daily rollup computed FROM the
    hourly rollup, never re-reading the fact table.  Exactness is by
    construction — BIGINT unit sums re-aggregate associatively, so the
    cascade equals the direct daily aggregation (which is what the
    oracle computes).  At 100 TB this is the difference between scanning
    24× less rollup data and re-scanning the raw events."""
    ev = load(spark, sf_dir, "events")
    hourly = rollup_time(
        ev, "ts", "1 hour", keys=("event_type",),
        aggs={"cnt": F.count("*"), "units": sum_units("value")},
    )
    daily = rollup_time(
        hourly, "bucket", "1 day", keys=("event_type",),
        aggs={"cnt": F.sum("cnt"), "units": F.sum("units")},
    )
    return daily.select(
        "bucket",
        "event_type",
        "cnt",
        (F.col("units") / F.lit(100.0)).alias("value_sum"),
    )


# Gap-fill family: 6-hour buckets per user keep the spine size bounded
# (|users| × ≤121 buckets over the 30-day fixture) at every SF the
# driver sweeps.
_GF_BASE = f"""
    WITH b AS (
      SELECT user_id,
             {_BUCKET_SQL.format(w=21600)} AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events
      GROUP BY 1, 2
    ), ext AS (
      SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
      FROM b GROUP BY 1
    ), spine AS (
      SELECT user_id,
             unnest(generate_series(mn, mx, INTERVAL 21600 SECOND))
                 AS bucket
      FROM ext
    ), dense AS (
      SELECT s.user_id, s.bucket, b.v
      FROM spine s LEFT JOIN b USING (user_id, bucket)
    )
"""


@query(
    "ts_gap_fill_ffill",
    oracle=_GF_BASE + """
    SELECT user_id, bucket,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM dense
    """,
)
def ts_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify each user's 6-hour series between its first and last
    observation and forward-fill gaps.  Spine = per-key extents (tiny
    shuffle) + map-side sequence/explode; fill = one window per key.
    No driver-side loops anywhere — the spine is generated inside the
    plan, which is what survives a 1000-executor scale-up."""
    ev = load(spark, sf_dir, "events")
    b = rollup_time(
        ev, "ts", "6 hours", keys=("user_id",), aggs={"v": dsum("value")}
    )
    return gap_fill(
        b, "bucket", "6 hours", ("user_id",), "v", how="ffill"
    )


@query(
    "ts_interpolate_linear",
    oracle=_GF_BASE + """
    , filled AS (
      SELECT user_id, bucket, v,
             CAST(epoch(bucket) AS BIGINT) AS bs,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS prev_v,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS next_v,
             last_value(CASE WHEN v IS NOT NULL
                             THEN CAST(epoch(bucket) AS BIGINT) END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS prev_s,
             first_value(CASE WHEN v IS NOT NULL
                              THEN CAST(epoch(bucket) AS BIGINT) END
                         IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS next_s
      FROM dense
    )
    SELECT user_id, bucket,
           CASE WHEN v IS NOT NULL THEN v
                ELSE prev_v + (next_v - prev_v)
                     * (CAST(bs - prev_s AS DOUBLE)
                        / CAST(next_s - prev_s AS DOUBLE))
           END AS v,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM filled
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across interior gaps of each user's 6-hour
    series.  Observed buckets pass through; gaps take
    ``prev + (next - prev) * frac`` with ``frac`` built from exact
    BIGINT bucket seconds — the formula is written in the identical
    IEEE order on both engines, so the interpolated DOUBLEs are
    bit-identical and hash-checkable (not merely close)."""
    ev = load(spark, sf_dir, "events")
    b = rollup_time(
        ev, "ts", "6 hours", keys=("user_id",), aggs={"v": dsum("value")}
    )
    return gap_fill(
        b, "bucket", "6 hours", ("user_id",), "v", how="linear"
    )


@query(
    "ts_distinct_rollup_hll",
    oracle=None,
    doc="Mergeable-sketch distinct rollup: DataSketches HLL has no "
        "DuckDB twin, so the driver records rows-only; the accuracy "
        "and merge-equivalence laws are pinned in tests/"
        "test_timeseries.py.",
)
def ts_distinct_rollup_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per week via mergeable HLL sketches: daily
    sketches first (`hll_sketch_agg`), then `hll_union_agg` up to
    weeks.  This is the 100 TB COUNT DISTINCT posture — exact distinct
    re-scans the fact table for every grain, while sketch registers
    re-aggregate associatively like the unit sums in
    :func:`ts_rollup_cascade`: build daily sketches once, answer any
    coarser grain (and any bucket union) from kilobyte-sized state.
    Register-maximum union is order-insensitive, so the result is
    deterministic under Spark's parallel aggregation."""
    ev = load(spark, sf_dir, "events")
    daily = rollup_time(
        ev, "ts", "1 day", keys=(),
        aggs={"sk": F.hll_sketch_agg("user_id")},
    ).withColumnRenamed("bucket", "day")
    weekly = rollup_time(
        daily, "day", "1 week", keys=(),
        aggs={"approx_users": F.hll_sketch_estimate(F.hll_union_agg("sk"))},
    )
    return weekly.select(F.col("bucket").alias("week"), "approx_users")


@query(
    "ts_rolling_1h",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_1h,
           (SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w)
               / CAST(100 AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def ts_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user rolling aggregates at every event.
    ONE window (sort each user's series once, slide the frame) — never
    the naive time-band self-join, which multiplies the fact table by
    its own window density.  The rolling sum goes through exact integer
    units so the DOUBLE output is engine-identical."""
    from ..operators.timeseries import rolling_time_agg

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    out = rolling_time_agg(
        ev, "ts", ("user_id",), "1 hour",
        aggs={
            "n_1h": F.count(F.lit(1)),
            "__units": F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ),
        },
    )
    return out.select(
        "event_id", "user_id", "n_1h",
        (F.col("__units") / F.lit(100.0)).alias("sum_1h"),
    )


@query(
    "ts_ohlc_6h",
    oracle=f"""
    WITH b AS (
      SELECT {_BUCKET_SQL.format(w=21600)} AS bucket,
             event_type, event_id, value, ts
      FROM events
    ), r AS (
      SELECT bucket, event_type, value,
             row_number() OVER (PARTITION BY bucket, event_type
                                ORDER BY ts, event_id) AS ra,
             row_number() OVER (PARTITION BY bucket, event_type
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM b
    )
    SELECT bucket, event_type,
           max(CASE WHEN ra = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rd = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM r GROUP BY 1, 2
    """,
)
def ts_ohlc_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick downsample: 6-hour candles per event_type in
    ONE hash aggregate — open/close are deterministic ordered picks via
    struct min/max on (ts, event_id, value), never ``first()`` (whose
    answer depends on partition arrival order).  All four outputs are
    picked stored DOUBLEs, so they hash-match without unit scaling."""
    from ..operators.timeseries import ohlc

    ev = load(spark, sf_dir, "events")
    return ohlc(
        ev, "ts", "value", "6 hours",
        keys=("event_type",), tie_break=("event_id",),
    )


@query(
    "ts_sessionize",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > 1800000000 THEN 1
                  ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS session_id
      FROM o
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
               AS duration_s
    FROM s GROUP BY 1, 2
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap sessionization (30-minute inactivity splits) + session
    stats.  lag-flag → running-sum numbering shares one sort per user
    (Spark plans a single Window exec), then one aggregate on
    (user, session).  The batch twin of the streaming session_window
    query — at rest you also get arbitrary post-hoc session stats."""
    from ..operators.timeseries import sessionize

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    s = sessionize(
        ev, "ts", ("user_id",), gap="30 minutes", order_tie=("event_id",)
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000"
        ).alias("duration_s"),
    )


_EWMA_NUM = " + ".join(
    f"COALESCE(lag(v, {k}) OVER w, 0) * {2 ** (7 - k)}" for k in range(8)
)
_EWMA_DEN = " + ".join(
    f"(CASE WHEN lag(v, {k}) OVER w IS NOT NULL"
    f" THEN {2 ** (7 - k)} ELSE 0 END)"
    for k in range(8)
)


@query(
    "ts_ewma",
    oracle=f"""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events
    )
    SELECT event_id, user_id,
           CAST({_EWMA_NUM} AS BIGINT) AS ewma_num,
           CAST({_EWMA_DEN} AS BIGINT) AS ewma_den
    FROM s
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α=1/2, 8-lag truncation) in EXACT scaled-integer
    arithmetic (operators/timeseries.py ewma_dyadic): numerator and
    present-weight denominator are BIGINT, so the smoothing is
    bit-identical across engines and partitionings — no float-summation
    drift.  The 8 lag expressions share one window spec → one sort per
    user, one shuffle."""
    from ..operators.timeseries import ewma_dyadic

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    out = ewma_dyadic(
        ev, "ts", "value", ("user_id",),
        depth=8, scale=100, tie_break="event_id",
    )
    return out.select("event_id", "user_id", "ewma_num", "ewma_den")


@query(
    "ts_holt_linear",
    oracle="""
    WITH s AS (
      SELECT user_id,
             {'t': epoch_us(ts), 'tb': event_id,
              'v': CAST(FLOOR(value * 100) AS DOUBLE)} AS e
      FROM events
    ),
    g AS (
      SELECT user_id,
             list_transform(list_sort(array_agg(e)), x -> x.v) AS vs
      FROM s GROUP BY user_id
    ),
    f AS (
      SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
             list_reduce(
               list_prepend([CAST(NULL AS DOUBLE), 0.0],
                            list_transform(vs, v -> [v])),
               (acc, x) -> CASE WHEN acc[1] IS NULL
                 THEN [x[1], 0.0]
                 ELSE [(x[1] + acc[1] + acc[2]) / 2,
                       ((x[1] + acc[1] + acc[2]) / 2 - acc[1] + acc[2])
                           / 2]
                 END
             ) AS st
      FROM g
    )
    SELECT user_id, n_events, st[1] AS level, st[2] AS trend,
           st[1] + st[2] AS forecast_next
    FROM f
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend, α=β=1/2) per
    user series, with a one-step-ahead forecast — the trend-aware step
    up from ts_ewma.  The sequential recurrence runs as an IN-PLAN
    ordered fold over each user's sorted value array
    (operators/timeseries.py holt_linear): one shuffle, no driver
    loop, and because both engines evaluate the identical
    +,−,/2 expression tree in the identical order, the smoothed
    doubles are bit-identical and fully on the hash — the pattern that
    makes iterative models differential-testable without rows-only
    downgrades."""
    from ..operators.timeseries import holt_linear

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return holt_linear(
        ev, "ts", "value", ("user_id",), scale=100, tie_break="event_id"
    )


@query(
    "ts_max_drawdown",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, epoch_us(ts) AS t,
             CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events
    ),
    r AS (
      SELECT event_id, user_id, t, v,
             max(v) OVER w AS run_peak
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(v) AS BIGINT) AS peak,
           CAST(min(v - run_peak) AS BIGINT) AS max_drawdown,
           CAST(min({'dd': v - run_peak, 't': t, 'e': event_id}).e
                AS BIGINT) AS worst_event_id
    FROM r GROUP BY user_id
    """,
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user series — the classic risk statistic:
    min over t of (v_t − max_{s≤t} v_s), with the peak and the
    deterministic argmin event (ties resolved by time then event id).
    The sequential-looking 'running peak' is pure window algebra —
    ONE sort per key (running max + the grouped min share the
    partitioning), exact scaled BIGINTs throughout, so every output
    is on the hash.  At 100 TB this is one shuffle on the series key
    and a map-side final aggregate — no state beyond the window sort."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.floor(F.col("value") * 100).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = ev.withColumn("run_peak", F.max("v").over(w))
    dd = (F.col("v") - F.col("run_peak")).alias("dd")
    return r.select("user_id", "event_id", "t", "v", dd).groupBy(
        "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("v").alias("peak"),
        F.min("dd").alias("max_drawdown"),
        F.min(F.struct("dd", "t", "event_id"))["event_id"].alias(
            "worst_event_id"
        ),
    )


@query(
    "ts_anomaly_zscore",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events
    ),
    fr AS (
      SELECT event_id, user_id, v,
             count(v) OVER w AS n_base,
             COALESCE(SUM(v) OVER w, 0) AS s,
             COALESCE(SUM(v * v) OVER w, 0) AS q
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, CAST(n_base AS BIGINT) AS n_base,
           CAST(n_base * v - s AS BIGINT) AS dev,
           CAST(n_base * q - s * s AS BIGINT) AS var_num,
           (n_base >= 8 AND
            (n_base * v - s) * (n_base * v - s) > 9 * (n_base * q - s * s))
               AS is_anomaly
    FROM fr
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags (|z| > 3 vs the 16 prior events
    per user) in EXACT integer arithmetic: the z-test rearranges to
    (n·v − s)² > 9·(n·q − s²) — no division/sqrt/floats, so flags are
    bit-identical across engines (operators/timeseries.py
    rolling_zscore_flags).  One window sort per user; the test is a
    map-side codegen expression — monitoring at rest costs one scan."""
    from ..operators.timeseries import rolling_zscore_flags

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    out = rolling_zscore_flags(
        ev, "ts", "value", ("user_id",),
        window_rows=16, z_threshold=3, scale=100, min_baseline=8,
        tie_break="event_id",
    )
    return out.select(
        "event_id", "user_id", "n_base", "dev", "var_num", "is_anomaly"
    )


@query(
    "ts_quantile_histogram",
    oracle="""
    WITH hourly AS (
      SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
                 AS bucket,
             CAST(FLOOR(value * 100) AS BIGINT) // 5000 AS bin,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT make_timestamp((epoch_us(bucket) // 86400000000)
                            * 86400000000) AS day,
             bin, SUM(n) AS n
      FROM hourly GROUP BY 1, 2
    ),
    cum AS (
      SELECT day, bin, n,
             SUM(n) OVER (PARTITION BY day ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS c,
             SUM(n) OVER (PARTITION BY day) AS tot
      FROM daily
    )
    SELECT day,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MIN(CASE WHEN c >= (tot * 1 + 1) // 2
                         THEN bin * 5000 END) AS BIGINT) AS p50_lo,
           CAST(MIN(CASE WHEN c >= (tot * 9 + 9) // 10
                         THEN bin * 5000 END) AS BIGINT) AS p90_lo
    FROM cum GROUP BY day
    """,
)
def ts_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-quantile cascade: hourly equi-width histograms (exact
    integer bins) re-aggregate to daily WITHOUT re-reading events, then
    p50/p90 lower bounds fall out of one cumulative window — the
    quantile twin of the HLL distinct rollup, with engine-exact outputs
    (true quantile within one 50.00-unit bin)
    (operators/timeseries.py histogram_rollup/histogram_quantile_lo).
    The oracle aggregates daily directly; equality IS the
    associativity law."""
    from ..operators.timeseries import (
        histogram_quantile_lo,
        histogram_rollup,
        time_bucket,
    )

    ev = load(spark, sf_dir, "events").select("ts", "value")
    hourly = histogram_rollup(
        ev, "ts", "value", width="1 hour", bin_units=5000, scale=100
    )
    daily = hourly.groupBy(
        time_bucket("bucket", "1 day").alias("day"), F.col("bin")
    ).agg(F.sum("n").alias("n"))
    return histogram_quantile_lo(
        daily, ("day",),
        {"p50_lo": (1, 2), "p90_lo": (9, 10)},
        bin_units=5000,
    ).select("day", "n_rows", "p50_lo", "p90_lo")


@query(
    "ts_weighted_moving_average",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'view'
    ),
    l AS (
      SELECT user_id, event_id, cents,
             lag(cents, 1) OVER w AS c1,
             lag(cents, 2) OVER w AS c2,
             lag(cents, 3) OVER w AS c3
      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(4 * cents + 3 * COALESCE(c1, cents)
              + 2 * COALESCE(c2, cents) + COALESCE(c3, cents)
              AS BIGINT) AS wma_numer,
           CAST(10 AS BIGINT) AS wma_denom
    FROM l
    """,
)
def ts_weighted_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted moving average (weights 4,3,2,1 over the last
    4 observations per user): the lag-based smoother that weights
    recency HARDER than a plain rolling mean but, unlike EWMA, forgets
    completely after the window.  Emitted as an exact integer
    numerator/denominator pair (cold-start lags backfill with the
    current value), so the result is engine-bit-identical with no
    float division anywhere; all four lags share ONE window sort per
    user."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    s = ev.select("user_id", "ts", "event_id", cents.alias("cents"))
    out = s.select(
        "user_id",
        "event_id",
        (
            F.lit(4) * F.col("cents")
            + F.lit(3) * F.coalesce(F.lag("cents", 1).over(w), F.col("cents"))
            + F.lit(2) * F.coalesce(F.lag("cents", 2).over(w), F.col("cents"))
            + F.coalesce(F.lag("cents", 3).over(w), F.col("cents"))
        )
        .cast("long")
        .alias("wma_numer"),
        F.lit(10).cast("long").alias("wma_denom"),
    )
    return out


@query(
    "ts_seasonal_forecast",
    oracle="""
    SELECT event_type,
           CAST(floor(epoch(ts) / 3600) % 24 AS BIGINT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n_obs,
           SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
               / CAST(100 AS DOUBLE) / count(value) AS forecast
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_seasonal_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-mean forecast: the per-(series, hour-of-day) historical
    average IS the next-day prediction — the baseline every forecasting
    stack ships first.  One hash aggregate over map-side epoch
    arithmetic (hour-of-day is ``floor(epoch/3600) % 24``); the profile
    table is |series|×24 rows at ANY history length, so the broadcast
    join that would apply it to live traffic is dimension-sized
    forever.  Exact integer-unit mean keeps the DOUBLE forecast
    engine-identical."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 3600) % 24).alias(
                "hour_of_day"
            ),
            "value",
        )
        .groupBy("event_type", "hour_of_day")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            (
                F.expr("sum(floor(value * 100 + 0.5d))")
                / F.lit(100.0).cast("double")
                / F.count("value")
            ).alias("forecast"),
        )
    )


@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT)
                 * 3600 * 1000000) AS bucket,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS v_units
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v_units) AS BIGINT) AS total_units
      FROM hourly GROUP BY 1
    ), dev AS (
      SELECT h.event_type, h.bucket,
             SUM(h.v_units * t.n - t.total_units) OVER (
               PARTITION BY h.event_type ORDER BY h.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cusum_scaled
      FROM hourly h JOIN tot t USING (event_type)
    ), ranked AS (
      SELECT event_type, bucket, cusum_scaled,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum_scaled) DESC, bucket)
                 AS rk
      FROM dev
    )
    SELECT event_type, bucket, CAST(cusum_scaled AS BIGINT) AS cusum_scaled
    FROM ranked WHERE rk <= 3
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per series: cumulative sum of
    deviations from the series mean peaks where the level shifts; the
    top-|cusum| buckets are the candidate change points.

    All arithmetic stays in scaled BIGINT — the deviation is
    ``v·n − total`` (the mean deviation times n), so the running sum is
    exact and order-free across engines, no floating-point drift in the
    cumulative.  (Headroom: |cusum| ≤ n·total ≈ 2^54 for a 1e9-bucket
    series of 1e6-unit values — document the bound, don't discover it.)
    Plan: hourly rollup (one shuffle), per-series totals joined back
    (series-count sized), one window per series for the running sum,
    one for the top-3 — every stage partitioned by series, no global
    sort."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.timestamp_seconds(
                (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            ).alias("bucket"),
            "value",
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("sum(floor(value * 100 + 0.5d))").alias("v_units"))
    )
    tot = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_units").alias("total_units"),
    )
    wsum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = (
        hourly.join(F.broadcast(tot), "event_type")
        .withColumn(
            "cusum_scaled",
            F.sum(
                F.col("v_units") * F.col("n") - F.col("total_units")
            ).over(wsum),
        )
    )
    wrank = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("bucket")
    )
    return (
        dev.withColumn("rk", F.row_number().over(wrank))
        .filter(F.col("rk") <= 3)
        .select("event_type", "bucket", "cusum_scaled")
    )


@query(
    "ts_correlation_pairs",
    oracle=f"""
    WITH b AS (
      SELECT user_id AS sid,
             {_BUCKET_SQL.format(w=21600)} AS bucket,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS vu
      FROM events GROUP BY 1, 2
    ), p AS (
      SELECT a.sid AS series_a, b2.sid AS series_b,
             a.vu AS x, b2.vu AS y
      FROM b a JOIN b b2 USING (bucket)
      WHERE a.sid < b2.sid
    ), m AS (
      SELECT series_a, series_b,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM p GROUP BY 1, 2
    ), r AS (
      SELECT series_a, series_b, n,
             (CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(syy AS DOUBLE) * CAST(n AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
      FROM m WHERE n >= 2
    )
    SELECT series_a, series_b, n, r FROM (
      SELECT *, row_number() OVER (
        PARTITION BY series_a ORDER BY r DESC, series_b) AS rk
      FROM r
    ) WHERE rk <= 3
    """,
)
def ts_correlation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed series-similarity search (which users' activity moves
    together): every user's 6-hour activity series correlates against
    every co-bucketed peer via the relational Pearson operator
    (operators/timeseries.py series_correlation_pairs — long-format
    bucket join + one exact-moment aggregate, never a dense driver-side
    matrix), then top-3 most-correlated peers per series.  At large
    |series| the same operator exact-scores LSH-pruned candidate pairs
    instead of the all-pairs default (the prune→exact-score shape of
    distributed top-k similarity search)."""
    from pyspark.sql.window import Window

    from ..operators.timeseries import series_correlation_pairs

    ev = load(spark, sf_dir, "events")
    r = series_correlation_pairs(
        ev, "user_id", "ts", "value", width="6 hours"
    )
    w = Window.partitionBy("series_a").orderBy(
        F.col("r").desc(), F.col("series_b")
    )
    return (
        r.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("series_a", "series_b", "n", "r")
    )


@query(
    "ts_forecast_backtest",
    oracle="""
    WITH base AS MATERIALIZED (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(floor(epoch(ts) / 3600) % 24 AS BIGINT) AS hod,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_units
      FROM events
    ),
    bounds AS (
      SELECT min(sec) + ((max(sec) - min(sec)) * 4) // 5 AS cutoff
      FROM base
    ),
    profile AS MATERIALIZED (
      SELECT event_type, hod,
             CAST(count(*) AS BIGINT) AS den,
             CAST(sum(v_units) AS BIGINT) AS num
      FROM base, bounds WHERE sec < cutoff
      GROUP BY 1, 2
    )
    SELECT b.event_type,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(SUM((abs(b.v_units * p.den - p.num) * 1000000)
                    // p.den) AS BIGINT) AS abs_err_micro,
           CAST(SUM((abs(b.v_units * p.den - p.num) * 1000000)
                    // p.den) // count(*) AS BIGINT) AS mae_micro
    FROM base b, bounds
    JOIN profile p ON p.event_type = b.event_type AND p.hod = b.hod
    WHERE b.sec >= cutoff
    GROUP BY 1
    """,
)
def ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST harness: split each series' history at the
    80%-of-timespan mark (integer-second cutoff from the observed
    min/max — scale-free, no hard-coded dates), train the seasonal
    hour-of-day profile on the head, score the tail — per-series test
    count, summed absolute error, and MAE, all in exact integer
    micro-units (``|v·den − num|·10⁶ DIV den`` — the error scales by
    the profile denominator BEFORE the division, so no float
    accumulates anywhere and both engines truncate identically).

    Scale: the projected base materializes once (lazy checkpoint) and
    feeds the bounds scalar, the training aggregate, and the test
    scoring; the profile is |series|×24 rows forever, so its join
    broadcasts; the cutoff is a single-row broadcast.  This is the
    eval loop every forecasting pipeline needs — the model row
    (ts_seasonal_forecast) ships the prediction, this ships the
    evidence."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        (F.floor(F.unix_timestamp("ts") / 3600) % 24).alias("hod"),
        F.expr("cast(floor(value * 100 + 0.5d) as bigint)").alias(
            "v_units"
        ),
    ).localCheckpoint(eager=False)
    bounds = base.agg(
        F.expr(
            "min(sec) + ((max(sec) - min(sec)) * 4) div 5"
        ).alias("cutoff")
    )
    train = base.join(F.broadcast(bounds)).filter(
        F.col("sec") < F.col("cutoff")
    )
    profile = train.groupBy(
        F.col("event_type").alias("p_type"), F.col("hod").alias("p_hod")
    ).agg(
        F.count(F.lit(1)).alias("den"),
        F.sum("v_units").alias("num"),
    )
    test = base.join(F.broadcast(bounds)).filter(
        F.col("sec") >= F.col("cutoff")
    )
    scored = test.join(
        F.broadcast(profile),
        (F.col("event_type") == F.col("p_type"))
        & (F.col("hod") == F.col("p_hod")),
    ).withColumn(
        "err_micro",
        F.expr(
            "(abs(v_units * den - num) * 1000000) div den"
        ),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum("err_micro").alias("abs_err_micro"),
        F.expr("sum(err_micro) div count(1)").alias("mae_micro"),
    )


# --------------------------------------------------------------------- #
# exact-integer series statistics (round-4 additions): autocorrelation, #
# MAD robust outliers, Spearman rank correlation                        #
# --------------------------------------------------------------------- #

_HOURLY_UNITS_SQL = f"""
      SELECT event_type,
             {_BUCKET_SQL.format(w=3600)} AS bucket,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
"""


def _hourly_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type series in exact integer units (scale 100) — the
    shared substrate for the series-statistics queries below."""
    ev = load(spark, sf_dir, "events")
    return rollup_time(
        ev, "ts", "1 hour", keys=("event_type",),
        aggs={
            "v": F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint"),
            "cnt": F.count(F.lit(1)).cast("bigint"),
        },
    )


@query(
    "ts_acf",
    oracle=f"""
    WITH h AS MATERIALIZED ({_HOURLY_UNITS_SQL}),
    led AS (
      SELECT event_type, v,
             lead(v, 1) OVER w AS l1,
             lead(v, 2) OVER w AS l2,
             lead(v, 3) OVER w AS l3
      FROM h WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
    ),
    st AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(SUM(v) AS HUGEINT) AS s,
             SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS q,
             CAST(count(l1) AS HUGEINT) AS m1,
             SUM(CAST(v AS HUGEINT) * CAST(l1 AS HUGEINT)) AS a1,
             CAST(SUM(CASE WHEN l1 IS NOT NULL THEN v END) AS HUGEINT)
                 AS bh1,
             CAST(SUM(l1) AS HUGEINT) AS bt1,
             CAST(count(l2) AS HUGEINT) AS m2,
             SUM(CAST(v AS HUGEINT) * CAST(l2 AS HUGEINT)) AS a2,
             CAST(SUM(CASE WHEN l2 IS NOT NULL THEN v END) AS HUGEINT)
                 AS bh2,
             CAST(SUM(l2) AS HUGEINT) AS bt2,
             CAST(count(l3) AS HUGEINT) AS m3,
             SUM(CAST(v AS HUGEINT) * CAST(l3 AS HUGEINT)) AS a3,
             CAST(SUM(CASE WHEN l3 IS NOT NULL THEN v END) AS HUGEINT)
                 AS bh3,
             CAST(SUM(l3) AS HUGEINT) AS bt3
      FROM led GROUP BY 1
    ),
    lags AS (
      SELECT event_type, 1 AS lag, n, s, q, m1 AS m, a1 AS a,
             bh1 AS bh, bt1 AS bt FROM st
      UNION ALL
      SELECT event_type, 2, n, s, q, m2, a2, bh2, bt2 FROM st
      UNION ALL
      SELECT event_type, 3, n, s, q, m3, a3, bh3, bt3 FROM st
    )
    SELECT event_type, CAST(lag AS INTEGER) AS lag,
           CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS n_pairs,
           CAST(n*n*a - n*s*(bh + bt) + m*s*s AS DOUBLE) AS acf_num,
           CAST(n*n*q - n*s*s AS DOUBLE) AS acf_den,
           CASE WHEN n*n*q - n*s*s > 0
                THEN CAST(n*n*a - n*s*(bh + bt) + m*s*s AS DOUBLE)
                     / CAST(n*n*q - n*s*s AS DOUBLE) END AS acf
    FROM lags WHERE m >= 2
    """,
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation at lags 1–3 per event-type hourly series, EXACT:
    the standard biased estimator r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x−x̄)²
    rearranged over integer sufficient statistics so no mean ever
    materializes — num·n² = n²·A_k − n·S·(Bh_k+Bt_k) + m_k·S²,
    den·n² = n²·Q − n·S².  Partials (A, B, S, Q) accumulate as one
    hash aggregate after a single window-lead pass (one sort per
    series); the scalar combination runs in DECIMAL(38,0) on Spark and
    HUGEINT in the oracle — exact to ~sf 10⁷ — and the SAME exact
    integer casts to the SAME double in both engines, so even the
    DOUBLE ratio hash-matches.  Constant series (den = 0) surface NULL
    acf on both sides (the NaN-vs-NULL divergence guard the round-3
    advice flagged on drift reports)."""
    h = _hourly_units(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket")
    led = h.select(
        "event_type",
        "v",
        F.lead("v", 1).over(w).alias("l1"),
        F.lead("v", 2).over(w).alias("l2"),
        F.lead("v", 3).over(w).alias("l3"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    vd = dec(F.col("v"))
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(vd * vd).cast("decimal(38,0)").alias("q"),
    ]
    for k in (1, 2, 3):
        lk = F.col(f"l{k}")
        aggs += [
            F.count(lk).cast("bigint").alias(f"m{k}"),
            F.sum(vd * dec(lk)).cast("decimal(38,0)").alias(f"a{k}"),
            F.sum(F.when(lk.isNotNull(), F.col("v")))
            .cast("bigint").alias(f"bh{k}"),
            F.sum(lk).cast("bigint").alias(f"bt{k}"),
        ]
    st = led.groupBy("event_type").agg(*aggs)
    per_lag = st.select(
        "event_type",
        F.expr(
            "inline(array("
            + ", ".join(
                f"struct({k} AS lag, m{k} AS m, a{k} AS a,"
                f" bh{k} AS bh, bt{k} AS bt)"
                for k in (1, 2, 3)
            )
            + "))"
        ),
        "n", "s", "q",
    ).filter(F.col("m") >= 2)
    n, s, q = dec(F.col("n")), dec(F.col("s")), F.col("q")
    m, a = dec(F.col("m")), F.col("a")
    bh, bt = dec(F.col("bh")), dec(F.col("bt"))
    num = (n * n * a - n * s * (bh + bt) + m * s * s).cast("decimal(38,0)")
    den = (n * n * q - n * s * s).cast("decimal(38,0)")
    return per_lag.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n"),
        F.col("m").cast("bigint").alias("n_pairs"),
        num.cast("double").alias("acf_num"),
        den.cast("double").alias("acf_den"),
        F.when(
            den > 0, num.cast("double") / den.cast("double")
        ).alias("acf"),
    )


@query(
    "ts_mad_outliers",
    oracle=f"""
    WITH h AS MATERIALIZED ({_HOURLY_UNITS_SQL}),
    med AS (
      SELECT event_type, median(CAST(v AS DOUBLE)) AS med
      FROM h GROUP BY 1
    ),
    dev AS (
      SELECT h.event_type, h.bucket, h.v, med.med,
             abs(CAST(h.v AS DOUBLE) - med.med) AS adev
      FROM h JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type, d.bucket, d.v, d.med, m.mad,
           CAST(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END
                AS INTEGER) AS is_outlier
    FROM dev d JOIN mad m USING (event_type)
    """,
)
def ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier flags per event-type hourly series —
    the heavy-tail-safe counterpart of ts_anomaly_zscore (one planted
    spike cannot inflate its own threshold the way it inflates a
    stddev).  Integer unit series → both medians are exact dyadic
    rationals (midpoint of BIGINTs, then midpoint of .5-multiples), so
    med, MAD, and the 3-MAD flags are bit-identical across engines with
    NO float tolerance.  Shape: two tiny per-type aggregates broadcast
    back onto the series — the fact table is scanned once, medians
    reduce 720 points per series, never raw events."""
    h = _hourly_units(spark, sf_dir)
    med = h.groupBy("event_type").agg(
        F.median(F.col("v").cast("double")).alias("med")
    )
    dev = h.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("v").cast("double") - F.col("med"))
    )
    mad = dev.groupBy(F.col("event_type").alias("m_type")).agg(
        F.median("adev").alias("mad")
    )
    return (
        dev.join(
            F.broadcast(mad), F.col("event_type") == F.col("m_type")
        )
        .select(
            "event_type",
            "bucket",
            "v",
            "med",
            "mad",
            (F.col("adev") > 3 * F.col("mad"))
            .cast("int")
            .alias("is_outlier"),
        )
    )


@query(
    "ts_spearman",
    oracle=f"""
    WITH h AS MATERIALIZED ({_HOURLY_UNITS_SQL}),
    ranked AS (
      SELECT event_type,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY cnt, bucket) AS BIGINT)
                 AS rc,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY v, bucket) AS BIGINT)
                 AS rv
      FROM h
    ),
    st AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM((rc - rv) * (rc - rv)) AS BIGINT) AS sum_d2
      FROM ranked GROUP BY 1
    )
    SELECT event_type, n, sum_d2,
           CAST(n * (n*n - 1) - 6 * sum_d2 AS BIGINT) AS rho_num,
           CAST(n * (n*n - 1) AS BIGINT) AS rho_den,
           CASE WHEN n >= 2
                THEN CAST(n * (n*n - 1) - 6 * sum_d2 AS DOUBLE)
                     / CAST(n * (n*n - 1) AS DOUBLE) END AS rho
    FROM st
    """,
)
def ts_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between hourly event COUNT and hourly
    value SUM per event type (does activity volume move with monetary
    magnitude?).  Ranks come from row_number with a total-order
    tie-break (metric, bucket) — a permutation, so the classic
    rho = 1 − 6Σd²/(n(n²−1)) closed form is EXACT integer arithmetic
    (n ≤ 2M before n³ nears BIGINT range; the hourly spine is far
    below).  One window pass per ranking + one hash aggregate; the
    DOUBLE rho is a ratio of identical exact BIGINTs on both engines."""
    h = _hourly_units(spark, sf_dir)
    wc = Window.partitionBy("event_type").orderBy("cnt", "bucket")
    wv = Window.partitionBy("event_type").orderBy("v", "bucket")
    ranked = h.select(
        "event_type",
        F.row_number().over(wc).cast("bigint").alias("rc"),
        F.row_number().over(wv).cast("bigint").alias("rv"),
    )
    d = F.col("rc") - F.col("rv")
    st = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d * d).cast("bigint").alias("sum_d2"),
    )
    n, d2 = F.col("n"), F.col("sum_d2")
    num = (n * (n * n - 1) - 6 * d2).cast("bigint")
    den = (n * (n * n - 1)).cast("bigint")
    return st.select(
        "event_type",
        "n",
        "sum_d2",
        num.alias("rho_num"),
        den.alias("rho_den"),
        F.when(
            n >= 2, num.cast("double") / den.cast("double")
        ).alias("rho"),
    )


@query(
    "ts_sliding_distinct_users",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    win AS (
      SELECT d.day AS target_day, u.user_id
      FROM days d JOIN ud u
        ON u.day BETWEEN d.day - 6 AND d.day
    )
    SELECT make_timestamp(target_day * 86400 * 1000000) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users_7d
    FROM win GROUP BY 1
    """,
)
def ts_sliding_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """7-day sliding distinct active users per day — the DAU/WAU
    engagement curve.  Distinct-count does NOT merge across windows
    (unlike the sums in ts_rolling_1h), so the exact form expands each
    (user, day) presence row into the ≤7 target days it supports
    (map-side sequence explode) and counts distinct per target day —
    7× amplification of the DEDUPLICATED presence frame (|users|·|days|
    ceiling), never of raw events; the approximate tier at extreme
    scale is the mergeable-HLL rollup already in
    ts_distinct_rollup_hll.  Day spine from observed days, so both
    engines enumerate identical groups."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)")
        .alias("day"),
    ).distinct()
    days = ud.select("day").distinct()
    win = days.select(F.col("day").alias("target_day")).join(
        ud,
        (F.col("day") >= F.col("target_day") - 6)
        & (F.col("day") <= F.col("target_day")),
    )
    return (
        win.groupBy("target_day")
        .agg(
            F.count_distinct("user_id").cast("bigint")
            .alias("active_users_7d")
        )
        .select(
            F.timestamp_micros(
                F.col("target_day") * 86400 * 1000000
            ).alias("day"),
            "active_users_7d",
        )
    )


@query(
    "ts_decompose_classical",
    oracle=f"""
    WITH h AS MATERIALIZED ({_HOURLY_UNITS_SQL}),
    tr AS (
      SELECT event_type, bucket, v,
             CAST(SUM(v) OVER w AS BIGINT) AS sum25,
             count(*) OVER w AS n_win,
             CAST(EXTRACT(hour FROM bucket) AS BIGINT) AS hod
      FROM h
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    complete AS (
      SELECT event_type, bucket, hod, v,
             CAST(25 * v - sum25 AS BIGINT) AS d_num, sum25
      FROM tr WHERE n_win = 25
    ),
    seas AS (
      SELECT event_type, hod,
             CAST(SUM(d_num) AS BIGINT) AS s_num,
             CAST(count(*) AS BIGINT) AS n
      FROM complete GROUP BY 1, 2
    )
    SELECT c.event_type, c.bucket, c.v,
           CAST(c.sum25 AS DOUBLE) / 25.0 AS trend,
           CAST(s.s_num AS DOUBLE) / (25.0 * CAST(s.n AS DOUBLE))
               AS seasonal,
           CAST(s.n * c.d_num - s.s_num AS DOUBLE)
               / (25.0 * CAST(s.n AS DOUBLE)) AS resid
    FROM complete c
    JOIN seas s ON s.event_type = c.event_type AND s.hod = c.hod
    """,
)
def ts_decompose_classical(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical additive decomposition of each event-type hourly
    series: trend = centered 25-hour moving average (complete windows
    only), seasonal = hour-of-day mean of the detrended series,
    residual = the rest — STL-lite, the first diagnostic before any
    forecast.  Exactness: every mean stays a RATIO of exact BIGINTs
    until the final projection (detrended ≡ (25v − Σ25)/25, seasonal ≡
    Σd/(25n), resid ≡ (n·d − Σd)/(25n)), so the emitted DOUBLEs are
    the same IEEE divisions of the same integers on both engines —
    no float accumulates anywhere.  One window sort per series + one
    tiny per-(type,hour) aggregate broadcast back."""
    h = _hourly_units(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-12, 12)
    )
    tr = h.select(
        "event_type",
        "bucket",
        "v",
        F.sum("v").over(w).cast("bigint").alias("sum25"),
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.hour("bucket").cast("bigint").alias("hod"),
    )
    complete = tr.filter(F.col("n_win") == 25).select(
        "event_type",
        "bucket",
        "hod",
        "v",
        (25 * F.col("v") - F.col("sum25")).cast("bigint").alias("d_num"),
        "sum25",
    )
    seas = complete.groupBy(
        F.col("event_type").alias("s_type"), F.col("hod").alias("s_hod")
    ).agg(
        F.sum("d_num").cast("bigint").alias("s_num"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    j = complete.join(
        F.broadcast(seas),
        (F.col("event_type") == F.col("s_type"))
        & (F.col("hod") == F.col("s_hod")),
    )
    return j.select(
        "event_type",
        "bucket",
        "v",
        (F.col("sum25").cast("double") / F.lit(25.0)).alias("trend"),
        (
            F.col("s_num").cast("double")
            / (F.lit(25.0) * F.col("n").cast("double"))
        ).alias("seasonal"),
        (
            (F.col("n") * F.col("d_num") - F.col("s_num")).cast("double")
            / (F.lit(25.0) * F.col("n").cast("double"))
        ).alias("resid"),
    )


@query(
    "ts_session_duration_hist",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > 1800000000 THEN 1
                  ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS session_id
      FROM o
    ), durs AS (
      SELECT CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                  AS BIGINT) AS duration_s
      FROM s GROUP BY user_id, session_id
    ), spine AS (
      SELECT unnest(generate_series(0, 24)) AS k
    ), binned AS (
      SELECT d.duration_s, sp.k
      FROM durs d JOIN spine sp
        ON d.duration_s >= (1::BIGINT << sp.k)
       AND d.duration_s < (1::BIGINT << (sp.k + 1))
    )
    SELECT k AS log2_bucket,
           CAST((1::BIGINT << k) AS BIGINT) AS bucket_lo_s,
           CAST(count(*) AS BIGINT) AS n_sessions
    FROM binned GROUP BY 1, 2
    """,
)
def ts_session_duration_hist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Log₂ histogram of session durations (30-min gap sessions,
    zero-length sessions excluded by the ≥1 s bucket floor): the
    dwell-time distribution readout.  The power-of-two bucketing joins
    against a TINY shift-literal spine (k = 0..24 ⇒ up to 194 days)
    with exact integer range predicates — no floating log2 anywhere,
    so bucket edges cannot ulp-flip between engines (floor(ln(x)/ln 2)
    does, at exact powers of two).  One sessionize sort + one
    broadcast range join on 25 rows."""
    from ..operators.timeseries import sessionize

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    s = sessionize(
        ev, "ts", ("user_id",), gap="30 minutes", order_tie=("event_id",)
    )
    durs = s.groupBy("user_id", "session_id").agg(
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000"
        ).cast("bigint").alias("duration_s")
    )
    spine = spark.range(0, 25).select(
        F.col("id").cast("int").alias("k"),
        F.expr("CAST(shiftleft(1L, CAST(id AS INT)) AS BIGINT)")
        .alias("lo"),
    )
    binned = durs.join(
        F.broadcast(spine),
        (F.col("duration_s") >= F.col("lo"))
        & (F.col("duration_s") < 2 * F.col("lo")),
    )
    return binned.groupBy("k", "lo").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    ).select(
        F.col("k").alias("log2_bucket"),
        F.col("lo").cast("bigint").alias("bucket_lo_s"),
        "n_sessions",
    )


@query(
    "ts_clamped_balance",
    oracle="""
    WITH s AS (
      SELECT user_id,
             {'t': epoch_us(ts), 'tb': event_id,
              'd': CAST(FLOOR(value * 100) AS BIGINT) - 500} AS e
      FROM events
    ),
    g AS (
      SELECT user_id,
             list_transform(list_sort(array_agg(e)), x -> x.d) AS ds
      FROM s GROUP BY user_id
    ),
    f AS (
      SELECT user_id, CAST(len(ds) AS BIGINT) AS n_events,
             list_reduce(
               list_prepend([CAST(0 AS BIGINT), 0, 0],
                            list_transform(ds, d -> [d])),
               (acc, x) -> [
                 least(greatest(acc[1] + x[1], 0), 10000),
                 acc[2] + CASE WHEN acc[1] + x[1] < 0 THEN 1 ELSE 0 END,
                 acc[3] + CASE WHEN acc[1] + x[1] > 10000 THEN 1
                          ELSE 0 END
               ]
             ) AS st
      FROM g
    )
    SELECT user_id, n_events,
           st[1] AS final_balance,
           st[2] AS n_floor_hits,
           st[3] AS n_cap_hits
    FROM f
    """,
)
def ts_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running balance per user — credit-ledger semantics:
    balance_t = clamp(balance_{t-1} + delta_t, 0, cap).  The clamp
    makes each step depend on the SATURATED previous state, so unlike
    a plain running sum this is NOT window algebra — it is the second
    member of the in-plan ordered-fold family (with ts_holt_linear):
    each user's deltas fold in time order with [balance, floor_hits,
    cap_hits] accumulator triples, every quantity an exact BIGINT, so
    the ledger replays bit-identically on any engine or partitioning.
    Deltas are floor(value·100)−500 (both signs), cap 10000."""
    from ..operators.timeseries import keyed_ordered_fold

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    zero = F.lit(0).cast("long")
    folded = keyed_ordered_fold(
        ev,
        ("user_id",),
        [
            F.unix_micros(F.col("ts").cast("timestamp")),
            F.col("event_id"),
        ],
        F.floor(F.col("value") * 100).cast("long") - 500,
        F.array(zero, zero, zero),
        lambda acc, d: F.array(
            F.least(
                F.greatest(acc[0] + d, F.lit(0).cast("long")),
                F.lit(10000).cast("long"),
            ),
            acc[1]
            + F.when(acc[0] + d < 0, F.lit(1).cast("long")).otherwise(
                zero
            ),
            acc[2]
            + F.when(
                acc[0] + d > 10000, F.lit(1).cast("long")
            ).otherwise(zero),
        ),
        values_col="n_events",
    )
    st = F.col("state")
    return folded.select(
        "user_id",
        "n_events",
        st[0].alias("final_balance"),
        st[1].alias("n_floor_hits"),
        st[2].alias("n_cap_hits"),
    )


@query(
    "ts_interval_coalesce",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t FROM events
    ),
    iv AS (
      -- each event opens a 10-minute activity interval
      SELECT user_id, t AS st, t + 600000000 AS en FROM e
    ),
    flag AS (
      SELECT user_id, st, en,
             CASE WHEN st > COALESCE(max(en) OVER (
               PARTITION BY user_id ORDER BY st, en
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), -1) THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    isl AS (
      SELECT user_id, st, en,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY st, en
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM flag
    ),
    m AS (
      SELECT user_id, island,
             min(st) AS cov_start, max(en) AS cov_end
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(cov_end - cov_start) AS BIGINT) AS covered_us,
           CAST(min(cov_start) AS BIGINT) AS first_start,
           CAST(max(cov_end) AS BIGINT) AS last_end
    FROM m GROUP BY user_id
    """,
)
def ts_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (coalesce overlapping ranges) per key — the
    range twin of gaps-and-islands: each event opens a 10-minute
    activity interval; overlapping/touching intervals merge into
    maximal covered spans, reporting span count and total covered
    time WITHOUT double-counting overlap.  An interval starts a new
    island iff its start exceeds the running max end of all earlier
    intervals (one window, exact µs BIGINTs); islands then aggregate
    like any group.  One sort per key — the standard coverage/uptime
    calculation (SLA windows, sensor liveness) at any scale."""
    from pyspark.sql.window import Window as W

    ten_min = 600_000_000
    iv = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("st"),
        (
            F.unix_micros(F.col("ts").cast("timestamp")) + ten_min
        ).alias("en"),
    )
    wp = W.partitionBy("user_id").orderBy("st", "en")
    prev_max_end = F.max("en").over(
        wp.rowsBetween(W.unboundedPreceding, -1)
    )
    flag = iv.withColumn(
        "new_island",
        (F.col("st") > F.coalesce(prev_max_end, F.lit(-1)))
        .cast("long"),
    )
    isl = flag.withColumn(
        "island",
        F.sum("new_island").over(
            wp.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    m = isl.groupBy("user_id", "island").agg(
        F.min("st").alias("cov_start"), F.max("en").alias("cov_end")
    )
    return m.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("cov_end") - F.col("cov_start")).alias("covered_us"),
        F.min("cov_start").alias("first_start"),
        F.max("cov_end").alias("last_end"),
    )


@query(
    "ts_rolling_ols_slope",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS tu,
             CAST(FLOOR(value * 100) AS BIGINT) AS y
      FROM events
    ),
    base AS (
      SELECT event_id, user_id, y,
             (tu - min(tu) OVER (PARTITION BY user_id)) // 1000000 AS t
      FROM e
    ),
    fr AS (
      SELECT event_id, user_id,
             CAST(count(*) OVER w AS BIGINT) AS n_win,
             CAST(sum(t) OVER w AS BIGINT) AS st,
             CAST(sum(y) OVER w AS BIGINT) AS sy,
             CAST(sum(t * y) OVER w AS BIGINT) AS sty,
             CAST(sum(t * t) OVER w AS BIGINT) AS stt
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, n_win,
           CAST(n_win * sty - st * sy AS BIGINT) AS slope_num,
           CAST(n_win * stt - st * st AS BIGINT) AS slope_den
    FROM fr WHERE n_win >= 4
    """,
)
def ts_rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window OLS trend per series — the closed-form slope
    over the last 8 observations, kept EXACT: slope = (nΣty − ΣtΣy) /
    (nΣt² − (Σt)²) reported as BIGINT numerator/denominator (the EWMA
    num/den discipline — no division, no floats, bit-identical
    anywhere).  The overflow trap is Σt² on raw epoch values (~1e19 —
    past int64); re-basing t to seconds since each user's first event
    keeps every sufficient statistic far inside BIGINT while leaving
    the slope unchanged (shift-invariance of OLS).  One window sort
    per key; the five frame sums share one spec."""
    from pyspark.sql.window import Window as W

    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    base = e.withColumn(
        "t",
        F.expr(
            "(tu - min(tu) OVER (PARTITION BY user_id)) div 1000000"
        ),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(-7, W.currentRow)
    )
    fr = base.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum("t").over(w).alias("st"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("t") * F.col("y")).over(w).alias("sty"),
        F.sum(F.col("t") * F.col("t")).over(w).alias("stt"),
    )
    return fr.filter(F.col("n_win") >= 4).select(
        "event_id",
        "user_id",
        "n_win",
        (F.col("n_win") * F.col("sty") - F.col("st") * F.col("sy"))
        .alias("slope_num"),
        (F.col("n_win") * F.col("stt") - F.col("st") * F.col("st"))
        .alias("slope_den"),
    )


@query(
    "ts_vwap_twap",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t, event_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS p
      FROM events
    ),
    w AS (
      SELECT user_id, t, p,
             lead(t) OVER (PARTITION BY user_id
                           ORDER BY t, event_id) AS t_next
      FROM e
    ),
    b AS (
      SELECT user_id, (t // 21600000000) AS bucket6h, p,
             COALESCE(t_next - t, 0) AS hold_us
      FROM w
    )
    SELECT user_id, CAST(bucket6h AS BIGINT) AS bucket6h,
           CAST(count(*) AS BIGINT) AS n_ticks,
           CAST(sum(p) AS BIGINT) AS vwap_num,
           CAST(count(*) AS BIGINT) AS vwap_den,
           CAST(sum(p * hold_us) AS BIGINT) AS twap_num,
           CAST(sum(hold_us) AS BIGINT) AS twap_den
    FROM b GROUP BY user_id, bucket6h
    """,
)
def ts_vwap_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-weighted vs TIME-weighted average price per 6-hour bucket —
    the finance pair where naive averaging goes wrong: a price held
    for one second should not weigh like one held for an hour.  TWAP
    weights each observation by its holding interval (lead(t) − t, the
    last tick of a series holding zero — a documented boundary
    choice), VWAP by tick count; both surface as exact BIGINT
    numerator/denominator so the averages are division-free on the
    hash.  One window (the lead) and one aggregate share the user
    partitioning — single shuffle."""
    from pyspark.sql.window import Window as W

    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("p"),
    )
    wspec = W.partitionBy("user_id").orderBy("t", "event_id")
    w = e.withColumn("t_next", F.lead("t").over(wspec))
    b = w.select(
        "user_id",
        F.expr("t div 21600000000").alias("bucket6h"),
        "p",
        F.coalesce(F.col("t_next") - F.col("t"), F.lit(0)).alias(
            "hold_us"
        ),
    )
    return b.groupBy("user_id", "bucket6h").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum("p").alias("vwap_num"),
        F.count(F.lit(1)).alias("vwap_den"),
        F.sum(F.col("p") * F.col("hold_us")).alias("twap_num"),
        F.sum("hold_us").alias("twap_den"),
    )


@query(
    "ts_peak_concurrency",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t FROM events
    ),
    f AS (
      SELECT user_id, t,
             CASE WHEN lag(t) OVER w IS NULL
                    OR t - lag(t) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS nf
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    g AS (
      SELECT user_id, t,
             sum(nf) OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM f
    ),
    s AS (
      SELECT user_id, sid, min(t) AS st, max(t) + 1 AS en
      FROM g GROUP BY user_id, sid
    ),
    sweep AS (
      SELECT st AS t, 1 AS delta FROM s
      UNION ALL
      SELECT en, -1 FROM s
    ),
    run AS (
      SELECT t, delta,
             sum(delta) OVER (ORDER BY t, delta DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS conc
      FROM sweep
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_sessions,
           CAST(max(conc) AS BIGINT) AS peak_concurrency,
           CAST(min(CASE WHEN conc = (SELECT max(conc) FROM run)
                    THEN t END) AS BIGINT) AS peak_at_us
    FROM run
    """,
)
def ts_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions — the sweep-line classic: each session
    contributes +1 at its start and −1 just past its end, and the
    running sum over the time-ordered deltas IS the concurrency curve;
    its max and the earliest time achieving it answer the capacity
    question ('how many simultaneous users must we size for').  Starts
    order before ends at equal times (delta DESC) so touching sessions
    count as concurrent — a deliberate, pinned boundary.  Sessions
    come from the 30-min gap sessionizer; everything is exact µs
    BIGINTs.

    The running sum is TWO-PHASE, never one global window
    (operators/prefix.prefix_sums): deltas bucket by UTC day, each day
    computes its local prefix sum in a day-partitioned window, and the
    day offsets (cumulative day totals) come from a day-METADATA table
    — one row per day, ≪ data — joined back by broadcast.  Equal
    timestamps share a bucket, so the boundary tie rule is preserved
    exactly; the only unpartitioned window left runs over the day
    metadata."""
    from ..operators.prefix import prefix_sums
    from ..operators.timeseries import sessionize

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    g = sessionize(
        ev, "ts", ("user_id",), gap="30 minutes",
        order_tie=("event_id",),
    ).withColumn("t", F.unix_micros(F.col("ts").cast("timestamp")))
    s = g.groupBy("user_id", "session_id").agg(
        F.min("t").alias("st"), (F.max("t") + 1).alias("en")
    )
    sweep = s.select(
        F.col("st").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        s.select(F.col("en").alias("t"), F.lit(-1).alias("delta"))
    )
    day_us = 86_400_000_000
    run = prefix_sums(
        sweep,
        order=[F.col("t"), F.col("delta").desc()],
        cols={"delta": "conc"},
        bucket=F.floor(F.col("t") / day_us),
        end="current",
    )
    n_sessions = s.agg(F.count(F.lit(1)).alias("n_sessions"))
    peak = run.agg(F.max("conc").alias("peak_concurrency"))
    peak_at = (
        run.crossJoin(F.broadcast(peak))
        .filter(F.col("conc") == F.col("peak_concurrency"))
        .agg(F.min("t").alias("peak_at_us"))
    )
    return (
        n_sessions.crossJoin(F.broadcast(peak))
        .crossJoin(F.broadcast(peak_at))
        .select("n_sessions", "peak_concurrency", "peak_at_us")
    )
