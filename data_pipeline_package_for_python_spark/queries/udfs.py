"""SURVEY §2.2.8 — the UDF / UDAF / UDTF surface.

All Python-boundary crossings are Arrow-batched (pandas UDFs,
applyInPandas, mapInPandas) — row-at-a-time ``F.udf`` appears exactly once,
as the equivalence demonstration, never in a hot path.

Determinism across engines: any float statistic computed inside Python is
derived from exact scaled-integer sums (int64), mirrored verbatim in the
oracle SQL, so pandas and DuckDB produce bit-identical doubles.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ._registry import load, query


@query(
    "udf_scalar_python",
    oracle="""
    SELECT c_custkey, upper(c_name) AS shouted, length(c_name) AS n
    FROM customer WHERE c_custkey < 300
    """,
)
def udf_scalar_python(spark, sf_dir):
    """Row-at-a-time Python UDF == built-in upper (the equivalence check).
    This is the slow path by design — ~100× slower than the JVM builtin at
    scale; exists to prove semantics, not for production use."""
    up = F.udf(lambda s: s.upper() if s is not None else None, "string")
    nlen = F.udf(lambda s: len(s) if s is not None else None, "int")
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        up("c_name").alias("shouted"),
        nlen("c_name").alias("n"),
    )


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized (Arrow) pandas UDF: numpy float64 elementwise ops are
    IEEE-identical to the engines' per-row double math."""

    @pandas_udf("double")
    def net(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net("l_extendedprice", "l_discount").alias("net"),
    )


@query(
    "udf_grouped_map_zscore",
    oracle="""
    WITH i AS (
        SELECT c.c_mktsegment AS seg, o.o_orderkey,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), s AS (
        SELECT seg, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS sx,
               -- A = n*Sxx - Sx^2 stays EXACT (HUGEINT) before one cast
               CAST(count(*) * SUM(cents * cents)
                    - SUM(cents) * SUM(cents) AS DOUBLE) AS a_d
        FROM i GROUP BY seg
    )
    SELECT i.seg, i.o_orderkey,
           (CAST(s.n * i.cents - s.sx AS DOUBLE) / s.n)
             / SQRT(s.a_d / (CAST(s.n AS DOUBLE) * (s.n - 1))) AS zscore
    FROM i JOIN s ON i.seg = s.seg
    """,
)
def udf_grouped_map_zscore(spark, sf_dir):
    """applyInPandas grouped-map: per-segment z-score of order totals.

    Moments are EXACT arbitrary-precision ints and the variance uses the
    cancellation-free form A = n·Σc² − (Σc)², mirrored token-for-token
    by the oracle (DuckDB keeps A exact in HUGEINT; pandas keeps it
    exact in Python ints; both convert to double once).  The naive
    (Σc² − (Σc)²/n) float64 form lost all 53 bits at sf0.1 magnitudes
    (Σc² ~ 4e20), went NEGATIVE, and Python's ``** 0.5`` then returned
    a COMPLEX array that crashed Arrow with 'unsupported numpy type
    15' — a scale bug invisible at the small fixtures.  int64 would
    overflow on Σc² there too; exact ints are the only safe reduction
    dtype for a grouped-map that must match a widening SQL engine."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = pdf["cents"].to_numpy()
        n = len(cents)
        sx = int(cents.sum())               # |Σc| < 2^53 — exact
        sxx = sum(c * c for c in cents.tolist())   # exact Python ints
        a = n * sxx - sx * sx               # ≥ 0, exact
        den = (float(a) / (float(n) * (n - 1))) ** 0.5
        z = ((n * cents - sx).astype("float64") / n) / den
        return pd.DataFrame(
            {"seg": pdf["seg"], "o_orderkey": pdf["o_orderkey"], "zscore": z}
        )

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).alias("cents"),
    )
    return base.groupBy("seg").applyInPandas(
        zscore, "seg string, o_orderkey long, zscore double"
    )


@query(
    "udf_map_in_pandas_expand",
    oracle="""
    SELECT o_orderkey, 'base' AS component, o_totalprice AS amount
    FROM orders WHERE o_orderkey < 1000
    UNION ALL
    SELECT o_orderkey, 'half' AS component, o_totalprice / 2 AS amount
    FROM orders WHERE o_orderkey < 1000
    """,
)
def udf_map_in_pandas_expand(spark, sf_dir):
    """mapInPandas as a UDTF-style 1→N row expander (each order emits a
    'base' and a 'half' component row)."""

    def expand(batches):
        for pdf in batches:
            base = pd.DataFrame(
                {
                    "o_orderkey": pdf["o_orderkey"],
                    "component": "base",
                    "amount": pdf["o_totalprice"],
                }
            )
            half = pd.DataFrame(
                {
                    "o_orderkey": pdf["o_orderkey"],
                    "component": "half",
                    "amount": pdf["o_totalprice"] / 2,
                }
            )
            yield pd.concat([base, half], ignore_index=True)

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select("o_orderkey", "o_totalprice").mapInPandas(
        expand, "o_orderkey long, component string, amount double"
    )


@query(
    "udf_grouped_agg_weighted_mean",
    oracle="""
    WITH i AS (
        SELECT l_returnflag,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
               CAST(FLOOR(l_quantity * 10 + 0.5) AS BIGINT) AS qty_t
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(SUM(price_c * qty_t) AS DOUBLE)
               / CAST(SUM(qty_t) AS DOUBLE) / 100.0 AS wmean
    FROM i GROUP BY l_returnflag
    """,
)
def udf_grouped_agg_weighted_mean(spark, sf_dir):
    """pandas_udf grouped-agg UDAF: quantity-weighted mean price from
    exact int64 sums (same formula as the oracle)."""

    @pandas_udf("double")
    def wmean(price_c: pd.Series, qty_t: pd.Series) -> float:
        num = float((price_c.to_numpy() * qty_t.to_numpy()).sum())
        den = float(qty_t.to_numpy().sum())
        return num / den / 100.0

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).alias("price_c"),
        F.floor(F.col("l_quantity") * 10 + F.lit(0.5)).alias("qty_t"),
    )
    return li.groupBy("l_returnflag").agg(
        wmean("price_c", "qty_t").alias("wmean")
    )


@query(
    "udf_sql_registered",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(SUM(CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_big
    FROM orders GROUP BY o_orderstatus
    """,
)
def udf_sql_registered(spark, sf_dir):
    """spark.udf.register + spark.sql: the SQL entry point calls the same
    Python function the DataFrame API would."""
    spark.udf.register(
        "is_big_order", lambda p: 1 if p is not None and p > 250000 else 0,
        "int",
    )
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n,
               SUM(is_big_order(o_totalprice)) AS n_big
        FROM orders_v GROUP BY o_orderstatus
        """
    )


@query(
    "udf_native_udtf",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word
    FROM part WHERE p_partkey <= 200
    """,
)
def udf_native_udtf(spark, sf_dir):
    """Native Python UDTF (Spark 3.5+/4.x ``@udtf``): one input row yields
    N output rows from ``eval``.  Row-at-a-time Python — coverage surface
    for genuinely imperative expansions; prefer mapInPandas (Arrow) or
    ``explode`` (JVM) in hot paths."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="p_partkey bigint, word string")
    class SplitWords:
        def eval(self, key: int, text: str):
            for word in text.split(" "):
                yield key, word

    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    spark.udtf.register("split_words_udtf", SplitWords)
    p.createOrReplaceTempView("part_udtf_v")
    return spark.sql(
        """
        SELECT t.p_partkey, t.word
        FROM part_udtf_v,
             LATERAL split_words_udtf(p_partkey, p_type) t
        """
    )


@query(
    "udf_apply_in_arrow",
    oracle="""
    SELECT c_mktsegment AS seg,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_acctbal
    FROM customer GROUP BY c_mktsegment
    """,
)
def udf_apply_in_arrow(spark, sf_dir):
    """applyInArrow grouped map (Spark 4 Arrow-native surface): the UDF
    receives each group as a pyarrow.Table and aggregates with Arrow
    compute kernels — no pandas materialization at all, the cheapest
    Python boundary Spark offers.  Cent units are computed JVM-side
    (floor in codegen) so the Python stage only sums exact int64s and
    the final double division is IEEE-identical to the oracle's."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def seg_stats(table: "pa.Table") -> "pa.Table":
        cents = pc.sum(table.column("cents")).as_py() or 0
        return pa.table(
            {
                "seg": [table.column("seg")[0].as_py()],
                "n": pa.array([table.num_rows], pa.int64()),
                "sum_acctbal": pa.array([cents / 100.0], pa.float64()),
            }
        )

    c = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    return c.groupBy("seg").applyInArrow(
        seg_stats, "seg string, n long, sum_acctbal double"
    )


@query(
    "udf_udtf_analyze",
    oracle="""
    SELECT doc_id,
           split_part(packed, '|', 1) AS f0,
           split_part(packed, '|', 2) AS f1,
           split_part(packed, '|', 3) AS f2
    FROM (
      SELECT doc_id, lang || '|' || source || '|' || doc_id AS packed
      FROM documents
    )
    """,
)
def udf_udtf_analyze(spark, sf_dir):
    """POLYMORPHIC UDTF (Spark 4 ``analyze()``): the output schema is
    computed at plan time from the literal width argument — f0..f{n-1}
    columns from a '|'-packed string — instead of being declared
    statically.  The dynamic-schema table function is the API that
    makes Python UDTFs composable with Catalyst (the analyzer sees
    real columns, so pruning/pushdown work downstream)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import LongType, StringType, StructType

    @udtf
    class UnpackFields:
        @staticmethod
        def analyze(key: AnalyzeArgument, packed: AnalyzeArgument,
                    n: AnalyzeArgument) -> AnalyzeResult:
            width = int(n.value)
            schema = StructType().add("doc_id", LongType())
            for i in range(width):
                schema = schema.add(f"f{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, key: int, packed: str, n: int):
            parts = packed.split("|")
            parts = (parts + [None] * n)[:n]
            yield (key, *parts)

    spark.udtf.register("unpack_fields_udtf", UnpackFields)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws("|", "lang", "source", F.col("doc_id")).alias("packed"),
    )
    docs.createOrReplaceTempView("docs_packed_v")
    return spark.sql(
        """
        SELECT t.doc_id, t.f0, t.f1, t.f2
        FROM docs_packed_v,
             LATERAL unpack_fields_udtf(doc_id, packed, 3) t
        """
    )


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT o_orderkey, length(o_orderpriority) AS pr_len,
           o_orderkey % 10 AS bucket
    FROM orders WHERE o_orderkey < 3000
    """,
)
def udf_map_in_arrow(spark, sf_dir):
    """mapInArrow (Spark 4): the partition-streaming Arrow boundary —
    each task hands Python an iterator of RecordBatches and takes one
    back, no pandas conversion, no grouping requirement.  The right
    primitive when a whole partition must flow through Python once
    (custom decoders, FFI libraries) — batches stream, so memory is
    bounded by batch size, not partition size."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_batch(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            yield pa.RecordBatch.from_arrays(
                [
                    t.column("o_orderkey").combine_chunks(),
                    pc.utf8_length(
                        t.column("o_orderpriority").combine_chunks()
                    ).cast(pa.int32()),
                    pc.subtract(
                        t.column("o_orderkey").combine_chunks(),
                        pc.multiply(
                            pc.divide(
                                t.column("o_orderkey").combine_chunks(), 10
                            ),
                            10,
                        ),
                    ),
                ],
                names=["o_orderkey", "pr_len", "bucket"],
            )

    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 3000
    ).select("o_orderkey", "o_orderpriority")
    return o.mapInArrow(
        per_batch, "o_orderkey long, pr_len int, bucket long"
    )


@query(
    "udf_arrow_optimized_scalar",
    oracle="""
    SELECT c_custkey,
           upper(c_name) || '/' || CAST(length(c_name) AS VARCHAR)
               AS tagged
    FROM customer WHERE c_custkey < 1000
    """,
)
def udf_arrow_optimized_scalar(spark, sf_dir):
    """Arrow-OPTIMIZED scalar Python UDF (Spark 4 ``useArrow=True``):
    same row-wise authoring model as a classic F.udf, but the engine
    ships column batches over Arrow instead of pickled rows — the
    migration path that removes the serialization tax without
    rewriting row UDFs into pandas form.  Equivalence-checked against
    the pure-SQL expression, like every UDF row in this family."""
    from pyspark.sql.functions import udf

    @udf(returnType="string", useArrow=True)
    def tag(name: str) -> str:
        return f"{name.upper()}/{len(name)}"

    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 1000)
    return c.select("c_custkey", tag("c_name").alias("tagged"))


@query(
    "udf_cogroup_asof",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id AS view_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM events WHERE event_type = 'view'
    ), p AS (
      SELECT user_id, event_id AS purchase_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM events WHERE event_type = 'purchase'
    ), ranked AS (
      SELECT v.user_id, v.view_id, p.purchase_id,
             row_number() OVER (
               PARTITION BY v.view_id
               ORDER BY p.ts_s DESC, p.purchase_id DESC
             ) AS rn
      FROM v LEFT JOIN p
        ON p.user_id = v.user_id AND p.ts_s <= v.ts_s
    )
    SELECT user_id, view_id, purchase_id
    FROM ranked WHERE rn = 1
    """,
)
def udf_cogroup_asof(spark, sf_dir):
    """cogroup().applyInPandas — the two-frame grouped-map surface: each
    user's views and purchases meet in ONE pandas function
    (``pd.merge_asof`` backward: latest purchase at-or-before each
    view), the canonical use Spark's own docs give the API.

    Both sides shuffle once on the key and each group pair streams
    through Arrow — per-group state is bounded by a user's own events,
    never the table.  Times are compared at whole-second precision on
    BOTH engines (the fixture stores ns, Spark reads µs — sub-second
    comparisons would disagree at boundary collisions; the second floor
    makes them identical) and merge_asof's last-in-sort-order tie rule
    is pinned by sorting purchases on (ts_s, purchase_id) to mirror the
    oracle's DESC/DESC ranking."""

    def asof(views: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
        views = views.sort_values(["ts_s", "view_id"])
        purchases = purchases.sort_values(["ts_s", "purchase_id"])
        merged = pd.merge_asof(
            views,
            purchases.rename(columns={"user_id": "r_user_id"}),
            on="ts_s",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "user_id": merged["user_id"],
                "view_id": merged["view_id"],
                "purchase_id": merged["purchase_id"].astype("Int64"),
            }
        )

    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.unix_timestamp("ts").alias("ts_s"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_timestamp("ts").alias("ts_s"),
    )
    return (
        views.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(asof, "user_id long, view_id long, purchase_id long")
    )


@query(
    "udf_udtf_table_argument",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents,
           CAST(MAX(gap) AS BIGINT) AS max_key_gap
    FROM (
      SELECT o_orderstatus, o_totalprice,
             o_orderkey - lag(o_orderkey) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_orderkey
             ) AS gap
      FROM orders WHERE o_orderkey < 5000
    )
    GROUP BY 1
    """,
)
def udf_udtf_table_argument(spark, sf_dir):
    """UDTF with a TABLE argument (Spark 4): the function consumes a
    whole RELATION — ``my_udtf(TABLE(t) PARTITION BY s ORDER BY k)`` —
    with the engine routing each partition's rows, in the declared
    order, through one stateful UDTF instance (``eval`` per row,
    ``terminate`` emits the partition summary).  This is the SQL-navel
    form of applyInPandas: same partition-scoped custom logic, but
    callable from the pure-SQL front door and streaming row-by-row
    (no whole-group materialization).  The per-status summary —
    count, exact cents, max gap between CONSECUTIVE orderkeys —
    depends on the ORDER BY clause actually holding, which the
    lag-window oracle verifies."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "o_orderstatus string, n bigint, cents bigint,"
            " max_key_gap bigint"
        )
    )
    class StatusStats:
        def __init__(self):
            self.status = None
            self.n = 0
            self.cents = 0
            self.prev_key = None
            self.max_gap = None

        def eval(self, row):
            self.status = row["o_orderstatus"]
            self.n += 1
            import math

            self.cents += int(
                math.floor(row["o_totalprice"] * 100 + 0.5)
            )
            k = row["o_orderkey"]
            if self.prev_key is not None:
                gap = k - self.prev_key
                if self.max_gap is None or gap > self.max_gap:
                    self.max_gap = gap
            self.prev_key = k

        def terminate(self):
            if self.n:
                yield self.status, self.n, self.cents, self.max_gap

    spark.udtf.register("dpp_status_stats", StatusStats)
    load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 5000
    ).createOrReplaceTempView("dpp_udtf_orders_v")
    return spark.sql("""
        SELECT * FROM dpp_status_stats(
            TABLE(dpp_udtf_orders_v)
            PARTITION BY o_orderstatus ORDER BY o_orderkey
        )
    """)
