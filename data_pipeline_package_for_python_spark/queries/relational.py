"""SURVEY §2.2.1–2.2.6 — scans, projection/filter, joins, aggregation,
windows, sort/limit/set-ops.  Each entry registers a Spark implementation
and the equivalent DuckDB oracle SQL (None ⇒ rows-only check).

Scale notes appear per-query; the common posture:
- dimension joins broadcast explicitly (`F.broadcast`) so the fact table
  never shuffles for a lookup;
- aggregations rely on Spark's partial (map-side) aggregation — the
  `groupBy().agg()` path, never RDD ops;
- all money math goes through exact decimals (see _registry.dsum).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._registry import davg, dsum, load, query, ssum
from ..operators import _util
from ..operators.joins import (
    asof_join,
    asof_join_nearest,
    broadcast_join,
    fuzzy_join_levenshtein,
    range_join,
    star_join,
)

# ---------------------------------------------------------------------- #
# §2.2.1 scans                                                           #
# ---------------------------------------------------------------------- #


@query(
    "scan_parquet_count",
    oracle="""
    SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def scan_parquet_count(spark, sf_dir):
    """Parquet scan + exact distinct. Plan check: scan reads only
    l_orderkey (column pruning)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
    )


@query(
    "scan_csv_roundtrip",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM orders
    """,
)
def scan_csv_roundtrip(spark, sf_dir):
    """orders → CSV (explicit schema + timestamp format) → read back →
    aggregate; lossless round-trip must match the oracle on the original."""
    import tempfile

    from ..sources import read_csv, write_csv

    orders = load(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="dpp_csv_") + "/orders"
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    write_csv(orders, path, timestamp_format=fmt)
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    back = read_csv(spark, path, schema=schema, timestamp_format=fmt)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("sum_price"),
    )


@query(
    "scan_json_roundtrip",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_value
    FROM events GROUP BY event_type
    """,
)
def scan_json_roundtrip(spark, sf_dir):
    """events → JSONL → read back with explicit schema → grouped agg."""
    import tempfile

    from ..sources import read_json, write_json

    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="dpp_json_") + "/events"
    write_json(ev, path)
    back = read_json(
        spark, path, schema="event_id long, event_type string, value double"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", 4).alias("sum_value"),
    )


@query(
    "scan_orc_roundtrip",
    oracle="""
    SELECT count(*) AS n_rows, count(DISTINCT p_brand) AS n_brands
    FROM part
    """,
)
def scan_orc_roundtrip(spark, sf_dir):
    """part → ORC → read back → counts."""
    import tempfile

    part = load(spark, sf_dir, "part")
    path = tempfile.mkdtemp(prefix="dpp_orc_") + "/part"
    part.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("p_brand").alias("n_brands"),
    )


@query(
    "scan_xml_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def scan_xml_roundtrip(spark, sf_dir):
    """nation → native XML sink (Spark 4 built-in source, rowTag
    layout) → read back with an explicit schema (no inference pass) →
    full-row compare against the table."""
    import tempfile

    nation = load(spark, sf_dir, "nation")
    path = tempfile.mkdtemp(prefix="dpp_xml_") + "/nation"
    (
        nation.write.format("xml")
        .option("rowTag", "nation")
        .mode("overwrite")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .load(path)
    )
    return back.select("n_nationkey", "n_name", "n_regionkey")


@query(
    "scan_jdbc_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def scan_jdbc_roundtrip(spark, sf_dir):
    """LIVE JDBC round-trip (SURVEY §2.2.1 optional row) against the
    Derby engine embedded in Spark's own distribution — no external
    server, no extra jar: nation writes through the JDBC sink (batched
    inserts) and reads back through the JDBC source as a PARTITIONED
    parallel scan (3 range predicates on n_nationkey — the shape that
    matters at scale, where an unpartitioned JDBC read funnels the
    whole table through one connection).  The database is staged once
    per (session, sf_dir) like the other round-trip fixtures."""
    import os
    import tempfile

    from ..sources import read_jdbc, write_jdbc

    key = ("jdbc_derby", sf_dir)
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    url = _JDBC_STAGE.get(key)
    if url is None:
        db = os.path.join(tempfile.mkdtemp(prefix="dpp_derby_"), "db")
        url = f"jdbc:derby:{db};create=true"
        write_jdbc(
            load(spark, sf_dir, "nation"),
            url,
            "nation_t",
            mode="overwrite",
            properties=props,
        )
        _JDBC_STAGE[key] = url
    back = read_jdbc(
        spark,
        url,
        "nation_t",
        partition_column="n_nationkey",
        lower_bound=0,
        upper_bound=25,
        num_partitions=3,
        properties=props,
    )
    return back.select("n_nationkey", "n_name", "n_regionkey")


_JDBC_STAGE: dict[tuple[str, str], str] = {}


@query(
    "scan_python_datasource",
    oracle="""
    SELECT i AS id,
           i % 8 AS bucket,
           (i * 2654435761) % 1000000007 AS val
    FROM range(0, 4096) t(i)
    """,
)
def scan_python_datasource(spark, sf_dir):
    """Custom source via the Python DataSource API (Spark 4): the
    registered ``synthrange`` format plans 8 independent input
    partitions, each generating its own index range worker-side — the
    extension path for feeds Spark doesn't ship, wired so partitions
    become tasks like any native source.  Values are pure 64-bit
    integer arithmetic, reproduced exactly by the oracle."""
    from ..sources.pyds import register_synth_range

    register_synth_range(spark)
    return (
        spark.read.format("synthrange")
        .option("n", 4096)
        .option("partitions", 8)
        .load()
    )


@query(
    "sink_partitioned_parquet",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def sink_partitioned_parquet(spark, sf_dir):
    """Partitioned parquet sink → re-read → per-partition agg.  The layout
    written here is what enables partition pruning at 100 TB."""
    import tempfile

    from ..sources import write_parquet

    orders = load(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="dpp_psink_") + "/orders"
    write_parquet(orders, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("sum_price"),
    )


@query(
    "scan_partition_pruning",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           (SELECT CAST(count(DISTINCT o_orderstatus) AS BIGINT)
            FROM orders) AS n_partitions_total,
           CAST(1 AS BIGINT) AS n_partitions_read
    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderstatus
    """,
)
def scan_partition_pruning(spark, sf_dir):
    """STATIC partition pruning made driver-checkable: orders written
    partitioned by o_orderstatus, read back with a partition-key
    filter, and the checked surface includes the number of PARTITION
    DIRECTORIES the pruned scan actually selects — straight from the
    physical plan's file index (``plans.partitions_scanned``, a
    driver-side walk, no job; ``inputFiles()`` deliberately ignores
    filters so it cannot probe this).  The oracle pins
    n_partitions_read = 1: if pruning ever regresses to scanning all
    partitions, the hash diverges — the PLAN property itself is on the
    hash, not just the (pruning-invariant) rows.  At 100 TB this is
    the difference between reading one directory and reading the
    lake."""
    import os
    import tempfile

    from .. import plans
    from ..sources import write_parquet

    key = ("prune_stage", sf_dir)
    path = _TEXT_STAGE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="dpp_prune_") + "/orders"
        write_parquet(
            load(spark, sf_dir, "orders"), path,
            partition_by=["o_orderstatus"],
        )
        _TEXT_STAGE[key] = path
    back = spark.read.parquet(path)
    n_total = len([
        d for d in os.listdir(path) if d.startswith("o_orderstatus=")
    ])
    pruned = back.filter(F.col("o_orderstatus") == "F")
    n_read = plans.partitions_scanned(pruned)
    return pruned.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.lit(n_total).cast("bigint").alias("n_partitions_total"),
        F.lit(n_read).cast("bigint").alias("n_partitions_read"),
    )


@query(
    "sink_zorder_layout",
    oracle="""
    SELECT count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 500
      AND o_totalprice BETWEEN 50000 AND 150000
    """,
)
def sink_zorder_layout(spark, sf_dir):
    """Z-order (Morton) clustered sink → read back → two-dimensional
    selective filter.  The layout gives BOTH filter columns row-group
    pruning power (no single sort order can; pinned by
    tests/test_bucketing.py's row-group stats comparison); this query
    hash-checks that the curve reorder is lossless."""
    import tempfile

    from ..sources import write_zorder_layout

    orders = load(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="dpp_zorder_") + "/orders"
    write_zorder_layout(
        orders, path, zorder_by=["o_custkey", "o_totalprice"], n_files=16
    )
    back = spark.read.parquet(path)
    return back.filter(
        F.col("o_custkey").between(100, 500)
        & F.col("o_totalprice").between(50000, 150000)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("sum_price"),
    )


@query(
    "scan_bucketed_join",
    oracle="""
    SELECT o.o_orderstatus, count(*) AS n,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_orderstatus
    """,
)
def scan_bucketed_join(spark, sf_dir):
    """Bucketed-table co-located join (SURVEY §2.2.1 layout writer).

    Both sides are written ``bucketBy`` the join key into the same
    bucket count, so the subsequent join plans with ZERO exchanges on
    the join edge — the shuffle was paid once at write time and
    amortizes over every later join/agg on that key (the 100 TB
    co-location primitive; ``tests/test_bucketing.py`` pins the
    exchange-free plan shape)."""
    import tempfile

    from ..sources import write_bucketed

    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey")
    base = tempfile.mkdtemp(prefix="dpp_bucketed_")
    write_bucketed(
        o, "dpp_orders_bq", bucket_by="o_custkey", n_buckets=8,
        sort_by="o_custkey", path=f"{base}/orders_b",
    )
    write_bucketed(
        c, "dpp_customer_bq", bucket_by="c_custkey", n_buckets=8,
        sort_by="c_custkey", path=f"{base}/customer_b",
    )
    ob, cb = spark.table("dpp_orders_bq"), spark.table("dpp_customer_bq")
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


@query(
    "source_in_memory",
    oracle="""
    SELECT 3 AS n_rows, 60 AS total
    """,
)
def source_in_memory(spark, sf_dir):
    """spark.createDataFrame literal table (schema mandatory)."""
    from ..sources import from_rows

    df = from_rows(
        spark, [(1, 10), (2, 20), (3, 30)], "id long, v long"
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("total")
    )


# ---------------------------------------------------------------------- #
# §2.2.2 projection / filter                                             #
# ---------------------------------------------------------------------- #


@query(
    "project_net_price",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net
    FROM lineitem
    """,
)
def project_net_price(spark, sf_dir):
    """Projection with computed column; per-row double math is IEEE-
    deterministic so no decimal detour is needed."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .alias("net"),
    )


@query(
    "filter_q6",
    oracle="""
    SELECT CAST(ROUND(SUM(
               CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def filter_q6(spark, sf_dir):
    """TPC-H Q6 shape: selective conjunctive filter + global agg.  Plan
    check: all four predicates appear in PushedFilters at the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    # one sql() statement per build (same analyzer-pass arithmetic as
    # agg_q1); predicates and the decimal-exact revenue expression are
    # unchanged, so PushedFilters and the value hash are identical.
    return spark.sql(
        """
        SELECT cast(round(sum(cast(l_extendedprice as decimal(18,4))
                             * cast(l_discount as decimal(18,4))), 2)
                    as double) AS revenue,
               count(1) AS n
        FROM {li}
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
        """,
        li=li,
    )


@query(
    "filter_case_tiers",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS tier,
           count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def filter_case_tiers(spark, sf_dir):
    """F.when conditional bucketing + grouped count."""
    orders = load(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return orders.groupBy(tier.alias("tier")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT count(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS bal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_name LIKE '%5%'
      AND c_acctbal IS NOT NULL
      AND NOT (c_acctbal < 0)
    """,
)
def filter_predicates(spark, sf_dir):
    """IN / LIKE / IS NULL / boolean algebra in one predicate."""
    c = load(spark, sf_dir, "customer")
    out = c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_name").like("%5%")
        & F.col("c_acctbal").isNotNull()
        & ~(F.col("c_acctbal") < 0)
    )
    return out.agg(
        F.count(F.lit(1)).alias("n"), dsum("c_acctbal").alias("bal")
    )


@query(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def distinct_segments(spark, sf_dir):
    return load(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@query(
    "drop_duplicates_subset",
    oracle="""
    SELECT c_nationkey, c_mktsegment, min(c_custkey) AS first_key
    FROM customer GROUP BY c_nationkey, c_mktsegment
    """,
)
def drop_duplicates_subset(spark, sf_dir):
    """Deterministic dropDuplicates: built as min-per-group (plain
    dropDuplicates keeps an arbitrary row — fine as an operator, not
    hash-checkable)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.min("c_custkey").alias("first_key")
    )


@query("sample_fraction", oracle=None,
       doc="df.sample is seed-stable within Spark but not across engines; "
           "rows-only check (bound-verified in tests).")
def sample_fraction(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).agg(
        F.count(F.lit(1)).alias("n")
    )


@query("sample_stratified", oracle=None,
       doc="sampleBy per-stratum fractions (training-corpus rebalancing, "
           "e.g. per-language/per-domain quotas); Bernoulli per row, no "
           "shuffle.  Seed-stable within Spark only; rows-only check "
           "(per-stratum bounds verified in tests).")
def sample_stratified(spark, sf_dir):
    """Stratified sampling: keep all of the rare stratum, downsample the
    common ones — the per-domain quota primitive a corpus pipeline uses to
    rebalance before training.  ``sampleBy`` filters map-side with a
    per-stratum Bernoulli draw: no shuffle, no stratum materialization."""
    o = load(spark, sf_dir, "orders")
    sampled = o.sampleBy(
        "o_orderstatus", fractions={"O": 0.1, "F": 0.1, "P": 1.0}, seed=42
    )
    return sampled.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


_MD5_BUCKET_SQL = (
    "CAST(('0x' || substring(md5(CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 10000"
)


@query(
    "sample_hash_deterministic",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE {_MD5_BUCKET_SQL.format(key='o_orderkey')} < 500
    """,
)
def sample_hash_deterministic(spark, sf_dir):
    """Deterministic 5% Bernoulli-by-key sample (md5 buckets, no
    rand()): map-only codegen filter, EXACTLY reproducible across
    engines — unlike `sample_fraction`, the drawn rows themselves
    hash-check.  Key-consistency means a second table sampled on the
    shared key joins losslessly with this one
    (operators/etl.py hash_sample)."""
    from ..operators.etl import hash_sample

    o = load(spark, sf_dir, "orders")
    return hash_sample(o, "o_orderkey", 0.05).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "sample_hash_stratified",
    oracle=f"""
    WITH b AS (
      SELECT o_orderkey, o_orderstatus,
             {_MD5_BUCKET_SQL.format(key='o_orderkey')} AS bucket
      FROM orders
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM b
    WHERE bucket < CASE o_orderstatus
                     WHEN 'O' THEN 1000
                     WHEN 'F' THEN 500
                     WHEN 'P' THEN 10000
                     ELSE 0 END
    GROUP BY o_orderstatus
    """,
)
def sample_hash_stratified(spark, sf_dir):
    """Per-stratum deterministic rates (downsample common statuses,
    keep ALL of 'P') with the same md5-bucket mechanism — the
    engine-reproducible twin of `sample_stratified`, so the per-stratum
    key checksums hash-check exactly
    (operators/etl.py stratified_hash_sample)."""
    from ..operators.etl import stratified_hash_sample

    o = load(spark, sf_dir, "orders")
    s = stratified_hash_sample(
        o, "o_orderkey", "o_orderstatus",
        {"O": 0.10, "F": 0.05, "P": 1.0},
    )
    return s.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.sum("o_orderkey").alias("key_sum"),
    )


# ---------------------------------------------------------------------- #
# §2.2.3 joins                                                           #
# ---------------------------------------------------------------------- #


@query(
    "join_inner",
    oracle="""
    SELECT o.o_orderstatus, count(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_inner(spark, sf_dir):
    """Fact-fact equi-join; Catalyst picks the strategy (SMJ/shuffled-hash;
    AQE may convert to broadcast at runtime when one side is small)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_customers_without_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
        ).alias("n_customers_without_orders"),
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_customers_without_orders
    FROM orders o RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def join_right_outer(spark, sf_dir):
    """Right outer join — the mirrored preserved side (customer is
    preserved, so the discriminating metric is customers WITHOUT a
    matching order, i.e. o_orderkey IS NULL).  Catalyst plans it as the
    left join with sides swapped; same shuffle shape."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    j = o.join(c, o.o_custkey == c.c_custkey, "right")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
        ).alias("n_customers_without_orders"),
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_left_only,
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_right_only
    FROM customer c FULL JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_full_outer(spark, sf_dir):
    """Full outer join: both sides preserved.  Always a shuffle join —
    broadcast cannot implement full-outer (the broadcast side's unmatched
    rows would be lost per-partition)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "full")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
        ).alias("n_left_only"),
        F.sum(
            F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
        ).alias("n_right_only"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT count(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c_custkey").alias("key_sum")
    )


@query(
    "join_anti",
    oracle="""
    SELECT count(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c_custkey").alias("key_sum")
    )


@query(
    "join_cross",
    oracle="""
    SELECT count(*) AS n FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark, sf_dir):
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).agg(F.count(F.lit(1)).alias("n"))


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name, count(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_broadcast_dims(spark, sf_dir):
    """Dimension lookups via explicit broadcast: zero fact-side shuffle
    before the aggregation.  Plan check: BroadcastHashJoin × 2."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    j = broadcast_join(c, n, c.c_nationkey == n.n_nationkey)
    j = broadcast_join(j, r, j.n_regionkey == r.r_regionkey)
    return j.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("bal"),
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT count(*) AS n,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS qty
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
    """,
)
def join_theta_range(spark, sf_dir):
    """Theta join with an equality conjunct: stays hash-joinable, the
    range predicate evaluates post-match (see operators.joins.range_join)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = range_join(
        li, p, F.col("l_quantity") > F.col("p_size"),
        equi_keys=("l_partkey", "p_partkey"),
    )
    return j.agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty")
    )


@query(
    "join_asof",
    oracle="""
    WITH ranked AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e
        JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, o_orderkey, o_totalprice FROM ranked WHERE rn = 1
    """,
)
def join_asof(spark, sf_dir):
    """As-of join (events ↔ latest order per user at event time) via the
    engine's asof_join operator: key-partitioned shuffles + one window,
    never a cartesian product."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "user_id"
    ).select("user_id", "o_orderkey", "o_orderdate", "o_totalprice")
    j = asof_join(
        ev, o, on="user_id", left_time="ts", right_time="o_orderdate",
        left_key="event_id", tie_break="o_orderkey",
    )
    return j.select("event_id", "o_orderkey", "o_totalprice")


@query(
    "join_asof_tolerance",
    oracle="""
    WITH ranked AS (
        SELECT p.event_id AS purchase_id, p.ts AS pts,
               c.event_id AS click_id, c.ts AS cts,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC, c.event_id DESC
               ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id AND c.ts <= p.ts
    )
    SELECT purchase_id, click_id FROM ranked
    WHERE rn = 1 AND cts >= pts - INTERVAL 2 DAY
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a staleness bound (pandas merge_asof
    ``tolerance`` semantics): each purchase attributes to the user's
    latest PRIOR click, but only if that click is at most 2 days old —
    older last-touches are no attribution at all.  The bound is an
    exact post-predicate on the merge-scan's selected match; same
    single-shuffle plan as the unbounded as-of."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    j = asof_join(
        p, c, on="user_id", left_time="ts", right_time="cts",
        left_key="purchase_id", tie_break="click_id",
        tolerance="2 days",
    )
    return j.select("purchase_id", "click_id")


@query(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pt
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, event_id AS click_id, epoch_us(ts) AS ct
      FROM events WHERE event_type = 'click'
    ),
    cand AS (
      SELECT p.purchase_id, c.click_id,
             CASE WHEN c.ct <= p.pt THEN p.pt - c.ct
                  ELSE c.ct - p.pt END AS dist,
             CASE WHEN c.ct <= p.pt THEN 1 ELSE 0 END AS bwd
      FROM p JOIN c ON c.user_id = p.user_id
    )
    SELECT purchase_id, click_id FROM (
      SELECT purchase_id, click_id,
             ROW_NUMBER() OVER (
               PARTITION BY purchase_id
               ORDER BY dist ASC, bwd DESC,
                        CASE WHEN bwd = 1 THEN -click_id
                             ELSE click_id END ASC
             ) AS rn
      FROM cand
    ) WHERE rn = 1
    """,
)
def join_asof_nearest(spark, sf_dir):
    """As-of join, direction='nearest' (pandas merge_asof's third
    direction; completes the backward/forward/nearest family next to
    join_asof and join_asof_tolerance): each purchase attributes to the
    user's CLOSEST click in either direction, ties to the earlier
    (backward) side.  The engine runs ONE keyed sort over the merged
    stream with two frames (running-last backward candidate,
    following-first forward candidate) — same single-shuffle merge-scan
    posture as the directional as-ofs, no join-then-rank pair blowup on
    hot users.  The oracle is the brute-force join-then-rank twin with
    the operator's exact tie ladder (distance, then backward, then
    largest-tiebreak-backward / smallest-tiebreak-forward)."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("pt"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("ct"),
    )
    j = asof_join_nearest(
        p, c, on="user_id", left_time="pt", right_time="ct",
        tie_break="click_id",
    )
    return j.select("purchase_id", "click_id")


@query(
    "join_interval_overlap",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t FROM events
    ),
    f AS (
      SELECT user_id, t,
             CASE WHEN lag(t) OVER w IS NULL
                    OR t - lag(t) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS nf
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    g AS (
      SELECT user_id, t,
             sum(nf) OVER (PARTITION BY user_id ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS session_id
      FROM f
    ),
    s AS (
      SELECT user_id, session_id, min(t) AS st, max(t) AS en
      FROM g GROUP BY user_id, session_id
    ),
    p AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             least(a.en, b.en) - greatest(a.st, b.st) AS overlap_us
      FROM s a JOIN s b
        ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
    )
    SELECT user_a, user_b,
           CAST(count(*) AS BIGINT) AS n_session_pairs,
           CAST(sum(overlap_us) AS BIGINT) AS total_overlap_us
    FROM p GROUP BY user_a, user_b
    """,
)
def join_interval_overlap(spark, sf_dir):
    """INTERVAL × INTERVAL overlap join — the join family point-lookup
    range joins don't cover: which users' activity sessions overlap in
    time, and for how long (co-presence analysis).  Sessions come from
    the gap sessionizer (operators/timeseries.py sessionize, 30-min
    gap); the overlap join blocks on covered HOUR BUCKETS (each
    session explodes to its bucket span — bounded by session length),
    so candidates meet through bucket equality, the exact overlap
    predicate filters inside the bucket, and duplicate hits from
    multi-bucket spans collapse with one distinct.  At 100 TB that is
    one shuffle on the bucket key with per-bucket fan-in bounded by
    concurrent sessions — never an interval × interval cartesian.  The
    oracle is the brute-force quadratic twin; overlap microseconds are
    exact BIGINTs."""
    from ..operators.timeseries import sessionize

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    g = sessionize(
        ev, "ts", ("user_id",), gap="30 minutes",
        order_tie=("event_id",),
    ).withColumn("t", F.unix_micros(F.col("ts").cast("timestamp")))
    sess = g.groupBy("user_id", "session_id").agg(
        F.min("t").alias("st"), F.max("t").alias("en")
    )
    hour = 3_600_000_000
    b = sess.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"st div {hour}"), F.expr(f"en div {hour}")
            )
        ),
    )
    a_side = b.select(
        F.col("user_id").alias("user_a"),
        F.col("session_id").alias("sid_a"),
        F.col("st").alias("sa"),
        F.col("en").alias("ea"),
        "bucket",
    )
    b_side = b.select(
        F.col("user_id").alias("user_b"),
        F.col("session_id").alias("sid_b"),
        F.col("st").alias("sb"),
        F.col("en").alias("eb"),
        "bucket",
    )
    pairs = (
        a_side.join(b_side, "bucket")
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea"))
        )
        .select(
            "user_a", "sid_a", "user_b", "sid_b",
            (
                F.least("ea", "eb") - F.greatest("sa", "sb")
            ).alias("overlap_us"),
        )
        .distinct()
    )
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_session_pairs"),
        F.sum("overlap_us").alias("total_overlap_us"),
    )


@query(
    "join_fuzzy_levenshtein",
    oracle="""
    WITH dirty AS (
      SELECT p_partkey AS d_key,
             substring(p_name, 1, length(p_name) - 1) AS d_name
      FROM part
    ),
    blocked AS (
      SELECT d.d_key, d.d_name, p.p_partkey AS c_key, p.p_name AS c_name,
             CAST(levenshtein(d.d_name, p.p_name) AS BIGINT) AS distance
      FROM dirty d JOIN part p
        ON string_split(d.d_name, ' ')[1] = string_split(p.p_name, ' ')[1]
    )
    SELECT d_key, d_name, c_key, c_name, distance
    FROM blocked WHERE distance <= 2
    """,
)
def join_fuzzy_levenshtein(spark, sf_dir):
    """Fuzzy record linkage: part names with the last character chopped
    off re-linked to the clean catalog by levenshtein ≤ 2 within
    first-token blocks (operators/joins.py fuzzy_join_levenshtein).
    Candidates come from one equality join on the blocking key — cost
    Σ|block|² instead of |L|·|R|; the edit distance evaluates in
    codegen on candidates only."""
    part = load(spark, sf_dir, "part")
    dirty = part.select(
        F.col("p_partkey").alias("d_key"),
        F.expr("substring(p_name, 1, length(p_name) - 1)").alias("d_name"),
    )
    clean = part.select(
        F.col("p_partkey").alias("c_key"), F.col("p_name").alias("c_name")
    )
    matched = fuzzy_join_levenshtein(
        dirty,
        clean,
        "d_name",
        "c_name",
        blocking=[(
            F.split(F.col("d_name"), " ").getItem(0),
            F.split(F.col("c_name"), " ").getItem(0),
        )],
        max_distance=2,
    )
    return matched.select("d_key", "d_name", "c_key", "c_name", "distance")


def _orders_side_fits_broadcast(spark, orders_side, token=None) -> bool:
    """Stats-gated broadcast decision for the Q3/Q5 fact edge.

    Probes Catalyst's size estimate of the PRE-JOIN orders scan (a pure
    planner call, no job): the enriched frame is an inner join of that
    scan with a dim, so ``|enriched| ≤ |orders scan| × bounded width``
    and the scan estimate is a sound upper bound — unlike the join
    node's own estimate, which inflates multiplicatively without CBO.
    The bound is compared against the session's
    ``autoBroadcastJoinThreshold`` so the gate follows the same policy
    knob as Catalyst's planner (-1 disables it).  At the 100 TB design
    point the scan estimate is in the terabytes and the gate always
    declines — the unconditional ``F.broadcast`` pin this replaces
    would have OOM'd the driver there.

    The verdict is memoized per (session, lineage, threshold): the scan
    estimate is pure metadata (parquet footer sizes) and stable for a
    given input, while computing it forces analysis + optimization of
    the probe frame — ~50 ms of py4j/Catalyst per call that would
    otherwise be paid on every plan construction."""
    from .. import plans

    thr = plans.broadcast_threshold_bytes(spark)
    if thr <= 0:
        return False
    # applicationId, not id(spark): id() can be recycled after a
    # stopped session is GC'd, letting a new session inherit a stale
    # gate verdict; the app id is unique per SparkContext lifetime.
    app_id = spark.sparkContext.applicationId
    if token is not None:
        # Fast memo: a caller-supplied (query, dataset) token lets the
        # verdict be reused WITHOUT re-building the probe frame at all —
        # constructing it costs 2 eager analyzer passes (~30 ms of the
        # old per-run build), and ``orders_side`` may then be passed as
        # a zero-arg thunk that is only invoked on a miss.
        tkey = (app_id, token, thr)
        hit = _GATE_CACHE.get(tkey)
        if hit is not None:
            return hit
    frame = orders_side() if callable(orders_side) else orders_side
    key = (
        app_id,
        frame._jdf.queryExecution().logical().semanticHash(),
        thr,
    )
    hit = _GATE_CACHE.get(key)
    if hit is None:
        _util.sweep_session_caches(app_id)
        hit = plans.estimated_size_bytes(frame) <= thr
        _GATE_CACHE[key] = hit
    if token is not None:
        _GATE_CACHE[(app_id, token, thr)] = hit
    return hit


_GATE_CACHE: dict[tuple, bool] = _util.register_session_cache({})


@query(
    "join_star_q5",
    oracle="""
    SELECT n.n_name,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000
               + 0.5) AS BIGINT)) / 10000.0 AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def join_star_q5(spark, sf_dir):
    """TPC-H Q5 shape: multi-way star join.

    Scale posture: true dimensions (region/nation/customer-dim) are
    always broadcast; the lineitem↔orders edge is chosen by the
    stats-gated ``_orders_side_fits_broadcast`` probe — broadcast +
    stream when the orders scan estimate bounds the enriched side under
    the session threshold, otherwise a direct shuffle join with the
    tiny n_name rollup folding map-side above it (the 100 TB shape;
    the gate always declines there)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    # Both paths are built as ONE sql() statement: classic DataFrames
    # run the analyzer eagerly per transformation, so the previous
    # ~20-op chain cost ~0.11 s of driver-side plan construction per
    # run (guide §4 applied at build time); a single statement parses
    # and analyzes once.  Join ORDER in the FROM clause reproduces the
    # old DataFrame shapes exactly (Catalyst keeps written order
    # without CBO), so the physical plans — and the plan-pin tests —
    # are unchanged.
    revenue = (
        "sum(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5d))"
        " / cast(10000 as double) AS revenue"
    )
    filters = """
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    """
    # probe the PRUNED projection actually broadcast (2 of 6 columns),
    # not the full orders scan — the gate should price what ships; the
    # thunk only builds it on a gate-memo miss
    if _orders_side_fits_broadcast(
        spark,
        lambda: o.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        ).select("o_orderkey", "o_custkey"),
        token=("q5_orders", sf_dir),
    ):
        # Small-side path: every broadcast build is an INDEPENDENT base
        # scan (orders, customer, nation, region), so AQE materializes
        # all four concurrently — one wall-clock round instead of the
        # serialized chain bcast(r) → bcast(n⋈r) → bcast(c⋈n⋈r) →
        # bcast(o⋈dims) that a pre-joined dim tree costs.  The lineitem
        # probe then pipelines all four broadcast hash joins in a single
        # stage; the only shuffle is the 5-group rollup.  (The probed
        # orders estimate bounds the largest broadcast; c/n/r are true
        # dims.)
        return spark.sql(
            f"""
            SELECT /*+ BROADCAST(o), BROADCAST(c), BROADCAST(n),
                       BROADCAST(r) */
                   n.n_name, {revenue}
            FROM {{li}} l
            JOIN {{o}} o ON l.l_orderkey = o.o_orderkey
            JOIN {{c}} c ON o.o_custkey = c.c_custkey
            JOIN {{n}} n ON c.c_nationkey = n.n_nationkey
            JOIN {{r}} r ON n.n_regionkey = r.r_regionkey
            {filters}
            GROUP BY n.n_name
            """,
            li=li, o=o, c=c, n=n, r=r,
        )
    # Scale path: DIRECT shuffle join, aggregation after.  Unlike Q3
    # (grouping key == join key, so agg-below-join removes the
    # re-aggregation), Q5's final grouping key is n_name — ~25 groups —
    # so a per-l_orderkey pre-aggregate would hash 60 M rows into a
    # fact-cardinality group table and STILL shuffle-join the result:
    # strictly more shuffle volume (fact + fact-keyed partials) and one
    # more stage barrier than joining the fact directly and letting the
    # 25-group rollup fold map-side.  Measured at sf10 (r8): direct
    # 3.92 s vs pre-agg 4.41 s; Spark's runtime Bloom filter (on by
    # default) additionally prunes lineitem rows whose orderkey misses
    # the date-filtered orders build when the creation side fits its
    # threshold.  At 100 TB both sides shuffle on l_orderkey/o_orderkey
    # and AQE handles skew; no fact data is ever broadcast.  The FROM
    # order builds (c⋈n⋈r) → orders (all dim-broadcast) first, then the
    # fact edge last, reproducing the old enriched-orders shape.
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(c), BROADCAST(n), BROADCAST(r) */
               n.n_name, {revenue}
        FROM {{o}} o
        JOIN {{c}} c ON o.o_custkey = c.c_custkey
        JOIN {{n}} n ON c.c_nationkey = n.n_nationkey
        JOIN {{r}} r ON n.n_regionkey = r.r_regionkey
        JOIN {{li}} l ON l.l_orderkey = o.o_orderkey
        {filters}
        GROUP BY n.n_name
        """,
        li=li, o=o, c=c, n=n, r=r,
    )


@query(
    "join_q3_topk",
    oracle="""
    SELECT o.o_orderkey,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000
               + 0.5) AS BIGINT)) / 10000.0 AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def join_q3_topk(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + group + deterministic top-k.

    Only the customer dim is unconditionally broadcast.  The
    fact-derived ``enriched`` side goes through the stats-gated
    ``_orders_side_fits_broadcast`` probe: under the threshold it is
    broadcast and lineitem streams (one shuffle); over it — always, at
    the 100 TB design point — the edge is a direct shuffle join with
    the revenue aggregation folded into the join stage (the join's
    hash partitioning satisfies the grouping), never a driver-side
    broadcast of fact data."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # single-statement builds for both paths — see join_star_q5 for the
    # analyzer-pass arithmetic; join order in FROM reproduces the old
    # DataFrame shapes and the plan pins exactly.
    select_body = """
           o.o_orderkey,
           sum(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5d))
               / cast(10000 as double) AS revenue,
           cast(o.o_orderdate as date) AS orderdate
    """
    filters = """
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
        AND l.l_shipdate > TIMESTAMP '1996-01-01'
    """
    tail = """
      GROUP BY o.o_orderkey, o.o_orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10
    """
    if _orders_side_fits_broadcast(
        spark,
        lambda: o.filter(F.col("o_orderdate") < "1998-01-01")
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        token=("q3_orders", sf_dir),
    ):
        # Small-side path: broadcast orders and customer as INDEPENDENT
        # base-scan builds (materialized concurrently by AQE) instead of
        # broadcasting the o⋈c join — the join-then-broadcast shape
        # serializes bcast(c) → enriched stage → bcast(enriched), one
        # scheduler round each.  lineitem probes both broadcast hash
        # joins in one pipelined stage; one shuffle (per-orderkey agg of
        # the filter-reduced joined rows).
        return spark.sql(
            f"""
            SELECT /*+ BROADCAST(o), BROADCAST(c) */ {select_body}
            FROM {{li}} l
            JOIN {{o}} o ON l.l_orderkey = o.o_orderkey
            JOIN {{c}} c ON o.o_custkey = c.c_custkey
            {filters} {tail}
            """,
            li=li, o=o, c=c,
        )
    # Scale path: DIRECT shuffle join, aggregation after.  The join is
    # selective (BUILDING ≈ 1/5 of customers), so a per-orderkey
    # pre-aggregate would hash the FULL fact into a fact-cardinality
    # group table and then discard ~80% of it at the join; joining
    # first aggregates only survivors.  No extra exchange: the SMJ
    # leaves both sides hash-partitioned on the order key, and
    # grouping on (o_orderkey, o_orderdate) is satisfied by that
    # clustering, so the aggregation folds into the join stage
    # (pinned: 2 exchanges total).  Measured r8 at sf10: 4.12→3.82 s
    # interleaved.  TakeOrdered(10) adds no shuffle.  FROM order:
    # (o ⋈ bcast c) first — the segment filter prunes ~80% of orders
    # BEFORE the fact edge — then the shuffle join with lineitem.
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(c) */ {select_body}
        FROM {{o}} o
        JOIN {{c}} c ON o.o_custkey = c.c_custkey
        JOIN {{li}} l ON l.l_orderkey = o.o_orderkey
        {filters} {tail}
        """,
        li=li, o=o, c=c,
    )


# ---------------------------------------------------------------------- #
# co-partitioned (bucketed) layout tier for the Q3/Q5 fact edge          #
# ---------------------------------------------------------------------- #

# one bucketed (orders, lineitem) pair per (session, sf_dir, n_buckets):
# the layout is written ONCE and every order-key join over it plans with
# zero exchanges on the fact edge — the 100 TB posture where the shuffle
# is paid at ingest time and amortizes over the whole query mix.
# value = ((orders_name, lineitem_name), tempdir) so the release path
# can drop the catalog tables AND reclaim the multi-GB data directory.
# Dead-session entries are swept by the shared registry (their catalog
# died with the session; the tempdir is what the cleanup reclaims).
def _drop_bucketed_tempdir(_key, value) -> None:
    import shutil

    shutil.rmtree(value[1], ignore_errors=True)


_BUCKETED_PAIR_CACHE: dict[
    tuple[str, str, int], tuple[tuple[str, str], str]
] = _util.register_session_cache({}, cleanup=_drop_bucketed_tempdir)


def bucketed_order_tables(spark, sf_dir: str, n_buckets: int = 8):
    """(orders, lineitem) as catalog tables bucketed + sorted on the
    order key with the same bucket count — the co-location layout for
    every orderkey-equijoin (Q3, Q5, Q4, Q12, Q21...).

    Written once per (session, sf_dir, n_buckets) and cached by
    CATALOG NAME (sf-dir-keyed, so sweeps that switch scale factors
    mid-session each get their own pair); later calls are pure catalog
    lookups.  Full unfiltered tables go in — per-query predicates
    (dates, segments) still prune at scan time via parquet row-group
    stats, and one layout serves every query shape.

    .. warning:: SESSION-GLOBAL SIDE EFFECT — this sets
       ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` for
       the rest of the session and deliberately does NOT restore it.
       The flag must be live when a consumer of the returned tables
       PLANS its join (planning happens at action time, long after this
       function returns), so a save/restore here would silently undo
       the sort-elision the layout exists for.  The cost of leaving it
       on is a planning-time file listing per bucketed scan — one
       directory per table here.  Call
       :func:`release_bucketed_order_tables` to drop the layout and
       restore the flag's default.

    The sf10 layout is multi-GB of tempdir + two catalog tables per
    (session, sf_dir); :func:`release_bucketed_order_tables` is the
    lifecycle path that frees both."""
    import hashlib
    import tempfile

    from ..sources import write_bucketed

    # sorted-bucket scans only REPORT their sort order under this flag
    # (off by default since 3.0 because the ordering check lists files
    # at planning time — cheap here, one dir per table).  With it on
    # and exactly one file per bucket (guaranteed by the repartition
    # below), sort-merge joins over the pair skip BOTH local sorts:
    # the r10 sf1 measurement flipped from 0.48x to ~1.3x of the
    # shipped plan on exactly this.
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    key = (spark.sparkContext.applicationId, sf_dir, n_buckets)
    hit = _BUCKETED_PAIR_CACHE.get(key)
    if hit is None:
        _util.sweep_session_caches(key[0])
        # stable digest, NOT Python hash(): PYTHONHASHSEED randomizes
        # hash() per process, so with a persistent metastore every new
        # process would mint a fresh table name and orphan the old
        # external table + tempdir; md5 re-derives the same name
        suffix = hashlib.md5(
            f"{sf_dir}:{n_buckets}".encode()
        ).hexdigest()[:8]
        names = (f"dpp_orders_bko_{suffix}", f"dpp_lineitem_bko_{suffix}")
        base = tempfile.mkdtemp(prefix="dpp_bko_")
        # repartition on the bucket key BEFORE the bucketed write:
        # bucketBy does not shuffle, so each input task otherwise writes
        # its own file per bucket (measured: 32 tasks × 32 buckets =
        # 1024 files at sf1) and the scan loses the sortBy order —
        # Spark only reports a bucket's outputOrdering when it selects
        # ≤1 file per bucket.  repartition uses the same murmur3 hash
        # as the bucket assignment, so every bucket lands in exactly
        # one task → one sorted file → sort-merge joins skip their
        # local sorts.  This is the one shuffle the layout tier pays,
        # at INGEST time.
        write_bucketed(
            load(spark, sf_dir, "orders")
            .repartition(n_buckets, F.col("o_orderkey")),
            names[0], bucket_by="o_orderkey", n_buckets=n_buckets,
            sort_by="o_orderkey", path=f"{base}/orders",
        )
        write_bucketed(
            load(spark, sf_dir, "lineitem")
            .repartition(n_buckets, F.col("l_orderkey")),
            names[1], bucket_by="l_orderkey", n_buckets=n_buckets,
            sort_by="l_orderkey", path=f"{base}/lineitem",
        )
        hit = (names, base)
        _BUCKETED_PAIR_CACHE[key] = hit
    return spark.table(hit[0][0]), spark.table(hit[0][1])


def bucketed_star_tables(spark, sf_dir: str, n_buckets: int = 8):
    """(denormalized orders, lineitem) bucketed + sorted on the order
    key — the r11 layout that removes the DIM SIDE from the query
    entirely.

    The r11 decomposition (BENCH_q5_decompose_r11_sf10.json) showed
    Q5-bucketed's residual is NOT the 4-table dim-broadcast build the
    r10 verdict suspected (0.083 s of a 0.916 s query): it is the dim
    *plumbing per execution* — customer scan + broadcast exchange +
    enrich join ≈ 0.25 s — plus the irreducible fact scan.  So the
    layout tier absorbs the dims at INGEST: orders is written with
    ``c_mktsegment``, ``n_name`` and ``r_name`` denormalized on
    (classic warehouse star-flattening — three low-cardinality,
    dictionary-encoded string columns, negligible storage), bucketed
    and sorted exactly like :func:`bucketed_order_tables`.  Q3 then
    filters ``c_mktsegment`` and Q5 filters ``r_name`` directly on the
    fact edge: ZERO dim scans, ZERO broadcasts, zero fact-edge
    exchanges at query time.  The pre-join cost is paid once, at the
    same ingest shuffle the bucketed layout already pays.

    The lineitem table is SHARED with :func:`bucketed_order_tables`
    (building either tier makes the other's lineitem free).  Same
    session-global ``outputOrdering`` flag caveat, same
    :func:`release_bucketed_order_tables` lifecycle."""
    import hashlib
    import tempfile

    from ..sources import write_bucketed

    # the plain pair supplies the shared lineitem table (cached)
    _, lib = bucketed_order_tables(spark, sf_dir, n_buckets)

    key = (spark.sparkContext.applicationId, sf_dir, n_buckets, "star")
    hit = _BUCKETED_PAIR_CACHE.get(key)
    if hit is None:
        _util.sweep_session_caches(key[0])
        suffix = hashlib.md5(
            f"{sf_dir}:{n_buckets}:star".encode()
        ).hexdigest()[:8]
        name = f"dpp_orders_star_bko_{suffix}"
        base = tempfile.mkdtemp(prefix="dpp_bko_star_")
        o = load(spark, sf_dir, "orders")
        c = load(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment", "c_nationkey"
        )
        n = load(spark, sf_dir, "nation").select(
            "n_nationkey", "n_regionkey", "n_name"
        )
        r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
        enriched = (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
            .join(F.broadcast(n),
                  F.col("c_nationkey") == F.col("n_nationkey"), "left")
            .join(F.broadcast(r),
                  F.col("n_regionkey") == F.col("r_regionkey"), "left")
            .drop("c_custkey", "c_nationkey", "n_nationkey",
                  "n_regionkey", "r_regionkey")
        )
        write_bucketed(
            enriched.repartition(n_buckets, F.col("o_orderkey")),
            name, bucket_by="o_orderkey", n_buckets=n_buckets,
            sort_by="o_orderkey", path=f"{base}/orders_star",
        )
        hit = ((name,), base)
        _BUCKETED_PAIR_CACHE[key] = hit
    return spark.table(hit[0][0]), lib


def release_bucketed_order_tables(spark) -> int:
    """Drop every cached bucketed (orders, lineitem) layout this session
    built: DROP TABLE both catalog entries, delete the tempdir holding
    the bucketed parquet, and restore
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` to its
    default.  Returns the number of layout pairs released.

    The lifecycle counterpart of :func:`bucketed_order_tables` —
    without it an sf10 layout (multi-GB tempdir + 2 external tables per
    sf_dir) is immortal for the process lifetime.  Mirrors
    ``BloomSketch.release()``: call when rotating layouts or at the end
    of a bench session.  Only pairs owned by THIS application are
    touched; entries from a dead session are evicted from the cache but
    their tables belong to a catalog that no longer exists."""
    import shutil

    app = spark.sparkContext.applicationId
    released = 0
    for key in list(_BUCKETED_PAIR_CACHE):
        (names, base) = _BUCKETED_PAIR_CACHE.pop(key)
        if key[0] == app:
            for name in names:
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {name}")
                except Exception:
                    pass  # catalog already gone — tempdir still removed
            released += 1
        shutil.rmtree(base, ignore_errors=True)
    try:
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    except Exception:
        pass  # session already stopped — nothing to restore
    return released


def q3_over_bucketed(spark, orders_b, lineitem_b, customer):
    """Q3 over a pre-bucketed (orders, lineitem) pair: identical
    semantics to ``join_q3_topk``'s scale path, but the fact edge is
    co-located — bucketing supplies the orderkey clustering, so the
    plan carries NO exchange between the fact scans and the join, and
    the (o_orderkey, o_orderdate) aggregation folds into the same
    stage (its clustering is satisfied by the join's).  The only
    shuffle-like movement left is TakeOrdered(10)'s driver fetch."""
    c = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    o = orders_b.filter(F.col("o_orderdate") < "1998-01-01").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem_b.filter(F.col("l_shipdate") > "1996-01-01").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # broadcast joins preserve the streamed side's (bucketed)
    # partitioning, so enriching orders with the tiny customer dim does
    # not surrender co-location
    enriched = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    return (
        li.join(enriched, li.l_orderkey == enriched.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(ssum("l_extendedprice * (1 - l_discount)").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_over_bucketed(spark, orders_b, lineitem_b, customer, nation, region):
    """Q5 over a pre-bucketed (orders, lineitem) pair: dims broadcast
    exactly as in ``join_star_q5``'s scale path, but the fact edge is
    bucket-co-located — no exchange between the fact scans and the
    join; the sole remaining exchange is the 25-group n_name rollup
    (map-side folded)."""
    r = region.filter(F.col("r_name") == "ASIA").select("r_regionkey")
    o = orders_b.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey")
    li = lineitem_b.select("l_orderkey", "l_extendedprice", "l_discount")
    dims = (
        customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                nation.select("n_nationkey", "n_regionkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    enriched = o.join(
        F.broadcast(dims), o.o_custkey == dims.c_custkey
    ).select("o_orderkey", "n_name")
    return (
        li.join(enriched, li.l_orderkey == enriched.o_orderkey)
        .groupBy("n_name")
        .agg(ssum("l_extendedprice * (1 - l_discount)").alias("revenue"))
    )


def q3_over_bucketed_star(spark, orders_star, lineitem_b):
    """Q3 over the denormalized star layout: ``c_mktsegment`` travels
    on the orders table, so the BUILDING filter is a fact-edge scan
    predicate — no customer scan, no broadcast, and (as with the plain
    bucketed tier) no exchange anywhere: the SMJ consumes the
    write-time sort and the (o_orderkey, o_orderdate) aggregation's
    clustering is satisfied by the join's."""
    o = orders_star.filter(
        (F.col("c_mktsegment") == "BUILDING")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_orderdate")
    li = lineitem_b.filter(F.col("l_shipdate") > "1996-01-01").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(ssum("l_extendedprice * (1 - l_discount)").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_over_bucketed_star(spark, orders_star, lineitem_b):
    """Q5 over the denormalized star layout: ``r_name``/``n_name``
    travel on the orders table, so the ASIA filter and the rollup key
    are fact-edge columns — no dim scans, no broadcasts; the sole
    exchange is the 25-group n_name rollup (map-side folded)."""
    o = orders_star.filter(
        (F.col("r_name") == "ASIA")
        & (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "n_name")
    li = lineitem_b.select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name")
        .agg(ssum("l_extendedprice * (1 - l_discount)").alias("revenue"))
    )


@query(
    "join_q3_topk_bucketed",
    oracle="""
    SELECT o.o_orderkey,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000
               + 0.5) AS BIGINT)) / 10000.0 AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def join_q3_topk_bucketed(spark, sf_dir):
    """Q3 over the co-partitioned layout tier (SURVEY §2.2.3 + §2.2.1):
    orders and lineitem written ``bucketBy`` the order key once, then
    joined with ZERO fact-edge exchanges — the r10 answer to the
    B3 residual, where the shipped shuffle plan's remaining cost was
    the fact exchange itself.  Results are identical to
    ``join_q3_topk`` (same oracle); only the physical layout differs.
    ``tests/test_bucketing.py`` pins the exchange-free plan."""
    ob, lib = bucketed_order_tables(spark, sf_dir)
    return q3_over_bucketed(
        spark, ob, lib, load(spark, sf_dir, "customer")
    )


@query(
    "join_star_q5_bucketed",
    oracle="""
    SELECT n.n_name,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000
               + 0.5) AS BIGINT)) / 10000.0 AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def join_star_q5_bucketed(spark, sf_dir):
    """Q5 over the co-partitioned layout tier: same bucketed
    (orders, lineitem) pair as ``join_q3_topk_bucketed`` (one write
    serves every orderkey join), dims broadcast, zero fact-edge
    exchanges — only the 25-group rollup shuffles.  Identical results
    to ``join_star_q5`` (same oracle).

    Note (r11 sf10 evidence, BENCH_bucketed_r11_sf10_3sessions.json):
    this plain bucketed variant measures 2.15–2.79× the DuckDB control
    at sf10; the denormalized ``join_star_q5_bucketed_star`` tier
    (1.46–1.89×) is the layout that meets the ≤2× bar and supersedes
    this query for that claim — this one stays as the
    co-partitioned-pair shape."""
    ob, lib = bucketed_order_tables(spark, sf_dir)
    return q5_over_bucketed(
        spark, ob, lib,
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "region"),
    )


@query(
    "join_q12_late_priority_bucketed",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def join_q12_late_priority_bucketed(spark, sf_dir):
    """Q12 over the SAME bucketed (orders, lineitem) pair as the
    Q3/Q5 layout queries — the amortization claim made checkable: one
    ingest-time layout serves every orderkey equijoin, so Q12's fact
    edge also plans exchange-free (its only shuffle is the 3-group
    returnflag rollup).  The inequality lateness predicate evaluates
    inside the SMJ output exactly as in ``join_q12_late_priority``
    (same oracle)."""
    ob, lib = bucketed_order_tables(spark, sf_dir)
    o = ob.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lib.select("l_orderkey", "l_shipdate", "l_returnflag")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(is_high, 1).otherwise(0))
        .cast("long")
        .alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1))
        .cast("long")
        .alias("low_line_count"),
    )


@query(
    "join_exists_q4_bucketed",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def join_exists_q4_bucketed(spark, sf_dir):
    """Q4's EXISTS over the shared bucketed pair — a different JOIN
    TYPE (left semi) served exchange-free by the same layout.

    The shipped ``join_exists_q4`` decorrelates the EXISTS into an
    aggregation-below-join precisely to shrink the fact-sized shuffle
    to 16-byte (key, max) rows.  Over the co-partitioned layout there
    is no shuffle to shrink, so the rewrite inverts: express the
    EXISTS DIRECTLY as a left-semi sort-merge join with the non-equi
    lateness predicate as the SMJ's residual condition — both sides
    consume their write-time bucket clustering and sort, no
    aggregation stage at all before the 5-group priority rollup (the
    plan's only exchange).  Same oracle as ``join_exists_q4``;
    ``tests/test_bucketing.py`` pins the semi-join shape."""
    ob, lib = bucketed_order_tables(spark, sf_dir)
    o = ob.filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lib.select("l_orderkey", "l_shipdate")
    sem = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "agg_having_q18_bucketed",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT)) / 100.0
               AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate
    HAVING SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT)) / 100.0
           > 200.0
    """,
)
def agg_having_q18_bucketed(spark, sf_dir):
    """Q18 over the shared bucketed pair — the layout serving an
    AGGREGATION, not just joins: ``groupBy(l_orderkey)`` on the
    bucketed lineitem satisfies its clustered distribution straight
    from the scan's ``HashPartitioning(l_orderkey)``, so the per-order
    quantity rollup — a full fact-sized shuffle in the shipped
    ``agg_having_q18`` — runs with ZERO exchanges, and the surviving
    heavy orders merge-join bucketed orders on the same partitioning
    (one local sort of the survivor side, no exchange).  Customer
    stays a broadcast dim.  Same oracle as ``agg_having_q18``;
    ``tests/test_bucketing.py`` pins the exchange-free aggregate."""
    ob, lib = bucketed_order_tables(spark, sf_dir)
    heavy = (
        lib.select("l_orderkey", "l_quantity")
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200.0)
    )
    o = ob.select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey")
    return (
        heavy.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "total_qty",
        )
    )


@query(
    "join_q21_semi_anti_bucketed",
    oracle="""
    WITH j AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END)
               AS n_late_supp
      FROM j GROUP BY 1
    ), late_pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM j WHERE is_late = 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late_pairs lp
    JOIN per_order po ON po.l_orderkey = lp.l_orderkey
    JOIN supplier s   ON s.s_suppkey = lp.l_suppkey
    WHERE po.n_supp > 1 AND po.n_late_supp = 1
    GROUP BY 1, 2
    """,
)
def join_q21_semi_anti_bucketed(spark, sf_dir):
    """Q21 over the shared bucketed pair — the layout making the
    DIRECT EXISTS / NOT EXISTS formulation affordable: a fact-vs-fact
    lineitem SELF-join pair, the shape the shipped
    ``join_q21_waiting_suppliers`` decorrelates into per-order counts
    precisely because two full-fact shuffles per predicate are
    unpayable at scale.

    Over the layout every orderkey edge is already co-partitioned, so
    the official query's shape survives verbatim: late pairs ⋉
    lineitem (another supplier shipped in the order — left-semi SMJ,
    suppkey inequality as residual) then ⋉̸ the late set itself (no
    OTHER supplier was late — left-anti SMJ), all four fact legs
    exchange-free; the only exchange is the per-supplier verdict
    rollup, and supplier is a broadcast dim.  The late-pair distinct
    is also exchange-free — ``HashPartitioning(l_orderkey)`` satisfies
    the (orderkey, suppkey) clustering.  'Late' = shipped >90 days
    after order date (fixture has no commit dates), matching the
    shipped oracle exactly."""
    ob, lib = bucketed_order_tables(spark, sf_dir)
    o = ob.select("o_orderkey", "o_orderdate")
    li = lib.select("l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    late = (
        j.filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = lib.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_suppkey").alias("r_suppkey"),
    )
    multi = late.join(
        other,
        (late.l_orderkey == F.col("r_orderkey"))
        & (late.l_suppkey != F.col("r_suppkey")),
        "left_semi",
    )
    late_rhs = late.select(
        F.col("l_orderkey").alias("a_orderkey"),
        F.col("l_suppkey").alias("a_suppkey"),
    )
    sole = multi.join(
        late_rhs,
        (multi.l_orderkey == F.col("a_orderkey"))
        & (multi.l_suppkey != F.col("a_suppkey")),
        "left_anti",
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


@query(
    "join_q3_topk_bucketed_star",
    oracle="""
    SELECT o.o_orderkey,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000
               + 0.5) AS BIGINT)) / 10000.0 AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def join_q3_topk_bucketed_star(spark, sf_dir):
    """Q3 over the DENORMALIZED star layout (r11, SURVEY §2.2.3 +
    §2.2.1): ``c_mktsegment`` is pre-joined onto the bucketed orders
    table at ingest, so the query is a pure fact-edge plan — no
    customer scan, no broadcast, ZERO exchanges.  Measured sf10:
    1.35× DuckDB vs 1.82× for the plain bucketed tier
    (BENCH_bucketed_r11).  Same oracle as ``join_q3_topk``."""
    ostar, lib = bucketed_star_tables(spark, sf_dir)
    return q3_over_bucketed_star(spark, ostar, lib)


@query(
    "join_star_q5_bucketed_star",
    oracle="""
    SELECT n.n_name,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000
               + 0.5) AS BIGINT)) / 10000.0 AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def join_star_q5_bucketed_star(spark, sf_dir):
    """Q5 over the DENORMALIZED star layout (r11): ``n_name`` and
    ``r_name`` travel on the bucketed orders table, so the ASIA filter
    and rollup key are fact columns — no dim side at all; the only
    exchange is the 25-group rollup.  The r11 decomposition showed the
    per-execution dim plumbing (~0.25 s of 0.92 s at sf10), not the
    dim-broadcast build, was Q5-bucketed's residual; absorbing the
    dims at ingest cut it to 1.73× DuckDB (was 2.6–3.0×).  Same
    oracle as ``join_star_q5``."""
    ostar, lib = bucketed_star_tables(spark, sf_dir)
    return q5_over_bucketed_star(spark, ostar, lib)


# ---------------------------------------------------------------------- #
# §2.2.4 aggregation                                                     #
# ---------------------------------------------------------------------- #


@query(
    "agg_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
               AS DOUBLE) AS sum_base_price,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
               + 0.5) AS BIGINT)) / 10000.0 AS sum_disc_price,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)
               * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS sum_charge,
           SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0
               / COUNT(l_quantity) AS avg_qty,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0
               / COUNT(l_extendedprice) AS avg_price,
           SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) / 100.0
               / COUNT(l_discount) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_q1(spark, sf_dir):
    """TPC-H Q1: the flagship grouped aggregation.  2×3 groups at any SF —
    partial aggregation collapses nearly everything map-side, so the
    shuffle moves ~#groups×#partitions rows regardless of input size.

    The averages divide the 10²-scaled exact sums instead of running
    their own 10⁶-scale floor-sums (the source columns carry ≤2 decimal
    places, so the cent-scale sum is already exact): 5 per-row scaled
    aggregates instead of 7, and the oracle computes the byte-identical
    division so both engines hold the same doubles."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = "l_extendedprice * (1 - l_discount)"
    charge = f"{disc_price} * (1 + l_tax)"
    div = "cast(100 as double)"
    # one sql() statement = one parse + one analyzer pass; the previous
    # groupBy/agg chain with 8 Column aggregates cost ~10 eager analyzer
    # passes + ~166 py4j round trips per build (~0.07 s/run, guide §4 at
    # plan-construction time).  Expression strings are byte-identical to
    # the dsum/ssum forms they replace, so both engines still hold the
    # same doubles by construction.
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               sum(floor((l_quantity) * 100 + 0.5d))
                   / {div} AS sum_qty,
               sum(floor((l_extendedprice) * 100 + 0.5d))
                   / {div} AS sum_base_price,
               sum(floor(({disc_price}) * 10000 + 0.5d))
                   / cast(10000 as double) AS sum_disc_price,
               sum(floor(({charge}) * 1000000 + 0.5d))
                   / cast(1000000 as double) AS sum_charge,
               sum(floor(l_quantity * 100 + 0.5d)) / {div}
                   / count(l_quantity) AS avg_qty,
               sum(floor(l_extendedprice * 100 + 0.5d)) / {div}
                   / count(l_extendedprice) AS avg_price,
               sum(floor(l_discount * 100 + 0.5d)) / {div}
                   / count(l_discount) AS avg_disc,
               count(1) AS count_order
        FROM {{li}}
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
        """,
        li=li,
    )


@query(
    "agg_global",
    oracle="""
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total,
           count(*) AS n,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    """,
)
def agg_global(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.agg(
        dsum("o_totalprice").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_cust,
           count(DISTINCT o_orderpriority) AS n_prio,
           count(*) AS n
    FROM orders
    """,
)
def agg_count_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count_distinct("o_custkey").alias("n_cust"),
        F.count_distinct("o_orderpriority").alias("n_prio"),
        F.count(F.lit(1)).alias("n"),
    )


@query("agg_approx_count_distinct", oracle=None,
       doc="HLL sketch differs across engines by construction; bound-checked "
           "in tests (within 5% of exact), rows-only here.")
def agg_approx_count_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_cust")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP with aggregation pushed below the Expand.

    Spark plans ``rollup(a, b)`` as Expand(×|grouping sets|) → partial
    agg → shuffle → final agg: every input row is REPLICATED once per
    grouping set before any reduction, so the hash agg touches 3× the
    rows.  Catalyst does not rewrite this, but when every measure is
    decomposable (count → sum of counts, integer-unit sum → sum of
    sums) the algebraic identity rollup(G) ∘ groupBy(finest G) =
    rollup(G) lets us aggregate on the finest grouping set FIRST — one
    ordinary shuffle whose map-side combine reduces each partition to
    ≤|distinct(a,b)| partials — and run the Expand over the tiny
    aggregate (here 6 rows → 18 expanded).  At 100 TB the Expand's 3×
    row replication is the difference between hashing 600 M and 1.8 B
    rows; the second shuffle moves |distinct keys| rows and is free.
    (Only applied because distinct(a,b) ≪ N; a rollup over near-unique
    keys should keep the single-phase plan.)  At sf0.1 the rewrite is
    roughly a wash — the removed Expand work (~70 ms) buys back the one
    extra AQE stage wave the second tiny shuffle costs — but the first
    shuffle's map-side combine now reduces 3× fewer rows, which is the
    term that grows with data size.  Data-NULL keys stay distinct from
    subtotal NULLs: gid bits are computed by the outer rollup exactly
    as in the single-phase plan."""
    li = load(spark, sf_dir, "lineitem")
    # one sql() statement per build (see agg_q1); the two-phase
    # agg-below-Expand rewrite is unchanged, expressed as a CTE.
    return spark.sql(
        """
        WITH base AS (
          SELECT l_returnflag, l_linestatus,
                 count(1) AS __n,
                 sum(floor(l_quantity * 100 + 0.5d)) AS __qty_units
          FROM {li}
          GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus,
               grouping_id() AS gid,
               sum(__n) AS n,
               sum(__qty_units) / cast(100.0 as double) AS sum_qty
        FROM base
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        li=li,
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE over pre-aggregated partials — same Expand-below-agg rewrite
    as ``agg_rollup`` (4 grouping sets here, so the naive plan replicates
    every row 4×; the pre-agg runs Expand over ≤|distinct(a,b)| rows)."""
    li = load(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"), F.sum("__n").alias("n")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (not derivable from rollup/cube): per-flag,
    per-status, and grand total in one pass — Spark expands to a single
    Expand + one aggregation, not three scans.
    Every requested set is a coarsening of (flag, status), so the same
    Expand-below-agg rewrite as ``agg_rollup`` applies: aggregate the
    finest common refinement first, then expand the tiny partial."""
    li = load(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return base.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(F.grouping_id().alias("gid"), F.sum("__n").alias("n"))


@query(
    "agg_stats",
    oracle="""
    WITH i AS (
        SELECT CAST(FLOOR(l_quantity * 10 + 0.5) AS BIGINT) AS qi,
               CAST(FLOOR(l_discount * 1000 + 0.5) AS BIGINT) AS di
        FROM lineitem
    ), s AS (
        SELECT count(*) AS n,
               CAST(SUM(qi) AS DOUBLE) / 10.0 AS sx,
               CAST(SUM(qi*qi) AS DOUBLE) / 100.0 AS sxx,
               CAST(SUM(di) AS DOUBLE) / 1000.0 AS sy,
               CAST(SUM(di*di) AS DOUBLE) / 1000000.0 AS syy,
               CAST(SUM(qi*di) AS DOUBLE) / 10000.0 AS sxy
        FROM i
    )
    SELECT n,
           (sxx - sx*sx/n) / (n-1) AS var_qty,
           SQRT((sxx - sx*sx/n) / (n-1)) AS std_qty,
           (sxy - sx*sy/n) / (n-1) AS covar_qd,
           (sxy - sx*sy/n)
               / (SQRT(sxx - sx*sx/n) * SQRT(syy - sy*sy/n)) AS corr_qd
    FROM s
    """,
)
def agg_stats(spark, sf_dir):
    """variance/stddev/covar/corr derived from exact scaled-integer
    moments: BIGINT sums are exact and convert to identical doubles on
    both engines (built-in stddev aggregates doubles in engine-specific
    order, and wide decimal→double casts double-round in DuckDB — neither
    is cross-engine hashable)."""
    return _agg_stats_impl(spark, sf_dir)


@query(
    "agg_median",
    oracle="""
    SELECT l_returnflag,
           median(CAST(l_quantity AS DOUBLE)) AS med_qty,
           median(CAST(l_extendedprice AS DOUBLE)) AS med_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median(spark, sf_dir):
    """Exact grouped median — hash-checkable because BOTH engines
    define even-count median as the midpoint interpolation of the two
    central order statistics of the same double inputs (verified
    value-identical; unlike stddev there is no accumulation-order
    dependence, the result is a function of the sorted multiset).  At
    scale the exact median is a per-group sort — the approx_percentile
    row is the 100 TB default; this is the exact tier."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.median("l_extendedprice").alias("med_price"),
        F.count(F.lit(1)).alias("n"),
    )


def _agg_stats_impl(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    qi = F.floor(F.col("l_quantity") * 10 + F.lit(0.5))
    di = F.floor(F.col("l_discount") * 1000 + F.lit(0.5))
    ints = li.select(qi.alias("qi"), di.alias("di"))
    s = ints.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("qi").cast("double") / 10.0).alias("sx"),
        (F.sum(F.col("qi") * F.col("qi")).cast("double") / 100.0).alias("sxx"),
        (F.sum("di").cast("double") / 1000.0).alias("sy"),
        (F.sum(F.col("di") * F.col("di")).cast("double") / 1000000.0)
        .alias("syy"),
        (F.sum(F.col("qi") * F.col("di")).cast("double") / 10000.0)
        .alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return s.select(
        "n",
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("std_qty"),
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_qd"),
        (
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
        ).alias("corr_qd"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders
    """,
)
def agg_percentile(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias(
            "median_price"
        ),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias(
            "p90_price"
        ),
    )


@query("agg_percentile_approx", oracle=None,
       doc="approx_percentile sketch is engine-specific; bound-checked in "
           "tests against the exact percentile.")
def agg_percentile_approx(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median")
    )


@query(
    "agg_collect_set_sorted",
    oracle="""
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
               AS segments
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_collect_set_sorted(spark, sf_dir):
    """collect_set canonicalized by array_sort + join for determinism."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(
            F.array_sort(F.collect_set("c_mktsegment")), ","
        ).alias("segments")
    )


@query(
    "agg_first_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS first_date
    FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def agg_first_per_group(spark, sf_dir):
    """Deterministic 'first' (earliest order per customer) — window +
    row_number, never F.first (which is order-undefined in Spark)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("first_date"),
        )
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)
                AS BIGINT) AS cnt_f,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0)
                AS BIGINT) AS cnt_o,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)
                AS BIGINT) AS cnt_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot with an explicit value list (no extra distinct-scan job)."""
    o = load(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
    )


# ---------------------------------------------------------------------- #
# §2.2.5 windows                                                         #
# ---------------------------------------------------------------------- #


@query(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY rn <= 3
    """,
)
def window_rank(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           value - LAG(value) OVER w AS delta,
           LEAD(value) OVER w - value AS next_delta
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
)
def window_lag_lead(spark, sf_dir):
    """lag/lead deltas per user.  Oracle casts ts to µs-precision TIMESTAMP
    to match Spark's parquet ns→µs truncation."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        (F.lead("value").over(w) - F.col("value")).alias("next_delta"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    """Running frame aggregate, exact via scaled-long units (cross-engine
    stable; same construction as _registry.dsum)."""
    o = load(spark, sf_dir, "orders")
    # one sql() statement per build (see agg_q1); the scaled-long window
    # sum is the same expression the Column form produced.
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               sum(floor(o_totalprice * 100 + 0.5d)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) / 100.0d AS running_total
        FROM {o}
        """,
        o=o,
    )


@query(
    "window_first_last_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           CAST(FIRST_VALUE(o_orderdate) OVER w AS DATE) AS first_date,
           CAST(LAST_VALUE(o_orderdate) OVER w AS DATE) AS last_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_value(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderdate").over(w).cast("date").alias("first_date"),
        F.last("o_orderdate").over(w).cast("date").alias("last_date"),
    ).distinct()


@query(
    "window_ntile_percent",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    QUALIFY o_orderkey < 500
    """,
)
def window_ntile_percent(spark, sf_dir):
    """Global ntile(4) + percent_rank — TWO-PHASE, no data-scale
    unpartitioned window (the §2.2.5 contract row, re-expressed the
    way ml_calibration_bins already tiles its deciles).

    Each row's exact global rank over (o_totalprice, o_orderkey) comes
    from operators/prefix.prefix_rank: a cumulative count of strictly
    smaller prices over price-range buckets (bucket-metadata cumsum
    only) plus a price-partitioned row_number over the key tie-break.
    o_orderkey is unique, so the full order key has no ties and
    rank == RANK() == ROW_NUMBER(); from it, SQL ntile's tile rule
    (first n mod 4 tiles take one extra row) and percent_rank's
    (rank-1)/(n-1) are closed forms — bit-identical to the window
    functions with no single-reducer sort of the orders table.
    """
    from ..operators.prefix import prefix_rank

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tot = o.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = prefix_rank(
        o, key="o_totalprice", tiebreak="o_orderkey",
        bucket=F.floor(F.col("o_totalprice") / F.lit(10000.0)),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            # SQL ntile(4): k = n div 4, r = n mod 4; tiles 1..r hold
            # k+1 rows, tiles r+1..4 hold k.  greatest(k,1) keeps the
            # unevaluated branch ANSI-safe when n < 4.
            F.expr(
                "CASE WHEN rk <= (n % 4) * ((n div 4) + 1) "
                "THEN (rk - 1) div ((n div 4) + 1) + 1 "
                "ELSE (n % 4) + (rk - (n % 4) * ((n div 4) + 1) - 1) "
                "div greatest(n div 4, 1) + 1 END"
            ).cast("int").alias("quartile"),
            F.when(F.col("n") > 1,
                   (F.col("rk") - 1).cast("double")
                   / (F.col("n") - 1).cast("double"))
            .otherwise(F.lit(0.0)).alias("pct_rank"),
        )
    )


@query(
    "window_cume_nth",
    oracle="""
    SELECT o_orderkey,
           cume_dist() OVER w AS cdist,
           nth_value(o_orderkey, 2) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    QUALIFY o_orderkey < 500
    """,
)
def window_cume_nth(spark, sf_dir):
    """cume_dist + nth_value — the remaining ranked-window surface
    next to rank/ntile/percent_rank.  nth_value uses an explicit
    running frame (identical default in both engines, pinned
    explicitly so the oracle cannot drift); total order via the
    (price, key) tie-break."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        o.select(
            "o_orderkey",
            F.cume_dist().over(w).alias("cdist"),
            F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
        )
        .filter(F.col("o_orderkey") < 500)
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice
    FROM (
        SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY o.o_totalprice DESC, o.o_orderkey
               ) AS rn
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark, sf_dir):
    """Top-3 per market segment via the zero-exchange local combiner.

    c_mktsegment has 5 distinct values: a plain window over it would
    funnel the whole orders table through 5 reducers (5 × 20 TB sorts
    at the 100 TB design point).  local_topk_per_group combines each
    scan partition down to its own top-3 per segment IN PLACE — the
    fact table crosses no network — and ranks only the surviving
    ~partitions × segments × k rows in the final window.  (The salted
    two-phase operator, operators/skew.py:18, solves the same funnel
    with a balanced phase-1 shuffle; it remains the choice when order
    keys are computed expressions or combiner state would be large —
    ``tests/test_skew.py`` pins both against each other.)"""
    from ..operators.skew import local_topk_per_group

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    # dim-enrich join as one sql() statement (see agg_q1 build notes)
    j = spark.sql(
        """
        SELECT /*+ BROADCAST(c) */ c_mktsegment, o_orderkey, o_totalprice
        FROM {o} o JOIN {c} c ON o.o_custkey = c.c_custkey
        """,
        o=o, c=c,
    )
    return local_topk_per_group(
        j,
        ["c_mktsegment"],
        [("o_totalprice", False), ("o_orderkey", True)],
        3,
    )


def _window_topk_salted_reference(spark, sf_dir):
    """The salted-operator form of window_topk_per_group, kept callable
    for the equivalence test in tests/test_skew.py."""
    from ..operators.skew import salted_topk_per_group

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    return salted_topk_per_group(
        j,
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    )


# ---------------------------------------------------------------------- #
# §2.2.6 sort / limit / set ops                                          #
# ---------------------------------------------------------------------- #


@query(
    "sort_top100",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_top100(spark, sf_dir):
    """Global top-k: Spark executes orderBy+limit as TakeOrderedAndProject
    (per-partition heaps + driver merge), never a full global sort."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "sort_multikey_nulls",
    oracle="""
    SELECT n_name, n_regionkey FROM nation
    ORDER BY n_regionkey DESC NULLS LAST, n_name ASC
    """,
)
def sort_multikey_nulls(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    return n.select("n_name", "n_regionkey").orderBy(
        F.col("n_regionkey").desc_nulls_last(), F.col("n_name").asc()
    )


@query(
    "setop_union",
    oracle="""
    SELECT count(*) AS n_all, count(DISTINCT o_orderkey) AS n_keys FROM (
        SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderkey FROM orders WHERE o_orderstatus <> 'F'
    )
    """,
)
def setop_union(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    b = o.filter(F.col("o_orderstatus") != "F").select("o_orderkey")
    u = a.unionByName(b)
    return u.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count_distinct("o_orderkey").alias("n_keys"),
    )


@query(
    "setop_intersect_except",
    oracle="""
    WITH with_orders AS (SELECT DISTINCT o_custkey AS k FROM orders),
         rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
    SELECT 'n_intersect' AS op, count(*) AS cnt
      FROM (SELECT k FROM with_orders INTERSECT SELECT k FROM rich)
    UNION ALL
    SELECT 'n_intersect_all' AS op, count(*) AS cnt
      FROM (SELECT k FROM with_orders INTERSECT ALL SELECT k FROM rich)
    UNION ALL
    SELECT 'n_except' AS op, count(*) AS cnt
      FROM (SELECT DISTINCT k FROM
            (SELECT k FROM rich EXCEPT ALL SELECT k FROM with_orders))
    UNION ALL
    SELECT 'n_except_all' AS op, count(*) AS cnt
      FROM (SELECT k FROM with_orders EXCEPT ALL SELECT k FROM rich)
    """,
)
def setop_intersect_except(spark, sf_dir):
    """intersect / intersectAll / exceptAll as ONE composed plan.

    Each set-op branch is aggregated to a single tagged count and the
    four counts are unioned — one action, no driver-side ``.count()``
    round-trips, no driver-assembled result frame.  (The branches share
    the two base scans; Catalyst reuses the exchange under AQE.)"""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    with_orders = o.select(F.col("o_custkey").alias("k")).distinct()
    rich = c.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("k")
    )

    def tagged(df, op):
        return df.agg(F.count(F.lit(1)).alias("cnt")).select(
            F.lit(op).alias("op"), "cnt"
        )

    return (
        tagged(with_orders.intersect(rich), "n_intersect")
        .unionByName(
            tagged(with_orders.intersectAll(rich), "n_intersect_all")
        )
        .unionByName(
            tagged(rich.exceptAll(with_orders).distinct(), "n_except")
        )
        .unionByName(
            tagged(with_orders.exceptAll(rich), "n_except_all")
        )
    )


@query(
    "agg_salted_skew",
    oracle="""
    SELECT lang,
           CAST(count(doc_id) AS BIGINT) AS count_doc_id,
           CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
    FROM documents GROUP BY lang
    """,
)
def agg_salted_skew(spark, sf_dir):
    """Salted two-phase aggregation on a skewed key (documents.lang —
    a handful of values, one dominant): phase 1 groups on (lang, salt)
    so the hot language spreads over 32 reducers, phase 2 merges the
    partials (operators/skew.py salted_groupby_agg).  The result is
    salt-invariant — identical to the plain GROUP BY the oracle runs —
    which is exactly why the operator is safe to drop in when one key
    would otherwise exceed a reducer.  count/sum are decomposable, so
    both phases keep map-side partial aggregation."""
    from ..operators.skew import salted_groupby_agg

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return salted_groupby_agg(
        docs, ["lang"], {"doc_id": "count", "n_chars": "sum"}
    )


@query(
    "sink_partition_overwrite",
    oracle="""
    WITH kept AS (
      SELECT o_orderstatus, o_totalprice FROM orders
      WHERE o_orderstatus <> 'F'
    ), replaced AS (
      SELECT o_orderstatus, o_totalprice + 1000 AS o_totalprice
      FROM orders
      WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0
    ), final AS (
      SELECT * FROM kept UNION ALL SELECT * FROM replaced
    )
    SELECT o_orderstatus, count(*) AS n,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0
               AS sum_price
    FROM final GROUP BY o_orderstatus
    """,
)
def sink_partition_overwrite(spark, sf_dir):
    """Dynamic partition overwrite — the incremental-reload primitive:
    rewriting one partition's batch must replace ONLY the partitions
    present in the batch and leave every other partition untouched
    (``partitionOverwriteMode=dynamic``; static mode would wipe the
    whole table root).  At 100 TB this is how daily reloads amortize:
    the rewrite cost follows the changed partitions, not the table.
    The check re-reads the table after replacing partition 'F' with a
    modified half-batch and aggregates every partition — wiping or
    duplicating any partition breaks the hash."""
    import tempfile

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="dpp_dynover_") + "/orders"
    orders.write.partitionBy("o_orderstatus").parquet(path)
    batch = (
        orders.filter(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0)
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
    )
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "dynamic")
    try:
        batch.write.mode("overwrite").partitionBy(
            "o_orderstatus"
        ).parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            / F.lit(100.0)
        ).alias("sum_price"),
    )


@query(
    "sink_python_datasource",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey < 2000
    GROUP BY o_orderstatus
    """,
)
def sink_python_datasource(spark, sf_dir):
    """The WRITER half of Spark 4's Python DataSource API
    (sources/pyds.py JsonLinesSinkDataSource): executors stream their
    partitions to independent files under a two-phase
    .inprogress→rename commit (a failed or speculative task never
    publishes a half-file), then the round-trip re-read aggregates
    back to the source values.  With the reader row this completes the
    custom-source/custom-sink story — no JVM code either way."""
    import tempfile

    from ..sources.pyds import register_jsonl_sink

    register_jsonl_sink(spark)
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 2000
    ).select("o_orderkey", "o_orderstatus")
    path = tempfile.mkdtemp(prefix="dpp_pyds_sink_") + "/orders"
    o.write.format("dpp_jsonl").option("path", path).mode("append").save()
    back = spark.read.json(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
    )


@query(
    "window_share_of_total",
    oracle="""
    WITH c AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey < 1000
    )
    SELECT o_orderkey, o_orderstatus,
           CAST(cents AS DOUBLE)
             / SUM(cents) OVER (PARTITION BY o_orderstatus) AS share
    FROM c
    """,
)
def window_share_of_total(spark, sf_dir):
    """Percent-of-total (ratio_to_report): each order's share of its
    status group's revenue.  The denominator is a windowed SUM of
    exact integer cents — order-insensitive, so the double division is
    engine-identical; a windowed SUM of raw doubles would hash-drift
    on accumulation order.  One window, no self-join against the
    group totals."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("o_orderstatus")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        (cents.cast("double") / F.sum(cents).over(w)).alias("share"),
    )


@query(
    "scan_csv_malformed",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_orderkey % 7 = 0 THEN 0 ELSE 1 END)
                AS BIGINT) AS n_good,
           CAST(SUM(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN o_orderkey % 7 = 0 THEN 0
                         ELSE o_orderkey END) AS BIGINT) AS good_key_sum
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scan_csv_malformed(spark, sf_dir):
    """PERMISSIVE CSV ingestion with a corrupt-record column: every
    7th line is deliberately unparseable (non-numeric price), the read
    keeps good rows typed and quarantines bad ones into
    `_corrupt_record` instead of failing the job — the
    bad-rows-at-scale discipline (FAILFAST kills a 100 TB ingest on
    one poisoned line; quarantine-and-audit doesn't, and the corrupt
    count is the audit)."""
    import tempfile

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    lines = o.select(
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.concat_ws(",", F.col("o_orderkey"), F.lit("not-a-price")),
        )
        .otherwise(
            F.concat_ws(",", F.col("o_orderkey"), F.col("o_totalprice"))
        )
        .alias("value")
    )
    path = tempfile.mkdtemp(prefix="dpp_csvbad_") + "/rows"
    lines.write.mode("overwrite").text(path)
    back = spark.read.csv(
        path,
        schema="k BIGINT, price DOUBLE, _corrupt_record STRING",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).cache()
    return back.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias(
            "n_good"
        ),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        F.sum(
            F.when(F.col("_corrupt_record").isNull(), F.col("k")).otherwise(
                0
            )
        ).alias("good_key_sum"),
    )


# ---------------------------------------------------------------------- #
# §2.2.3/2.2.4 — decision-support subquery shapes (TPC-H Q4 / Q17 / Q18) #
#                                                                        #
# The reference's DSL has no subquery surface, but SURVEY §2.2's contract#
# covers the relational-engine shapes users express THROUGH the facade:  #
# correlated EXISTS, correlated scalar subqueries, and HAVING.  Each is  #
# decorrelated by hand into the aggregation-below-join form Catalyst     #
# itself targets, so the physical plan is one fact-keyed partial agg +   #
# one join — never a per-row re-probe of the fact table.                 #
# ---------------------------------------------------------------------- #


@query(
    "join_exists_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def join_exists_q4(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS with an extra non-equi
    predicate, decorrelated to aggregation-below-join.

    ``EXISTS(l.l_orderkey = o.o_orderkey AND l.l_shipdate >
    o.o_orderdate)`` holds iff ``max(l_shipdate) per l_orderkey >
    o_orderdate``, so lineitem collapses to one (key, max) row per
    order BEFORE the join: the fact-sized shuffle carries 16-byte
    rows instead of full lineitems, and the non-equi half of the
    predicate is evaluated post-join on the aggregate — the shape a
    correlated-subquery rewrite should reach at 100 TB.  (The fixture
    has no l_commitdate/l_receiptdate, so shipdate-vs-orderdate
    carries the Q4 shape.)  Reference scope: dpp.py has no relational
    surface; shape from TPC-H spec Q4."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li_max = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("__max_ship"))
    )
    return (
        o.select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(li_max, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("__max_ship") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "agg_scalar_subquery_q17",
    oracle="""
    WITH brand AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
    ), avgq AS (
        SELECT l_partkey,
               SUM(CAST(FLOOR(l_quantity * 1000000 + 0.5) AS BIGINT))
                   / 1000000.0 / COUNT(l_quantity) AS __avg_qty
        FROM brand GROUP BY l_partkey
    )
    SELECT SUM(CAST(FLOOR(b.l_extendedprice * 100 + 0.5) AS BIGINT))
               / 100.0 / 7.0 AS avg_yearly
    FROM brand b JOIN avgq a ON b.l_partkey = a.l_partkey
    WHERE b.l_quantity < 0.2 * a.__avg_qty
    """,
)
def agg_scalar_subquery_q17(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated to a grouped aggregate joined back.

    Scale posture: the brand dim filter broadcasts FIRST so only the
    ~1/|brands| fact slice reaches the two partkey shuffles (partial
    agg + join-back); the per-part average uses the exact
    scaled-integer mean (``davg``) so the 0.2×avg threshold compares
    bit-identically on both engines.  No window over the unfiltered
    fact, no per-row subquery re-execution."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    brand = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    avgq = brand.groupBy("l_partkey").agg(
        davg("l_quantity").alias("__avg_qty")
    )
    joined = brand.withColumnRenamed("l_partkey", "__bk").join(
        avgq, F.col("__bk") == F.col("l_partkey")
    )
    return joined.filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("__avg_qty")
    ).agg(
        (
            F.sum(
                F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
            )
            / F.lit(100.0)
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


@query(
    "agg_having_q18",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT)) / 100.0
               AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate
    HAVING SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT)) / 100.0
           > 200.0
    """,
)
def agg_having_q18(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders — GROUP BY + HAVING above a
    3-way join, with the HAVING pushed below the join.

    ``sum(l_quantity) per order > 200`` only reads lineitem, so the
    filter runs against the per-orderkey partial aggregate BEFORE
    orders/customer join in: the join input shrinks from every order
    to the rare heavy ones (survivor fraction falls with the
    threshold), and AQE sizes the survivor side for a broadcast at
    runtime when it fits.  Exact integer-unit quantity sums keep the
    HAVING threshold engine-identical."""
    heavy = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200.0)
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey")
    return (
        heavy.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "total_qty",
        )
    )


@query(
    "join_q13_custdist",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def join_q13_custdist(spark, sf_dir):
    """TPC-H Q13 shape: customer order-count distribution via an outer
    join that must keep zero-order customers.

    The naive plan outer-joins raw orders to customer and counts after
    — a fact-sized shuffle of full order rows.  Since the count only
    needs orders and groups on the join key, the aggregation pushes
    below the join: orders collapses to (custkey, n) per customer
    first, then LEFT-joins customer (COALESCE(n, 0) re-creates the
    outer-join zeros).  Both shuffles carry one row per customer; the
    second aggregate groups the tiny (c_count) domain.  The filter is
    on the fact side of the OUTER join (join-condition placement, not
    WHERE — a WHERE would silently turn the join inner).  Reference
    scope: dpp.py has no relational surface; shape from TPC-H Q13."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    per_cust_orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_cust = (
        c.join(
            per_cust_orders,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .select(
            "c_custkey",
            F.coalesce(F.col("__n"), F.lit(0)).alias("c_count"),
        )
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "join_q14_promo",
    oracle="""
    SELECT 100.0 * (
             SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                      * 10000 + 0.5) AS BIGINT) ELSE 0 END)
             / CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                      * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
           ) AS promo_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def join_q14_promo(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — conditional aggregate over
    a fact⋈dim join with a selective time filter.

    The month filter prunes lineitem at the scan (pushed filter), the
    part side prunes to (partkey, type), and Catalyst's stats pick the
    join strategy: broadcast at test scale, shuffle join at 100 TB
    where part grows with SF — no pinned hint on the growing dim.  The
    ratio is computed from ONE pass of exact integer revenue units
    (numerator = CASE-gated sum, denominator = full sum), so no second
    scan and no float drift across engines."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-09-01")
            & (F.col("l_shipdate") < "1996-10-01")
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    units = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        * F.lit(10000.0)
        + F.lit(0.5)
    ).cast("bigint")
    joined = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    # Association must mirror the oracle exactly: 100.0 * (num/denom).
    # (100.0 * num) / denom double-rounds differently and was measured
    # 1 ulp off at sf0.1 — enough to fail the full-precision value hash.
    num = F.sum(
        F.when(F.col("p_type").like("PROMO%"), units).otherwise(F.lit(0))
    )
    return joined.agg(
        (F.lit(100.0) * (num / F.sum(units).cast("double"))).alias(
            "promo_revenue"
        )
    )


@query(
    "agg_q22_idle_customers",
    oracle="""
    WITH cutoff AS (
        SELECT SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0
                   / COUNT(c_acctbal) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0
               AS totacctbal
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def agg_q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: wealthy customers with no orders — uncorrelated
    scalar subquery (global average) + NOT EXISTS (anti join) + agg.

    The scalar average collapses to a 1-row aggregate cross-joined via
    broadcast (Catalyst's own scalar-subquery plan, written explicitly
    so the threshold is an exact scaled-integer mean on both engines).
    NOT EXISTS is a LEFT ANTI join on custkey: orders prunes to the
    filter survivors' join keys only, so the anti side shuffles 8-byte
    keys — at 100 TB the anti join is the fact-sized edge and
    key-pruning is what keeps it cheap.  (The fixture has no c_phone,
    so nationkey plays the country-code role of spec Q22, and "no
    URGENT order" replaces "no order" — the synthetic orders table
    covers every customer, which would make the spec predicate
    vacuously empty.)"""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal").alias("__avg_bal"))
    )
    o_keys = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            o_keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@query(
    "sketch_cms_freq",
    oracle="""
    WITH ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
    rows_h AS (
      SELECT d, CAST(('0x' || substring(md5(CAST(l_suppkey AS VARCHAR)
                 || ':' || d), 1, 8)) AS BIGINT) % 256 AS b
      FROM lineitem, ds
    ),
    sk AS (SELECT d, b, count(*) AS c FROM rows_h GROUP BY d, b),
    probes AS (
      SELECT s_suppkey AS key, d,
             CAST(('0x' || substring(md5(CAST(s_suppkey AS VARCHAR)
                 || ':' || d), 1, 8)) AS BIGINT) % 256 AS b
      FROM supplier, ds
    ),
    est AS (
      SELECT key, MIN(COALESCE(c, 0)) AS est
      FROM probes LEFT JOIN sk USING (d, b) GROUP BY key
    ),
    exact AS (
      SELECT l_suppkey AS key, count(*) AS exact_n
      FROM lineitem GROUP BY 1
    )
    SELECT e.key, CAST(e.est AS BIGINT) AS est,
           CAST(COALESCE(x.exact_n, 0) AS BIGINT) AS exact_n
    FROM est e LEFT JOIN exact x USING (key)
    """,
)
def sketch_cms_freq(spark, sf_dir):
    """Count-Min Sketch frequency estimates for every supplier key over
    lineitem (operators/sketches.py): one-pass depth×width build whose
    shuffle carries ≤ d·w partials per task, broadcast-probe estimate,
    exact counts alongside to exhibit the ≥-overestimate contract.
    The md5-derived hashes make the whole sketch engine-deterministic,
    so the oracle replays build+probe bit-for-bit."""
    from ..operators import sketches as K

    li = load(spark, sf_dir, "lineitem").select("l_suppkey")
    sk = K.cms_build(li, "l_suppkey", depth=4, width=256)
    sup = load(spark, sf_dir, "supplier").select("s_suppkey")
    est = K.cms_estimate(sk, sup, "s_suppkey", depth=4, width=256)
    exact = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    return est.join(exact, "key", "left").select(
        "key",
        F.col("est").cast("long").alias("est"),
        F.coalesce(F.col("exact_n"), F.lit(0)).cast("long").alias("exact_n"),
    )


@query(
    "agg_mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderstatus
        ORDER BY n DESC, o_orderpriority
      ) AS rk
      FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           CAST(n AS BIGINT) AS n
    FROM ranked WHERE rk = 1
    """,
)
def agg_mode_per_group(spark, sf_dir):
    """Deterministic grouped MODE (most frequent value per group).

    Built as count-then-rank with a total-order tie-break instead of
    the engines' native ``mode()`` — whose tie choice is
    implementation-defined and engine-divergent.  Two narrow shuffles
    (count keys, then per-group top-1 over group-count rows only);
    the second input is |groups × values|, dimension-sized at any fact
    scale."""
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_distinct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counting via the Spark 4 bitmap aggregate family:
    keys map to (bucket, bit) positions, each (group, bucket) folds
    into a fixed 4 KB bitmap (``bitmap_construct_agg``), and the
    distinct count is the sum of ``bitmap_count`` over buckets.

    Why this beats count(DISTINCT) at 100 TB: the distinct-expand path
    shuffles every (group, key) pair, while the bitmap path shuffles at
    most one 4 KB blob per (group, bucket) regardless of row count —
    map-side partials OR together losslessly, and bitmaps stored per
    ingest batch are mergeable later (the exact-count analog of the HLL
    rollup).  The oracle is plain COUNT(DISTINCT): equality IS the
    exactness claim."""
    li = load(spark, sf_dir, "lineitem")
    per_bucket = (
        li.select(
            "l_returnflag",
            F.expr("bitmap_bucket_number(l_suppkey)").alias("__bucket"),
            F.expr("bitmap_bit_position(l_suppkey)").alias("__pos"),
        )
        .groupBy("l_returnflag", "__bucket")
        .agg(F.expr("bitmap_construct_agg(__pos)").alias("__bm"))
    )
    return per_bucket.groupBy("l_returnflag").agg(
        F.sum(F.expr("bitmap_count(__bm)")).alias("n_distinct")
    )


@query(
    "scan_recursive_glob",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status
    FROM orders WHERE o_orderkey < 3000
    """,
)
def scan_recursive_glob(spark, sf_dir):
    """Data-lake directory-layout ingestion: the same rows scattered
    over a NESTED directory tree (year=/month= style subdirs written
    per status) read back in one scan with ``recursiveFileLookup`` —
    the option that walks arbitrary-depth layouts without partition
    discovery, for lakes whose directory scheme is NOT key=value.
    Totals hash-checked against the source table, so a missed subdir
    or double-read file diverges immediately."""
    import tempfile

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    base = tempfile.mkdtemp(prefix="dpp_rglob_")
    for status in [r[0] for r in o.select("o_orderstatus").distinct().collect()]:
        (
            o.filter(F.col("o_orderstatus") == status)
            .write.mode("overwrite")
            .parquet(f"{base}/deep/nest_{status}/leaf")
        )
    back = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(base)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
        F.count_distinct("o_orderstatus").alias("n_status"),
    )


@query(
    "join_range_bucketed",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'purchase'
    )
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id AS user_id
    FROM v JOIN p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts < v.ts + INTERVAL 3600 SECOND
    """,
)
def join_range_bucketed(spark, sf_dir):
    """BUCKETED range join — the technique that makes interval joins
    linear at 100 TB: both sides bucket time into 1 h epochs (window
    width chosen so every fixture SF yields matches), the left
    side fans out to its bucket and the next (a window of width w can
    only span 2 consecutive w-buckets), the join runs on EQUALITY of
    (user, bucket) — hash-partitionable, AQE-skew-splittable — and the
    exact interval condition filters residually.  A plain non-equi
    range join degenerates to per-key cross products; the fan-out costs
    exactly 2× the probe rows instead.  The oracle is the plain range
    join: equality of results IS the completeness proof for the
    2-bucket cover."""
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("v_ts"),
        F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).alias("__b"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).alias("p_b"),
    )
    v_fan = v.select(
        "view_id", "user_id", "v_ts",
        F.explode(F.array(F.col("__b"), F.col("__b") + 1)).alias("p_b"),
    )
    # equality join on (user, bucket) — the composite key is what
    # hash-partitions the interval join; bucket-only would make every
    # same-minute event collide on one reducer.
    return (
        v_fan.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (v_fan["p_b"] == p["p_b"]),
        )
        .filter(
            (F.col("p_ts") >= F.col("v_ts"))
            & (
                F.col("p_ts")
                < F.col("v_ts") + F.expr("INTERVAL 3600 SECONDS")
            )
        )
        .select("view_id", "purchase_id", "user_id")
    )


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT n_nationkey,
           string_agg(c_mktsegment, '|' ORDER BY c_mktsegment)
               AS segs
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n_nationkey
    """,
)
def agg_listagg_ordered(spark, sf_dir):
    """listagg ... WITHIN GROUP (ORDER BY ...) (Spark 4): ordered
    string aggregation with DEFINED element order — the ANSI form of
    collect_list-then-sort-then-join, deterministic because the WITHIN
    GROUP clause pins what parallel accumulation would otherwise
    scramble.  DuckDB twin: string_agg(... ORDER BY ...)."""
    n = load(spark, sf_dir, "nation").select("n_nationkey")
    c = load(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment"
    )
    j = c.join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return j.groupBy("n_nationkey").agg(
        F.expr(
            "listagg(c_mktsegment, '|')"
            " WITHIN GROUP (ORDER BY c_mktsegment)"
        ).alias("segs")
    )


@query(
    "scan_text_roundtrip",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(min(length(text)) AS BIGINT) AS min_len,
           CAST(max(length(text)) AS BIGINT) AS max_len
    FROM documents
    """,
)
def scan_text_roundtrip(spark, sf_dir):
    """Plain-text source/sink round-trip (`spark.read.text` — the
    line-per-row format raw corpora arrive in before any schema
    exists): documents write as newline-delimited text, read back as a
    one-column frame, and the line census must match the original
    table.  The fixture's documents are single-line by construction;
    a corpus with embedded newlines takes the `wholetext`/custom-
    delimiter options on the same reader."""
    import tempfile

    key = ("text_stage", sf_dir)
    path = _TEXT_STAGE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="dpp_text_")
        load(spark, sf_dir, "documents").select("text").write.mode(
            "overwrite"
        ).text(path)
        _TEXT_STAGE[key] = path
    back = spark.read.text(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).alias("min_len"),
        F.max(F.length("value")).alias("max_len"),
    )


_TEXT_STAGE: dict[tuple[str, str], str] = {}


@query(
    "scan_jsonl_gzip_roundtrip",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           sha256(string_agg(CAST(doc_id AS VARCHAR), ','
                             ORDER BY doc_id)) AS id_census
    FROM documents GROUP BY lang
    """,
)
def scan_jsonl_gzip_roundtrip(spark, sf_dir):
    """GZIPPED JSONL round-trip through Spark's NATIVE codec path: the
    corpus writes as ``.json.gz`` (``compression=gzip``) and reads
    back with schema inference — decompression happens JVM-SIDE inside
    the scan, the preferred shape for compressed line-oriented corpora
    at 100 TB (splittable-format caveats aside, gzip text is the
    dominant interchange form crawls actually ship).  Complements the
    Python-side archive operators (operators/archive.py), which exist
    for container formats Spark has no native reader for.  The census
    (per-lang counts, char mass, an ORDER-pinned id digest) must match
    the original table exactly — one dropped or doubled line after
    the compress/decompress round-trip diverges the hash."""
    import tempfile

    key = ("jsonl_gz_stage", sf_dir)
    path = _TEXT_STAGE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="dpp_jsonlgz_")
        load(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        ).write.mode("overwrite").option("compression", "gzip").json(path)
        _TEXT_STAGE[key] = path
    back = spark.read.json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sha2(
            F.concat_ws(
                ",",
                F.sort_array(F.collect_list(F.col("doc_id").cast("long")))
                .cast("array<string>"),
            ),
            256,
        ).alias("id_census"),
    )


@query(
    "join_bloom_semireduction",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1
    """,
)
def join_bloom_semireduction(spark, sf_dir):
    """Runtime Bloom-filter semi-join reduction
    (operators/joins.bloom_semi_reduce): the filtered customer side's
    join keys are tree-aggregated into a Bloom sketch (driver traffic
    = sketch bytes, never key rows), the orders fact is prefiltered
    MAP-SIDE by an Arrow-batched probe BEFORE its exchange, and the
    exact merge join removes the sketch's false positives — the result
    is provably identical to the plain join, which is exactly what the
    DuckDB oracle replays.

    Why it matters at 100 TB: a 1/5-selective dim filter still makes a
    plain shuffle join exchange EVERY fact row; Catalyst's own runtime
    bloom filter only fires above a 10 GB application-side scan, so the
    engine ships the same reduction portably.  The ``merge`` hint pins
    the SortMergeJoin path — the regime where the reduction pays (a
    broadcast join needs no reduction; its fact side never shuffles).
    """
    from ..operators.joins import bloom_semi_reduce

    dim = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    fact = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice"
    )
    pre = bloom_semi_reduce(fact, "o_custkey", dim, "c_custkey", fpp=0.01)
    return (
        pre.join(
            dim.hint("merge"),
            pre["o_custkey"] == dim["c_custkey"],
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("cents"),
        )
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH e AS (
      SELECT event_id,
             CASE WHEN event_id % 5 = 0 THEN NULL
                  ELSE CAST(user_id % 100 AS BIGINT) END AS bucket
      FROM events WHERE event_id < 2000
    ), d AS (
      SELECT CASE WHEN g = -1 THEN NULL ELSE g END AS bucket,
             CASE WHEN g = -1 THEN 'unattributed'
                  WHEN g % 2 = 0 THEN 'even' ELSE 'odd' END AS label
      FROM (SELECT UNNEST(range(-1, 100)) AS g)
    )
    SELECT d.label, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM e JOIN d ON e.bucket IS NOT DISTINCT FROM d.bucket
    GROUP BY 1
    """,
)
def join_null_safe_eq(spark, sf_dir):
    """NULL-safe equality join (``eqNullSafe`` / ``<=>`` / ANSI
    ``IS NOT DISTINCT FROM``): NULL join keys MATCH each other instead
    of silently dropping — the sane semantics for dimension keys where
    NULL is a real category ('unattributed') rather than absence.
    Catalyst hash-partitions ``<=>`` like a plain equality (NULL is
    just another hash bucket), so the plan stays a broadcast/shuffled
    HASH join — no nested-loop degradation, which is what makes the
    operator usable at fact scale."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
                (F.col("user_id") % 100).cast("long")
            ).alias("bucket"),
        )
    )
    d = spark.range(-1, 100).select(
        F.when(F.col("id") == -1, F.lit(None))
        .otherwise(F.col("id"))
        .alias("d_bucket"),
        F.when(F.col("id") == -1, F.lit("unattributed"))
        .when(F.col("id") % 2 == 0, F.lit("even"))
        .otherwise(F.lit("odd"))
        .alias("label"),
    )
    return (
        e.join(
            F.broadcast(d),
            F.col("bucket").eqNullSafe(F.col("d_bucket")),
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "scan_file_metadata",
    oracle="""
    SELECT o_orderstatus,
           CAST(1 AS BIGINT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey < 4000
    GROUP BY 1
    """,
)
def scan_file_metadata(spark, sf_dir):
    """Hidden ``_metadata`` file columns (Spark 3.2+): every file-based
    scan exposes ``_metadata.file_path`` / ``file_name`` /
    ``file_size`` / ``file_modification_time`` — the ingestion-audit
    substrate (which file did this row come from, how many files feed
    each partition, are any zero-length) with NO extra I/O: the values
    come from the file listing the scan already performed.

    The fixture stages a Hive-partitioned copy (one task per status →
    exactly one data file per partition directory), then audits per
    partition: distinct feeding files (pinned 1), rows, exact key sum
    — with the partition value recovered FROM the file path, and a
    belt-and-braces guard that every row's ``file_size`` is positive.
    Oracle: the same rollup straight off the source table."""
    import tempfile

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    path = tempfile.mkdtemp(prefix="dpp_meta_") + "/lake"
    o.repartition("o_orderstatus").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(path)
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("_metadata.file_size") > 0)
        .select(
            F.regexp_extract(
                F.col("_metadata.file_path"), "o_orderstatus=([^/]+)/", 1
            ).alias("o_orderstatus"),
            F.col("_metadata.file_name").alias("fname"),
            "o_orderkey",
        )
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("fname").alias("n_files"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )


def _snm_oracle_sql(window: int = 3, max_distance: int = 2) -> str:
    cand_selects = []
    lead_cols = ",\n             ".join(
        f"lead({c}, {j}) OVER w AS {c}_{j}"
        for j in range(1, window + 1)
        for c in ("k", "v", "side")
    )
    for j in range(1, window + 1):
        cand_selects.append(f"""
      SELECT CASE WHEN side = 0 THEN k ELSE k_{j} END AS left_key,
             CASE WHEN side = 0 THEN v ELSE v_{j} END AS left_val,
             CASE WHEN side = 0 THEN k_{j} ELSE k END AS right_key,
             CASE WHEN side = 0 THEN v_{j} ELSE v END AS right_val
      FROM led WHERE side_{j} IS NOT NULL AND side <> side_{j}""")
    return f"""
    WITH both_s AS (
      SELECT c_custkey AS k, c_name || 'q' AS v, 0 AS side
      FROM customer
      UNION ALL
      SELECT c_custkey, c_name, 1 FROM customer
    ),
    led AS (
      SELECT k, v, side,
             {lead_cols}
      FROM both_s WINDOW w AS (ORDER BY v, side, k)
    ),
    cand AS (SELECT DISTINCT * FROM ({" UNION ALL ".join(cand_selects)}))
    SELECT left_key, left_val, right_key, right_val,
           CAST(levenshtein(left_val, right_val) AS BIGINT) AS distance
    FROM cand
    WHERE levenshtein(left_val, right_val) <= {max_distance}
    """


@query("join_sorted_neighborhood", oracle=_snm_oracle_sql())
def join_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood record linkage (operators/joins.py
    sorted_neighborhood_join): customer names with a trailing
    corruption character re-linked to the clean roster by sorted
    window-3 lead comparisons — (|L|+|R|)·w candidates instead of
    |L|·|R|, no blocking key to mistype; levenshtein verifies in
    codegen.  The sort is DISTRIBUTED over deterministic name-prefix
    ranges (range_len=16 → one range per hundred customer keys) with
    boundary head rows duplicated backward, so the result is exactly
    the global-sort pair set — the DuckDB oracle keeps the one-window
    formulation and the hash pins the equivalence.  The fixed-width
    unique names keep each corrupted record sort-adjacent to its twin
    (the regime SNM is designed for — a suffix typo); the
    blocking-free complement to join_fuzzy_levenshtein's equality
    blocks (SNM survives a typo in the block key; blocking survives a
    corrupted prefix — production linkage runs both tiers)."""
    from ..operators.joins import sorted_neighborhood_join

    cust = load(spark, sf_dir, "customer")
    dirty = cust.select(
        F.col("c_custkey").alias("d_key"),
        F.concat(F.col("c_name"), F.lit("q")).alias("d_name"),
    )
    clean = cust.select("c_custkey", "c_name")
    return sorted_neighborhood_join(
        dirty, clean, "d_key", "d_name", "c_custkey", "c_name",
        window=3, max_distance=2, range_len=16,
    )


@query(
    "window_exclude_current",
    oracle="""
    WITH u AS (
      SELECT o_orderkey, o_custkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS units
      FROM orders
    )
    SELECT o_orderkey, o_custkey,
           CAST(COALESCE(SUM(units) OVER (PARTITION BY o_custkey
                ORDER BY o_orderkey
                ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                EXCLUDE CURRENT ROW), 0) AS BIGINT) AS peer_units,
           CAST(count(*) OVER (PARTITION BY o_custkey
                ORDER BY o_orderkey
                ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                EXCLUDE CURRENT ROW) AS BIGINT) AS peer_n
    FROM u
    """,
)
def window_exclude_current(spark, sf_dir):
    """``EXCLUDE CURRENT ROW`` window frames — the leave-one-out
    (jackknife) neighborhood statistic behind self-excluding anomaly
    baselines.  Spark has no EXCLUDE clause, so the engine EMULATES it
    by algebra: frame_sum − own_value and frame_count − 1 over the
    ordinary ±2 ROWS frame — identical semantics, zero extra passes.
    The oracle runs DuckDB's NATIVE ``EXCLUDE CURRENT ROW``, so the
    hash-match certifies the emulation against a real implementation,
    not against itself."""
    from pyspark.sql.window import Window

    u = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("units"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(-2, 2)
    )
    return u.select(
        "o_orderkey",
        "o_custkey",
        (F.sum("units").over(w) - F.col("units"))
        .cast("bigint")
        .alias("peer_units"),
        (F.count(F.lit(1)).over(w) - 1).cast("bigint").alias("peer_n"),
    )


@query(
    "window_groups_frame",
    oracle="""
    WITH u AS (
      SELECT o_orderkey, o_orderstatus, o_orderdate,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS units
      FROM orders
    ),
    g AS (
      SELECT o_orderstatus, o_orderdate,
             CAST(SUM(units) AS BIGINT) AS g_units
      FROM u GROUP BY 1, 2
    ),
    gwin AS (
      SELECT o_orderstatus, o_orderdate,
             CAST(SUM(g_units) OVER (PARTITION BY o_orderstatus
                  ORDER BY o_orderdate
                  ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS grp_frame_units
      FROM g
    )
    SELECT u.o_orderkey, u.o_orderstatus, u.o_orderdate,
           w.grp_frame_units
    FROM u JOIN gwin w
      ON w.o_orderstatus = u.o_orderstatus
     AND w.o_orderdate = u.o_orderdate
    """,
)
def window_groups_frame(spark, sf_dir):
    """``GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW`` frame semantics —
    every row sees the total of its own ORDER-BY peer group plus the
    previous peer group.  NEITHER engine implements GROUPS mode (Spark
    has no GROUPS; DuckDB 1.0 parses but rejects it), so this is the
    portable decomposition BOTH sides run: aggregate per peer group,
    ROWS-frame window over the group spine (one row per group — tiny),
    hash-join back to the detail rows.  The pattern is the standard
    workaround users need the moment a SQL port hits a GROUPS frame."""
    from pyspark.sql.window import Window

    u = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("units"),
    )
    g = u.groupBy("o_orderstatus", "o_orderdate").agg(
        F.sum("units").cast("bigint").alias("g_units")
    )
    wg = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_orderdate")
        .rowsBetween(-1, 0)
    )
    gwin = g.select(
        F.col("o_orderstatus").alias("gs"),
        F.col("o_orderdate").alias("gd"),
        F.sum("g_units").over(wg).cast("bigint").alias("grp_frame_units"),
    )
    return u.join(
        gwin,
        (F.col("o_orderstatus") == F.col("gs"))
        & (F.col("o_orderdate") == F.col("gd")),
    ).select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "grp_frame_units"
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS flag,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               AS price_c,
             CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS w
      FROM lineitem
    ),
    g AS (
      SELECT flag, price_c, CAST(sum(w) AS BIGINT) AS wsum
      FROM c GROUP BY flag, price_c
    ),
    r AS (
      SELECT flag, price_c, wsum,
             sum(wsum) OVER (PARTITION BY flag ORDER BY price_c
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum,
             sum(wsum) OVER (PARTITION BY flag) AS tot
      FROM g
    )
    SELECT flag AS l_returnflag,
           CAST(min(price_c) AS BIGINT) AS weighted_median_cents,
           CAST(min(tot) AS BIGINT) AS total_weight
    FROM r WHERE 2 * cum >= tot GROUP BY flag
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Exact quantity-weighted median price per return flag — the
    robust 'typical unit price' a plain median misses when line sizes
    vary.  Defined as the LOWER weighted median (smallest value whose
    cumulative weight reaches half the total): a pure order statistic
    on exact cents/integer weights, so there is no interpolation and
    nothing float-ordered anywhere.  Shape: pre-aggregate per (group,
    value) — the windowed cumsum then runs over the distinct-value
    frame, not raw rows — one sort per group key, map-side partials
    first.  The 100 TB posture for the approximate tier is the
    mergeable quantile histogram; this is the exact tier."""
    from pyspark.sql.window import Window as W

    li = load(spark, sf_dir, "lineitem")
    c = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long").alias("price_c"),
        F.floor(F.col("l_quantity") + F.lit(0.5))
        .cast("long").alias("w"),
    )
    g = c.groupBy("flag", "price_c").agg(F.sum("w").alias("wsum"))
    wc = (
        W.partitionBy("flag")
        .orderBy("price_c")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r = g.withColumn("cum", F.sum("wsum").over(wc)).withColumn(
        "tot", F.sum("wsum").over(W.partitionBy("flag"))
    )
    return (
        r.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.min("price_c").alias("weighted_median_cents"),
            F.min("tot").alias("total_weight"),
        )
    )


@query(
    "etl_prorate_largest_remainder",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q
      FROM lineitem
    ),
    o AS (
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS total_c
      FROM orders
    ),
    j AS (
      SELECT li.l_orderkey, li.l_linenumber, li.q, o.total_c,
             sum(li.q) OVER (PARTITION BY li.l_orderkey) AS qq
      FROM li JOIN o ON o.o_orderkey = li.l_orderkey
    ),
    b AS (
      SELECT l_orderkey, l_linenumber, q, total_c, qq,
             (total_c * q) // qq AS base,
             (total_c * q) % qq AS rem
      FROM j
    ),
    r AS (
      SELECT l_orderkey, l_linenumber, base,
             total_c - sum(base) OVER (PARTITION BY l_orderkey)
               AS leftover,
             row_number() OVER (PARTITION BY l_orderkey
               ORDER BY rem DESC, l_linenumber, q) AS rn
      FROM b
    )
    SELECT l_orderkey, l_linenumber,
           CAST(base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM r
    """,
)
def etl_prorate_largest_remainder(spark, sf_dir):
    """Exact proration by the largest-remainder method — the finance
    allocation rule: distribute each order's total (exact cents)
    across its line items proportionally to quantity with NO lost or
    invented cents.  floor allocations first, then the leftover cents
    go to the largest fractional remainders (ties to the lowest line
    number then quantity — the fixture has duplicate line numbers, and
    the full ladder makes the allocation MULTISET deterministic even
    then), so Σ alloc = total per order by construction — an
    invariant float proration cannot give.  Shape: one key-partitioned
    join and ONE window partitioning shared by the sum/rank frames —
    single shuffle on the order key at any scale."""
    from pyspark.sql.window import Window as W

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity") + F.lit(0.5))
        .cast("long")
        .alias("q"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("total_c"),
    )
    wp = W.partitionBy("l_orderkey")
    j = li.join(o, "l_orderkey").withColumn(
        "qq", F.sum("q").over(wp)
    )
    b = j.withColumn(
        "base", F.expr("(total_c * q) div qq")
    ).withColumn("rem", F.expr("(total_c * q) % qq"))
    r = b.withColumn(
        "leftover", F.col("total_c") - F.sum("base").over(wp)
    ).withColumn(
        "rn",
        F.row_number().over(
            wp.orderBy(F.col("rem").desc(), "l_linenumber", "q")
        ),
    )
    return r.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("base")
            + (F.col("rn") <= F.col("leftover")).cast("long")
        ).alias("alloc_cents"),
    )


@query(
    "agg_skyline_pareto",
    oracle="""
    WITH pts AS (
      SELECT l_returnflag AS flag,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               AS price_c,
             CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty
      FROM lineitem
    ),
    per_price AS (
      SELECT flag, price_c, CAST(max(qty) AS BIGINT) AS qty
      FROM pts GROUP BY flag, price_c
    ),
    run AS (
      SELECT flag, price_c, qty,
             max(qty) OVER (PARTITION BY flag ORDER BY price_c
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS best_cheaper
      FROM per_price
    )
    SELECT flag AS l_returnflag, price_c, qty
    FROM run
    WHERE best_cheaper IS NULL OR qty > best_cheaper
    """,
)
def agg_skyline_pareto(spark, sf_dir):
    """SKYLINE / Pareto frontier (Börzsönyi et al., ICDE 2001) —
    the multi-objective dominance operator: per return flag, the
    (price, quantity) points not dominated by any cheaper-or-equal,
    larger-quantity point (minimize price, maximize quantity).  The
    naive formulation is an all-pairs anti-join; the sort-based plan
    here is LINEAR after one shuffle: collapse ties to max-quantity
    per price, then one window — a point survives iff its quantity
    beats the running max over all strictly cheaper prices.  Exact
    cents/integer quantities keep dominance decisions off floats."""
    from pyspark.sql.window import Window as W

    pts = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
        F.floor(F.col("l_quantity") + F.lit(0.5))
        .cast("long")
        .alias("qty"),
    )
    per_price = pts.groupBy("flag", "price_c").agg(
        F.max("qty").alias("qty")
    )
    w = (
        W.partitionBy("flag")
        .orderBy("price_c")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    run = per_price.withColumn("best_cheaper", F.max("qty").over(w))
    return run.filter(
        F.col("best_cheaper").isNull()
        | (F.col("qty") > F.col("best_cheaper"))
    ).select(
        F.col("flag").alias("l_returnflag"), "price_c", "qty"
    )
