"""SURVEY §2.2.12 extension: modern SQL front-door surface (round 4).

Spark 4 SQL conveniences a reference user migrating real query text
would hit immediately: ``SELECT * EXCEPT``, ``GROUP BY ALL`` /
``ORDER BY ALL``, ``max_by``/``min_by`` ordered-argument aggregates, and
SQL ``UNPIVOT``.  Each compiles to the same relational plans the
DataFrame queries pin elsewhere — these rows prove the TEXT front door
accepts the syntax and produces engine-identical results (the oracle
spells the equivalent long-form ANSI, since DuckDB's spellings differ:
``EXCLUDE`` vs ``EXCEPT``, ``arg_max`` vs ``max_by``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ._registry import load, query


def _view(spark: SparkSession, sf_dir: str, table: str) -> None:
    load(spark, sf_dir, table).createOrReplaceTempView(table)


@query(
    "sql_star_except_group_all",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS bal_units
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    """,
)
def sql_star_except_group_all(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``SELECT * EXCEPT (...)`` column exclusion + ``GROUP BY ALL``
    (group by every non-aggregate output) — the Spark 4 shorthand pair.
    The inner star-except projects by EXCLUSION (drop key/name), the
    outer aggregate infers its keys; Catalyst resolves both at analysis
    time,
    so the physical plan is the ordinary partial/final hash aggregate —
    syntax sugar costs nothing.  Oracle spells the same query long-form
    ANSI."""
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS bal_units
        FROM (
          SELECT * EXCEPT (c_custkey, c_name) FROM customer
        )
        GROUP BY ALL
        """
    )


@query(
    "agg_max_by_min_by",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderstatus, o_orderkey) AS latest_status,
           arg_min(o_orderstatus, o_orderkey) AS first_status,
           arg_max(o_orderkey, o_orderkey) AS max_key
    FROM orders GROUP BY o_custkey
    """,
)
def agg_max_by_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``max_by`` / ``min_by`` ordered-argument aggregates (DuckDB:
    ``arg_max``/``arg_min``): the one-pass replacement for the
    row_number-over-window + filter idiom when only the extreme row's
    VALUE is wanted — no sort, no window state, just a (value, key)
    partial that merges map-side.  Ordering key is the UNIQUE order key
    so the result is deterministic (max_by on a tied key is
    engine-arbitrary — the contract documents that ties require a
    total-order key, same rule as first/last deterministic)."""
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey,
               max_by(o_orderstatus, o_orderkey) AS latest_status,
               min_by(o_orderstatus, o_orderkey) AS first_status,
               max_by(o_orderkey, o_orderkey) AS max_key
        FROM orders GROUP BY o_custkey
        """
    )


@query(
    "sql_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric,
           CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice',
           CAST(CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS DOUBLE) / 100
    FROM part
    """,
)
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ``UNPIVOT`` (wide → long over the TEXT front door): the
    declarative twin of the DataFrame melt in ``func_unpivot``.  Spark
    plans it as the same map-side Expand — one scan, rows×metrics
    output, no shuffle or join; the oracle is the expansion's UNION ALL
    definition.  Retail price normalizes through exact cents so the
    DOUBLE values are engine-identical."""
    _view(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, metric, val FROM (
          SELECT p_partkey,
                 CAST(p_size AS DOUBLE) AS p_size,
                 CAST(CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS DOUBLE) / 100
                     AS p_retailprice
          FROM part
        )
        UNPIVOT (val FOR metric IN (p_size, p_retailprice))
        """
    )


@query(
    "func_aes_roundtrip",
    oracle="""
    SELECT c_custkey, c_name AS decrypted, 1 AS roundtrip_ok
    FROM customer
    """,
)
def func_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: ``aes_encrypt`` →
    ``aes_decrypt`` round-trip in ECB mode (deterministic — GCM, the
    secure default, salts a random IV per call and cannot be
    differentially checked; real deployments use GCM and give up
    equality, documented here).  The oracle is the IDENTITY — a correct
    round-trip must reproduce the plaintext bit-for-bit, which is
    exactly what the hash compares.  JVM-side codegen; at 100 TB this
    is a map-only pass like any cast."""
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey,
               CAST(aes_decrypt(
                    aes_encrypt(c_name, '0000111122223333', 'ECB'),
                    '0000111122223333', 'ECB') AS STRING) AS decrypted,
               CAST(CAST(aes_decrypt(
                    aes_encrypt(c_name, '0000111122223333', 'ECB'),
                    '0000111122223333', 'ECB') AS STRING) = c_name
                    AS INT) AS roundtrip_ok
        FROM customer
        """
    )


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders
    WHERE o_totalprice > 150000.0
    GROUP BY o_orderpriority
    """,
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXECUTE IMMEDIATE`` (Spark 4 dynamic SQL): a query TEXT built
    at runtime executes with positional parameter binding — the
    stored-procedure-style front door on top of the parameterized-SQL
    row (`sql_parameterized_binding` binds through the API; this binds
    through SQL itself).  The dynamic string compiles to the same
    Catalyst plan as the static query the oracle runs."""
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
           FROM orders WHERE o_totalprice > ? GROUP BY o_orderpriority'
        USING 150000.0
        """
    )


@query(
    "func_xpath_scalar",
    oracle="""
    SELECT p_partkey,
           p_brand AS brand,
           CAST(p_size AS VARCHAR) AS size_s,
           CAST(2 AS BIGINT) AS n_fields
    FROM part
    """,
)
def func_xpath_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath scalar extraction (``xpath_string`` / ``xpath`` array
    form) over per-row XML documents built from table values — the
    §2.2.7 family row for XML-embedded payloads (the document-level XML
    SOURCE is scan_xml_roundtrip; this is the in-cell tier).  The
    oracle computes the same fields relationally, so the hash certifies
    Spark's XPath engine against ground truth rather than against
    itself.  Map-only codegen."""
    _view(spark, sf_dir, "part")
    return spark.sql(
        """
        WITH x AS (
          SELECT p_partkey,
                 concat('<part><brand>', p_brand, '</brand><size>',
                        CAST(p_size AS STRING), '</size></part>')
                     AS doc
          FROM part
        )
        SELECT p_partkey,
               xpath_string(doc, '/part/brand') AS brand,
               xpath_string(doc, '/part/size') AS size_s,
               CAST(size(xpath(doc, '/part/*/text()')) AS BIGINT)
                   AS n_fields
        FROM x
        """
    )


@query(
    "udf_sql_scalar_function",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                      * (1.0 + l_tax) * 100 + 0.5) AS BIGINT)
               AS charged_units
    FROM lineitem
    """,
)
def udf_sql_scalar_function(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SQL-DEFINED scalar function (Spark 4 ``CREATE FUNCTION …
    RETURN expr``): business logic declared ONCE in the catalog and
    reused across query text — the governed alternative to copy-pasted
    expressions and the zero-cost alternative to Python UDFs (the body
    INLINES into the plan at analysis time: whole-stage codegen, no
    serialization boundary, nothing Python).  The oracle runs the
    inlined expression directly — equality certifies the inlining."""
    _view(spark, sf_dir, "lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charged_units(
            price DOUBLE, discount DOUBLE, tax DOUBLE)
        RETURNS BIGINT
        RETURN CAST(FLOOR(price * (1.0 - discount) * (1.0 + tax) * 100
                          + 0.5) AS BIGINT)
        """
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               charged_units(l_extendedprice, l_discount, l_tax)
                   AS charged_units
        FROM lineitem
        """
    )


@query(
    "udf_sql_table_function",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS units
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def udf_sql_table_function(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SQL-defined TABLE function (``CREATE FUNCTION … RETURNS TABLE``)
    — a parameterized view: callers select FROM it with arguments, the
    body inlines into the plan (predicate pushdown still reaches the
    scan because after inlining it is an ordinary filter).  The
    §2.2.8 UDTF row's declarative sibling: no Python process, no
    Arrow boundary, just catalog-managed SQL."""
    _view(spark, sf_dir, "orders")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION orders_by_priority(
            prio STRING)
        RETURNS TABLE(o_orderkey BIGINT, o_custkey BIGINT, units BIGINT)
        RETURN SELECT o_orderkey, o_custkey,
                      CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
               FROM orders WHERE o_orderpriority = prio
        """
    )
    return spark.sql("SELECT * FROM orders_by_priority('1-URGENT')")
