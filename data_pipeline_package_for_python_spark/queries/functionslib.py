"""SURVEY §2.2.7 — the scalar function library, exercised family-by-family
with DuckDB oracles.

Cross-engine semantic notes baked into the oracles (discovered by probing
DuckDB 1.0, see git history):
- DuckDB ``dayofweek`` is 0=Sunday, Spark is 1=Sunday → oracle adds 1;
- DuckDB ``CAST(double AS BIGINT)`` rounds, Spark truncates → oracle uses
  ``TRUNC`` before casting;
- DuckDB ``%`` matches Spark's ``%`` (sign of dividend); Spark ``pmod`` has
  no DuckDB twin → expressed as ``((a % b) + b) % b``;
- transcendental functions (exp/ln) may differ in the last ulp between
  libm implementations → those columns are rounded to 4 decimals;
- no ``initcap`` in DuckDB → checked via lower/upper composition instead;
- DuckDB ``regexp_replace`` replaces only the first match unless passed the
  ``'g'`` flag (Spark is global by default);
- DuckDB ``date_trunc('month', ts)`` returns DATE, Spark returns timestamp
  → both sides cast to DATE;
- DuckDB ``ceil``/``floor`` return DOUBLE (Spark: LONG), ``sign`` returns
  INT (Spark: DOUBLE) → explicit casts pin the shared type.

Everything here is pure ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; zero Python UDFs (that surface is §2.2.8).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._registry import davg, dsum, load, query

# ---------------------------------------------------------------------- #
# strings                                                                #
# ---------------------------------------------------------------------- #


@query(
    "func_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up,
           lower(c_name) AS lo,
           length(c_name) AS len,
           substring(c_name, 3, 5) AS sub,
           concat_ws('-', c_mktsegment, c_name) AS joined,
           lpad(c_name, 25, '*') AS padded,
           rpad(c_name, 25, '.') AS rpadded,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           replace(c_name, '0', '#') AS replaced,
           instr(c_name, '1') AS pos1,
           starts_with(c_name, 'C') AS is_c,
           contains(c_name, '5') AS has5,
           translate(c_name, '0123', 'abcd') AS translated,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', 'x', 'g') AS nodigits,
           split_part(c_name, '#', 1) AS first_tok,
           printf('%s/%d', c_mktsegment, c_custkey) AS formatted
    FROM customer
    """,
)
def func_string(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.upper(name).alias("up"),
        F.lower(name).alias("lo"),
        F.length(name).alias("len"),
        F.substring(name, 3, 5).alias("sub"),
        F.concat_ws("-", F.col("c_mktsegment"), name).alias("joined"),
        F.lpad(name, 25, "*").alias("padded"),
        F.rpad(name, 25, ".").alias("rpadded"),
        F.trim(F.concat(F.lit("  "), name, F.lit("  "))).alias("trimmed"),
        F.replace(name, F.lit("0"), F.lit("#")).alias("replaced"),
        F.instr(name, "1").alias("pos1"),
        F.startswith(name, F.lit("C")).alias("is_c"),
        F.contains(name, F.lit("5")).alias("has5"),
        F.translate(name, "0123", "abcd").alias("translated"),
        F.regexp_extract(name, r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace(name, r"[0-9]", "x").alias("nodigits"),
        F.split_part(name, F.lit("#"), F.lit(1)).alias("first_tok"),
        F.printf(F.lit("%s/%d"), F.col("c_mktsegment"), F.col("c_custkey"))
        .alias("formatted"),
    )


# ---------------------------------------------------------------------- #
# date / time                                                            #
# ---------------------------------------------------------------------- #


@query(
    "func_datetime_parts",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           dayofmonth(o_orderdate) AS d,
           dayofweek(o_orderdate) + 1 AS dow,
           hour(o_orderdate) AS h,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           CAST(o_orderdate AS DATE) - 7 AS minus7,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS days_since,
           CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2mo,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS mo_start,
           CAST(o_orderdate AS DATE) AS as_date,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_s,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders WHERE o_orderkey < 2000
    """,
)
def func_datetime_parts(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.dayofweek(d).alias("dow"),
        F.hour(d).alias("h"),
        F.date_add(d, 30).alias("plus30"),
        F.date_sub(d, 7).alias("minus7"),
        F.datediff(d, F.lit("1995-01-01")).alias("days_since"),
        F.add_months(d, 2).alias("plus2mo"),
        F.date_trunc("month", d).cast("date").alias("mo_start"),
        F.to_date(d).alias("as_date"),
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.unix_timestamp(d).alias("unix_s"),
        F.last_day(d).alias("month_end"),
    )


@query(
    "func_date_histogram",
    oracle="""
    SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
           count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders GROUP BY 1, 2
    """,
)
def func_date_histogram(spark, sf_dir):
    """Per-month order histogram — the date-dimension rollup pattern."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("revenue")
    )


# ---------------------------------------------------------------------- #
# math                                                                   #
# ---------------------------------------------------------------------- #


@query(
    "func_math",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 1500) AS dist,
           CAST(ceil(p_retailprice / 100) AS BIGINT) AS ceil_h,
           CAST(floor(p_retailprice / 100) AS BIGINT) AS floor_h,
           sqrt(p_size) AS root,
           ROUND(exp(p_size / 50.0), 4) AS grown,
           ROUND(ln(p_size + 1.0), 4) AS logged,
           ROUND(log10(p_size + 1.0), 4) AS log10ed,
           power(p_size, 2) AS squared,
           p_size % 7 AS m7,
           ((p_size % 7) + 7) % 7 AS pm7,
           CAST(sign(p_retailprice - 1500) AS DOUBLE) AS sgn,
           greatest(p_size, 25) AS hi,
           least(p_size, 25) AS lo
    FROM part
    """,
)
def func_math(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    size, price = F.col("p_size"), F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.abs(price - 1500).alias("dist"),
        F.ceil(price / 100).alias("ceil_h"),
        F.floor(price / 100).alias("floor_h"),
        F.sqrt(size).alias("root"),
        F.round(F.exp(size / F.lit(50.0)), 4).alias("grown"),
        F.round(F.log(size + F.lit(1.0)), 4).alias("logged"),
        F.round(F.log10(size + F.lit(1.0)), 4).alias("log10ed"),
        F.pow(size, 2).alias("squared"),
        (size % 7).alias("m7"),
        F.pmod(size, F.lit(7)).alias("pm7"),
        F.signum(price - 1500).alias("sgn"),
        F.greatest(size, F.lit(25)).alias("hi"),
        F.least(size, F.lit(25)).alias("lo"),
    )


# ---------------------------------------------------------------------- #
# null handling / conditional                                            #
# ---------------------------------------------------------------------- #


@query(
    "func_null_handling",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(o.o_totalprice, 0.0) AS price_or_zero,
           COALESCE(o.o_orderstatus, 'NONE') AS status_or_none,
           NULLIF(c.c_mktsegment, 'BUILDING') AS seg_nullified,
           o.o_orderkey IS NULL AS no_order,
           isnan(COALESCE(o.o_totalprice, 0.0)) AS never_nan
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, o_orderkey, o_totalprice, o_orderstatus FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
            FROM orders
        ) WHERE rn = 1
    ) o ON o.o_custkey = c.c_custkey
    """,
)
def func_null_handling(spark, sf_dir):
    """coalesce/nullif/isNull over a deliberately null-producing left join
    (first order per customer; customers without orders yield nulls).
    Also exercises df.na.fill via the coalesce equivalence."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    first_orders = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus")
    )
    j = c.join(first_orders, c.c_custkey == first_orders.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("price_or_zero"),
        F.coalesce(F.col("o_orderstatus"), F.lit("NONE")).alias(
            "status_or_none"
        ),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias(
            "seg_nullified"
        ),
        F.col("o_orderkey").isNull().alias("no_order"),
        F.isnan(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias(
            "never_nan"
        ),
    )


@query(
    "func_na_ops",
    oracle="""
    WITH fo AS (
      SELECT o_custkey, o_orderkey, o_totalprice, o_orderstatus,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderkey) AS rn
      FROM orders
    )
    SELECT c.c_custkey,
           COALESCE(NULLIF(c.c_mktsegment, 'BUILDING'), 'OTHER')
               AS seg_filled,
           CASE fo.o_orderstatus WHEN 'F' THEN 'FINISHED'
                WHEN 'O' THEN 'OPEN' WHEN 'P' THEN 'PENDING'
                ELSE fo.o_orderstatus END AS status_full,
           fo.o_totalprice AS price
    FROM customer c JOIN fo ON c.c_custkey = fo.o_custkey AND fo.rn = 1
    """,
)
def func_na_ops(spark, sf_dir):
    """The ``df.na.*`` facade itself (SURVEY §2.2.7 null row): fill,
    replace and drop each observably change the result.

    Two independent null sources so no op masks another: the left join
    nulls every ``o_*`` column for order-less customers (``na.drop`` on
    ``o_orderkey`` removes exactly those rows — the inner-join oracle),
    while ``nullif`` nulls the segment for BUILDING customers, who
    survive the drop and expose ``na.fill``.  ``na.replace`` rewrites
    the status code dictionary-style."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    fo = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus")
    )
    base = c.join(fo, c.c_custkey == fo.o_custkey, "left").withColumn(
        "seg_null", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    )
    return (
        base.na.fill({"seg_null": "OTHER"})
        .na.replace(
            {"F": "FINISHED", "O": "OPEN", "P": "PENDING"},
            subset=["o_orderstatus"],
        )
        .na.drop(subset=["o_orderkey"])
        .select(
            "c_custkey",
            F.col("seg_null").alias("seg_filled"),
            F.col("o_orderstatus").alias("status_full"),
            F.col("o_totalprice").alias("price"),
        )
    )


@query(
    "func_misc_id",
    oracle="""
    SELECT count(*) AS n, count(*) AS n_distinct_ids FROM part
    """,
)
def func_misc_id(spark, sf_dir):
    """``monotonically_increasing_id`` smoke (§2.2.7 misc row).  The ids
    themselves are partition-layout-dependent so they can never be
    hash-compared; the CONTRACT — globally unique across partitions —
    is checkable: distinct count must equal row count."""
    p = load(spark, sf_dir, "part").withColumn(
        "mid", F.monotonically_increasing_id()
    )
    return p.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("mid").alias("n_distinct_ids"),
    )


@query(
    "func_casts",
    oracle="""
    SELECT o_orderkey,
           CAST(TRUNC(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_totalprice AS VARCHAR) AS price_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(o_orderkey AS DOUBLE) AS key_dbl,
           CAST(o_orderdate AS DATE) AS just_date,
           CAST(o_totalprice > 100000 AS INTEGER) AS is_big
    FROM orders WHERE o_orderkey < 2000
    """,
)
def func_casts(spark, sf_dir):
    """Casting across primitive types.  Note: Spark double→long truncates
    while DuckDB's CAST rounds — the oracle uses TRUNC to pin shared
    semantics."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("long").alias("price_int"),
        F.col("o_totalprice").cast("string").alias("price_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.col("o_orderdate").cast("date").alias("just_date"),
        (F.col("o_totalprice") > 100000).cast("int").alias("is_big"),
    )


# ---------------------------------------------------------------------- #
# arrays + higher-order functions                                        #
# ---------------------------------------------------------------------- #


@query(
    "func_array_explode_tf",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    """,
)
def func_array_explode_tf(spark, sf_dir):
    """split + explode → term frequency (the §2.2.7 array-row check)."""
    p = load(spark, sf_dir, "part")
    # one sql() statement per build (bench query: plan-construction
    # round trips are part of the timed path — OPTIMIZATION_r11.md)
    return spark.sql(
        """
        SELECT word, count(1) AS n
        FROM (SELECT explode(split(p_name, ' ')) AS word FROM {p})
        GROUP BY word
        """,
        p=p,
    )


@query(
    "func_array_ops",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_words,
           list_contains(string_split(p_name, ' '), 'widget') AS has_widget,
           array_to_string(list_sort(string_split(p_name, ' ')), '|')
               AS sorted_words,
           string_split(p_name, ' ')[1] AS first_word,
           array_to_string(list_sort(string_split(p_name, ' ')), '|')
               AS joined,
           array_to_string([p_size, p_size * 2, p_size * 3], ',') AS triples,
           CAST(list_sum([p_size, p_size * 2, p_size * 3]) AS BIGINT)
               AS triple_sum,
           array_to_string(range(1, 4), ',') AS seq3
    FROM part WHERE p_partkey < 500
    """,
)
def func_array_ops(spark, sf_dir):
    """Array construction / sort / contains / element_at / sequence /
    aggregate.  Array-typed results are serialized with ``array_join``
    before leaving the query: the correctness harness canonicalizes
    through pandas, whose sort chokes on raw list cells — and string
    serialization also pins element order, which is the property arrays
    add over sets."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    words = F.split("p_name", " ")
    triples = F.array(
        F.col("p_size"),
        F.col("p_size") * 2,
        F.col("p_size") * 3,
    )
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_contains(words, "widget").alias("has_widget"),
        F.array_join(F.array_sort(words), "|").alias("sorted_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_join(F.array_sort(words), "|").alias("joined"),
        F.array_join(triples, ",").alias("triples"),
        F.aggregate(
            triples, F.lit(0), lambda acc, x: acc + x
        ).cast("bigint").alias("triple_sum"),
        F.array_join(F.sequence(F.lit(1), F.lit(3)), ",").alias("seq3"),
    )


@query(
    "func_array_hof",
    oracle="""
    SELECT vec_id,
           list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                   x -> x * x)) AS norm2,
           list_sum(list_filter(CAST(embedding AS DOUBLE[]),
                                x -> x > 0)) AS pos_sum,
           len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
               AS n_pos
    FROM embeddings WHERE vec_id < 100
    """,
)
def func_array_hof(spark, sf_dir):
    """Higher-order functions over embedding arrays (transform / filter /
    aggregate).  Floats are cast to double FIRST so both engines square
    and sum identical doubles in array order."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    dvec = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.aggregate(
            F.transform(dvec, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("norm2"),
        F.aggregate(
            F.filter(dvec, lambda x: x > 0),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("pos_sum"),
        F.size(F.filter(dvec, lambda x: x > 0)).alias("n_pos"),
    )


# ---------------------------------------------------------------------- #
# maps / JSON / structs                                                  #
# ---------------------------------------------------------------------- #


@query(
    "func_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def func_json_extract(spark, sf_dir):
    """get_json_object + typed cast + histogram over events.props."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.get_json_object("props", "$.k").cast("long").alias("k_val")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "func_json_struct_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS parsed_k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) * 2
               AS via_map,
           event_type AS unpacked_type
    FROM events WHERE event_id < 500
    """,
)
def func_json_struct_map(spark, sf_dir):
    """from_json into a struct, create_map + element_at, struct pack/
    unpack — the oracle states the end-to-end semantics directly."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    parsed = F.from_json("props", "k long")
    packed = F.struct(F.col("event_type").alias("t"), F.col("value").alias("v"))
    m = F.create_map(F.lit("k2"), parsed.getField("k") * 2)
    return ev.select(
        "event_id",
        parsed.getField("k").alias("parsed_k"),
        F.element_at(m, F.lit("k2")).alias("via_map"),
        packed.getField("t").alias("unpacked_type"),
    )


@query(
    "func_to_json_roundtrip",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events WHERE event_id < 500
    """,
)
def func_to_json_roundtrip(spark, sf_dir):
    """props → from_json → struct → to_json → from_json → field (lossless
    round-trip through Spark's JSON codec)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    parsed = F.from_json("props", "k long")
    rejson = F.to_json(parsed)
    reparsed = F.from_json(rejson, "k long")
    return ev.select(
        "event_id", reparsed.getField("k").alias("k")
    )


# ---------------------------------------------------------------------- #
# hashing                                                                #
# ---------------------------------------------------------------------- #


@query(
    "func_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           length(md5(c_name || c_mktsegment)) AS combo_len
    FROM customer
    """,
)
def func_hash(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.length(
            F.md5(F.concat(F.col("c_name"), F.col("c_mktsegment")))
        ).alias("combo_len"),
    )


@query("func_hash_spark_native", oracle=None,
       doc="xxhash64 / crc32 / murmur hash are Spark-specific algorithms "
           "with no DuckDB twin; rows-only (stability pinned in tests).")
def func_hash_spark_native(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.xxhash64("c_name").alias("name_xx64"),
        F.crc32("c_name").alias("name_crc32"),
        F.hash("c_name").alias("name_murmur"),
    )


@query(
    "func_unpivot",
    oracle="""
    SELECT c_custkey, 'c_acctbal' AS metric,
           CAST(c_acctbal AS DOUBLE) AS value
    FROM customer
    UNION ALL
    SELECT c_custkey, 'c_nationkey' AS metric,
           CAST(c_nationkey AS DOUBLE) AS value
    FROM customer
    """,
)
def func_unpivot(spark, sf_dir):
    """Wide→long reshape via the native ``unpivot``/``melt`` API — a
    map-side Expand (each input row fans to one row per value column
    inside the same task), NOT a union of N re-scans: one pass over the
    input regardless of how many columns melt.  The oracle is the
    equivalent stacked UNION ALL."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        F.col("c_nationkey").cast("double").alias("c_nationkey"),
    ).unpivot(
        ids=["c_custkey"],
        values=["c_acctbal", "c_nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "func_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract_string(props, '$.k') AS INTEGER) * 2
               AS k_doubled,
           CAST(NULL AS INTEGER) AS missing
    FROM events
    """,
)
def func_variant_json(spark, sf_dir):
    """Semi-structured access through the VARIANT type (Spark 4):
    ``parse_json`` once into a binary-encoded variant, then typed
    ``variant_get`` path extraction — the open-format answer to
    repeated ``get_json_object`` string re-parsing (the variant parses
    the JSON text once; every extraction is a binary traversal).
    ``try_variant_get`` on an absent path yields NULL, not an error."""
    ev = load(spark, sf_dir, "events")
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.k", "int").alias("k"),
        (F.variant_get("v", "$.k", "int") * F.lit(2)).alias("k_doubled"),
        F.try_variant_get("v", "$.nope", "int").alias("missing"),
    )


@query(
    "func_winsorize",
    oracle="""
    WITH q AS (
      SELECT ROUND(quantile_cont(o_totalprice, 0.01), 4) AS lo,
             ROUND(quantile_cont(o_totalprice, 0.99), 4) AS hi
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o_totalprice < lo OR o_totalprice > hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           SUM(CAST(FLOOR((CASE WHEN o_totalprice < lo THEN lo
                                WHEN o_totalprice > hi THEN hi
                                ELSE o_totalprice END) * 10000 + 0.5)
                    AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_winsorized
    FROM orders, q
    """,
)
def func_winsorize(spark, sf_dir):
    """Winsorization (quantile outlier clipping), the standard ML
    feature-preprocessing step: exact p01/p99 thresholds (rounded to 4
    decimals so both engines clip at the identical boundary), broadcast
    as a 1-row frame, then a map-side clip + ONE exact-unit aggregate.
    Two jobs total: a percentile aggregate and the clipped re-scan —
    never a per-row rank or a sort of the fact table."""
    o = load(spark, sf_dir, "orders")
    q = o.agg(
        F.round(F.expr("percentile(o_totalprice, 0.01)"), 4).alias("lo"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("hi"),
    )
    price = F.col("o_totalprice")
    clipped = (
        F.when(price < F.col("lo"), F.col("lo"))
        .when(price > F.col("hi"), F.col("hi"))
        .otherwise(price)
    )
    is_clipped = (price < F.col("lo")) | (price > F.col("hi"))
    return (
        o.join(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_clipped.cast("long")).alias("n_clipped"),
            (
                F.sum(
                    F.floor(clipped * 10000 + F.lit(0.5)).cast("long")
                )
                / F.lit(10000.0)
            ).alias("sum_winsorized"),
        )
    )


@query(
    "func_quantile_buckets",
    oracle="""
    WITH q AS (
      SELECT ROUND(quantile_cont(o_totalprice, 0.25), 4) AS q1,
             ROUND(quantile_cont(o_totalprice, 0.50), 4) AS q2,
             ROUND(quantile_cont(o_totalprice, 0.75), 4) AS q3
      FROM orders
    )
    SELECT CASE WHEN o_totalprice <= q1 THEN 0
                WHEN o_totalprice <= q2 THEN 1
                WHEN o_totalprice <= q3 THEN 2
                ELSE 3 END AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0
               AS sum_price
    FROM orders, q
    GROUP BY 1
    """,
)
def func_quantile_buckets(spark, sf_dir):
    """Quantile feature binning (QuantileDiscretizer shape, exact
    flavor): one percentile aggregate produces the quartile fences
    (rounded to 4 decimals so both engines clip at identical doubles),
    broadcast as a 1-row frame; bucket assignment is a map-side CASE
    over the fact scan — never a per-row rank, never a sort.  The same
    two-job shape holds at 100 TB with percentile_approx swapped in for
    the fence pass."""
    o = load(spark, sf_dir, "orders")
    q = o.agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("q1"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("q2"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("q3"),
    )
    price = F.col("o_totalprice")
    bucket = (
        F.when(price <= F.col("q1"), F.lit(0))
        .when(price <= F.col("q2"), F.lit(1))
        .when(price <= F.col("q3"), F.lit(2))
        .otherwise(F.lit(3))
    )
    return (
        o.join(F.broadcast(q))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.floor(price * 100 + F.lit(0.5)).cast("long"))
                / F.lit(100.0)
            ).alias("sum_price"),
        )
    )


@query(
    "func_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / NULLIF(o_custkey % 7, 0) AS safe_div,
           TRY_CAST(CASE WHEN o_orderkey % 2 = 0
                         THEN CAST(o_orderkey AS VARCHAR)
                         ELSE 'k' || o_orderkey END AS BIGINT) AS safe_cast,
           CASE WHEN o_orderkey % 2 = 1 THEN NULL
                ELSE 9223372036854775807 END AS safe_add
    FROM orders WHERE o_orderkey < 1000
    """,
)
def func_try_arithmetic(spark, sf_dir):
    """ANSI-safe TRY family (Spark 4 runs under ANSI SQL, where /0,
    overflow, and bad casts THROW): try_divide → NULL on zero divisor,
    try_cast → NULL on malformed input, try_add → NULL on BIGINT
    overflow.  The error-as-NULL discipline a 100 TB batch job needs —
    one poisoned row must not kill a 6-hour pipeline, and the NULLs
    stay auditable (count them with an expectations rule)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    mixed = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.col("o_orderkey").cast("string"),
    ).otherwise(F.concat(F.lit("k"), F.col("o_orderkey")))
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 7).alias(
            "safe_div"
        ),
        mixed.cast("string").try_cast("bigint").alias("safe_cast"),
        F.try_add(
            F.lit(9223372036854775807), F.col("o_orderkey") % 2
        ).alias("safe_add"),
    )


@query(
    "func_collation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
                  ELSE lower(c_mktsegment) END AS seg
      FROM customer
    )
    SELECT CAST(count(DISTINCT seg) AS BIGINT) AS raw_distinct,
           CAST(count(DISTINCT lower(seg)) AS BIGINT) AS ci_distinct
    FROM mixed
    """,
)
def func_collation(spark, sf_dir):
    """String collations (Spark 4): UTF8_LCASE comparisons treat case
    variants as EQUAL inside the aggregate itself — count(DISTINCT
    collate(seg, 'UTF8_LCASE')) halves the raw distinct count on a
    case-mixed column without rewriting values.  Collation rides the
    type, so every comparison operator (joins, sorts, groupBy)
    inherits it; the oracle replays the semantics via lower()."""
    c = load(spark, sf_dir, "customer")
    seg = F.when(
        F.col("c_custkey") % 2 == 0, F.col("c_mktsegment")
    ).otherwise(F.lower(F.col("c_mktsegment")))
    return c.select(seg.alias("seg")).agg(
        F.count_distinct(F.col("seg")).alias("raw_distinct"),
        F.count_distinct(
            F.collate(F.col("seg"), "UTF8_LCASE")
        ).alias("ci_distinct"),
    )


@query(
    "func_explode_outer",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0
                  THEN CAST([] AS VARCHAR[])
                  ELSE string_split(o_orderpriority, '-') END AS parts
      FROM orders WHERE o_orderkey < 600
    )
    SELECT o_orderkey,
           unnest(CASE WHEN len(parts) = 0
                       THEN [CAST(NULL AS VARCHAR)]
                       ELSE parts END) AS part
    FROM t
    """,
)
def func_explode_outer(spark, sf_dir):
    """explode_outer: rows with EMPTY arrays survive as a single
    NULL-element row instead of vanishing — the LEFT-JOIN-shaped
    explode a fact table needs when the array is optional (plain
    explode silently drops the parent row and corrupts downstream
    counts).  The oracle replays the semantics by unnesting a
    [NULL] substitute for empty arrays."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 600)
    parts = F.when(
        F.col("o_orderkey") % 3 == 0,
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.col("o_orderpriority"), "-"))
    return o.select(
        "o_orderkey", F.explode_outer(parts).alias("part")
    )


@query(
    "func_bool_agg",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           CAST(count(*) FILTER (WHERE o_orderpriority LIKE '1-%')
                AS BIGINT) AS n_urgent,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def func_bool_agg(spark, sf_dir):
    """Boolean/conditional aggregate family: every(), any_value-free
    some(), and count_if — the predicate-rollup idioms (all rows
    satisfy X / any row satisfies X / how many satisfy X) as single
    codegen aggregates instead of CASE-sum workarounds."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_orderpriority").like("1-%")).alias("n_urgent"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "func_posexplode",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, string_split(o_orderpriority, '-') AS parts
      FROM orders WHERE o_orderkey < 600
    ),
    u AS (
      SELECT o_orderkey,
             unnest([{'pos': i - 1, 'part': parts[i]}
                     FOR i IN range(1, len(parts) + 1)]) AS e
      FROM t
    )
    SELECT o_orderkey, CAST(e.pos AS INTEGER) AS pos, e.part AS part
    FROM u
    """,
)
def func_posexplode(spark, sf_dir):
    """posexplode: element position travels with the exploded row —
    required whenever array ORDER is data (token sequences, path
    segments, frame indices); plain explode destroys it and no
    downstream sort can recover per-parent positions.  Zero-based to
    match Spark; the oracle rebuilds (pos, element) pairs with a
    struct comprehension."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 600)
    return o.select(
        "o_orderkey",
        F.posexplode(F.split(F.col("o_orderpriority"), "-")).alias(
            "pos", "part"
        ),
    )


@query(
    "func_inline_map_entries",
    oracle="""
    SELECT o_orderkey, u.k AS key, u.v AS value FROM (
      SELECT o_orderkey,
             unnest([
               {'k': 'st', 'v': o_orderstatus},
               {'k': 'pr', 'v': split_part(o_orderpriority, '-', 1)},
               {'k': 'tier', 'v': CASE WHEN o_totalprice > 250000
                                       THEN 'high' ELSE 'low' END}
             ]) AS u
      FROM orders WHERE o_orderkey < 500
    )
    """,
)
def func_inline_map_entries(spark, sf_dir):
    """The remaining §2.2.7 struct/map rows in one query:
    map_from_entries (struct array → map), map_concat (merge), and the
    inline generator (struct array → rows-and-columns, the struct twin
    of explode).  One row per map entry, scalar columns out — maps
    never reach the driver canonicalizer."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    base = F.map_from_entries(
        F.array(
            F.struct(
                F.lit("st").alias("key"),
                F.col("o_orderstatus").alias("value"),
            ),
            F.struct(
                F.lit("pr").alias("key"),
                F.split(F.col("o_orderpriority"), "-")[0].alias("value"),
            ),
        )
    )
    merged = F.map_concat(
        base,
        F.create_map(
            F.lit("tier"),
            F.when(F.col("o_totalprice") > 250000, F.lit("high")).otherwise(
                F.lit("low")
            ),
        ),
    )
    return o.select("o_orderkey", F.inline(F.map_entries(merged)))


@query(
    "func_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 21845) AS toggled,
           bit_count(o_orderkey) AS popcount,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3
    FROM orders WHERE o_orderkey < 2000
    """,
)
def func_bitwise(spark, sf_dir):
    """Bitwise family: and/or/xor, popcount, shifts — the integer bit
    plumbing flag-pack/bucket-id/bloom code relies on; all codegen
    column ops with engine-identical two's-complement semantics."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("toggled"),
        F.bit_count(k).alias("popcount"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
    )


@query(
    "func_parse_url",
    oracle="""
    WITH u AS (
      SELECT o_orderkey,
             'https://shop' || (o_orderkey % 20) || '.example.com:'
             || (8000 + o_orderkey % 5) || '/cat/'
             || replace(lower(split_part(o_orderpriority, '-', 2)), ' ', '-')
             || '?id=' || o_orderkey || '&ref=r%20' || (o_orderkey % 7)
                 AS url
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey,
           'https' AS proto,
           regexp_extract(url, '^https://([^/:]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           CAST(regexp_extract(url, 'id=([0-9]+)', 1) AS VARCHAR)
               AS id_param,
           'r ' || (o_orderkey % 7) AS ref_decoded
    FROM u
    """,
)
def func_parse_url(spark, sf_dir):
    """URL parsing family (parse_url PROTOCOL/HOST/PATH/QUERY + keyed
    query-param extraction + url_decode) — the codegen web-data
    toolkit a crawl pipeline leans on before any custom regex; the
    oracle replays each component with plain regex on the same
    synthesized URLs."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    url = F.concat(
        F.lit("https://shop"), (F.col("o_orderkey") % 20).cast("string"),
        F.lit(".example.com:"),
        (F.lit(8000) + F.col("o_orderkey") % 5).cast("string"),
        F.lit("/cat/"),
        F.replace(
            F.lower(F.split(F.col("o_orderpriority"), "-")[1]),
            F.lit(" "),
            F.lit("-"),
        ),
        F.lit("?id="), F.col("o_orderkey").cast("string"),
        F.lit("&ref=r%20"), (F.col("o_orderkey") % 7).cast("string"),
    )
    u = o.select("o_orderkey", url.alias("url"))
    return u.select(
        "o_orderkey",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
        F.url_decode(
            F.parse_url("url", F.lit("QUERY"), F.lit("ref"))
        ).alias("ref_decoded"),
    )


@query(
    "func_luhn_check",
    oracle="""
    WITH c AS (
      SELECT o_orderkey,
             lpad(CAST(o_orderkey * 137 AS VARCHAR), 16, '4') AS num
      FROM orders WHERE o_orderkey < 2000
    ),
    d AS (
      SELECT o_orderkey, num, length(num) AS L,
             [CAST(num[i] AS INTEGER)
              FOR i IN range(1, length(num) + 1)] AS ds
      FROM c
    ),
    s AS (
      SELECT o_orderkey, num,
             list_sum([CASE WHEN (L - i) % 2 = 1
                 THEN (CASE WHEN ds[i] * 2 > 9
                       THEN ds[i] * 2 - 9 ELSE ds[i] * 2 END)
                 ELSE ds[i] END FOR i IN range(1, L + 1)]) AS total
      FROM d
    )
    SELECT o_orderkey, num, (total % 10 = 0) AS is_valid
    FROM s
    """,
)
def func_luhn_check(spark, sf_dir):
    """luhn_check (Spark 4): checksum validation for payment-card-like
    digit strings — the gate that turns a 13-16-digit regex hit into a
    REAL credit-card detection during corpus PII scrubbing (random
    digit runs fail the checksum, so redaction false-positive rates
    drop ~10×).  The oracle reimplements the Luhn fold as a list
    comprehension, verified bit-equal on the classic test vectors."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    num = F.lpad((F.col("o_orderkey") * 137).cast("string"), 16, "4")
    return o.select(
        "o_orderkey",
        num.alias("num"),
        F.expr("luhn_check(lpad(cast(o_orderkey * 137 as string), 16, '4'))")
        .alias("is_valid"),
    )


@query(
    "func_regexp_family",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[0-9]+')) AS n_number_runs,
           CASE WHEN regexp_matches(text, 'the')
                THEN strpos(text, 'the') ELSE 0 END AS first_the,
           COALESCE(regexp_extract(text, '([A-Z][a-z]+)', 1), '')
               AS first_capword,
           regexp_matches(text, '[.!?]$') AS ends_sentence
    FROM documents
    """,
)
def func_regexp_family(spark, sf_dir):
    """The extended regexp family: regexp_count (occurrence counting),
    regexp_instr (first-match position), regexp_substr (first-match
    text), rlike anchor test — the quartet corpus heuristics are built
    from; all codegen, patterns restricted to RE2/Java-identical
    constructs."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit(r"[0-9]+")).alias("n_number_runs"),
        F.regexp_instr(t, F.lit(r"the")).alias("first_the"),
        F.coalesce(
            F.regexp_substr(t, F.lit(r"[A-Z][a-z]+")), F.lit("")
        ).alias("first_capword"),
        t.rlike(r"[.!?]$").alias("ends_sentence"),
    )


@query(
    "func_string_extended",
    oracle="""
    SELECT c_custkey,
           left(c_name, 8) AS l8,
           right(c_name, 6) AS r6,
           reverse(c_name) AS rev,
           repeat('ab', 3) || c_mktsegment AS repeated,
           CASE WHEN length(c_name) >= 10
                THEN substring(c_name, 1, 4) || 'XX'
                     || substring(c_name, 7)
                ELSE c_name END AS overlaid,
           strpos(c_name, '#') AS hash_pos,
           length(c_mktsegment) AS seg_len
    FROM customer
    """,
)
def func_string_extended(spark, sf_dir):
    """Extended string ops: left/right slices, reverse, repeat, overlay
    (replace-at-position), position — the remainder of the §2.2.7
    string toolkit; overlay's oracle is spelled as the substring
    composition it is defined by."""
    c = load(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.expr("left(c_name, 8)").alias("l8"),
        F.expr("right(c_name, 6)").alias("r6"),
        F.reverse(name).alias("rev"),
        F.concat(F.repeat(F.lit("ab"), 3), F.col("c_mktsegment")).alias(
            "repeated"
        ),
        F.when(
            F.length(name) >= 10, F.overlay(name, F.lit("XX"), F.lit(5))
        )
        .otherwise(name)
        .alias("overlaid"),
        F.instr(name, "#").alias("hash_pos"),
        F.length("c_mktsegment").alias("seg_len"),
    )


@query(
    "func_conversions",
    oracle="""
    SELECT c_custkey,
           ascii(c_name) AS first_code,
           chr(65 + CAST(c_custkey % 26 AS INTEGER)) AS letter,
           to_base64(encode(c_mktsegment)) AS b64,
           decode(from_base64(to_base64(encode(c_name)))) AS b64_rt,
           upper(to_hex(encode(c_mktsegment))) AS hexed,
           decode(from_hex(to_hex(encode(c_name)))) AS hex_rt
    FROM customer
    """,
)
def func_conversions(spark, sf_dir):
    """Byte/char conversion family: ascii/chr, base64/unbase64,
    hex/unhex — with round-trips pinned (decode(encode(x)) == x both
    ways), the plumbing binary payload columns pass through when they
    cross text systems."""
    c = load(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.ascii(name).alias("first_code"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26)).alias("letter"),
        F.base64(F.col("c_mktsegment").cast("binary")).alias("b64"),
        F.unbase64(F.base64(name.cast("binary")))
        .cast("string")
        .alias("b64_rt"),
        F.hex(F.col("c_mktsegment").cast("binary")).alias("hexed"),
        F.unhex(F.hex(name.cast("binary"))).cast("string").alias("hex_rt"),
    )


@query(
    "func_try_conversions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE 'https' END AS proto,
           CASE WHEN o_orderpriority LIKE '1%'
                THEN CAST(split_part(o_orderpriority, '-', 1) AS BIGINT)
                ELSE NULL END AS prio_num,
           CASE WHEN o_orderkey % 4 < 2
                THEN split_part(o_orderpriority, '-', 1)
                ELSE NULL END AS maybe_elem
    FROM orders WHERE o_orderkey < 2000
    """,
)
def func_try_conversions(spark, sf_dir):
    """ANSI-safe TRY conversions beyond arithmetic: try_parse_url on a
    malformed-every-third URL (NULL, never INVALID_URL), try_to_number
    against a strict format (non-numeric prefixes → NULL), and
    try_element_at past the end of an array (NULL, never
    ArrayIndexOutOfBounds) — the tolerance family that keeps a 100 TB
    ingest from dying on its millionth malformed row."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    url = F.when(
        F.col("o_orderkey") % 3 == 0, F.lit("ht!tp://%%bad")
    ).otherwise(
        F.concat(F.lit("https://h"), F.col("o_orderkey").cast("string"))
    )
    return o.select(
        "o_orderkey",
        F.try_parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.when(
            F.col("o_orderpriority").like("1%"),
            F.try_to_number(
                F.split(F.col("o_orderpriority"), "-")[0], F.lit("9")
            ).cast("long"),
        ).alias("prio_num"),
        F.try_element_at(
            F.when(
                F.col("o_orderkey") % 4 < 2,
                F.split(F.col("o_orderpriority"), "-"),
            ).otherwise(F.array().cast("array<string>")),
            F.lit(1),
        ).alias("maybe_elem"),
    )


# Business-day arithmetic: W(d) = number of weekdays (Mon–Fri) among
# epoch days [0, d).  Epoch day 0 = Thursday, so the remainder lookup
# walks Thu, Fri, Sat, Sun, Mon, Tue (Sat/Sun contribute nothing).
_WEEKDAYS_BEFORE = (
    "(5 * ({d} // 7) + CASE ({d} % 7) WHEN 0 THEN 0 WHEN 1 THEN 1"
    " WHEN 2 THEN 2 WHEN 3 THEN 2 WHEN 4 THEN 2 WHEN 5 THEN 3"
    " ELSE 4 END)"
)
_WEEKDAYS_BEFORE_SPARK = (
    "(5 * ({d} div 7) + CASE ({d} % 7) WHEN 0 THEN 0 WHEN 1 THEN 1"
    " WHEN 2 THEN 2 WHEN 3 THEN 2 WHEN 4 THEN 2 WHEN 5 THEN 3"
    " ELSE 4 END)"
)


@query(
    "func_business_days",
    oracle=f"""
    WITH lags AS (
      SELECT l.l_returnflag AS flag,
             datediff('day', DATE '1970-01-01',
                      CAST(o.o_orderdate AS DATE)) AS da,
             datediff('day', DATE '1970-01-01',
                      CAST(l.l_shipdate AS DATE)) AS db
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ),
    b AS (
      SELECT flag,
             CAST({_WEEKDAYS_BEFORE.format(d='db')}
                  - {_WEEKDAYS_BEFORE.format(d='da')} AS BIGINT)
               AS bdays
      FROM lags
    )
    SELECT flag AS l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(bdays) AS BIGINT) AS total_bdays,
           CAST(min(bdays) AS BIGINT) AS min_bdays,
           CAST(max(bdays) AS BIGINT) AS max_bdays
    FROM b GROUP BY flag
    """,
)
def func_business_days(spark, sf_dir):
    """Business-day (Mon–Fri) lag between order and ship dates — the
    calendar arithmetic every SLA report needs, in CLOSED FORM: the
    weekday count before epoch day d is 5·(d div 7) plus a 7-case
    remainder lookup anchored on epoch day 0 being a Thursday, so
    bdays(a,b) = W(b) − W(a) with no calendar table, no explode, no
    UDF — pure integer codegen.  Both engines evaluate the identical
    CASE, and a pytest replays Python's weekday count as the
    independent law.  Reported as per-flag totals/extremes (exact
    BIGINT)."""
    lags = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            F.col("l_returnflag").alias("flag"),
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("db"),
            F.col("l_shipdate"),
        )
        .join(
            load(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.lit("1970-01-01").cast("date"),
                ).alias("da"),
                F.col("o_orderdate"),
            ),
            "l_orderkey",
        )
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
    )
    b = lags.select(
        "flag",
        (
            F.expr(_WEEKDAYS_BEFORE_SPARK.format(d="db"))
            - F.expr(_WEEKDAYS_BEFORE_SPARK.format(d="da"))
        ).cast("long").alias("bdays"),
    )
    return b.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bdays").alias("total_bdays"),
        F.min("bdays").alias("min_bdays"),
        F.max("bdays").alias("max_bdays"),
    )
