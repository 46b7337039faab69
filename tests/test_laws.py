"""SURVEY §5.2(3) — algebraic laws the relational layer must satisfy,
property-checked with hypothesis over generated micro-tables.

These pin optimizer-facing equivalences: if any law breaks, Catalyst
rewrites (filter fusion, pushdown through joins, partial aggregation) would
silently change results at scale, where plans differ from the local ones.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),          # k
        st.integers(min_value=-100, max_value=100),     # v
        st.sampled_from(["a", "b", "c", None]),         # tag
    ),
    min_size=0,
    max_size=40,
)




def _nullsafe_sorted(rows):
    """Sort collected rows with None-safe keys (hypothesis feeds NULL
    strings; bare tuple sort raises TypeError comparing None < str)."""
    return sorted(
        (tuple(r) for r in rows),
        key=lambda t: tuple((x is None, x) for x in t),
    )

def mkdf(spark, rows):
    return spark.createDataFrame(rows, "k int, v int, tag string")


@SLOW
@given(rows=rows_st, lo=st.integers(-50, 50))
def test_filter_fusion(spark, rows, lo):
    # filter(p).filter(q) == filter(p & q) — the rewrite behind pushdown
    df = mkdf(spark, rows)
    split = df.filter(F.col("v") > lo).filter(F.col("k") % 2 == 0)
    fused = df.filter((F.col("v") > lo) & (F.col("k") % 2 == 0))
    assert _nullsafe_sorted(split.collect()) == _nullsafe_sorted(
        fused.collect()
    )


@SLOW
@given(rows=rows_st, other=rows_st)
def test_union_conserves_rows(spark, rows, other):
    a, b = mkdf(spark, rows), mkdf(spark, other)
    assert a.unionByName(b).count() == len(rows) + len(other)


@SLOW
@given(rows=rows_st, other=rows_st)
def test_inner_join_cardinality_bounds(spark, rows, other):
    a, b = mkdf(spark, rows), mkdf(spark, other)
    n = a.join(b, on="k", how="inner").count()
    # bounded by the product of per-key multiplicities; simple global bound:
    assert n <= len(rows) * max(1, len(other))
    # left join returns at least every left row
    assert a.join(b, on="k", how="left").count() >= len(rows)
    # semi + anti partition the left side exactly
    semi = a.join(b, on="k", how="left_semi").count()
    anti = a.join(b, on="k", how="left_anti").count()
    assert semi + anti == len(rows)


@SLOW
@given(rows=rows_st)
def test_distinct_idempotent(spark, rows):
    df = mkdf(spark, rows).distinct()
    assert df.count() == df.distinct().count()


@SLOW
@given(rows=rows_st)
def test_partial_plus_final_agg_equals_direct(spark, rows):
    # two-level aggregation (the map-side-combine shape) == direct grouped
    # sum; this is the contract that lets Spark pre-aggregate per partition
    df = mkdf(spark, rows)
    direct = df.groupBy("k").agg(F.sum("v").alias("s"))
    two_level = (
        df.withColumn("bucket", F.pmod(F.xxhash64("v"), F.lit(4)))
        .groupBy("k", "bucket")
        .agg(F.sum("v").alias("ps"))
        .groupBy("k")
        .agg(F.sum("ps").alias("s"))
    )
    assert _nullsafe_sorted(direct.collect()) == _nullsafe_sorted(
        two_level.collect()
    )


@SLOW
@given(rows=rows_st)
def test_sort_is_stable_under_resort(spark, rows):
    df = mkdf(spark, rows)
    once = df.orderBy("k", "v", "tag").collect()
    twice = df.orderBy("k", "v", "tag").orderBy("k", "v", "tag").collect()
    assert once == twice


@pytest.mark.parametrize("how", ["inner", "left", "right", "full"])
def test_join_null_keys_never_match(spark, how):
    a = spark.createDataFrame([(None, 1), (1, 2)], "k int, v int")
    b = spark.createDataFrame([(None, 9), (1, 8)], "k int, v int")
    matched = (
        a.join(b, on=(a["k"] == b["k"]), how=how)
        .filter(a["k"].isNotNull() & b["k"].isNotNull())
        .count()
    )
    assert matched == 1  # only the non-null key pairs up


text_st = st.lists(
    st.text(
        alphabet=st.sampled_from(
            list("abcdefghij0123456789@.+-() ") + [" "]
        ),
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@SLOW
@given(texts=text_st)
def test_redact_pii_idempotent(spark, texts):
    # redact(redact(x)) == redact(x): tags contain no digits or '@', so a
    # second pass can never re-match — the law that makes redaction safe
    # to re-run over partially-processed corpora.
    from data_pipeline_package_for_python_spark.operators import text as T

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    once = T.redact_pii(df, "doc_id", "text")
    twice = T.redact_pii(
        once.select(F.col("id").alias("doc_id"),
                    F.col("clean_text").alias("text")),
        "doc_id", "text",
    )
    a = {r.id: r.clean_text for r in once.collect()}
    b = {r.id: r.clean_text for r in twice.collect()}
    assert a == b


@SLOW
@given(texts=text_st, max_tokens=st.integers(min_value=1, max_value=7))
def test_pack_sequences_partitions_tokens(spark, texts, max_tokens):
    # Chunks tile the token stream: concatenating chunks in chunk_idx
    # order reproduces split(text) exactly, for any text and chunk size.
    from data_pipeline_package_for_python_spark.operators import text as T

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = T.pack_sequences(df, "doc_id", "text", max_tokens=max_tokens)
    got = {}
    for r in out.collect():
        got.setdefault(r.id, []).append((r.chunk_idx, r.chunk_text))
    for i, text in enumerate(texts):
        chunks = [c for _, c in sorted(got[i])]
        rebuilt = [w for c in chunks for w in c.split(" ")]
        assert rebuilt == text.split(" ")


def test_hash_split_laws(spark, sf_dir):
    """hash_split: partition (every row in exactly one split), stability
    (subset restriction never migrates a row), and fraction sanity."""
    from data_pipeline_package_for_python_spark.operators.etl import (
        hash_split,
    )
    from data_pipeline_package_for_python_spark.queries._registry import load

    docs = load(spark, sf_dir, "documents").select("doc_id")
    full = {
        r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()
    }
    assert set(full.values()) <= {"train", "val", "test"}
    assert len(full) == docs.count()
    # growing the corpus must not move existing rows between splits
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub = {
        r.doc_id: r.split for r in hash_split(subset, "doc_id").collect()
    }
    assert all(full[k] == v for k, v in sub.items())
    # 80/10/10 within loose Binomial bounds at n=500
    n = len(full)
    train_frac = sum(1 for v in full.values() if v == "train") / n
    assert 0.7 < train_frac < 0.9
    # map-only: no shuffle in the assignment plan
    from data_pipeline_package_for_python_spark import plans

    assert plans.plan_report(hash_split(docs, "doc_id")).n_shuffles == 0
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", fractions={"a": 0.5, "b": 0.4})


def test_charset_quality_laws(spark):
    from data_pipeline_package_for_python_spark.operators.text import (
        charset_quality,
    )

    rows = [
        (1, "Pure ASCII letters only"),
        (2, "12345 67890"),
        (3, "héllo wörld"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in charset_quality(df, "doc_id", "text").collect()}
    assert out[1].is_ascii and out[1].keep
    assert out[2].is_ascii and not out[2].keep  # digits: no alpha mass
    assert not out[3].is_ascii  # é/ö outside printable ASCII
    assert out[4].n_alpha == 0 and not out[4].keep  # empty: safe ratio
    assert all(0.0 <= r.alpha_ratio <= 1.0 for r in out.values())


def test_cms_laws(spark, sf_dir):
    """CMS contracts: (1) estimate >= exact for every key (collisions
    only ADD); (2) merge losslessness — per-half sketches summed equal
    the whole-corpus sketch exactly, the mergeable-rollup law."""
    import pyspark.sql.functions as F

    from data_pipeline_package_for_python_spark.operators import (
        sketches as K,
    )
    from data_pipeline_package_for_python_spark.queries._registry import (
        load,
    )

    li = load(spark, sf_dir, "lineitem").select("l_suppkey")
    sk = K.cms_build(li, "l_suppkey", depth=4, width=64)
    keys = li.select(F.col("l_suppkey").alias("k")).distinct()
    est = K.cms_estimate(sk, keys, "k", depth=4, width=64)
    exact = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bad = (
        est.join(exact, "key")
        .filter(F.col("est") < F.col("n"))
        .count()
    )
    assert bad == 0  # never underestimates

    a = li.filter(F.col("l_suppkey") % 2 == 0)
    b = li.filter(F.col("l_suppkey") % 2 == 1)
    merged = K.cms_merge(
        K.cms_build(a, "l_suppkey", depth=4, width=64),
        K.cms_build(b, "l_suppkey", depth=4, width=64),
    )
    diff = (
        merged.withColumnRenamed("c", "cm")
        .join(sk, ["d", "b"], "full")
        .filter(
            F.coalesce(F.col("cm"), F.lit(0))
            != F.coalesce(F.col("c"), F.lit(0))
        )
        .count()
    )
    assert diff == 0  # merge == rebuild, exactly


def test_global_shuffle_laws(spark, sf_dir):
    """global_shuffle: reruns are byte-identical (determinism), the
    shards partition the corpus (no loss/duplication), each shard is
    internally sorted by the shuffle key, and changing the seed
    actually reshuffles."""
    from data_pipeline_package_for_python_spark.operators.etl import (
        global_shuffle,
    )
    from data_pipeline_package_for_python_spark.queries._registry import load

    docs = load(spark, sf_dir, "documents").select("doc_id")
    a = global_shuffle(docs, "doc_id", seed=7, n_shards=8).collect()
    b = global_shuffle(docs, "doc_id", seed=7, n_shards=8).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # partition: every doc exactly once, shard = skey % n_shards
    assert sorted(r.doc_id for r in a) == sorted(
        r.doc_id for r in docs.collect()
    )
    dicts = [r.asDict() for r in a]
    assert all(d["shard"] == d["__skey"] % 8 for d in dicts)
    # in-shard order: non-decreasing skey per shard in collection order
    from collections import defaultdict

    per_shard = defaultdict(list)
    for d in dicts:
        per_shard[d["shard"]].append(d["__skey"])
    assert all(ks == sorted(ks) for ks in per_shard.values())
    # a different seed produces a different permutation
    c = global_shuffle(docs, "doc_id", seed=8, n_shards=8).collect()
    assert [tuple(r) for r in c] != [tuple(r) for r in a]


def test_weighted_priority_sample_laws(spark, sf_dir):
    """weighted_priority_sample: exact size, subset-of-corpus,
    partitioning-invariance, and weight-monotone inclusion (the race
    key only improves when a row's weight grows)."""
    from data_pipeline_package_for_python_spark.operators.etl import (
        weighted_priority_sample,
    )
    from data_pipeline_package_for_python_spark.queries._registry import load

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    picked = weighted_priority_sample(docs, "doc_id", "w", 50)
    ids = {r.doc_id for r in picked.collect()}
    assert len(ids) == 50
    all_ids = {r.doc_id for r in docs.collect()}
    assert ids <= all_ids
    # physical layout must not change the sample
    ids7 = {
        r.doc_id
        for r in weighted_priority_sample(
            docs.repartition(7), "doc_id", "w", 50
        ).collect()
    }
    assert ids7 == ids
    # inflating a non-picked row's weight 10^6x must pull it in: its
    # race key (2h+1)/w shrinks strictly monotonically in w
    loser = min(all_ids - ids)
    boosted = docs.withColumn(
        "w",
        F.when(
            F.col("doc_id") == loser, F.col("w") * 1000000
        ).otherwise(F.col("w")),
    )
    ids_boost = {
        r.doc_id
        for r in weighted_priority_sample(
            boosted, "doc_id", "w", 50
        ).collect()
    }
    assert loser in ids_boost
    # zero/negative weights are excluded outright
    zeroed = docs.withColumn(
        "w", F.when(F.col("doc_id").isin(*list(ids)), 0).otherwise(F.col("w"))
    )
    ids_zero = {
        r.doc_id
        for r in weighted_priority_sample(
            zeroed, "doc_id", "w", 50
        ).collect()
    }
    assert not (ids_zero & ids)


def test_temperature_mixture_laws(spark, sf_dir):
    """temperature_mix_weights: shares are a floor-partition of 1e6
    (sum within k of the whole), quotas never exceed group size, and
    the sqrt temperature compresses the mixture strictly toward
    uniform (max share shrinks vs the natural mixture)."""
    from data_pipeline_package_for_python_spark.operators.etl import (
        temperature_mix_weights,
    )
    from data_pipeline_package_for_python_spark.queries._registry import load

    docs = load(spark, sf_dir, "documents")
    rows = temperature_mix_weights(docs, "lang").collect()
    k = len(rows)
    total_share = sum(r.share_ppm for r in rows)
    assert 1_000_000 - k <= total_share <= 1_000_000
    assert all(0 <= r.quota_docs <= r.n_docs for r in rows)
    n_total = sum(r.n_docs for r in rows)
    nat_max = max(r.n_docs / n_total for r in rows)
    temp_max = max(r.share_ppm / 1e6 for r in rows)
    assert temp_max <= nat_max + 1e-6


def test_weighted_sample_stratified_laws(spark, sf_dir):
    """Per-group weighted sampling: exactly min(k, n_g) rows per group,
    and each group's draw equals an independent global draw restricted
    to that group (the race depends only on the row key, so grouping
    never perturbs selection)."""
    from data_pipeline_package_for_python_spark.operators.etl import (
        weighted_priority_sample,
        weighted_priority_sample_per_group,
    )
    from data_pipeline_package_for_python_spark.queries._registry import load

    docs = load(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    rows = weighted_priority_sample_per_group(
        docs, "lang", "doc_id", "w", 20
    ).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    sizes = {
        r.lang: r.n for r in docs.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    for lang, n in sizes.items():
        assert len(by_lang.get(lang, set())) == min(20, n)
    # independence: restricting the corpus to one group and sampling
    # globally yields the identical set
    some_lang = sorted(sizes)[0]
    solo = {
        r.doc_id
        for r in weighted_priority_sample(
            docs.filter(F.col("lang") == some_lang), "doc_id", "w", 20
        ).collect()
    }
    assert solo == by_lang[some_lang]


@pytest.mark.parametrize(
    "qname",
    [
        "analytics_linear_attribution",
        "analytics_timedecay_attribution",
        "analytics_ushape_attribution",
    ],
)
def test_attribution_conserves_revenue(spark, sf_dir, qname):
    """Attribution is a credit PARTITION: summed millicents across
    channels equal 1000x the total purchase units, short only the
    per-journey floor-division remainders (< n_channels per journey,
    plus for the U-shape a bounded ppm loss from the middle-touch
    weight floor — at most (n_touches-2) ppm of each journey)."""
    from data_pipeline_package_for_python_spark.queries import QUERIES
    from data_pipeline_package_for_python_spark.queries._registry import load

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("units")
    )
    agg = purchases.agg(
        F.sum("units").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    total_milli = agg.s * 1000
    n_purchases = agg.n
    n_channels = (
        ev.filter(F.col("event_type") != "purchase")
        .select("event_type")
        .distinct()
        .count()
    )
    rows = QUERIES[qname].spark_fn(spark, sf_dir).collect()
    credited = sum(r.attributed_millicents for r in rows)
    assert credited <= total_milli
    # 1e-4 relative slack covers the U-shape's <=~50ppm middle-floor loss
    assert credited >= (
        total_milli - n_purchases * n_channels - total_milli // 10000
    )


def test_bloom_semi_reduce_laws(spark, sf_dir):
    """Bloom semi-join reduction: (1) NEVER drops a matching fact row
    (false ⇒ provably absent), so the reduced join equals the plain
    join exactly; (2) actually reduces — the surviving fact mass sits
    between the exact semi-join count and the full fact count, and at
    fpp=0.01 lands within a few percent of exact."""
    from data_pipeline_package_for_python_spark.operators.joins import (
        bloom_semi_reduce,
    )
    from data_pipeline_package_for_python_spark.queries import load

    dim = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    fact = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pre = bloom_semi_reduce(fact, "o_custkey", dim, "c_custkey", fpp=0.01)

    n_fact = fact.count()
    n_semi = fact.join(
        dim, fact["o_custkey"] == dim["c_custkey"], "left_semi"
    ).count()
    n_pre = pre.count()
    assert n_semi <= n_pre <= n_fact
    # 1% fpp of the non-matching mass is the expected overshoot.
    assert n_pre - n_semi <= max(5, 0.05 * (n_fact - n_semi))

    # Exact-equality of the reduced join vs the plain join.
    plain = sorted(
        fact.join(dim, fact["o_custkey"] == dim["c_custkey"])
        .select("o_orderkey")
        .toPandas()["o_orderkey"]
    )
    reduced = sorted(
        pre.join(dim, pre["o_custkey"] == dim["c_custkey"])
        .select("o_orderkey")
        .toPandas()["o_orderkey"]
    )
    assert plain == reduced


def test_weighted_median_is_lower_order_statistic(spark, sf_dir):
    """Replay: smallest price whose cumulative quantity-weight reaches
    half the group total, computed row-at-a-time in Python."""
    from __spark_entry__ import queries

    got = {
        r["l_returnflag"]: (r["weighted_median_cents"], r["total_weight"])
        for r in queries()["agg_weighted_median"](spark, sf_dir).collect()
    }
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_returnflag, CAST(FLOOR(l_extendedprice*100+0.5) AS BIGINT),"
        f" CAST(FLOOR(l_quantity+0.5) AS BIGINT)"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    by_flag = {}
    for f, p, w in rows:
        by_flag.setdefault(f, []).append((p, w))
    for f, pw in by_flag.items():
        pw.sort()
        tot = sum(w for _, w in pw)
        cum = 0
        med = None
        for p, w in pw:
            cum += w
            if 2 * cum >= tot:
                med = p
                break
        assert got[f] == (med, tot), f


def test_prorate_sum_preserved_and_fair(spark, sf_dir):
    """Allocation invariants: per order, allocations sum EXACTLY to
    total cents; each allocation is within 1 cent of the unrounded
    proportional share."""
    import duckdb

    from __spark_entry__ import queries

    rows = queries()["etl_prorate_largest_remainder"](
        spark, sf_dir
    ).collect()
    alloc = {}
    for r in rows:
        alloc.setdefault(r["l_orderkey"], []).append(
            (r["l_linenumber"], r["alloc_cents"])
        )
    con = duckdb.connect()
    truth = dict(
        con.execute(
            f"""
        SELECT o.o_orderkey,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/orders.parquet' o
        JOIN (SELECT DISTINCT l_orderkey
              FROM '{sf_dir}/lineitem.parquet') l
          ON l.l_orderkey = o.o_orderkey
        """
        ).fetchall()
    )
    q = {}
    for ok, ln, qty in con.execute(
        f"SELECT l_orderkey, l_linenumber,"
        f" CAST(FLOOR(l_quantity + 0.5) AS BIGINT)"
        f" FROM '{sf_dir}/lineitem.parquet'"
        f" ORDER BY 1, 2, 3"
    ).fetchall():
        q.setdefault(ok, []).append((ln, qty))
    assert alloc.keys() == truth.keys()
    for ok, items in alloc.items():
        total = truth[ok]
        assert sum(a for _, a in items) == total, ok
        qq = sum(qty for _, qty in q[ok])
        # fairness per row: match allocations to quantities greedily —
        # line numbers repeat in the fixture, so compare as sorted
        # multisets of (linenumber, alloc) vs per-row bounds
        shares = sorted(
            (ln, total * qty // qq, -(-total * qty // qq) + 1)
            for ln, qty in q[ok]
        )
        got = sorted(items)
        assert len(got) == len(shares), ok
        for (ln_g, a), (ln_s, lo, hi) in zip(got, shares):
            assert ln_g == ln_s, (ok, ln_g, ln_s)
        # every allocation is floor(share) or floor(share)+1 as a
        # multiset property per (order, linenumber) group
        from collections import Counter
        for ln in {ln for ln, _ in q[ok]}:
            a_multi = sorted(a for l2, a in items if l2 == ln)
            s_multi = sorted(
                total * qty // qq
                for l2, qty in q[ok] if l2 == ln
            )
            for a, base in zip(a_multi, s_multi):
                assert a in (base, base + 1), (ok, ln, a, base)


def test_merkle_diff_flags_exactly_drifted_buckets(spark, sf_dir):
    """A bucket mismatches iff it contains a %97 segment change or a
    %301 missing row — verified bucket-by-bucket from first
    principles."""
    import duckdb

    from __spark_entry__ import queries

    got = {
        r["bucket"]: r
        for r in queries()["etl_merkle_bucket_diff"](
            spark, sf_dir
        ).collect()
    }
    keys = [
        k
        for (k,) in duckdb.connect()
        .execute(
            f"SELECT c_custkey FROM '{sf_dir}/customer.parquet'"
        )
        .fetchall()
    ]
    drifted = {
        k // 64 for k in keys if k % 97 == 0 or k % 301 == 0
    }
    for bucket, r in got.items():
        assert r["is_match"] == (0 if bucket in drifted else 1), bucket
    # every drifted bucket appears in the report
    assert drifted <= set(got)


def test_bitemporal_correction_visibility(spark, sf_dir):
    """The retroactive correction is invisible as-at day 20 and wins
    as-at day 60: CORRECTED appears only in the t=60 probe, and the
    per-probe customer totals are identical (no rows lost/duplicated)."""
    from __spark_entry__ import queries

    rows = queries()["etl_bitemporal_asof_asat"](spark, sf_dir).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["tx_day"], {})[r["segment"]] = (
            r["n_customers"]
        )
    assert "CORRECTED" not in by_probe[20]
    assert by_probe[60].get("CORRECTED", 0) > 0
    assert sum(by_probe[20].values()) == sum(by_probe[60].values())


def test_benford_spine_and_ppm_conservation(spark, sf_dir):
    """All nine digits present, counts sum to the filtered row count,
    observed ppm within integer-floor of exact shares, expectations
    match floor(1e6*log10(1+1/d))."""
    import math

    import duckdb

    from __spark_entry__ import queries

    rows = {
        r["digit"]: r
        for r in queries()["analytics_benford_audit"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == set(range(1, 10))
    total = sum(r["n"] for r in rows.values())
    (want_total,) = duckdb.connect().execute(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
        f" WHERE o_totalprice >= 1"
    ).fetchone()
    assert total == want_total
    for d, r in rows.items():
        assert r["expected_ppm"] == int(1_000_000 * math.log10(1 + 1 / d))
        assert r["observed_ppm"] == (1_000_000 * r["n"]) // total
        assert r["delta_ppm"] == r["observed_ppm"] - r["expected_ppm"]


def test_kaplan_meier_matches_python_replay(spark, sf_dir):
    """KM curve replayed row-at-a-time in Python (risk sets from first
    principles, same ordered float product) — bit-identical survival;
    curve strictly decreasing across event days."""
    import duckdb

    from __spark_entry__ import queries

    got = sorted(
        (
            r["duration_days"],
            r["n_risk"],
            r["n_events"],
            r["survival"],
        )
        for r in queries()["analytics_kaplan_meier"](
            spark, sf_dir
        ).collect()
    )
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH v0 AS (
          SELECT user_id, CAST(min(ts) AS DATE) AS d0
          FROM '{sf_dir}/events.parquet'
          WHERE event_type = 'view' GROUP BY user_id
        ),
        pe AS (
          SELECT e.user_id, CAST(min(e.ts) AS DATE) AS de
          FROM '{sf_dir}/events.parquet' e
          JOIN v0 ON v0.user_id = e.user_id
          WHERE e.event_type = 'purchase'
            AND e.ts >= CAST(v0.d0 AS TIMESTAMP)
          GROUP BY e.user_id
        ),
        h AS (SELECT CAST(max(ts) AS DATE) AS dh
              FROM '{sf_dir}/events.parquet')
        SELECT datediff('day', v0.d0, COALESCE(pe.de, h.dh)),
               pe.de IS NOT NULL
        FROM v0 LEFT JOIN pe USING (user_id), h
        """
    ).fetchall()
    durs = sorted(rows)
    want = []
    surv = 1.0
    event_days = sorted({d for d, e in durs if e})
    for day in event_days:
        n_risk = sum(1 for d, _ in durs if d >= day)
        d_i = sum(1 for d, e in durs if d == day and e)
        surv = surv * (1.0 - d_i / n_risk)
        want.append((day, n_risk, d_i, surv))
    assert got == want
    survs = [s for *_, s in got]
    assert all(a > b for a, b in zip(survs, survs[1:]))


def test_revenue_bridge_reconciles(spark, sf_dir):
    """Sum of class deltas equals total period-2 minus period-1 revenue
    exactly, and class membership is exclusive and exhaustive."""
    import duckdb

    from __spark_entry__ import queries

    rows = queries()["analytics_revenue_bridge"](spark, sf_dir).collect()
    total_delta = sum(r["delta_cents"] for r in rows)
    con = duckdb.connect()
    (r1, r2) = con.execute(
        f"""
        SELECT
          CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
               THEN CAST(FLOOR(o_totalprice*100+0.5) AS BIGINT)
               ELSE 0 END) AS BIGINT),
          CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
               THEN CAST(FLOOR(o_totalprice*100+0.5) AS BIGINT)
               ELSE 0 END) AS BIGINT)
        FROM '{sf_dir}/orders.parquet'
        """
    ).fetchone()
    assert total_delta == r2 - r1
    assert sum(r["rev_before_cents"] for r in rows) == r1
    assert sum(r["rev_after_cents"] for r in rows) == r2
    for r in rows:
        sign = {"new": 1, "expanded": 1, "churned": -1,
                "contracted": -1, "flat": 0}[r["class"]]
        if sign > 0:
            assert r["delta_cents"] > 0, dict(r)
        elif sign < 0:
            assert r["delta_cents"] < 0, dict(r)
        else:
            assert r["delta_cents"] == 0, dict(r)


def test_skyline_dominance_law(spark, sf_dir):
    """No frontier point is dominated, and every non-frontier point IS
    dominated — checked against brute force per flag."""
    import duckdb

    from __spark_entry__ import queries

    got = {}
    for r in queries()["agg_skyline_pareto"](spark, sf_dir).collect():
        got.setdefault(r["l_returnflag"], set()).add(
            (r["price_c"], r["qty"])
        )
    pts = {}
    for f, p, q in duckdb.connect().execute(
        f"""SELECT l_returnflag,
             CAST(FLOOR(l_extendedprice*100+0.5) AS BIGINT),
             CAST(FLOOR(l_quantity+0.5) AS BIGINT)
           FROM '{sf_dir}/lineitem.parquet'"""
    ).fetchall():
        pts.setdefault(f, set()).add((p, q))

    def dominated(p, q, others):
        return any(
            (p2 <= p and q2 > q) or (p2 < p and q2 >= q)
            for p2, q2 in others
        )

    for f, all_pts in pts.items():
        frontier = {
            (p, q) for p, q in all_pts if not dominated(p, q, all_pts)
        }
        assert got[f] == frontier, f


def test_did_null_calibration(spark, sf_dir):
    """With a hash-random 'treatment', the DiD estimate must be small
    relative to the overall mean (null calibration), and the cells
    partition the table exactly."""
    import duckdb

    from __spark_entry__ import queries

    r = queries()["analytics_diff_in_diff"](spark, sf_dir).collect()[0]
    n_total = (
        r["n_treat_post"] + r["n_treat_pre"]
        + r["n_ctrl_post"] + r["n_ctrl_pre"]
    )
    (want_n,) = duckdb.connect().execute(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()
    assert n_total == want_n
    s_total = (
        r["s_treat_post"] + r["s_treat_pre"]
        + r["s_ctrl_post"] + r["s_ctrl_pre"]
    )
    mean = s_total / n_total
    # null effect: |DiD| well under the grand mean (loose, but a sign
    # of a broken estimator is being on the order of the mean itself)
    assert abs(r["did_cents"]) < 0.5 * mean, (r["did_cents"], mean)
