"""Golden end-to-end pipelines (SURVEY §5.2 item 5).

Each test drives the full stack THROUGH THE DSL — context variables,
``>>`` expressions, ``common/all/branch/sequence/select`` — over the
sf0.001 fixtures, and asserts a committed SHA-256 of the canonicalized
result.  These pin the whole integration (DSL → DataFrame plans →
operators → results), not any single layer.
"""

import hashlib
import os

import pyspark.sql.functions as F
import pytest

from data_pipeline_package_for_python_spark import ALL, PREV, Pipeline, V
from data_pipeline_package_for_python_spark.operators import dedup as D
from data_pipeline_package_for_python_spark.queries._registry import load


def digest(df, *, ndigits=4):
    """Order-insensitive canonical SHA-256 of a DataFrame's contents."""
    rows = []
    for row in df.collect():
        cells = []
        for col in sorted(df.columns):
            v = row[col]
            if isinstance(v, float):
                v = round(v, ndigits)
            cells.append(f"{col}={v!r}")
        rows.append("|".join(cells))
    body = "\n".join(sorted(rows))
    return hashlib.sha256(body.encode()).hexdigest()[:16]


# The committed digests are pinned to the sf0.001 fixture by design —
# a scale-factor robustness pass (SPARK_GRAFT_TEST_SF_DIR=sf0.01) would
# otherwise fail every digest for the right reason.  Everything else in
# the suite is fixture-relative and must pass at any SF.
# Read the env var directly (mirrors tests/conftest.SF_DIR) instead of
# __import__-ing tests.conftest: that import only works when the repo
# root happens to be importable as a namespace package, and it creates
# a second module instance alongside the one pytest loads (r7 advice).
pytestmark = pytest.mark.skipif(
    "sf0.001" not in os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    ),
    reason="golden digests are committed for the sf0.001 fixture",
)


def test_golden_q1_sequence(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    with Pipeline(lineitem=li) as p:
        p.sequence(
            p.lineitem
            >> (lambda df: df.filter(F.col("l_shipdate") <= "2001-09-01"))
            >> p.filtered,
            PREV
            >> (
                lambda df: df.groupBy("l_returnflag", "l_linestatus").agg(
                    F.sum(
                        F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
                    ).alias("qty_c"),
                    F.count(F.lit(1)).alias("n"),
                )
            )
            >> p.q1,
        )
    assert digest(p.q1) == "65ea4205db42109c"


def test_golden_q3_branch_merge(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    with Pipeline(customer=c, orders=o) as p:
        p.branch(
            (
                p.customer
                >> (
                    lambda df: df.filter(
                        F.col("c_mktsegment") == "BUILDING"
                    ).select("c_custkey")
                )
                >> p.building
            ),
            (
                p.orders
                >> (
                    lambda df: df.filter(F.col("o_orderdate") < "1998-01-01")
                )
                >> p.recent
            ),
        )
        p.all(
            V(p.recent, p.building)
            >> (
                lambda o_df, c_df: o_df.join(
                    F.broadcast(c_df),
                    o_df.o_custkey == c_df.c_custkey,
                )
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            >> p.by_status
        )
    assert digest(p.by_status) == "2717bb955c6f1f8e"


def test_golden_q6_select_routing(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    with Pipeline(lineitem=li) as p:
        # pipeline-level routing: pick the aggregation based on data
        # (forces one driver-side action, as documented in SURVEY §4.2)
        p.select(
            (
                (lambda ctx: ctx.lineitem.count() > 0),
                p.lineitem
                >> (
                    lambda df: df.filter(
                        (F.col("l_shipdate") >= "1994-01-01")
                        & (F.col("l_shipdate") < "1995-01-01")
                        & (F.col("l_discount").between(0.05, 0.07))
                        & (F.col("l_quantity") < 24)
                    ).agg(
                        F.sum(
                            F.floor(
                                F.col("l_extendedprice")
                                * F.col("l_discount")
                                * 10000
                                + F.lit(0.5)
                            )
                        ).alias("revenue_scaled"),
                        F.count(F.lit(1)).alias("n"),
                    )
                )
                >> p.q6,
            ),
            default=(
                p.lineitem >> (lambda df: df.limit(0)) >> p.q6
            ),
        )
    assert digest(p.q6) == "852da26c7d637887"


def test_golden_llm_dedup_pipeline(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    with Pipeline(documents=docs) as p:
        p.common(
            p.documents
            >> (lambda df: D.exact_dedup(df, "text", "doc_id"))
            >> p.exact,
        )
        p.all(
            V(p.documents)
            >> (
                lambda df: D.near_dedup_minhash(
                    df, "doc_id", "text", n=3, num_hashes=16, bands=4,
                    threshold=0.1,
                )
            )
            >> p.near,
        )
        p.common(
            p.exact
            >> (
                lambda df: df.agg(
                    F.count(F.lit(1)).alias("n_distinct"),
                    F.sum("n_copies").alias("n_docs"),
                )
            )
            >> p.exact_summary,
        )
        p.common(
            p.near
            >> (
                lambda df: df.agg(F.count(F.lit(1)).alias("n_pairs"))
            )
            >> p.near_summary,
        )
    assert digest(p.exact_summary) == "3d587fc8449aadd4"
    assert digest(p.near_summary) == "01231383349ec954"


def test_golden_corpus_curation(spark, sf_dir):
    """The flagship LLM-data flow, end-to-end through the DSL: quality +
    repetition gates → exact dedup survivors → near-dup CLUSTER
    survivors (MinHash-LSH pairs resolved by connected components) →
    benchmark decontamination → PII redaction → sequence packing, each
    stage a DSL step over the previous one.  Pins the integration of
    §2.1 (pipeline algebra) with §2.2.10 (training-data operators)."""
    from data_pipeline_package_for_python_spark.operators import graph as G
    from data_pipeline_package_for_python_spark.operators import text as T

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 50)

    def quality_gate(df):
        scored = T.quality_score(df, "doc_id", "text")
        ok = scored.filter(
            F.col("quality_bucket").isin("natural", "keep")
        ).select("id")
        rep_ok = T.repetition_stats(df, "doc_id", "text").filter(
            F.col("repetition_bucket") == "keep"
        ).select("id")
        gated = df.join(ok, df["doc_id"] == ok["id"], "left_semi")
        return gated.join(
            rep_ok, gated["doc_id"] == rep_ok["id"], "left_semi"
        )

    def dedup_survivors(df):
        keep = D.exact_dedup(df, "text", "doc_id").select(
            F.col("keep_id").alias("doc_id")
        )
        return df.join(keep, "doc_id", "left_semi")

    def near_cluster_survivors(df):
        pairs = D.near_dedup_minhash(
            df, "doc_id", "text", n=3, num_hashes=16, bands=4,
            threshold=0.5,
        ).select("id_a", "id_b")
        resolved = G.resolve_duplicates(
            df.select("doc_id"), pairs, "doc_id"
        )
        keep = resolved.filter(F.col("is_survivor")).select("doc_id")
        return df.join(keep, "doc_id", "left_semi")

    def decontaminated(df):
        flagged = T.decontaminate(
            df, bench, "doc_id", "text", n=3, min_overlap=2
        ).select(F.col("id").alias("doc_id")).distinct()
        return df.join(flagged, "doc_id", "left_anti")

    with Pipeline(documents=docs.filter(F.col("doc_id") >= 50)) as p:
        p.sequence(
            p.documents >> quality_gate >> p.clean,
            PREV >> dedup_survivors >> p.unique,
            PREV >> near_cluster_survivors >> p.canonical,
            PREV >> decontaminated >> p.safe,
            PREV
            >> (lambda df: T.redact_pii(df, "doc_id", "text"))
            >> p.redacted,
            PREV
            >> (
                lambda df: T.pack_sequences(
                    df.select(
                        F.col("id").alias("doc_id"),
                        F.col("clean_text").alias("text"),
                    ),
                    "doc_id",
                    "text",
                    max_tokens=32,
                )
            )
            >> p.packed,
        )
    out = p.packed
    # structural invariants (stable across fixture regeneration)
    n_docs = out.select("id").distinct().count()
    assert 0 < n_docs <= 450
    assert out.filter(F.col("n_tokens") > 32).count() == 0
    # committed digest pins exact end-to-end results on sf0.001
    assert digest(out) == "8f6401a5d3041f23"


def test_golden_retrieval_prep_round3(spark, sf_dir):
    """Round-3 operators composed through the DSL: charset gate →
    per-domain cap → language rebalancing → sliding-window chunking,
    with a branch computing the expectations report on the same gated
    corpus.  Pins that the new training-data surface participates in
    the §2.1 pipeline algebra like every older operator."""
    from data_pipeline_package_for_python_spark.operators import etl as E
    from data_pipeline_package_for_python_spark.operators import text as T

    docs = load(spark, sf_dir, "documents")

    def charset_gate(df):
        ok = T.charset_quality(df, "doc_id", "text", min_alpha_ratio=0.6)
        keep = ok.filter(F.col("keep")).select("id")
        return df.join(keep, df["doc_id"] == keep["id"], "left_semi")

    def domain_cap(df):
        return E.cap_per_group(df, "source", "doc_id", 15)

    def rebalance(df):
        return E.stratified_hash_sample(
            df, "doc_id", "lang",
            {"en": 0.5, "fr": 1.0, "es": 1.0, "zh": 1.0, "de": 1.0},
        )

    def chunk(df):
        return T.chunk_documents(
            df, "doc_id", "text", chunk_tokens=32, stride=24
        )

    def audit(df):
        return E.expectations_report(
            df,
            {"text_present": F.col("text").isNotNull()},
            unique=("doc_id",),
        )

    with Pipeline(documents=docs) as p:
        p.sequence(
            p.documents >> charset_gate >> p.gated,
            PREV >> domain_cap >> p.capped,
            PREV >> rebalance >> p.balanced,
            PREV >> chunk >> p.chunks,
        )
        p.common(p.balanced >> audit >> p.audit)
    chunks = p.chunks
    report = {r["rule"]: r["n_violations"] for r in p.audit.collect()}
    assert report == {"text_present": 0, "unique(doc_id)": 0}
    # every chunk bounded, every kept doc chunked
    assert chunks.filter(F.col("n_tokens") > 32).count() == 0
    assert (
        chunks.select("id").distinct().count()
        == p.balanced.select("doc_id").distinct().count()
    )
    # committed digest pins exact end-to-end results on sf0.001
    assert digest(chunks) == "966c9119645b40d1"


def test_golden_lm_mixture_round3(spark, sf_dir):
    """This round's operators composed through the DSL: corpus-fit
    bigram-LM fluency gate → domain mixture weights on the survivors,
    with a branch auditing the SAME corpus through the fused filter
    funnel and another deriving the BPE merge table from the gated
    text.  Pins that model-fit-join-back operators (LM scoring) and
    k-row audit/model outputs (weights, merges, funnel) compose in the
    §2.1 algebra."""
    from data_pipeline_package_for_python_spark.operators import etl as E
    from data_pipeline_package_for_python_spark.operators import text as T

    docs = load(spark, sf_dir, "documents")

    def lm_gate(df):
        scored = T.bigram_lm_scores(df, "doc_id", "text")
        # fluent = average transition probability over 5% (50k ppm);
        # exact integer arithmetic so the gate is engine-deterministic.
        fluent = scored.filter(
            F.col("lm_score_ppm") >= F.col("n_bigrams") * 50000
        ).select("id")
        return df.join(fluent, df["doc_id"] == fluent["id"], "left_semi")

    with Pipeline(documents=docs) as p:
        p.branch(
            p.documents
            >> (
                lambda df: T.filter_funnel(
                    df, "doc_id", "text", "source"
                )
            )
            >> p.audit,
            p.documents >> lm_gate >> p.fluent,
        )
        p.sequence(
            p.fluent
            >> (lambda df: E.domain_mix_weights(df, "source"))
            >> p.weights,
        )
        p.sequence(
            p.fluent
            >> (lambda df: T.bpe_pair_counts(df, "text", top_k=10))
            >> p.merges,
        )
    # structural invariants
    n_sources = p.weights.count()
    assert 0 < n_sources <= 20
    assert p.merges.count() == 10
    audit = {r["grp"]: r for r in p.audit.collect()}
    assert all(
        r["n_total"] >= r["n_charset"] >= r["n_length"] >= r["n_final"]
        for r in audit.values()
    )
    # committed digests pin exact end-to-end results on sf0.001
    assert digest(p.weights) == "f8275abfa4c3a89f"
    assert digest(p.merges) == "d51782de91678eeb"


def test_golden_warc_ingestion_round4(spark, sf_dir):
    """Round-4 ingestion golden — the COMPLETE crawl chain: WARC files
    of full HTML pages → parsed response records → HTML main-text
    extraction (boilerplate dropped) → charset gate → exact dedup
    survivors, composed entirely through the DSL.  Pins that the
    archive + HTML layers feed the existing curation operators with no
    impedance mismatch — crawl to clean corpus end to end."""
    import pandas as pd

    from data_pipeline_package_for_python_spark.operators import (
        archive as A,
    )
    from data_pipeline_package_for_python_spark.operators import (
        dedup as DD,
    )
    from data_pipeline_package_for_python_spark.operators.text import (
        html_extract_text,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def to_warc(it):
        import html as _html

        for pdf in it:
            payloads = []
            for r in pdf.itertuples():
                page = (
                    f"<html><head><title>D{int(r.doc_id)}</title></head>"
                    "<body><nav>chrome</nav>"
                    f"<article><p>{_html.escape(r.text)}</p></article>"
                    "<footer>foot</footer></body></html>"
                )
                payloads.append(
                    A.warc_bytes([
                        ("response", f"https://e.com/{int(r.doc_id)}",
                         page.encode("utf-8")),
                    ])
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    warcs = docs.mapInPandas(
        to_warc, schema="media_id long, payload binary"
    )
    with Pipeline(crawl=warcs) as p:
        p.sequence(
            p.crawl >> A.parse_warc >> p.records,
            PREV
            >> (
                lambda df: html_extract_text(
                    df.filter(F.col("warc_type") == "response").select(
                        F.col("archive_id").alias("doc_id"),
                        F.col("payload").cast("string").alias("page"),
                    ),
                    "doc_id",
                    "page",
                ).select(F.col("id").alias("doc_id"), "text")
            )
            >> p.texts,
            PREV
            >> (
                lambda df: df.filter(
                    F.length(F.regexp_replace("text", r"[^a-zA-Z ]", ""))
                    * 10
                    >= F.length("text") * 5
                )
            )
            >> p.clean,
            PREV
            >> (lambda df: DD.exact_dedup(df, "text", "doc_id"))
            >> p.unique,
        )
        p.common(
            p.unique
            >> (
                lambda df: df.agg(
                    F.count(F.lit(1)).alias("n_unique"),
                    F.sum("n_copies").alias("n_total"),
                )
            )
            >> p.census,
        )
    
    assert digest(p.census) == "6c9977a4624ef959"
