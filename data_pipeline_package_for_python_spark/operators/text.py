"""Text-analysis operators for large-scale corpora (SURVEY §2.2.10).

Everything here is pure ``pyspark.sql.functions`` column algebra — no UDFs,
no Python in the hot path.  Each operator is a narrow projection over the
document table, so at 100 TB the scan is column-pruned to (id, text) and
every derived stat stays inside whole-stage codegen.

Determinism contract: all outputs are integers, strings, or doubles
produced by IEEE-deterministic expressions (integer counts, single
divisions), so a DuckDB oracle can reproduce them bit-for-bit
(see queries/llm.py).

Reference parity note: the reference system (/root/reference/dpp.py) has
no text operators of any kind; this module is the north-star extension
declared in SURVEY §2.2.10 (text analysis rows).
"""

from __future__ import annotations

import time as _time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import ensure_parallel

__all__ = [
    "bpe_train",
    "LANG_MARKERS",
    "PII_PATTERNS",
    "TOKEN_REGEX",
    "bigram_lm_scores",
    "bm25_related_topk",
    "linear_quality_score",
    "bpe_apply",
    "bpe_pair_counts",
    "html_extract_text",
    "build_vocab",
    "charset_quality",
    "decontaminate",
    "doc_fingerprint",
    "filter_funnel",
    "encode_as_vocab_ids",
    "language_id",
    "pack_sequences",
    "quality_score",
    "redact_pii",
    "remove_boilerplate",
    "repetition_stats",
    "rolling_hash_fingerprint",
    "term_frequencies",
    "tf_idf",
    "token_counts",
]

# Function-word markers per language for the n-gram-free heuristic
# classifier.  Scoring is a JVM-side ``filter`` over the whitespace
# tokens — no Python, no shuffle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "von", "mit", "das", "nicht"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "es": ("el", "la", "de", "los", "las", "que", "es", "una"),
    "fr": ("le", "la", "les", "et", "des", "est", "une", "dans"),
}

# BPE-ish lexer: letter runs | digit runs | single non-alnum-non-space.
# Kept to constructs with identical semantics in Java regex and RE2 so
# the DuckDB oracle can run the same pattern.
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def _marker_hits(words: Column, markers: tuple[str, ...]) -> Column:
    quoted = ",".join(f"'{m}'" for m in markers)
    return F.size(F.filter(words, lambda w: w.isin(*markers))) if False else (
        F.size(F.expr(f"filter(__words__, w -> w IN ({quoted}))"))
    )


def language_id(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Heuristic language ID: (id, s_de, s_en, s_es, s_fr, lang_guess).

    Scores = marker-function-word hits per language over whitespace
    tokens; argmax with a fixed de<en<es<fr tie-break so the result is
    total-order deterministic.
    """
    out = df.select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ").alias("__words__"),
    )
    for lang, markers in LANG_MARKERS.items():
        out = out.withColumn(f"s_{lang}", _marker_hits(F.col("__words__"), markers))
    s = {lang: F.col(f"s_{lang}") for lang in LANG_MARKERS}
    guess = (
        F.when(
            (s["de"] >= s["en"]) & (s["de"] >= s["es"]) & (s["de"] >= s["fr"]),
            F.lit("de"),
        )
        .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]), F.lit("en"))
        .when(s["es"] >= s["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return out.withColumn("lang_guess", guess).drop("__words__")


def quality_score(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document quality stats: (id, n_chars, n_words, avg_word_len,
    stopword_ratio, punct_count, quality_bucket).

    The bucket rule mirrors common LLM-corpus filters: drop too-short
    docs, drop docs with implausibly long "words" (markup/binary), keep
    docs whose stopword ratio suggests natural language.
    """
    words = F.split(F.col(text_col), " ")
    all_markers = tuple(m for ms in LANG_MARKERS.values() for m in ms)
    quoted = ",".join(f"'{m}'" for m in all_markers)
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    avg_word_len = (n_chars - (n_words - 1)).cast("double") / n_words
    stop_hits = F.expr(
        f"size(filter(split({text_col}, ' '), w -> w IN ({quoted})))"
    )
    stopword_ratio = stop_hits.cast("double") / n_words
    punct_count = F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z0-9 ]", ""))
    bucket = (
        F.when(n_words < 5, F.lit("too_short"))
        .when(avg_word_len > 15.0, F.lit("weird_tokens"))
        .when(stopword_ratio >= 0.05, F.lit("natural"))
        .otherwise(F.lit("keep"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        stopword_ratio.alias("stopword_ratio"),
        punct_count.alias("punct_count"),
        bucket.alias("quality_bucket"),
    )


def charset_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_alpha_ratio: float = 0.6,
) -> DataFrame:
    """Charset-level quality filter: (id, n_alpha, n_ascii, alpha_ratio,
    is_ascii, keep).

    The cheapest corpus gate there is — two regexp strips and a length,
    all inside whole-stage codegen, map-only at any scale.  Patterns are
    restricted to character classes with identical semantics in Java
    regex and RE2 so a DuckDB oracle can replay them verbatim:
    ``[^A-Za-z]`` (alpha strip) and ``[^ -~]`` (printable-ASCII strip).
    ``keep`` mirrors the standard LLM-corpus rule of dropping documents
    whose alphabetic mass is below ``min_alpha_ratio``."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    n_ascii = F.length(F.regexp_replace(text, "[^ -~]", ""))
    alpha_ratio = n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))
    return df.select(
        F.col(id_col).alias("id"),
        n_alpha.alias("n_alpha"),
        n_ascii.alias("n_ascii"),
        alpha_ratio.alias("alpha_ratio"),
        (n_ascii == n_chars).alias("is_ascii"),
        (alpha_ratio >= F.lit(min_alpha_ratio)).alias("keep"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher/C4-style repetition filters: (id, n_lines,
    dup_line_fraction, dup_2gram_fraction, top_word_fraction,
    repetition_bucket).

    Repetitious documents (boilerplate, scraped nav bars, degenerate
    generations) are the classic LLM-corpus poison; the Gopher rules
    (Rae et al. 2021, §A1.1) filter on duplicate-line and repeated
    n-gram fractions.  All three signals here are per-document array
    folds — ``array_distinct``/``aggregate`` over the doc's own tokens
    inside whole-stage codegen, NO explode and NO corpus-wide shuffle
    (the per-doc word-multiplicity fold replaces the explode → groupBy
    (doc, word) → max pipeline, which at 100 TB would shuffle every
    token in the corpus twice).

    - ``dup_line_fraction``: 1 − distinct/total over ``\\n``-split lines.
    - ``dup_2gram_fraction``: 1 − distinct/total over word 2-grams.
    - ``top_word_fraction``: multiplicity of the most-repeated word /
      word count (sort the doc's words, longest equal run via an
      ``aggregate`` fold).
    """
    lines = F.split(F.col(text_col), "\n")
    ws = F.split(F.col(text_col), " ")
    n_lines = F.size(lines)
    n_words = F.size(ws)
    dup_line_fraction = (
        (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines
    )
    grams = F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) < 2 THEN array()"
        f" ELSE transform(sequence(0, size(split({text_col}, ' ')) - 2),"
        f" i -> concat_ws(' ', split({text_col}, ' ')[i],"
        f" split({text_col}, ' ')[i + 1])) END"
    )
    n_grams = F.size(grams)
    dup_2gram_fraction = F.when(n_grams == 0, F.lit(0.0)).otherwise(
        (n_grams - F.size(F.array_distinct(grams))).cast("double") / n_grams
    )
    # longest run of equal adjacent words in the sorted array == max
    # multiplicity of any word; a pure per-row fold, no shuffle
    best_word_count = F.expr(
        f"""aggregate(
            array_sort(split({text_col}, ' ')),
            named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
            (acc, w) -> named_struct(
                'prev', w,
                'run', CASE WHEN w = acc.prev THEN acc.run + 1 ELSE 1L END,
                'best', greatest(acc.best,
                    CASE WHEN w = acc.prev THEN acc.run + 1 ELSE 1L END)),
            acc -> acc.best)"""
    )
    top_word_fraction = best_word_count.cast("double") / n_words
    bucket = (
        F.when(dup_line_fraction > 0.30, F.lit("dup_lines"))
        .when(dup_2gram_fraction > 0.50, F.lit("dup_ngrams"))
        .when(top_word_fraction > 0.20, F.lit("word_dominance"))
        .otherwise(F.lit("keep"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_lines.alias("n_lines"),
        dup_line_fraction.alias("dup_line_fraction"),
        dup_2gram_fraction.alias("dup_2gram_fraction"),
        top_word_fraction.alias("top_word_fraction"),
        bucket.alias("repetition_bucket"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    lexer (letter runs / digit runs / single punctuation).

    (id, ws_tokens, lex_tokens).  ``regexp_extract_all`` runs in the JVM.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0)
        ).alias("lex_tokens"),
    )


def term_frequencies(
    df: DataFrame, text_col: str, min_count: int = 1
) -> DataFrame:
    """Corpus-wide term frequencies: (term, tf).

    explode → groupBy: the classic two-phase (map-side partial count,
    one shuffle on term).  At 100 TB the explode never materializes —
    it streams through codegen into the partial aggregation.
    """
    return (
        ensure_parallel(df)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.col("tf") >= min_count)
    )


def tf_idf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_tf: int = 1,
    log_idf: bool = False,
) -> DataFrame:
    """Per-(doc, term) TF-IDF: (id, term, tf, df, n_docs, tfidf).

    Classic two-shuffle shape, both with map-side partial aggregation:
    explode → groupBy(id, term) for tf, then groupBy(term) over the
    already-distinct (id, term) frame for df (counting rows there IS
    the document frequency — no second distinct).  The corpus size
    joins in as a broadcast 1-row aggregate; the tf↔df join keys on
    term, which AQE demotes to broadcast when the vocabulary is small.

    ``tfidf`` defaults to the exact-rational odds form ``tf * n_docs /
    df`` — one integer product and one IEEE division, bit-reproducible
    across engines (a DuckDB oracle matches it hash-for-hash).  The
    textbook ``tf * ln(n_docs/df)`` is available via ``log_idf=True``;
    it ranks identically per document (ln is monotone in n_docs/df) but
    ``ln`` differs between libm implementations in the last ulp
    (measured: 44/500 of the ratios here), so it is not part of the
    hash-checked surface.
    """
    words = ensure_parallel(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = words.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(
        F.count_distinct(F.col(id_col)).alias("n_docs")
    )
    out = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("tf") >= min_tf)
    )
    if log_idf:
        tfidf = F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
    else:
        tfidf = (F.col("tf") * F.col("n_docs")) / F.col("df")
    return out.select(
        "id", "term", "tf", "df", "n_docs", tfidf.alias("tfidf")
    )


def bm25_related_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    query_pred: Column,
    k: int = 5,
    max_df_ratio_ppm: int = 200_000,
) -> DataFrame:
    """Okapi BM25 related-document retrieval, exact-rational score:
    for each query document (rows matching ``query_pred``), the top-k
    other documents ranked by Σ over shared terms of
    ``idf_t · tf-saturation_t`` — (query_id, rank, doc_id, score,
    n_shared).

    BM25 normally hides two hash-hostile floats (``ln`` idf and an
    unordered float sum).  Both are removed without changing the
    ranking family:

      * k1=6/5, b=3/4 (the standard 1.2/0.75 as exact rationals), and
        the Robertson odds idf ``(2N−2df+1)/(2df+1)`` in place of its
        ln (monotone in the same odds, same per-term ordering — the
        same ln-free discipline as :func:`tf_idf`).  Clearing
        denominators, each term's contribution is ONE correctly-rounded
        IEEE division of two exact BIGINTs:

          (2N−2df+1)·22·tf·L  /  (2df+1)·(10·tf·L + 3·L + 9·dl·N)

        (L = Σ doc lengths, so dl/avgdl = dl·N/L exactly).
      * the per-pair sum folds over terms in ascending term order
        (sorted-array aggregate), so the double total is
        bit-reproducible across engines and partitionings.

    Query terms are a set (query-side tf weighting — BM25's k3 — is
    deliberately dropped, the common search-engine simplification).
    Terms with df > max_df_ratio_ppm·N/1e6 are pruned BEFORE the
    term join: their idf is near zero AND their posting lists are the
    quadratic hot spot at 100 TB — the standard max-df/WAND-style cut,
    which keeps the candidate join bounded by rare-term posting lists
    (never corpus × corpus).  Overflow headroom: numerator ≈
    2N·22·tf·L needs N·L·tf ≪ 4e17 — fine through sf1 here; a
    100 TB corpus would compute the two products as DECIMAL(38,0)
    before the divide."""
    words = ensure_parallel(df).select(
        F.col(id_col).alias("id"),
        query_pred.alias("is_q"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = words.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("is_q").alias("is_q")
    )
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("len_total")
    )
    posting = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .filter(
            F.col("df") * F.lit(1_000_000)
            <= F.lit(int(max_df_ratio_ppm)) * F.col("n_docs")
        )
        .join(dl, "id")
    )
    qside = posting.filter(F.col("is_q")).select(
        F.col("id").alias("query_id"), "term"
    )
    n, L = F.col("n_docs"), F.col("len_total")
    num = (2 * n - 2 * F.col("df") + 1) * 22 * F.col("tf") * L
    den = (2 * F.col("df") + 1) * (
        10 * F.col("tf") * L + 3 * L + 9 * F.col("dl") * n
    )
    scored = (
        qside.join(posting, "term")
        .filter(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            "id",
            "term",
            (num.cast("double") / den.cast("double")).alias("s"),
        )
    )
    per_pair = scored.groupBy("query_id", "id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score"),
        F.count(F.lit(1)).alias("n_shared"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        per_pair.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", F.col("id").alias("doc_id"),
            "score", "n_shared",
        )
    )


def build_vocab(
    df: DataFrame, text_col: str, *, size: int = 256
) -> DataFrame:
    """Top-``size`` corpus vocabulary: (term, tf, token_id), token ids
    dense 0.. by (tf desc, term asc) — a deterministic total order.

    The top-V selection is ``TakeOrderedAndProject`` (per-partition
    top-V, tiny driver merge — no global sort of the term table); the
    dense id is a row_number over the V survivors only, a single task
    on V rows, which is the correct cost for a model-sized artifact.
    """
    from pyspark.sql import Window

    tf = term_frequencies(df, text_col)
    top = tf.orderBy(F.col("tf").desc(), F.col("term")).limit(size)
    w = Window.orderBy(F.col("tf").desc(), F.col("term"))
    return top.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("int")
    )


def encode_as_vocab_ids(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    *,
    oov_id: int = -1,
) -> DataFrame:
    """Tokenize each document to vocabulary ids: (id, n_tokens, n_oov,
    token_ids) with ``token_ids`` a space-joined string (stable across
    engines and canonicalizers).

    The vocabulary is COLLECTED (it is model state, like k-means
    centroids — V entries, not data) and baked into a literal map, so
    encoding is MAP-ONLY: ``transform`` over the split words with an
    ``element_at`` lookup per token, no explode, no join, no shuffle —
    the shape that encodes 100 TB in one pass.  For vocabularies too
    large for a literal (≫10⁵), switch to posexplode + broadcast join;
    same result, one extra shuffle.
    """
    pairs = vocab.select("term", "token_id").collect()
    args: list[Column] = []
    for r in pairs:
        args.append(F.lit(r["term"]))
        args.append(F.lit(int(r["token_id"])))
    lookup = F.create_map(*args)
    ws = F.split(F.col(text_col), " ")
    ids = F.transform(
        ws, lambda w: F.coalesce(lookup[w], F.lit(int(oov_id)))
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(ws).alias("n_tokens"),
        F.size(F.filter(ids, lambda i: i == oov_id)).alias("n_oov"),
        F.array_join(ids, " ").alias("token_ids"),
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive bag fingerprint: md5 over the sorted distinct
    vocabulary of the document.  (id, vocab_fingerprint).

    Two documents that are word-permutations of each other collide — a
    cheap shuffle-free near-dup signal complementary to MinHash.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(
            F.concat_ws(
                " ",
                F.array_sort(
                    F.array_distinct(F.split(F.col(text_col), " "))
                ),
            )
        ).alias("vocab_fingerprint"),
    )


ROLLING_MOD = 2**31


def rolling_hash_fingerprint(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Order-SENSITIVE rolling polynomial hash over word hashes:
    ``h = (h*31 + word_hash) mod 2^31`` left-to-right.  (id, rolling_hash).

    word_hash = first 8 md5 hex digits as int64 (engine-portable, same
    construction as operators/dedup.py).  The fold is a single
    ``aggregate`` higher-order function — per-row, no shuffle at all,
    and the modulus keeps every intermediate below 2^36 so the math is
    exact int64 on any engine.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"aggregate(split({text_col}, ' '), CAST(0 AS BIGINT), "
            f"(acc, w) -> (acc * 31 + CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)) % {ROLLING_MOD})"
        ).alias("rolling_hash"),
    )


# PII patterns kept to constructs with identical Java-regex / RE2
# semantics (no backrefs, no lookaround) so the DuckDB oracle can run
# the same patterns verbatim.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    (r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Replace emails / phone numbers / IPv4 literals with typed tags.

    A chain of JVM-side ``regexp_replace`` calls — order matters: the
    phone pattern also matches dotted quads, so IPs are replaced from
    the email-scrubbed text BEFORE the phone pattern runs.
    Output: (id, clean_text, n_redactions) where the count is computed
    from the tag occurrences — column algebra only, one pass, no UDF.
    """
    clean = F.col(text_col)
    for pat, tag in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, tag)
    n_tags = sum(
        (
            F.coalesce(
                F.size(F.split(F.col("clean_text"), tag, -1)) - 1, F.lit(0)
            )
            for _, tag in PII_PATTERNS
        ),
        F.lit(0),
    )
    return (
        df.select(
            F.col(id_col).alias("id"), clean.alias("clean_text")
        ).withColumn("n_redactions", n_tags.cast("long"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ≥ ``min_overlap``
    distinct n-gram shingles with any benchmark doc.

    The training-data hygiene step before an eval release: exact n-gram
    collision against the benchmark set.  Shape is shingle-explode both
    sides + equality join on the shingle + per-(doc, bench) distinct
    count — linear in corpus shingles, never an all-pairs comparison.
    The benchmark side is tiny by construction (eval sets are thousands
    of rows) so Catalyst broadcasts it; the corpus side never shuffles
    document bodies, only (id, shingle-hash) pairs.

    Both sides join on the md5-derived int64 shingle hash, not the
    shingle text — the broadcast ships 8-byte keys and the probe stays
    narrow (collision odds at 2^64 are negligible next to min_overlap).

    Returns (id, bench_id, n_shared) for flagged docs.
    """
    from .dedup import _shingle_hash, word_shingles

    c_sh = word_shingles(corpus, id_col, text_col, n).select(
        "id", _shingle_hash().alias("sh")
    )
    b_sh = word_shingles(benchmark, id_col, text_col, n).select(
        F.col("id").alias("bench_id"), _shingle_hash().alias("sh")
    )
    return (
        c_sh.join(b_sh, "sh")
        .groupBy("id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_tokens: int = 128,
) -> DataFrame:
    """Split each document into fixed-size whitespace-token chunks —
    the sequence-packing step that turns documents into training rows.

    All inside codegen: one ``split`` per doc, ``sequence`` over chunk
    starts, ``slice`` + ``concat_ws`` per chunk, ``posexplode`` to rows.
    No Python, no shuffle; at 100 TB this is a map-only stage whose
    output partitioning follows the scan.

    Returns (id, chunk_idx, chunk_text, n_tokens); chunk_idx is 0-based,
    every chunk except possibly the last has exactly ``max_tokens``
    tokens.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ").alias("__ws"),
    )
    chunks = F.expr(
        f"transform(sequence(1, greatest(ceil(size(__ws) / {max_tokens}),"
        f" 1)), i -> concat_ws(' ', slice(__ws, (i - 1) * {max_tokens} + 1,"
        f" {max_tokens})))"
    )
    return (
        words.select("id", F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .withColumn("chunk_idx", F.col("chunk_idx").cast("long"))
        .withColumn(
            "n_tokens", F.size(F.split(F.col("chunk_text"), " ")).cast("long")
        )
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    unit: str = "line",
    min_doc_frac: float = 0.5,
) -> DataFrame:
    """Corpus-frequency boilerplate removal (C4-style): drop every
    ``unit`` (newline-delimited line, or whitespace word) that occurs in
    at least ``min_doc_frac`` of all documents, and reassemble each
    document from its surviving units in original order.

    This is the cross-document counterpart of ``repetition_stats``
    (which is within-document): headers, cookie banners and navigation
    chrome repeat across pages and survive per-doc filters.

    Distributed shape — three shuffles, all on compact keys:
      1. ``posexplode`` → distinct (unit, id) → count per unit = the
         document frequency (partial aggregation compresses map-side);
      2. the boilerplate set joins back to the exploded units on
         ``xxhash64(unit)`` — an 8-byte shuffle key regardless of unit
         length (same trick as ``decontaminate``), with a string
         equality check after the join so a hash collision can never
         delete an innocent unit;
      3. per-doc reassembly: ``collect_list(struct(pos, unit))`` →
         ``array_sort`` → ``array_join`` — one group per document, list
         size bounded by document length.
    Never a cross join, never driver-side; the boilerplate set itself
    stays distributed (it can be vocabulary-sized, so it is NOT pinned
    to a broadcast — AQE demotes the join when it is actually small).

    Returns (id, n_kept, n_removed, clean_text); ``clean_text`` is NULL
    when every unit was boilerplate.
    """
    if unit not in ("line", "word"):
        raise ValueError(f"unit must be 'line' or 'word', got {unit!r}")
    sep = "\n" if unit == "line" else " "
    base = ensure_parallel(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text")
    )
    units = base.select(
        "id",
        F.posexplode(F.split(F.col("__text"), sep)).alias("pos", "u"),
    )

    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = (
        units.select("id", "u")
        .distinct()
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("nd"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            F.col("nd")
            >= F.col("n_docs").cast("double") * F.lit(min_doc_frac)
        )
        .select(
            F.xxhash64("u").alias("bh"), F.col("u").alias("bu")
        )
    )

    kept = (
        units.withColumn("uh", F.xxhash64("u"))
        .join(
            boiler,
            (F.col("uh") == F.col("bh")) & (F.col("u") == F.col("bu")),
            "left_anti",
        )
        .drop("uh")
    )
    per_doc = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("u")))
                ),
                lambda s: s["u"],
            ),
            sep,
        ).alias("clean_text"),
    )
    return (
        base.withColumn(
            "__n_total", F.size(F.split(F.col("__text"), sep)).cast("long")
        )
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias(
                "n_kept"
            ),
            (
                F.col("__n_total")
                - F.coalesce(F.col("n_kept"), F.lit(0).cast("long"))
            ).alias("n_removed"),
            "clean_text",
        )
    )


def extract_urls(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exploded URL mentions with canonical form: (id, url, domain,
    url_norm) — the substrate for URL-level dedup and per-domain corpus
    accounting in a crawl pipeline.

    Entirely codegen regex (map-only, zero shuffle):
    ``regexp_extract_all`` pulls ``http(s)://`` spans, normalization
    lowercases, strips the scheme and a leading ``www.``, and drops the
    query string, fragment, and any trailing slash — the standard
    canonicalizer that makes ``http://WWW.X.com/a?utm=1`` and
    ``https://x.com/a/`` the same corpus key.  Patterns restricted to
    Java-regex/RE2-identical constructs so a DuckDB oracle runs them
    verbatim (same discipline as ``redact_pii``).
    """
    urls = ensure_parallel(df).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"https?://[^\s]+"), 0
            )
        ).alias("url"),
    )
    lowered = F.lower(F.col("url"))
    no_scheme = F.regexp_replace(lowered, r"^https?://(www\.)?", "")
    no_query = F.regexp_replace(no_scheme, r"[?#].*$", "")
    norm = F.regexp_replace(no_query, r"/$", "")
    return urls.select(
        "id",
        "url",
        F.regexp_extract(norm, r"^([^/]+)", 1).alias("domain"),
        norm.alias("url_norm"),
    )


def ngram_novelty(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
) -> DataFrame:
    """Per-document n-gram novelty against a reference corpus:
    (id, n_ngrams, n_unseen) — how many of a doc's distinct n-grams
    never occur in the reference.  The memorization/novelty proxy a
    training pipeline uses to rank candidate data against what the
    model has already seen (low novelty = near-duplicate knowledge,
    high novelty = new material), entirely in exact integers.

    Shape: distinct n-grams both sides → join on the md5-derived int64
    n-gram hash (8-byte keys, reference side deduplicated first) →
    per-doc counts.  Linear in corpus n-grams; the reference hash set
    is the only reused state, and at 100 TB it is a narrow one-column
    frame that AQE broadcasts when small and shuffle-joins when not —
    no driver-side set, no Python.
    """
    from .dedup import _shingle_hash, word_shingles

    c = word_shingles(corpus, id_col, text_col, n).select(
        "id", _shingle_hash().alias("h")
    )
    ref = (
        word_shingles(reference, id_col, text_col, n)
        .select(_shingle_hash().alias("h"))
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    return (
        c.join(ref, "h", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                F.when(F.col("__seen").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_unseen"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window document chunking: (id, chunk_idx, n_tokens,
    chunk_text) — fixed-size token windows every ``stride`` tokens,
    overlapping by ``chunk_tokens − stride``.  The retrieval/embedding
    prep step (context windows with overlap so no boundary sentence is
    lost), as the map-only HOF pipeline: split once, slice per chunk
    index inside codegen, posexplode.  No shuffle; output width is
    bounded by ``chunk_tokens`` so rows re-shuffle safely downstream.

    Chunk count = ceil(max(n_tokens − chunk, 0) / stride) + 1 — the
    last window may be short but is never empty, and every token is in
    ≥ 1 chunk for stride ≤ chunk_tokens.
    """
    if not 0 < stride <= chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    words = ensure_parallel(df).select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ").alias("__ws"),
    )
    # last chunk index = ceil(max(n_tokens - chunk, 0) / stride);
    # sequence(0, last) is inclusive, so chunk count = last + 1.
    last_idx = (
        f"CAST((greatest(size(__ws) - {chunk_tokens}, 0) "
        f"+ {stride} - 1) div {stride} AS INT)"
    )
    chunks = words.select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {last_idx}), "
                f"i -> slice(__ws, i * {stride} + 1, {chunk_tokens}))"
            )
        ).alias("chunk_idx", "__chunk"),
    )
    return chunks.select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("__chunk").cast("long").alias("n_tokens"),
        F.concat_ws(" ", "__chunk").alias("chunk_text"),
    )


def bigram_lm_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """CCNet-style corpus-LM quality scoring: fit a bigram language
    model ON the corpus itself, then score every document against it —
    (id, n_bigrams, lm_score_ppm).  Documents whose word transitions
    are unusual for the corpus (boilerplate, markup, shredded text)
    score low and can be gated; the real CCNet uses a KenLM 5-gram, but
    the *pipeline shape* — model-fit aggregation joined back to the
    corpus it came from — is identical.

    ``lm_score_ppm = Σ_bigram floor(1e6 · c(w1 w2) / c(w1 ·))`` over
    the doc's bigram OCCURRENCES (not distinct): each term is the
    conditional MLE probability P(w2|w1) in exact parts-per-million
    (one IEEE divide then floor — engine-identical), summed as BIGINT.

    Scale: two corpus aggregations (bigram counts, prefix counts) keyed
    by the md5-derived int64 used across the dedup family — 8-byte
    shuffle keys, model size is corpus-vocabulary-sized (zipf-bounded,
    ≪ corpus), so AQE broadcasts the count tables when they fit and
    shuffle-joins otherwise.  The doc-side probe is one explode; no
    Python, no driver-side model state.
    """
    words = ensure_parallel(df).select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.col(text_col)), " ").alias("__ws"),
    )
    bigrams = words.select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(__ws) - 1, 1)),"
                " i -> concat_ws(' ', slice(__ws, i, 2)))"
            )
        ).alias("shingle"),
    ).filter(F.col("shingle").contains(" "))
    keyed = bigrams.select(
        "id",
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10)
        .cast("long")
        .alias("__bg"),
        F.conv(
            F.substring(
                F.md5(F.substring_index(F.col("shingle"), " ", 1)), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        .alias("__pf"),
    )
    bg_counts = keyed.groupBy("__bg").agg(F.count(F.lit(1)).alias("__c_bg"))
    pf_counts = keyed.groupBy("__pf").agg(F.count(F.lit(1)).alias("__c_pf"))
    scored = (
        keyed.join(bg_counts, "__bg")
        .join(pf_counts, "__pf")
        .select(
            "id",
            F.floor(
                F.lit(1000000.0) * F.col("__c_bg") / F.col("__c_pf")
            ).alias("__ppm"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("__ppm").alias("lm_score_ppm"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str, *, top_k: int = 20
) -> DataFrame:
    """The first step of BPE tokenizer training: corpus-wide frequency
    of adjacent character pairs inside words — (pair, n_pairs).  The
    highest-count pair is the first merge a byte-pair encoder would
    learn; iterating (merge, recount) yields the full vocabulary, and
    each iteration is exactly this aggregation, so the one-step operator
    is the scalable substrate.

    Words are lowercase letter runs (``[a-z]+``); single-letter words
    carry no pair.  The per-word pair expansion happens entirely inside
    codegen (regexp_extract_all → transform/sequence/substring →
    flatten) — one explode, one count shuffle on short-string keys,
    then a deterministic top-k: ties broken by pair text, so the
    result is a total order and LIMIT is well-defined on both engines.
    """
    pairs = ensure_parallel(df).select(
        F.explode(
            F.flatten(
                F.expr(
                    f"transform("
                    f"  filter(regexp_extract_all(lower({text_col}),"
                    f"         '[a-z]+', 0), w -> length(w) >= 2),"
                    f"  w -> transform(sequence(1, length(w) - 1),"
                    f"       i -> substring(w, i, 2)))"
                )
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), F.col("pair").asc())
        .limit(top_k)
    )


def filter_funnel(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    *,
    min_alpha_ratio: float = 0.6,
    min_words: int = 5,
    max_avg_word_len: float = 15.0,
    max_dup_2gram: float = 0.5,
) -> DataFrame:
    """One-pass corpus-curation funnel report: per group (source/domain),
    how many documents survive each successive quality gate —
    (group, n_total, n_charset, n_length, n_final).

    The gates are the fused single-projection forms of
    ``charset_quality`` (alpha mass), ``quality_score`` (length and
    word-shape), and ``repetition_stats`` (duplicate 2-gram fraction):
    every pipeline publishes exactly this funnel to show where its
    corpus went, and fusing the three gate expressions into one
    projection means ONE scan and ONE k-row aggregate instead of three
    operator passes joined on id — at 100 TB the difference between one
    pass over the corpus and four.

    Cumulative semantics: a document counts toward ``n_length`` only if
    it also passed the charset gate, matching how the sequential filter
    chain actually discards data.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    g_charset = (
        n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))
        >= F.lit(min_alpha_ratio)
    )
    ws = F.split(text, " ")
    n_words = F.size(ws)
    avg_word_len = (n_chars - (n_words - 1)).cast("double") / n_words
    g_length = (n_words >= F.lit(min_words)) & (
        avg_word_len <= F.lit(max_avg_word_len)
    )
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - 1,"
        f" 1)), i -> concat_ws(' ', slice(split({text_col}, ' '), i, 2)))"
    )
    n2 = F.size(grams)
    d2 = F.size(F.array_distinct(grams))
    dup_frac = F.when(
        n_words < 2, F.lit(0.0)
    ).otherwise((n2 - d2).cast("double") / n2)
    g_rep = dup_frac <= F.lit(max_dup_2gram)
    gated = df.select(
        F.col(group_col).alias("grp"),
        g_charset.cast("int").alias("__c1"),
        (g_charset & g_length).cast("int").alias("__c2"),
        (g_charset & g_length & g_rep).cast("int").alias("__c3"),
    )
    return gated.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("__c1").cast("long").alias("n_charset"),
        F.sum("__c2").cast("long").alias("n_length"),
        F.sum("__c3").cast("long").alias("n_final"),
    )


def linear_quality_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_features: int = 100003,
    threshold_units: int = 0,
) -> DataFrame:
    """Hashed-feature linear classifier scoring: (id, score_units, keep).

    The fasttext-style quality gate a curation pipeline runs over every
    document: tokens hash into a fixed feature space, each feature
    carries a learned integer weight, and the document score is the sum
    of its tokens' weights.  Entirely map-only codegen — tokenize,
    hash, fold — so scoring cost is one corpus scan at any scale; in a
    real deployment the weight table is a broadcast ``array<int>``
    indexed by ``feature_id`` (dimension-sized, never shuffled).  Here
    the weights are a deterministic hash of the feature id itself
    (``w = (feature_id * 31 + 7) % 1001 - 500``, an integer in
    [-500, 500]) so both engines materialize the identical "model"
    without a trained artifact, and integer sums make the score
    order-free and engine-exact.  Scores are kept in raw units
    (sigmoid/scaling is monotone — the gate only needs the sign side
    of ``threshold_units``)."""
    feat = (
        f"cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint)"
        f" % {n_features}"
    )
    # NULL text scores 0 (gate says drop), matching the oracle's
    # LEFT-JOIN + COALESCE shape — split(NULL) would otherwise propagate
    # NULL through the fold.
    score = F.coalesce(
        F.expr(
            f"aggregate(split({text_col}, ' '), cast(0 as bigint), "
            f"(acc, w) -> acc + (({feat}) * 31 + 7) % 1001 - 500)"
        ),
        F.lit(0).cast("bigint"),
    )
    return df.select(
        F.col(id_col).alias("id"),
        score.alias("score_units"),
        (score > F.lit(threshold_units)).cast("int").alias("keep"),
    )


def html_extract_text(
    df: DataFrame,
    id_col: str,
    html_col: str,
    *,
    drop_tags: tuple = (
        "script", "style", "noscript", "template",
        "nav", "header", "footer", "aside",
    ),
) -> DataFrame:
    """HTML → main text: the extraction step between crawl ingestion
    (WARC) and text curation — what trafilatura/justext do in
    production pipelines, here as a deterministic stdlib
    ``html.parser`` implementation so the behavior is exactly
    specified and oracle-checkable:

    * contents of ``drop_tags`` are removed entirely — the semantic
      chrome tags (nav/header/footer/aside) plus code payloads
      (script/style), the standard first-order boilerplate cut;
    * comments and entity references are handled by the parser
      (entities unescaped to their characters);
    * text from remaining BLOCK elements is separated by single
      newlines, inline markup (``<b>``, ``<a>``, …) joins without a
      break, and runs of whitespace collapse to one space —
      whitespace-exact output, so equality checks are meaningful;
    * the ``<title>`` text is surfaced as its own column.

    Returns (id, title, text, n_chars).  Arrow-batched ``mapInPandas``
    — one parser instance per document, bounded memory, map-only plan
    (no shuffle).  Malformed HTML never raises: ``html.parser`` is a
    recovering tokenizer by design, matching crawl reality."""
    _BLOCK = {
        "p", "div", "article", "section", "main", "li", "ul", "ol",
        "table", "tr", "h1", "h2", "h3", "h4", "h5", "h6", "br",
        "blockquote", "pre", "body",
    }

    def extract(payload: str) -> tuple:
        from html.parser import HTMLParser

        class _X(HTMLParser):
            def __init__(self) -> None:
                super().__init__(convert_charrefs=True)
                self.skip = 0
                self.in_title = False
                self.title: list = []
                self.parts: list = []

            def handle_starttag(self, tag, attrs):
                if tag in drop_tags:
                    self.skip += 1
                elif tag == "title":
                    self.in_title = True
                elif tag in _BLOCK:
                    self.parts.append(None)  # block boundary marker

            def handle_endtag(self, tag):
                if tag in drop_tags:
                    self.skip = max(0, self.skip - 1)
                elif tag == "title":
                    self.in_title = False
                elif tag in _BLOCK:
                    self.parts.append(None)

            def handle_data(self, data):
                if self.in_title:
                    self.title.append(data)
                elif not self.skip:
                    self.parts.append(data)

        x = _X()
        x.feed(payload or "")
        x.close()
        import re as _re

        # segments between block boundaries; whitespace WITHIN a
        # segment (including source newlines) collapses to one space —
        # only block structure produces line breaks
        lines = []
        buf: list = []
        for part in x.parts + [None]:
            if part is None:
                collapsed = _re.sub(r"\s+", " ", "".join(buf)).strip()
                if collapsed:
                    lines.append(collapsed)
                buf = []
            else:
                buf.append(part)
        text = "\n".join(lines)
        title = _re.sub(r"\s+", " ", "".join(x.title)).strip()
        return title, text

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for i, h in zip(pdf[id_col], pdf[html_col]):
                title, text = extract(h)
                rows.append((int(i), title, text, len(text)))
            yield pd.DataFrame(
                rows, columns=["id", "title", "text", "n_chars"]
            )

    return df.select(id_col, html_col).mapInPandas(
        batches, schema="id long, title string, text string, n_chars long"
    )


def bpe_apply(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list,
) -> DataFrame:
    """Apply a trained BPE merge table — REAL tokenization, not the
    whitespace proxy: words (whitespace-split) start as character
    sequences, and merges apply in RANK ORDER (the training order,
    lowest rank first), each pass fusing every non-overlapping
    occurrence of its pair left-to-right, until no listed pair remains
    adjacent.  This is the encode loop of Sennrich et al.'s BPE — the
    step between ``bpe_pair_counts`` (which trains the table) and
    token-budget accounting with a REAL tokenizer.

    CANONICAL loop semantics (subword-nmt / GPT-2 encoder): repeatedly
    find the LOWEST-RANK pair currently adjacent anywhere in the word,
    merge all its non-overlapping occurrences left-to-right, and
    re-evaluate — so an early-rank merge fires even when a later-rank
    merge is what created its pair (pinned by test).

    Returns (id, n_tokens, n_merges): token count after merging and
    the number of merge operations applied (n_tokens = non-whitespace
    chars − n_merges, an invariant the tests pin).  The merge table is
    a plain Python list baked into the closure — model state ships
    with the task like every broadcast-dict operator here; for ≫10⁵
    merges move the table to a broadcast variable.  Arrow-batched
    ``mapInPandas``, map-only plan."""
    rank = {tuple(p): i for i, p in enumerate(merges)}

    def encode_word(word: str) -> tuple:
        syms = list(word)
        applied = 0
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, syms[i], syms[i + 1])
            if best is None:
                break
            _, a, b = best
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    applied += 1
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms), applied

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                n_tokens = 0
                n_merges = 0
                for w in (t or "").split():
                    nt, nm = encode_word(w)
                    n_tokens += nt
                    n_merges += nm
                rows.append((int(i), n_tokens, n_merges))
            yield pd.DataFrame(
                rows, columns=["id", "n_tokens", "n_merges"]
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, schema="id long, n_tokens long, n_merges long"
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 8,
    max_words: int = 2000,
    batch_m: int = 1,
    round_log: list | None = None,
) -> DataFrame:
    """Train a BPE merge table over a corpus — the full iterative loop
    (Sennrich et al., ACL '16), not just one round of pair counts.

    Distributed shape per round (× ``n_merges``):

    1. adjacent-pair counts over the word-frequency table — one
       map-side ``arrays_zip`` explode + one hash aggregate;
    2. the argmax pair (count DESC, then lexicographic left/right —
       a total order, so ties cannot float between engines) comes to
       the driver: ONE row per round, the k-means "bounded model
       state" pattern;
    3. the merge applies map-only via the piped-string trick: symbols
       render as ``|a||b||c|``, the pair as the substring
       ``|a||b|`` → ``|ab|``, and builtin ``replace`` (left-to-right,
       non-overlapping in BOTH Spark and DuckDB) IS the greedy BPE
       merge semantics; re-split on ``||`` restores the symbol array.

    The working frame (≤ ``max_words`` rows after the deterministic
    top-k cut) is lazily local-checkpointed each round so round *k*
    costs one pass over it, not *k* re-derivations.  Output: one row
    per learned merge (merge_rank, lhs, rhs, merged, pair_count) — exact
    BIGINT counts, fully hash-checkable against a twin replaying the
    identical rounds.

    Deviation from subword-nmt: no ``</w>`` end-of-word marker (the
    fixture words are whitespace-pretokenized already); symbols are
    restricted to ``[a-z]`` by the pre-clean so the ``|`` sentinel
    can never collide.

    ``batch_m > 1`` is the SCALE path: each count pass commits up to
    ``batch_m`` merges instead of one, so a 32k-merge vocabulary costs
    ~32k/m scheduler round-trips instead of 32k (m=256 → 125 rounds).
    Selection per round: take candidate pairs in the same total order
    (count DESC, l, r) and greedily accept each whose symbols are
    DISJOINT from every symbol (lhs, rhs, and merged output) of the
    pairs already accepted this round.  Merging a pair never creates
    or destroys an adjacency between two symbols it doesn't contain,
    so the accepted pairs' counts are exact under each other's
    application and the merges commute — the batch applies in rank
    order as one map-only select.

    Equivalence contract (law-tested): batched == sequential whenever
    additionally no pair INVOLVING a token minted earlier in the same
    batch out-counts a later batch member at its commit point (e.g.
    trivially: corpora whose words never exceed 2 symbols mint no new
    pairs; more generally, well-separated count strata).  On natural
    corpora a freshly minted token's pairs can overtake a later batch
    member, so batched ranks may locally reorder relative to
    sequential — the standard fast-BPE approximation; the sequential
    path (``batch_m=1``, the default) remains the registry contract.
    """
    # validate before any plan is built; bool is an int subclass, so
    # batch_m=True would otherwise pass >=1 and silently mean 1
    if isinstance(batch_m, bool) or not isinstance(batch_m, int):
        raise TypeError(f"batch_m must be an int, got {batch_m!r}")
    if batch_m < 1:
        raise ValueError(f"batch_m must be >= 1, got {batch_m}")
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(
                F.split(
                    F.regexp_replace(
                        F.lower(F.col(text_col)), "[^a-z ]", " "
                    ),
                    " +",
                )
            ).alias("w")
        )
        .filter(F.length("w").between(2, 12))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("w"))
        .limit(max_words)
        .select(F.split("w", "").alias("syms"), "freq")
        .localCheckpoint(eager=False)
    )

    # optional instrumentation: appends (pass_index, merges_committed,
    # seconds) per distributed count pass when a list is supplied —
    # this is how the ~merges/batch_m round-trip amortization claim is
    # measured at scale without touching the training semantics
    merges = []
    while len(merges) < n_merges:
        _t0 = _time.monotonic()
        _before = len(merges)
        want = min(batch_m, n_merges - len(merges))
        n = F.size("syms")
        # Over-fetch 4x: conflicting candidates are skipped, so the
        # top-`want` disjoint pairs may sit below position `want`.
        # Under-filled batches are correct (the next count pass sees
        # the post-merge table), just one extra round-trip.
        top = (
            words.filter(n >= 2)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, n - 1).alias("l"),
                        F.slice("syms", 2, n - 1).alias("r"),
                    )
                ).alias("z"),
            )
            .groupBy(
                F.col("z.l").alias("l"), F.col("z.r").alias("r")
            )
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
            .limit(max(4 * want, 16) if batch_m > 1 else 1)
            .collect()
        )
        if not top:
            break
        used: set = set()
        batch = []
        for row in top:
            if len(batch) >= want:
                break
            l, r = row["l"], row["r"]
            # reject on ANY symbol contact with an earlier accept —
            # including its minted output, whose later-round identity
            # must come from a recount, not an in-batch replace
            if {l, r, l + r} & used:
                continue
            used |= {l, r, l + r}
            batch.append((l, r, int(row["c"])))
        # the first candidate is always accepted (`used` starts empty),
        # so a non-empty `top` guarantees a non-empty batch
        assert batch, "greedy selection accepts top[0] unconditionally"
        expr = F.concat(
            F.lit("|"), F.array_join("syms", "||"), F.lit("|")
        )
        for l, r, c in batch:
            merges.append((len(merges), l, r, l + r, c))
            expr = F.replace(
                expr, F.lit(f"|{l}||{r}|"), F.lit(f"|{l}{r}|")
            )
        words = words.select(
            F.split(F.btrim(expr, F.lit("|")), "\\|\\|").alias("syms"),
            "freq",
        ).localCheckpoint(eager=False)
        if round_log is not None:
            round_log.append(
                (len(round_log), len(merges) - _before,
                 _time.monotonic() - _t0)
            )

    return spark.createDataFrame(
        merges,
        schema=(
            "merge_rank int, lhs string, rhs string,"
            " merged string, pair_count bigint"
        ),
    )
