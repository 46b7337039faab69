"""Deduplication operators for large-scale text corpora (SURVEY §2.2.10).

Four tiers, all composed from DataFrame primitives (no custom Catalyst
rules, no driver-side loops):

1. ``exact_dedup``            — hash-groupBy on content (one shuffle).
2. ``jaccard_similar_pairs``  — n-gram Jaccard via shingle explode +
   self-join.  The verification tier: exact when uncapped, quadratic in
   the worst case; the default shingle-frequency cap prunes that to a
   warned, documented lower bound.
3. ``minhash_signatures`` / ``lsh_candidate_pairs`` — MinHash+LSH: the
   100 TB path.  Cost is linear in corpus size: shingle → signature is a
   map-side aggregation; banding turns all-pairs comparison into an
   equality join on band keys.
4. ``simhash64``              — 64-bit SimHash fingerprints; near-dup
   lookup by hamming distance over band-exact matches.

Cross-engine determinism: every hash derives from md5 (identical
everywhere) — shingle hash = first 8 md5 hex digits as int64, MinHash
permutations are fixed-coefficient affine maps mod a prime.  A DuckDB
oracle can replay the exact same integers (see queries/llm.py).

Reference parity note: the reference system has no dedup of any kind
(/root/reference/dpp.py — no such operator exists in the file); this
module implements the north-star extension declared in SURVEY §2.2.10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import ensure_parallel, swap_cache

__all__ = [
    "MINHASH_PRIME",
    "BloomSketch",
    "build_bloom",
    "bloom_member",
    "duplicated_substring_spans",
    "exact_dedup",
    "incremental_dedup",
    "containment_pairs",
    "hamming_near_pairs",
    "jaccard_similar_pairs",
    "lsh_candidate_pairs",
    "minhash_coefficients",
    "minhash_signatures",
    "near_dedup_minhash",
    "simhash64",
    "word_shingles",
]

MINHASH_PRIME = 1_000_000_007


def _bq(name: str) -> str:
    """Backtick-quote an identifier for interpolation into SQL text.

    Embedded backticks are doubled, so a hostile/unlucky column name
    cannot break out of the quoting — string-safe like the ``F.col``
    forms these SQL-text builders replaced (ADVICE r11)."""
    return "`" + name.replace("`", "``") + "`"


def minhash_coefficients(num_hashes: int) -> list[tuple[int, int]]:
    """Fixed affine coefficients (a, b) for the MinHash permutations.

    Deterministic LCG (no RNG import, reproducible in SQL by listing the
    constants); a must be nonzero mod the prime.
    """
    coeffs = []
    state = 88172645463325252
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = (state % (MINHASH_PRIME - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % MINHASH_PRIME
        coeffs.append((a, b))
    return coeffs


def exact_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    by_hash: bool = True,
) -> DataFrame:
    """Exact dedup: one row per distinct content, keeping the smallest id.

    Grouping on ``md5(text)`` keeps shuffle rows narrow (32 bytes instead
    of document bodies) — at 100 TB the difference between shuffling 100 TB
    and shuffling ~3 GB of digests.  Collision probability at 10^12 docs is
    ~10^-14; use ``by_hash=False`` to group on raw content instead.

    Returns (content_key, keep_id, n_copies).
    """
    key = f"md5({_bq(text_col)})" if by_hash else _bq(text_col)
    # one sql() statement per build (bench path; see near_dedup_minhash)
    return df.sparkSession.sql(
        f"""
        SELECT {key} AS content_key,
               min({_bq(id_col)}) AS keep_id,
               count(1) AS n_copies
        FROM {{df}} GROUP BY {key}
        """,
        df=df,
    )


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct n-word shingles per document: (id, shingle).

    Built with JVM-side higher-order functions (split / sequence /
    transform / slice) — the shingle expansion never leaves codegen.  The
    text is split ONCE per document (``ws`` projection), not once per
    shingle inside the lambda.
    """
    return (
        _shingle_arrays(df, id_col, text_col, n)
        .select("id", F.explode("__sh_arr").alias("shingle"))
    )


def _shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, __sh_arr): per-document DISTINCT shingle array, map-side only.

    ``array_distinct`` inside the projection replaces a global
    ``.distinct()`` on the exploded (id, shingle) table — shingle
    uniqueness is per-document, so deduping inside the array removes an
    entire corpus-wide shuffle from every consumer.
    """
    # greatest(..., 1): a doc shorter than n words yields itself as its one
    # shingle.  The floor must be 1, not 0 — Spark's sequence(1, 0) counts
    # DOWN to [1, 0] and slice(_, 0, n) then throws, whereas the DuckDB
    # oracle's generate_series(1, 0) is empty.
    # selectExpr (string batch, one py4j round trip per projection)
    # instead of Column algebra: plan construction is pure driver-side
    # socket chatter — guide §4, the Python boundary exists at build
    # time too (measured: ~1250 round trips per near_dedup build before
    # the batching, ~0.39 s of the bench's per-run cost).
    words = ensure_parallel(df).selectExpr(
        f"{_bq(id_col)} AS id", f"split({_bq(text_col)}, ' ') AS __ws"
    )
    return words.selectExpr(
        "id",
        f"array_distinct(transform("
        f"sequence(1, greatest(size(__ws) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(__ws, i, {n})))) AS __sh_arr",
    )


def _shingle_hash() -> F.Column:
    """int64 hash of a shingle derived from md5 — engine-portable."""
    return F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast(
        "long"
    )


# Same hash as ``_shingle_hash`` but as a SQL lambda body over an array
# element, so signatures can be computed per-document inside codegen.
_HASH_LAMBDA = "cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint)"


def jaccard_similar_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """n-gram Jaccard similarity pairs: (id_a, id_b, n_common, n_a,
    n_b, jaccard) with id_a < id_b and jaccard ≥ threshold.

    EXACT when ``max_shingle_freq=None``; otherwise a guaranteed LOWER
    BOUND (see below).  Scale posture: the self-join explodes on
    shingle frequency f as O(f²) — ``max_shingle_freq`` drops
    stop-shingles above the cap (standard prefix-filtering practice).
    The default cap (1000) makes the quadratic footgun opt-IN: pass
    ``max_shingle_freq=None`` explicitly for the uncapped exact answer
    (verifier tier on small / pre-filtered inputs only).

    Capped semantics: ``n_a`` / ``n_b`` are computed BEFORE the cap
    (exact per-document shingle counts), while ``n_common`` counts only
    surviving shingles — so reported ``jaccard`` is a strict lower
    bound on the true value (never a false positive over the
    threshold), but pairs whose overlap lives in dropped stop-shingles
    can be missed entirely, and a document duplicated more than the cap
    times loses ALL its shingles and vanishes from the output (a
    RuntimeWarning is emitted whenever the cap is active).  On corpora
    where no shingle exceeds the cap the result is exactly the uncapped
    one (law-pinned in tests/test_llm_ops.py).  For full-corpus dedup
    at scale prefer ``near_dedup_minhash`` and use this as the verifier
    on its candidate pairs.
    """
    sh = word_shingles(df, id_col, text_col, n)
    sizes = None
    if max_shingle_freq is not None:
        import warnings

        warnings.warn(
            f"jaccard_similar_pairs: max_shingle_freq={max_shingle_freq}"
            " is active — shingles shared by more than that many"
            " documents are excluded, so reported jaccard is a lower"
            " bound and documents duplicated above the cap are dropped"
            " entirely; pass max_shingle_freq=None for the exact"
            " (quadratic) answer",
            RuntimeWarning,
            stacklevel=2,
        )
        # Exact per-doc sizes BEFORE the cap: with an undercounted
        # n_common and exact n_a/n_b, jaccard = c/(a+b-c) is a strict
        # lower bound — capping can only MISS pairs, never promote one
        # over the threshold.
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
        freq_w = Window.partitionBy("shingle")
        sh = sh.withColumn("__f", F.count(F.lit(1)).over(freq_w)).filter(
            F.col("__f") <= max_shingle_freq
        ).drop("__f")
    return _jaccard_from_shingles(sh, threshold=threshold, sizes=sizes)


def _jaccard_from_shingles(
    sh: DataFrame,
    *,
    threshold: float,
    candidates: DataFrame | None = None,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over a (id, shingle) table.

    ``candidates=None`` → all-pairs via shingle self-join (quadratic in
    shingle frequency).  With a (id_a, id_b) ``candidates`` frame, the
    intersection is counted ONLY for those pairs: candidates ⋈ shingles of
    id_a ⋈ shingles of id_b — linear in |candidates| × shingles-per-doc,
    which is what makes LSH-then-verify the 100 TB path.

    ``sizes``: optional pre-computed (id, n_sh) frame — pass when ``sh``
    has been frequency-capped so n_a/n_b stay exact and the reported
    jaccard is a lower bound instead of a both-ways-biased estimate.
    """
    if sizes is None:
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))

    if candidates is None:
        a = sh.select(F.col("id").alias("id_a"), "shingle")
        b = sh.select(F.col("id").alias("id_b"), "shingle")
        common = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        a = sh.select(F.col("id").alias("id_a"), "shingle")
        b = sh.select(F.col("id").alias("id_b"), "shingle")
        common = (
            candidates.join(a, "id_a")
            .join(b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    sa = sizes.select(
        F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")
    )
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signatures: (id, s0..s{k-1}).

    One shuffle (groupBy id); the k permutations are computed as k
    parallel MIN aggregates over the shingle hashes — map-side partials
    shrink each document to k int64s before the shuffle.
    """
    arrs = _shingle_arrays(df, id_col, text_col, n)
    return _signatures_from_arrays(arrs, num_hashes=num_hashes).drop(
        "__sh_arr"
    )


def _signatures_from_arrays(
    arrs: DataFrame, *, num_hashes: int
) -> DataFrame:
    """Append s0..s{k-1} to a (id, __sh_arr) frame — ZERO shuffles.

    Each signature is ``array_min`` over a hashed-and-permuted copy of the
    per-document shingle array, entirely inside whole-stage codegen.  The
    md5 runs once per shingle (``__h_arr``), not once per permutation.
    The equivalent explode → groupBy(id) → k×MIN formulation costs a
    corpus-wide shuffle; this one costs nothing beyond the scan."""
    hashed = arrs.selectExpr(
        "*", f"transform(__sh_arr, x -> {_HASH_LAMBDA}) AS __h_arr"
    )
    sigs = [
        f"array_min(transform(__h_arr,"
        f" h -> (h * {a}L + {b}L) % {MINHASH_PRIME}L)) AS s{i}"
        for i, (a, b) in enumerate(minhash_coefficients(num_hashes))
    ]
    return hashed.selectExpr("id", "__sh_arr", *sigs)


def _band_explode_sql(
    sig_cols: list[str], bands: int, rows_per_band: int
) -> str:
    """`explode(array(<band keys>)) AS band_key` SQL snippet — one band
    key per band, exploded in a single pass, NOT a union of per-band
    frames (which would put `bands` copies of the upstream signature
    subtree into the plan and re-aggregate it per band)."""
    keys = []
    for bi in range(bands):
        cols = sig_cols[bi * rows_per_band : (bi + 1) * rows_per_band]
        casts = ", ".join(f"cast(`{c}` as string)" for c in cols)
        keys.append(f"concat_ws(':', '{bi}', {casts})")
    return f"explode(array({', '.join(keys)})) AS band_key"


def lsh_candidate_pairs(
    signatures: DataFrame,
    *,
    bands: int = 4,
    rows_per_band: int = 4,
    max_band_freq: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become
    candidate pairs (id_a < id_b, distinct).

    The all-pairs problem becomes ``bands`` equality self-joins on a
    narrow band-key column — at scale each is a shuffle on a well-
    distributed key, and the union dedups candidates.

    ``max_band_freq`` guards the degenerate-bucket blowup: a band value
    shared by B documents emits B² candidate pairs, so one pathological
    bucket (e.g. every empty document has the identical signature)
    silently re-creates the all-pairs join this operator exists to
    avoid.  Buckets above the cap are dropped entirely — the same
    prefix-filtering tradeoff as ``max_shingle_freq``: a bucket that
    hot is a degenerate value, not a plausible near-dup cluster, and
    candidate volume stays ≤ bands · max_band_freq² per bucket.
    """
    sig_cols = [c for c in signatures.columns if c != "id"]
    if len(sig_cols) != bands * rows_per_band:
        raise ValueError(
            f"{len(sig_cols)} signature columns != bands*rows_per_band"
        )
    all_bands = signatures.selectExpr(
        "id", _band_explode_sql(sig_cols, bands, rows_per_band)
    )
    if max_band_freq is not None:
        # Window count over band_key: one shuffle on the same key the
        # self-join below shuffles on.  The count itself is memory-light
        # even on the hot bucket — rows stream through, only the tally
        # lives per partition.
        freq_w = Window.partitionBy("band_key")
        all_bands = (
            all_bands.withColumn("__bf", F.count(F.lit(1)).over(freq_w))
            .filter(F.col("__bf") <= max_band_freq)
            .drop("__bf")
        )
    a = all_bands.selectExpr("id AS id_a", "band_key")
    b = all_bands.selectExpr("id AS id_b", "band_key")
    return (
        a.join(b, "band_key")
        .filter("id_a < id_b")
        .select("id_a", "id_b")
        .distinct()
    )


def near_dedup_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_band_freq: int | None = None,
    cache_signatures: bool = False,
) -> DataFrame:
    """The scale path end-to-end: MinHash → LSH candidates → exact-Jaccard
    verification of candidates only.  Returns verified (id_a, id_b,
    jaccard ≥ threshold) pairs.

    The (id, shingle-array) frame feeds the band keys once and the
    verification joins twice.  Everything up to the band self-join is
    map-side (per-document arrays + ``array_min`` signatures, no
    explode/groupBy); verification is ``array_intersect`` on the two
    candidate docs' arrays — so the only shuffles in the whole pipeline
    are the band-key self-join, the candidate distinct, and the two
    id-keyed array lookups, each linear in corpus + candidate volume.
    ``max_band_freq`` caps degenerate LSH buckets (see
    :func:`lsh_candidate_pairs`).

    ``cache_signatures``: by default the signature lineage RECOMPUTES
    for each of its three consumers — it is a map-only pipeline over
    the scan, and guide-§5 arithmetic favors recompute at the 100 TB
    design point (persisting shingle arrays means materializing a
    dataset at least as large as the corpus into storage memory/disk,
    evicting execution memory, where recompute costs two extra scans
    of codegen'd string work).  Measured at sf0.1 the no-persist form
    is also ~8% faster end-to-end (r11 A/B, 7-run medians 0.767 s vs
    0.833 s) because each call otherwise pays a cache write of the fat
    array column.  Pass ``cache_signatures=True`` for mid-size corpora
    that are reused interactively; the persisted frame then occupies
    the single-slot cache tag ``near_dedup_minhash.sigs``
    (``_util.swap_cache`` — the next call unpersists it, bounding
    leaked blocks, the round-2 failure mode) and is attached as
    ``result.sig_cache`` for early release.
    """
    arrs = _shingle_arrays(df, id_col, text_col, n)
    sigs = _signatures_from_arrays(arrs, num_hashes=num_hashes)
    if cache_signatures:
        sigs = swap_cache("near_dedup_minhash.sigs", sigs)
    # Everything downstream of the signature frame is ONE sql() call:
    # classic DataFrames run the Catalyst analyzer EAGERLY on every
    # transformation over the whole accumulated tree, so the previous
    # ~15-op chain paid ~15 analyzer passes + py4j round trips per
    # build (~0.23 s of driver time per bench run, guide §4 applied to
    # plan construction).  A single statement is parsed and analyzed
    # once; {sigs} resolves to the SAME persisted frame everywhere it
    # appears, so the cache hits are unchanged, as is the physical
    # shape (band self-join → distinct → two id-keyed lookups).
    sig_cols = [c for c in sigs.columns if c not in ("id", "__sh_arr")]
    band_src = f"SELECT id, {_band_explode_sql(sig_cols, bands, num_hashes // bands)} FROM {{sigs}}"
    if max_band_freq is not None:
        # window count over band_key: one shuffle on the same key the
        # self-join below shuffles on; rows stream through, only the
        # tally lives per partition even on the hot bucket.
        band_src = (
            f"SELECT id, band_key FROM ("
            f"SELECT id, band_key,"
            f" count(1) OVER (PARTITION BY band_key) AS __bf"
            f" FROM ({band_src})) WHERE __bf <= {int(max_band_freq)}"
        )
    result = df.sparkSession.sql(
        f"""
        WITH bands AS ({band_src}),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bands a JOIN bands b USING (band_key)
          WHERE a.id < b.id
        ),
        scored AS (
          SELECT c.id_a, c.id_b,
                 size(array_intersect(sa.__sh_arr, sb.__sh_arr)) AS n_common,
                 size(sa.__sh_arr) AS __na, size(sb.__sh_arr) AS __nb
          FROM cand c
          JOIN {{sigs}} sa ON sa.id = c.id_a
          JOIN {{sigs}} sb ON sb.id = c.id_b
        )
        SELECT id_a, id_b,
               n_common / (__na + __nb - n_common) AS jaccard
        FROM scored
        WHERE n_common / (__na + __nb - n_common)
              >= CAST({threshold!r} AS DOUBLE)
        """,
        sigs=sigs,
    )
    result.sig_cache = sigs  # caller releases in long-lived sessions
    return result


def simhash64(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """64-bit SimHash fingerprint per document: (id, simhash_hi, simhash_lo).

    Token hash = two 32-bit halves of md5 (engine-portable); each output
    bit is the sign of the sum of per-token ±1 votes.  All 64 bit-votes are
    computed as one groupBy with 64 SUM aggregates — single shuffle,
    entirely JVM-side.
    """
    # ONE sql() statement for the whole 64-aggregate tree (guide §4 at
    # plan-construction time, same treatment minhash got in opt 1): the
    # previous Column-algebra form built 64 SUM(CASE...) aggregates plus
    # two 32-deep `+` chains one py4j call at a time and re-ran the
    # eager analyzer per chained op — ~0.8 s of pure driver build per
    # call.  The SQL text is the same integer arithmetic (votes, sign
    # tests, power-of-two reconstruction), so every value — and the
    # oracle hash — is unchanged.
    words = ensure_parallel(df).selectExpr(
        f"{_bq(id_col)} AS id",
        f"explode(split({_bq(text_col)}, ' ')) AS w",
    ).selectExpr("id", "md5(w) AS md")
    votes = ", ".join(
        f"sum(CASE WHEN (shiftright({h}, {bit}) & 1) = 1 THEN 1 ELSE -1 END)"
        f" AS v_{h}_{bit}"
        for bit in range(32)
        for h in ("hi", "lo")
    )
    # every term a BIGINT literal (`L` suffix): with INT literals the
    # left-associative sum of bits 0..30 reaches exactly INT_MAX before
    # the 2^31 term widens the chain — zero headroom, and any reordering
    # of the terms would overflow under ANSI mode (ADVICE r11)
    recon = {
        h: " + ".join(
            f"(CASE WHEN v_{h}_{b} > 0 THEN {2 ** b}L ELSE 0L END)"
            for b in range(32)
        )
        for h in ("hi", "lo")
    }
    return df.sparkSession.sql(
        f"""
        SELECT id,
               cast({recon['hi']} as bigint) AS simhash_hi,
               cast({recon['lo']} as bigint) AS simhash_lo
        FROM (
          SELECT id, {votes}
          FROM (
            SELECT id,
                   cast(conv(substring(md, 1, 8), 16, 10) as bigint) AS hi,
                   cast(conv(substring(md, 9, 8), 16, 10) as bigint) AS lo
            FROM {{words}}
          )
          GROUP BY id
        )
        """,
        words=words,
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance:
    (id_a, id_b, hamming) with id_a < id_b and hamming ≤ ``max_hamming``.

    The pigeonhole blocking that makes this linear-ish at 100 TB: split
    the 64-bit fingerprint into 4 16-bit bands — any two fingerprints
    within hamming distance 3 agree EXACTLY on at least one band (3 bit
    flips can dirty at most 3 of the 4 bands).  Candidates are pairs
    sharing any (band index, band value) key — one equality self-join on
    a narrow int key, never all-pairs — then verified with
    ``bit_count(a XOR b)``, all in codegen.  ``max_hamming`` must stay
    ≤ 3 for 4 bands to be a complete cover (k+1 bands cover distance k).

    ``max_band_freq`` is the same degenerate-bucket guard as
    ``lsh_candidate_pairs``: a band value shared by B docs emits B²
    candidates, so hot buckets (e.g. all-zero fingerprints from empty
    docs) are dropped above the cap.
    """
    fp = simhash64(df, id_col, text_col)
    return hamming_near_pairs(
        fp,
        max_hamming=max_hamming,
        max_band_freq=max_band_freq,
    )


def hamming_near_pairs(
    fp: DataFrame,
    *,
    id_col: str = "id",
    hi_col: str = "simhash_hi",
    lo_col: str = "simhash_lo",
    max_hamming: int = 3,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Generic 64-bit-fingerprint near-pair join by 4×16-bit pigeonhole
    banding — the blocking engine behind :func:`simhash_near_pairs`
    (text) and ``multimodal.ahash_near_pairs`` (images): any fingerprint
    kind with a (hi, lo) 32-bit-half representation gets linear-ish
    hamming pairing from the same code path."""
    if max_hamming > 3:
        raise ValueError(
            "4-band pigeonhole blocking only covers hamming <= 3; "
            f"got max_hamming={max_hamming}"
        )
    # ONE sql() statement for the banding + self-join + verify tail
    # (guide §4 at plan-construction time; same batching simhash64 and
    # the minhash verify got).  Band keys fold the band index into the
    # high bits of one narrow int64 join key; arithmetic is identical
    # to the Column form this replaces, so values and hashes are
    # unchanged.  4 × 16-bit bands: hi >> 16, hi & 0xFFFF, lo >> 16,
    # lo & 0xFFFF.
    fp = fp.select(
        F.col(id_col).alias("id"),
        F.col(hi_col).alias("simhash_hi"),
        F.col(lo_col).alias("simhash_lo"),
    )
    band_vals = [
        "(shiftright(simhash_hi, 16) & 65535)",
        "(simhash_hi & 65535)",
        "(shiftright(simhash_lo, 16) & 65535)",
        "(simhash_lo & 65535)",
    ]
    keys = ", ".join(
        f"({i} * 65536) + {v}" for i, v in enumerate(band_vals)
    )
    keyed_src = (
        "SELECT id, simhash_hi, simhash_lo,"
        f" explode(array({keys})) AS band_key FROM {{fp}}"
    )
    if max_band_freq is not None:
        keyed_src = (
            "SELECT id, simhash_hi, simhash_lo, band_key FROM ("
            "SELECT *, count(1) OVER (PARTITION BY band_key) AS __bf"
            f" FROM ({keyed_src})) WHERE __bf <= {int(max_band_freq)}"
        )
    return fp.sparkSession.sql(
        f"""
        WITH keyed AS ({keyed_src}),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                 a.simhash_hi AS hi_a, a.simhash_lo AS lo_a,
                 b.simhash_hi AS hi_b, b.simhash_lo AS lo_b
          FROM keyed a JOIN keyed b USING (band_key)
          WHERE a.id < b.id
        )
        SELECT id_a, id_b, hamming FROM (
          SELECT id_a, id_b,
                 cast(bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)
                      as bigint) AS hamming
          FROM cand
        ) WHERE hamming <= {int(max_hamming)}
        """,
        fp=fp,
    )


# --------------------------------------------------------------------- #
# incremental (cross-run) dedup                                         #
# --------------------------------------------------------------------- #

def incremental_dedup(
    new_df: DataFrame,
    seen_df: DataFrame,
    text_col: str,
    *,
    seen_text_col: str | None = None,
    prefilter: "BloomSketch | None" = None,
) -> DataFrame:
    """Rows of ``new_df`` whose content digest does NOT appear in ``seen_df``.

    The incremental-ingest primitive: each crawl/batch is deduplicated
    against the corpus already ingested.  Expressed as a LEFT ANTI join on
    ``md5(text)`` so the shuffle carries 32-byte digests, never document
    bodies; Catalyst's runtime bloom filter
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) can additionally
    inject a map-side probe prefilter when the build side is large.

    With ``prefilter`` (a :class:`BloomSketch` of the seen digests, built
    once per ingest epoch and persisted), rows whose digest misses the
    sketch skip the anti-join entirely — bloom filters have no false
    negatives, so a miss is PROVABLY unseen.  Only the candidate hits
    (true dups + the sketch's fpp share of new rows) enter the join, which
    keeps the exact result while shrinking the shuffle by ~the novelty
    rate.  Result is exact in both modes.
    """
    seen_text_col = seen_text_col or text_col
    digests = seen_df.select(
        F.md5(F.col(seen_text_col)).alias("__seen_digest")
    ).distinct()
    keyed = new_df.withColumn("__digest", F.md5(F.col(text_col)))
    if prefilter is None:
        return keyed.join(
            digests,
            keyed["__digest"] == digests["__seen_digest"],
            "left_anti",
        ).drop("__digest")
    hits = bloom_member(prefilter, F.col("__digest"))
    definite_new = keyed.filter(~hits)
    candidates = keyed.filter(hits).join(
        digests,
        F.col("__digest") == digests["__seen_digest"],
        "left_anti",
    )
    return definite_new.unionByName(candidates).drop("__digest")


class BloomSketch:
    """An m-bit / k-hash bloom filter over string keys, held as numpy bytes.

    Built distributively by :func:`build_bloom`; probed executor-side by
    :func:`bloom_member`.  Sketch size is chosen from (expected_items,
    fpp) via the standard formulae ``m = -n ln p / (ln 2)^2``,
    ``k = (m/n) ln 2`` — e.g. 100 M digests at 1% fpp is a 120 MB bitmap,
    which broadcasts to every executor once per ingest run (vs shuffling
    the full seen-key set on every batch).
    """

    def __init__(self, m_bits: int, k: int, bitmap: "bytes"):
        self.m_bits = m_bits
        self.k = k
        self.bitmap = bitmap

    @staticmethod
    def params(expected_items: int, fpp: float) -> tuple[int, int]:
        import math

        n = max(1, expected_items)
        m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
        m = ((m + 63) // 64) * 64  # whole 64-bit words
        k = max(1, round(m / n * math.log(2)))
        return m, k

    def release(self) -> None:
        """Destroy the cached Spark broadcast of this sketch's bitmap.

        A probe stage broadcasts the ~m/8-byte bitmap once per session
        (:func:`_sketch_broadcast`); the handle is pinned on driver and
        executors for the application lifetime.  An ingest loop that
        rotates sketches per epoch should call ``release()`` on the
        retired sketch so each epoch holds exactly one live bitmap."""
        cached = getattr(self, "_bc", None)
        if cached is not None:
            self._bc = None
            try:
                cached[1].unpersist(blocking=False)
                cached[1].destroy()
            except Exception:
                pass  # session already gone — nothing to free


def _bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """array<long> of the k bit positions for ``key`` — JVM-side xxhash64
    with per-hash seeds, identical on build and probe paths."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ]
    )


def build_bloom(
    df: DataFrame,
    key_col: str | Column,
    *,
    expected_items: int,
    fpp: float = 0.01,
    fanin: int = 16,
) -> BloomSketch:
    """Build a :class:`BloomSketch` of ``key_col`` with a two-level OR.

    Each input partition sets its keys' bits in a local numpy bitmap and
    emits ONE (group, bitmap) row; a ``fanin``-way repartition ORs those
    per-partition bitmaps down to ≤ ``fanin`` rows; the driver ORs the
    remainder.  Driver traffic is bounded by ``fanin × m/8`` bytes —
    sketch-sized, independent of corpus row count (the tree-aggregate
    shape; a 10 000-partition scan never sends 10 000 bitmaps to the
    driver).
    """
    import numpy as np
    import pandas as pd

    key = F.col(key_col) if isinstance(key_col, str) else key_col
    m_bits, k = BloomSketch.params(expected_items, fpp)
    n_bytes = m_bits // 8

    pos = df.select(
        _bloom_positions(key, m_bits, k).alias("__pos"),
        (F.spark_partition_id() % fanin).alias("__grp"),
    )

    def _partition_bitmap(batches):
        grp = 0
        bm = np.zeros(n_bytes, dtype=np.uint8)
        seen_any = False
        for pdf in batches:
            if len(pdf):
                seen_any = True
                grp = int(pdf["__grp"].iloc[0])
                flat = np.concatenate(pdf["__pos"].to_numpy())
                np.bitwise_or.at(
                    bm, flat // 8, (1 << (flat % 8)).astype(np.uint8)
                )
        if seen_any:
            yield pd.DataFrame({"__grp": [grp], "__bm": [bm.tobytes()]})

    def _or_bitmaps(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        seen_any = False
        for pdf in batches:
            for raw in pdf["__bm"]:
                seen_any = True
                bm |= np.frombuffer(raw, dtype=np.uint8)
        if seen_any:
            yield pd.DataFrame({"__bm": [bm.tobytes()]})

    partial = pos.mapInPandas(
        _partition_bitmap, schema="__grp int, __bm binary"
    )
    reduced = partial.repartition(fanin, "__grp").mapInPandas(
        _or_bitmaps, schema="__bm binary"
    )
    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in reduced.collect():
        out |= np.frombuffer(row["__bm"], dtype=np.uint8)
    return BloomSketch(m_bits, k, out.tobytes())


def _sketch_broadcast(sketch: BloomSketch):
    """Spark ``Broadcast`` of the sketch's bitmap for the active session,
    created once per (sketch, SparkContext) and cached on the sketch.

    A 100 M-digest / 1% sketch is ~120 MB: captured in a UDF closure it
    re-ships through the task-serialization path on EVERY probe stage;
    as a broadcast variable it ships torrent-style once per executor
    and every later stage of the ingest run reuses the local copy."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:  # no session — caller will fall back to closure
        return None
    sc = spark.sparkContext
    cached = getattr(sketch, "_bc", None)
    if cached is not None:
        if cached[0] == sc.applicationId:
            return cached[1]
        # session changed — free the stale handle before re-broadcasting
        # so a long-lived multi-session process holds one bitmap per
        # sketch per ACTIVE session, not one per retired session
        try:
            cached[1].unpersist(blocking=False)
            cached[1].destroy()
        except Exception:
            pass  # old context already stopped — JVM side is gone anyway
    bc = sc.broadcast(sketch.bitmap)
    sketch._bc = (sc.applicationId, bc)
    return bc


def bloom_member(sketch: BloomSketch, key: Column) -> Column:
    """Boolean column: may ``key`` be in the sketch?  (false ⇒ provably
    absent; true ⇒ present OR a false positive at the sketch's fpp).

    The probe is an Arrow-batched pandas UDF over the JVM-computed
    position array.  The bitmap travels as a ``SparkContext.broadcast``
    (cached per session on the sketch, see :func:`_sketch_broadcast`) so
    repeated probe stages in one ingest run ship it to each executor
    once; the UDF closure carries only the tiny broadcast handle.
    Falls back to closure capture when no session is active."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bc = _sketch_broadcast(sketch)
    raw = sketch.bitmap if bc is None else None

    def _probe_fn(pos):
        bitmap = np.frombuffer(
            raw if bc is None else bc.value, dtype=np.uint8
        )
        out = np.empty(len(pos), dtype=bool)
        for i, arr in enumerate(pos.to_numpy()):
            p = np.asarray(arr)
            out[i] = bool(
                np.all(bitmap[p // 8] & (1 << (p % 8)).astype(np.uint8))
            )
        return pd.Series(out)

    # real annotations (not strings): this module has
    # `from __future__ import annotations`, which would otherwise leave
    # pandas_udf's type-hint inspection with unresolvable literals
    _probe_fn.__annotations__ = {"pos": pd.Series, "return": pd.Series}
    _probe = pandas_udf(_probe_fn, "boolean")

    return _probe(_bloom_positions(key, sketch.m_bits, sketch.k))


def jaccard_pairs_prefix_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """EXACT Jaccard-similar pairs (J ≥ t_num/t_den) via PREFIX
    FILTERING (PPJoin family, Xiao et al., WWW '08):
    (id_a, id_b, n_inter, n_a, n_b).

    The scale upgrade over ``jaccard_similar_pairs``: instead of
    joining on EVERY shingle, each document joins only on its prefix —
    the ``sz − ceil(t·sz) + 1`` globally-rarest shingles (rarest-first
    order makes prefixes small AND selective).  Two sets with J ≥ t
    must overlap in ≥ 1 prefix element (pigeonhole on the ≥ ceil(t·sz)
    required intersections), so recall is exactly 1 — the filter only
    prunes candidates, never answers.  Candidates are then verified
    with the full intersection count and the integer cross-
    multiplication ``t_den·inter ≥ t_num·(n_a + n_b − inter)`` — no
    float Jaccard anywhere.

    Cost: one extra narrow shuffle for global shingle frequencies +
    one per-doc window; the candidate join's key distribution is the
    RAREST shingles, the exact opposite of the hot-bucket problem the
    plain shingle join has.  ``ceil`` is the integer form
    ``(sz·t_num + t_den − 1) div t_den`` so any engine replays it.
    """
    # The hashed shingle table is referenced five times (frequencies,
    # sizes, ranking, and both verification probes) — persist it once
    # (PPJoin's token index) or every reference replays the shingle
    # explode and the plan's exchange count multiplies.
    sh = swap_cache(
        "ppjoin_shingles",
        word_shingles(df, id_col, text_col, n).select(
            "id", _shingle_hash().alias("h")
        ),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    freq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sh.join(freq, "h")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df", "h")
            ),
        )
        .join(sizes, "id")
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("sz")
        - F.expr(f"(sz * {t_num} + {t_den} - 1) div {t_den}")
        + 1
    ).select("id", "h")
    cand = (
        prefix.select(F.col("id").alias("id_a"), "h")
        .join(prefix.select(F.col("id").alias("id_b"), "h"), "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    inter = (
        cand.join(sh.select(F.col("id").alias("id_a"), "h"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "h"), ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            F.lit(t_den) * F.col("n_inter")
            >= F.lit(t_num) * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        .select("id_a", "id_b", "n_inter", "n_a", "n_b")
    )


def duplicated_substring_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window_chars: int = 40,
) -> DataFrame:
    """Exact duplicated-substring spans across documents:
    (id, span_start, span_end, n_windows) — maximal character ranges
    whose every ``window_chars``-gram also appears in ANOTHER document.

    The substring-level dedup of Lee et al., "Deduplicating Training
    Data Makes Language Models Better" (ACL '22), re-expressed as
    relational algebra instead of a suffix array: every stride-1
    character window is hashed in codegen (one array ``transform`` per
    doc — the text is never re-scanned per window), windows whose hash
    occurs in ≥ 2 distinct docs are flagged, and flagged starts merge
    into maximal spans with the classic island detection (gap > window
    ⇒ new span; two windows ≤ ``window_chars`` apart overlap or
    touch).  A span's every position is covered by some shared window,
    so clipping [span_start, span_end] removes exactly the cross-doc
    repeated text.

    Scale: windows = Σ doc_len rows of (id, start, hash64) — ~8× the
    corpus bytes, hash-partitioned; the groupBy and the per-doc span
    merge are the only shuffles.  A suffix array finds longer-than-L
    matches cheaper per byte, but cannot shard on a shuffle key the
    way an n-gram hash join does — this shape is the one that runs on
    1000 executors unchanged.
    """
    L = window_chars
    eligible = ensure_parallel(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t")
    ).filter(F.length("__t") >= L)
    hashes = F.expr(
        f"transform(sequence(1, length(__t) - {L - 1}), "
        f"i -> cast(conv(substring(md5(substring(__t, i, {L})), 1, 8), "
        f"16, 10) as bigint))"
    )
    windows = eligible.select(
        "id", F.posexplode(hashes).alias("__p", "hh")
    ).select("id", (F.col("__p") + 1).alias("s"), "hh")
    shared = (
        windows.groupBy("hh")
        .agg(F.count_distinct("id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("hh")
    )
    flagged = windows.join(shared, "hh").select("id", "s")
    w_ord = Window.partitionBy("id").orderBy("s")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg = flagged.withColumn(
        "__brk",
        F.when(
            F.col("s") - F.coalesce(F.lag("s").over(w_ord), F.col("s")) > L,
            1,
        ).otherwise(0),
    ).withColumn("__island", F.sum("__brk").over(w_run))
    return (
        seg.groupBy("id", "__island")
        .agg(
            F.min("s").alias("span_start"),
            (F.max("s") + F.lit(L - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("id", "span_start", "span_end", "n_windows")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs: (id_a, id_b, n_common, n_a, n_b,
    containment) with ``containment = |A∩B| / min(|A|, |B|)`` ≥
    ``threshold`` and id_a < id_b.

    Containment is the asymmetric cousin of Jaccard and the right
    near-dup signal for EXCERPTS: a quote or doc-in-doc inclusion has
    tiny Jaccard (the container dilutes the union) but containment ≈ 1
    on the smaller side — which is why dedup pipelines (Lee et al. ACL
    '22 §4.2 discuss the distinction) run both.  Same scale posture as
    :func:`jaccard_similar_pairs`: shingle self-join bounded by
    ``max_shingle_freq`` stop-shingle capping; for full corpora use LSH
    candidates and verify containment on the pairs.
    """
    sh = word_shingles(df, id_col, text_col, n)
    if max_shingle_freq is not None:
        freq_w = Window.partitionBy("shingle")
        sh = sh.withColumn("__f", F.count(F.lit(1)).over(freq_w)).filter(
            F.col("__f") <= max_shingle_freq
        ).drop("__f")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    cont = F.col("n_common").cast("double") / F.least(
        F.col("n_a"), F.col("n_b")
    )
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("containment", cont)
        .filter(F.col("containment") >= F.lit(threshold))
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "containment")
    )


def corpus_overlap_sketch(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    n: int = 3,
    k: int = 128,
) -> DataFrame:
    """Pairwise corpus-overlap estimation between document GROUPS
    (sources, dumps, snapshots): a bottom-k MinHash sketch of each
    group's shingle SET, merged per pair — the classic k-minimum-values
    Jaccard estimator (Beyer et al., SIGMOD '07).

    Returns (sa, sb, k_eff, n_shared, jaccard_est_ppm) for every
    unordered group pair: of the ``k_eff ≤ k`` smallest hashes of the
    UNION of the two sketches, ``n_shared`` appear in both — an
    unbiased estimate of the shingle-set Jaccard, exact-ppm by BIGINT
    floor division.

    Why this exists: "how much does dump N+1 overlap dump N / source A
    overlap source B" is the first question before near-dedup across
    corpora, and the full answer is a |shingles|×|shingles| join.  The
    sketch answer reduces each group to ``k`` BIGINTs FIRST (one
    distinct + one windowed top-k per group, all key-partitioned), so
    the pairwise stage touches G²·k sketch rows, never corpus rows —
    at 100 TB with thousands of sources that is megabytes.  The
    estimator is deterministic (md5-derived hashes, no RNG), so the
    DuckDB twin hash-matches.

    Reference parity: dpp.py has no corpus-level operator; this is the
    standard companion to its per-document dedup gap (SURVEY §2.2.10).
    """
    sk = (
        word_shingles(df, group_col, text_col, n)
        .select(F.col("id").alias("g"), _shingle_hash().alias("h"))
        .distinct()
    )
    wtop = Window.partitionBy("g").orderBy("h")
    sk_k = (
        sk.withColumn("__r", F.row_number().over(wtop))
        .filter(F.col("__r") <= k)
        .drop("__r")
        .localCheckpoint(eager=False)  # read 3x below (a/b/group list)
    )
    groups = sk_k.select("g").distinct()
    side_a = (
        sk_k.select(F.col("g").alias("sa"), "h")
        .join(F.broadcast(groups.select(F.col("g").alias("sb"))))
        .filter(F.col("sa") < F.col("sb"))
        .select("sa", "sb", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
    )
    side_b = (
        sk_k.select(F.col("g").alias("sb"), "h")
        .join(F.broadcast(groups.select(F.col("g").alias("sa"))))
        .filter(F.col("sa") < F.col("sb"))
        .select("sa", "sb", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
    )
    merged = (
        side_a.unionAll(side_b)
        .groupBy("sa", "sb", "h")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
    )
    wpair = Window.partitionBy("sa", "sb").orderBy("h")
    top = merged.withColumn("__r", F.row_number().over(wpair)).filter(
        F.col("__r") <= k
    )
    return top.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_eff"),
        F.sum(F.col("ia") * F.col("ib")).cast("bigint").alias("n_shared"),
        F.expr("(1000000 * sum(ia * ib)) div count(1)")
        .cast("bigint")
        .alias("jaccard_est_ppm"),
    )


def cdc_chunk_dup_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    modulus: int = 4,
) -> DataFrame:
    """Content-defined chunking (CDC) duplication report — the
    rsync/FastCDC primitive at word granularity: a chunk boundary falls
    after every word whose hash ≡ 0 (mod ``modulus``), so boundaries
    are a pure function of LOCAL content and an edit anywhere in a
    document only re-chunks its neighborhood — shared passages between
    documents keep producing byte-identical chunks no matter where
    they sit.  Average chunk length ≈ ``modulus`` words.

    Returns per document: ``n_chunks``, ``n_dup_chunks`` (chunks whose
    corpus-wide occurrence count exceeds 1 — including within-document
    repeats), and ``dup_ratio_ppm``.  This is the passage-level
    duplication signal sitting between exact-document dedup and
    substring-span dedup (Lee et al.): cheaper than suffix machinery,
    robust to prepended boilerplate that defeats whole-doc hashing.

    Shape at 100 TB: chunking is ONE map-side codegen projection
    (split / filter / slice HOFs — no Python, no shuffle), then one
    groupBy(chunk_hash) count and one hash-join back — the exact-dedup
    posture applied to chunks.  Deterministic md5 arithmetic, so the
    DuckDB twin hash-matches.
    """
    chunks = (
        ensure_parallel(df)
        .select(
            F.col(id_col).alias("id"),
            F.split(F.col(text_col), " ").alias("__ws"),
        )
        .select(
            "id",
            "__ws",
            F.expr(
                "filter(sequence(1, size(__ws)),"
                " i -> (cast(conv(substring(md5(__ws[i-1]), 1, 8),"
                f" 16, 10) as bigint) % {int(modulus)}) = 0)"
            ).alias("__bpos"),
        )
        .select(
            "id",
            "__ws",
            F.expr("concat(array(0), __bpos)").alias("__starts"),
            F.expr("concat(__bpos, array(size(__ws)))").alias("__ends"),
        )
        .select(
            "id",
            F.explode(
                F.expr(
                    "filter(transform(sequence(1, size(__starts)),"
                    " j -> concat_ws(' ',"
                    " slice(__ws, __starts[j-1] + 1,"
                    " __ends[j-1] - __starts[j-1]))),"
                    " c -> c != '')"
                )
            ).alias("chunk"),
        )
        .select("id", F.md5("chunk").alias("chunk_hash"))
    )
    counts = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )
    return (
        chunks.join(counts, "chunk_hash")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum((F.col("n_occ") > 1).cast("int"))
            .cast("bigint")
            .alias("n_dup_chunks"),
            F.expr(
                "(1000000 * sum(cast(n_occ > 1 as int))) div count(1)"
            ).cast("bigint").alias("dup_ratio_ppm"),
        )
    )
