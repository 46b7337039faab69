"""Join operators beyond the built-in equi-join surface.

Everything here composes public DataFrame APIs (SURVEY §2.2.3) — no custom
Catalyst rules.  Scale posture:

- as-of joins NEVER materialize the (left × time-valid right) pair set.
  Both sides are unioned into one stream, shuffled ONCE on the equality
  key, sorted by time within the key, and each left row picks up the
  running ``last(right_payload, ignorenulls=True)`` — the merge_asof /
  kdb aj shape.  Cost is one shuffle + one per-key sort, linear in
  |left| + |right|; the naive join-then-rank formulation is quadratic on
  hot keys (a key with 10⁴ rows each side builds 10⁸ intermediate pairs
  before rank-1 filtering discards all but 10⁴).
- range/theta joins keep the equality conjunct in the join condition so
  Catalyst can still pick a hash/sort-merge strategy and apply the range
  predicate as a post-join filter; a pure non-equi join (no equality
  conjunct) degrades to broadcast-nested-loop and is only sane when one
  side is broadcastable — `range_join` enforces that with an explicit
  broadcast of the smaller side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "bloom_semi_reduce",
    "broadcast_join",
    "range_join",
    "star_join",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    *,
    left_key: str | Sequence[str],
    direction: str = "backward",
    tie_break: str | Sequence[str] | None = None,
    how: str = "inner",
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """For each left row, match the single right row with the greatest
    ``right_time <= left_time`` (direction='backward'; 'forward' = least
    ``right_time >= left_time``), within equal ``on`` keys.

    ``tolerance`` bounds how stale the match may be: a candidate
    farther than the tolerance from ``left_time`` is treated as no
    match (dropped under ``how='inner'``, null-extended under
    ``'left'``) — pandas ``merge_asof(tolerance=...)`` semantics,
    applied as an exact post-predicate on the already-selected nearest
    match.  Pass an SQL interval string (``'30 days'``) for timestamp
    time columns, or a number for numeric ones.

    ``tie_break`` columns (right side) break right_time ties
    deterministically — always pass one when right_time is not unique per
    key, otherwise results are nondeterministic under Spark AND under any
    engine.  Backward picks the LARGEST tie-break among equal times,
    forward the smallest (matching the rank-1 ordering of the classic
    formulation).  ``left_key`` is retained for API compatibility and
    ignored: the merge-scan needs no unique left identifier.

    Reference parity: SURVEY §2.2.3 "Interval/as-of join"; the reference
    itself has no joins of any kind (dpp.py — no join exists in the file).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"invalid direction {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports how='inner'|'left', got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    tie_break = (
        [] if tie_break is None
        else [tie_break] if isinstance(tie_break, str) else list(tie_break)
    )
    backward = direction == "backward"
    right_payload = [c for c in right.columns if c not in on]

    # One merged stream: left rows carry their payload in __l, right rows
    # theirs in __r; unionByName(allowMissingColumns) nulls the other side.
    lu = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
    )
    # Join semantics: null equality keys and null times never match — drop
    # such right rows up front (otherwise the null-key window partition
    # would pair them with null-key left rows).
    r_valid = right.filter(F.col(right_time).isNotNull())
    for k in on:
        r_valid = r_valid.filter(F.col(k).isNotNull())
    ru = r_valid.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*right_payload).alias("__r"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tie_break)],
    )
    u = lu.unionByName(ru, allowMissingColumns=True)

    # Scan order: by time toward the left row (asc for backward, desc for
    # forward), rights BEFORE lefts at equal time (inclusive <= / >=), and
    # tie-breaks ordered so the preferred right lands LAST before the left
    # row — ``last(__r, ignorenulls=True)`` then reads the match off the
    # running frame.  Null left times sort to the start of the scan (no
    # rights seen yet) and correctly match nothing.
    if backward:
        order = [F.col("__t").asc_nulls_first(), F.col("__is_left").asc()]
        order += [F.col(f"__tb{i}").asc() for i in range(len(tie_break))]
    else:
        order = [F.col("__t").desc_nulls_first(), F.col("__is_left").asc()]
        order += [F.col(f"__tb{i}").desc() for i in range(len(tie_break))]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    if tolerance is not None:
        tol = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        mt = F.col("__m").getField(right_time)
        within = (
            (F.col("__t") - mt <= tol)
            if backward
            else (mt - F.col("__t") <= tol)
        )
        # null __m (no match) propagates: when(null) -> null
        matched = matched.withColumn(
            "__m", F.when(within, F.col("__m"))
        )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    return matched.select("__l.*", "__m.*")


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    *,
    equi_keys: tuple[str, str] | None = None,
    broadcast_right: bool = True,
) -> DataFrame:
    """Theta/range join.  With ``equi_keys=(lcol, rcol)`` the equality
    conjunct rides in the join condition so Catalyst keeps a hash or
    sort-merge strategy (the range predicate evaluates post-match); without
    one, Spark must nested-loop — then the right side is broadcast
    explicitly, which is the only shape of pure-theta join that survives
    scale."""
    if equi_keys is not None:
        lk, rk = equi_keys
        condition = (left[lk] == right[rk]) & condition
        return left.join(right, condition, "inner")
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, condition, "inner")


def broadcast_join(
    left: DataFrame, right: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Equi-join with the right side explicitly broadcast (small dims)."""
    return left.join(F.broadcast(right), on, how)


def star_join(fact: DataFrame, *dims: tuple[DataFrame, Column | str | list]) -> DataFrame:
    """Chain fact ⋈ dim1 ⋈ dim2 …, broadcasting every dimension.

    The canonical 100 TB star-schema plan: one pass over the fact table,
    all dimension lookups map-side (no fact shuffle at all until the
    subsequent aggregation)."""
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on, "inner")
    return out


def fuzzy_join_levenshtein(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    blocking: list[tuple[Column | str, Column | str]],
    max_distance: int = 2,
    max_block_freq: int | None = None,
) -> DataFrame:
    """Approximate string match (record linkage): rows whose keys are
    within ``max_distance`` edits, found WITHOUT an all-pairs compare.

    ``blocking`` is a list of (left_expr, right_expr) pairs; candidates
    are generated by an EQUALITY join on the concatenated blocking key
    (one hash-partitioned shuffle), then verified with
    ``F.levenshtein`` in codegen.  This is standard blocking-based
    entity resolution: recall is bounded by the blocking scheme (rows
    in different blocks are never compared — callers pick blocks the
    corruption model cannot escape, e.g. first token + length bucket),
    and cost is Σ|block_l|·|block_r| instead of |L|·|R|.

    ``max_block_freq`` drops blocks whose LEFT-side frequency exceeds
    the cap — the same degenerate-hot-bucket guard as the LSH
    operators; at 100 TB one empty-string block must not cartesian.
    """
    lkey = F.concat_ws(
        "\x1f", *[c if isinstance(c, Column) else F.col(c) for c, _ in blocking]
    )
    rkey = F.concat_ws(
        "\x1f", *[c if isinstance(c, Column) else F.col(c) for _, c in blocking]
    )
    lb = left.withColumn("__block", lkey)
    rb = right.withColumn("__block", rkey)
    if max_block_freq is not None:
        freq_w = Window.partitionBy("__block")
        lb = (
            lb.withColumn("__bf", F.count(F.lit(1)).over(freq_w))
            .filter(F.col("__bf") <= max_block_freq)
            .drop("__bf")
        )
    matched = (
        lb.alias("__l")
        .join(rb.alias("__r"), "__block")
        .withColumn(
            "distance",
            F.levenshtein(
                F.col(f"__l.{left_key}"), F.col(f"__r.{right_key}")
            ).cast("long"),
        )
        .filter(F.col("distance") <= max_distance)
        .drop("__block")
    )
    return matched


def bloom_semi_reduce(
    fact: DataFrame,
    fact_key: str | Column,
    dim: DataFrame,
    dim_key: str | Column,
    *,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Runtime Bloom-filter semi-join reduction: prefilter ``fact``
    MAP-SIDE to rows whose join key may exist in ``dim``.

    The 100 TB problem this solves: a selective dim filter (say 1/5 of
    customers) still forces the shuffle join to exchange EVERY fact row
    — the fact side doesn't know which keys survived.  Catalyst's own
    runtime bloom filter (``spark.sql.optimizer.runtime.bloomFilter``)
    only fires above a 10 GB application-side scan; this operator is
    the same reduction expressed portably: build a
    :class:`~..operators.dedup.BloomSketch` of the dim's surviving join
    keys (tree-aggregated, driver traffic = sketch bytes, never key
    rows), probe it in an Arrow-batched filter BEFORE the fact's
    exchange, and let the exact join swallow the sketch's false
    positives.  Result set is provably identical to the plain join —
    ``false`` from a Bloom probe means *certainly absent*, so only
    rows that could never match are dropped; the expected extra
    shuffle volume is ``fpp`` of the discarded mass.

    ``expected_items`` sizes the sketch; when omitted the dim side is
    counted first (one cheap action over the already-filtered dim —
    the side that was small enough to justify the reduction).
    """
    fk = F.col(fact_key) if isinstance(fact_key, str) else fact_key
    dk = F.col(dim_key) if isinstance(dim_key, str) else dim_key
    from .dedup import build_bloom, bloom_member

    keys = dim.select(dk.alias("__k"))
    if expected_items is None:
        expected_items = max(1, keys.count())
    sketch = build_bloom(
        keys, "__k", expected_items=expected_items, fpp=fpp
    )
    return fact.filter(bloom_member(sketch, fk))


def sorted_neighborhood_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_col: str,
    right_key: str,
    right_col: str,
    *,
    window: int = 3,
    max_distance: int = 2,
    range_len: int = 1,
) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernández & Stolfo, SIGMOD
    '95): union both sides, sort on the match column, then compare
    each row only against the next ``window`` rows in that sort —
    candidates are generated by ``window`` map-side ``lead`` columns,
    so the candidate volume is exactly (|L|+|R|)·window instead of
    |L|·|R|, with NO blocking key to get wrong (the failure mode of
    equality blocking is a typo in the block key itself; a sort keeps
    typo'd records adjacent as long as the corruption is not in the
    first characters — the two methods are complementary tiers).

    Verification is ``levenshtein ≤ max_distance`` in codegen on
    candidates only.  Returns matched (left_key, left_val, right_key,
    right_val, distance) pairs; determinism comes from the total sort
    order (value, side, key).

    Scale posture — DISTRIBUTED sorted neighborhoods, not one global
    window.  The sort key's leading ``range_len`` characters define
    deterministic, sort-contiguous ranges (a prefix is monotone in the
    lexicographic order, so equal-prefix rows are adjacent in the
    global sort).  Each range becomes one window partition, and the
    global semantics are restored EXACTLY by duplicating boundary
    rows: for every range r, the first rows of the following ranges —
    just enough of them that r's tail can see its next ``window``
    global successors (each interior range holds ≥ 1 row, so at most
    ``window`` ranges ahead ever contribute; the per-range row counts
    that size this pull are a range-METADATA table, one row per
    distinct prefix, ≪ data, and its cum-sum runs over that metadata
    only).  Duplicated rows may only be lead TARGETS, never anchors,
    so every global adjacent pair is generated exactly once and
    nothing else is.  ``range_len=1`` suits generically-distributed
    strings; pass a longer prefix when values share a common head
    (the same granularity lever as any blocking choice — but unlike
    equality blocking, a neighbor straddling a range boundary is still
    caught, by construction).  Degenerate single-range inputs fall
    back to one partition, the declared small tier.
    """
    lhs = left.select(
        F.col(left_key).alias("k"),
        F.col(left_col).alias("v"),
        F.lit(0).alias("side"),
    )
    rhs = right.select(
        F.col(right_key).alias("k"),
        F.col(right_col).alias("v"),
        F.lit(1).alias("side"),
    )
    both = lhs.unionAll(rhs).withColumn(
        "rng", F.substring("v", 1, range_len)
    )
    # Range metadata: one row per distinct leading prefix.  pos orders
    # the ranges; cum is the inclusive running row count in range
    # order.  The unpartitioned window here runs over range METADATA
    # (|distinct prefixes| rows), not over data.
    wr = Window.orderBy("rng")
    meta = both.groupBy("rng").agg(F.count(F.lit(1)).alias("n")).select(
        "rng",
        "n",
        F.sum("n").over(wr).alias("cum"),
        F.row_number().over(wr).alias("pos"),
    )
    # Range r needs head rows from following range s iff fewer than
    # ``window`` rows lie strictly between them: between(r, s) =
    # cum(s-1) - cum(r) = (s.cum - s.n) - r.cum.  Each interior range
    # holds >= 1 row, so s.pos - r.pos <= window — an EQUALITY join on
    # the exploded pos offset, never a theta join.
    a = meta.select(
        F.col("rng").alias("dst_rng"),
        F.col("cum").alias("a_cum"),
        F.explode(
            F.array(*[F.col("pos") + j for j in range(1, window + 1)])
        ).alias("pos"),
    )
    b = meta.select(
        F.col("rng").alias("src_rng"),
        (F.col("cum") - F.col("n")).alias("b_prev_cum"),
        "pos",
    )
    needs = (
        a.join(b, "pos")
        .filter(F.col("b_prev_cum") - F.col("a_cum") < window)
        .select(
            "dst_rng",
            "src_rng",
            (window - (F.col("b_prev_cum") - F.col("a_cum"))).alias(
                "need"
            ),
        )
    )
    # First ``window`` rows of every range, in sort order.
    wh = Window.partitionBy("rng").orderBy("v", "side", "k")
    heads = both.withColumn("rn", F.row_number().over(wh)).filter(
        F.col("rn") <= window
    )
    # Duplicate just enough head rows backward into each needing range.
    # Their prefix is strictly greater than the destination range's, so
    # they sort after every native row — i.e. exactly where the global
    # order puts them.
    extra = (
        heads.join(F.broadcast(needs), heads["rng"] == needs["src_rng"])
        .filter(F.col("rn") <= F.col("need"))
        .select(
            "k",
            "v",
            "side",
            F.col("dst_rng").alias("rng"),
            F.lit(1).alias("xtra"),
        )
    )
    aug = both.select(
        "k", "v", "side", "rng", F.lit(0).alias("xtra")
    ).unionAll(extra)
    w = Window.partitionBy("rng").orderBy("v", "side", "k")
    cols = ["k", "v", "side"]
    led = aug.select(
        *cols,
        "xtra",
        *[
            F.lead(c, j).over(w).alias(f"{c}_{j}")
            for j in range(1, window + 1)
            for c in cols
        ],
    ).filter(F.col("xtra") == 0)
    pairs = None
    for j in range(1, window + 1):
        cand = led.filter(
            F.col(f"side_{j}").isNotNull()
            & (F.col("side") != F.col(f"side_{j}"))
        ).select(
            F.when(F.col("side") == 0, F.col("k"))
            .otherwise(F.col(f"k_{j}")).alias("left_key"),
            F.when(F.col("side") == 0, F.col("v"))
            .otherwise(F.col(f"v_{j}")).alias("left_val"),
            F.when(F.col("side") == 0, F.col(f"k_{j}"))
            .otherwise(F.col("k")).alias("right_key"),
            F.when(F.col("side") == 0, F.col(f"v_{j}"))
            .otherwise(F.col("v")).alias("right_val"),
        )
        pairs = cand if pairs is None else pairs.unionAll(cand)
    out = (
        pairs.distinct()
        .withColumn(
            "distance",
            F.levenshtein("left_val", "right_val").cast("bigint"),
        )
        .filter(F.col("distance") <= max_distance)
    )
    return out


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    *,
    tie_break: str | Sequence[str] | None = None,
    how: str = "inner",
    tolerance: int | float | None = None,
) -> DataFrame:
    """As-of join, direction='nearest' (pandas ``merge_asof``'s third
    direction): each left row takes the right row whose NUMERIC
    ``right_time`` is closest in either direction, ties to the earlier
    (backward) side.  Time columns must be numeric (cast timestamps to
    ``unix_micros`` first) so distances compare exactly.

    One merged stream, ONE sort per key, TWO frames over it: the
    running ``last`` non-null right (the backward candidate, rights
    sorted before lefts at equal time so distance-0 matches land here)
    and the ``first`` non-null right over the FOLLOWING frame (the
    forward candidate).  No second sort, no self-join — the same
    merge-scan posture as ``asof_join``, still one shuffle on the key.
    ``tolerance`` (same numeric units) bounds both directions.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how='inner'|'left', got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    tie_break = (
        [] if tie_break is None
        else [tie_break] if isinstance(tie_break, str) else list(tie_break)
    )
    right_payload = [c for c in right.columns if c not in on]
    lu = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
    )
    r_valid = right.filter(F.col(right_time).isNotNull())
    for k in on:
        r_valid = r_valid.filter(F.col(k).isNotNull())
    ru = r_valid.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*right_payload).alias("__r"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tie_break)],
    )
    u = lu.unionByName(ru, allowMissingColumns=True)
    order = [F.col("__t").asc_nulls_first(), F.col("__is_left").asc()]
    order += [F.col(f"__tb{i}").asc() for i in range(len(tie_break))]
    wb = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    m = (
        u.withColumn("__mb", F.last("__r", ignorenulls=True).over(wb))
        .withColumn("__mf", F.first("__r", ignorenulls=True).over(wf))
        .filter(F.col("__is_left") == 1)
    )
    db = F.col("__t") - F.col("__mb").getField(right_time)
    df_ = F.col("__mf").getField(right_time) - F.col("__t")
    pick_b = F.col("__mf").isNull() | (
        F.col("__mb").isNotNull() & (db <= df_)
    )
    m = m.withColumn(
        "__m", F.when(pick_b, F.col("__mb")).otherwise(F.col("__mf"))
    ).withColumn(
        "__dist", F.when(pick_b, db).otherwise(df_)
    )
    if tolerance is not None:
        m = m.withColumn(
            "__m", F.when(F.col("__dist") <= F.lit(tolerance), F.col("__m"))
        )
    if how == "inner":
        m = m.filter(F.col("__m").isNotNull())
    return m.select("__l.*", "__m.*")
