"""Join operators beyond the built-in equi-join surface.

Everything here composes public DataFrame APIs (SURVEY §2.2.3) — no custom
Catalyst rules.  Scale posture:

- as-of joins shuffle both sides on the equality key (one shuffle each) and
  resolve the "latest ≤ t" semantics with a window over the *left* primary
  key — the window repartitions on the left key, so at 100 TB the cost is
  two key-partitioned shuffles + a per-key sort, never a cartesian product.
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

__all__ = ["asof_join", "range_join", "broadcast_join", "star_join"]


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
) -> DataFrame:
    """For each left row, match the single right row with the greatest
    ``right_time <= left_time`` (direction='backward'; 'forward' = least
    ``right_time >= left_time``), within equal ``on`` keys.

    ``left_key`` must uniquely identify left rows (the window partitions on
    it).  ``tie_break`` columns (right side) break right_time ties
    deterministically — always pass one when right_time is not unique per
    key, otherwise results are nondeterministic under Spark AND under any
    engine.

    Reference parity: SURVEY §2.2.3 "Interval/as-of join"; the reference
    itself has no joins of any kind (dpp.py — no join exists in the file).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"invalid direction {direction!r}")
    on = [on] if isinstance(on, str) else list(on)
    left_key = [left_key] if isinstance(left_key, str) else list(left_key)
    tie_break = (
        [] if tie_break is None
        else [tie_break] if isinstance(tie_break, str) else list(tie_break)
    )

    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    time_pred = rt <= lt if direction == "backward" else rt >= lt
    cond = time_pred
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))

    joined = left.alias("l").join(right.alias("r"), cond, "inner")

    order = [rt.desc() if direction == "backward" else rt.asc()]
    order += [
        F.col(f"r.{c}").desc() if direction == "backward" else F.col(f"r.{c}").asc()
        for c in tie_break
    ]
    w = Window.partitionBy(*[F.col(f"l.{k}") for k in left_key]).orderBy(*order)
    best = joined.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")
    # de-duplicate the equality-key columns (keep the left copy)
    right_cols = [c for c in right.columns if c not in on]
    best = best.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right_cols],
    )
    if how == "left":
        matched_keys = best.select(*[F.col(k) for k in left_key])
        unmatched = left.join(matched_keys, left_key, "left_anti")
        best = best.unionByName(unmatched, allowMissingColumns=True)
    elif how != "inner":
        raise ValueError(f"asof_join supports how='inner'|'left', got {how!r}")
    return best


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
