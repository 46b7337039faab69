"""Count-Min Sketch re-expressed as relational algebra (SURVEY §2.2.4
approximate-aggregate family; reference scope note: /root/reference/dpp.py
has no sketches of any kind — this is north-star surface like the HLL
rollup in operators/timeseries.py).

A CMS is a depth × width counter matrix: row d counts collisions under
hash_d, and a key's frequency estimate is the MINIMUM of its depth
counters — always an OVERestimate (collisions only add), within ε·N with
high probability for width = e/ε.

The relational re-expression keeps every property and gets Spark's
execution model for free:

- BUILD is ``explode(depth) → groupBy(d, bucket) → count``: the shuffle
  carries at most depth × width partial counts per map task (map-side
  combine), so sketch construction is ONE pass at any corpus size and
  the result is a depth×width-row table — a dimension-sized frame.
- MERGE of two sketches is ``union → groupBy(d, bucket) → sum`` — the
  counters are associative, which is the whole point of a mergeable
  sketch (per-partition / per-day sketches roll up losslessly).
- ESTIMATE joins probe keys against the sketch per hash row and takes
  ``min(c)`` — the sketch side broadcasts (d×w rows), so probing is
  map-side.

Hashes are the repo's engine-portable md5-derived integers (same
discipline as operators/dedup.py::_shingle_hash), so a DuckDB oracle
replays the ENTIRE construction bit-for-bit — the sketch is
deterministic, not merely statistically characterized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_merge", "cms_estimate"]


def _bucket_expr(key_sql: str, row: int, width: int) -> F.Column:
    """Hash row ``row``'s bucket for a key: md5-derived uint32 % width."""
    return F.expr(
        f"cast(conv(substring(md5(concat(cast({key_sql} as string),"
        f" ':', {row})), 1, 8), 16, 10) as bigint) % {width}"
    )


def cms_build(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """One-pass Count-Min Sketch of ``key_col`` frequencies: (d, b, c).

    ``explode`` fans each input row into ``depth`` (hash-row, bucket)
    pairs; the groupBy's map-side combine collapses them to ≤ depth×width
    partials per task before the only shuffle.  Output is depth×width
    rows max — a broadcastable model frame at any input scale.
    """
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket_expr(key_col, d, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("e")
    )
    return rows.groupBy(
        F.col("e.d").alias("d"), F.col("e.b").alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Lossless sketch union: counter addition per (d, b).

    ``cms_merge(cms_build(A), cms_build(B))`` equals
    ``cms_build(A ∪ B)`` exactly (associative integer counters) — the
    law that lets per-partition/per-day sketches roll up without
    revisiting data; pinned in tests/test_laws.py.
    """
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "b").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: (key, est).

    est = min over hash rows of the key's counter (0 if a bucket is
    absent — an empty counter).  The sketch is depth×width rows, so it
    broadcasts and the probe is a map-side join however many keys are
    probed; CMS guarantees est ≥ true count.
    """
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket_expr(key_col, d, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("e"),
    ).select("key", F.col("e.d").alias("d"), F.col("e.b").alias("b"))
    joined = probes.join(F.broadcast(sketch), ["d", "b"], "left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est")
    )
