"""SURVEY §2.2.12 extension: graph analytics beyond CC/triangles/PageRank.

BFS reachability, k-core peeling, and neighbor-Jaccard link prediction
over the same deterministic interaction graph the existing graph queries
use (orders-derived, ``analytics._GRAPH_EDGES_SQL``).  All three are
FIXED-ROUND / pure-relational, so every output is exact integers and the
DuckDB twins hash-match — the same discipline that upgraded PageRank to
hash-checked in round 4.  Reference parity: the reference DSL (dpp.py)
has no graph stage; these are the reachability / quality-gate /
link-prediction primitives its users hand-roll downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._registry import load, query
from .analytics import _GRAPH_EDGES_SQL, _graph_edges

_BFS_ROUNDS = 4
_KCORE_ROUNDS = 3
_WEDGE_CAP = 10_000

# Shared oracle prologue: canonical undirected edges + bidirected view +
# node set, all MATERIALIZED (DuckDB inlines CTEs by default; the
# unrolled rounds below reference each stage more than once, so
# materialization keeps the plan linear — the PageRank-twin lesson).
_ORACLE_GRAPH_PRELUDE = f"""
    g AS MATERIALIZED ({_GRAPH_EDGES_SQL}),
    e AS MATERIALIZED
      (SELECT a AS u, b AS v FROM g UNION ALL SELECT b, a FROM g),
    nodes AS MATERIALIZED (SELECT DISTINCT u AS id FROM e)
"""


def _bfs_oracle_sql(rounds: int = _BFS_ROUNDS) -> str:
    parts = [
        _ORACLE_GRAPH_PRELUDE,
        "d0 AS MATERIALIZED (SELECT id,"
        " CASE WHEN id < 5 THEN CAST(0 AS BIGINT) END AS dist FROM nodes)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT id,"
            " CAST(MIN(dist) AS BIGINT) AS dist FROM ("
            f"   SELECT id, dist FROM d{p}"
            "    UNION ALL"
            "    SELECT e.v AS id, d.dist + 1 AS dist"
            f"   FROM d{p} d JOIN e ON e.u = d.id"
            "    WHERE d.dist IS NOT NULL"
            " ) GROUP BY id)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, dist FROM d{rounds}"
    )


@query("graph_bfs_distances", oracle=_bfs_oracle_sql())
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (operators/graph.py bfs_distances): hop distance
    from the seed set {id < 5} in 4 fixed Bellman–Ford rounds, NULL when
    out of range.  One shuffle per round (settled ⋈ edges → groupBy
    min), per-round lineage truncation — the pagerank_exact iteration
    discipline applied to reachability.  Distances are BIGINTs and MIN
    is order-insensitive, so the unrolled DuckDB twin hash-matches."""
    from ..operators.graph import bfs_distances

    e = _graph_edges(spark, sf_dir)
    bidir = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    seeds = (
        bidir.select(F.col("u").alias("id"))
        .distinct()
        .filter(F.col("id") < 5)
    )
    return bfs_distances(bidir, seeds, rounds=_BFS_ROUNDS)


# The %100 orders graph is near-COMPLETE at every shipped SF, which
# makes fixed-k peeling trivial (everything or nothing survives).  The
# k-core query therefore runs on the multiplicity-THRESHOLDED graph —
# an edge must carry ≥ 5/4× the mean pair multiplicity (the Q11
# threshold trick, cross-multiplied so it stays exact integers) — and
# picks k from the thresholded graph itself: k = (3·meandeg)//4 + 1,
# meandeg = (2E)//V.  Measured: 62/98/48 survivors with real peeling at
# sf0.001/0.01/0.1 — non-degenerate at every scale the driver checks.
_KCORE_EDGES_SQL = """
    mult AS MATERIALIZED (
      SELECT least(o_custkey % 100, o_orderkey % 100) AS a,
             greatest(o_custkey % 100, o_orderkey % 100) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM orders
      WHERE (o_custkey % 100) <> (o_orderkey % 100)
      GROUP BY 1, 2
    ),
    tot AS MATERIALIZED (
      SELECT CAST(SUM(c) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM mult
    ),
    e0 AS MATERIALIZED (
      SELECT a AS u, b AS v FROM mult, tot
      WHERE 4 * c * n_pairs >= 5 * total
    ),
    kstat AS MATERIALIZED (
      SELECT (3 * ((2 * (SELECT CAST(count(*) AS BIGINT) FROM e0))
                   // (SELECT CAST(count(*) AS BIGINT) FROM
                       (SELECT u AS id FROM e0 UNION SELECT v FROM e0))))
             // 4 + 1 AS k
    )
"""


def _kcore_oracle_sql(rounds: int = _KCORE_ROUNDS) -> str:
    parts = [_KCORE_EDGES_SQL]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT id FROM ("
            f"   SELECT u AS id FROM e{p}"
            f"   UNION ALL SELECT v FROM e{p}"
            " ) GROUP BY id HAVING count(*) >= (SELECT k FROM kstat))"
        )
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT u, v FROM e{p}"
            f" WHERE u IN (SELECT id FROM k{i})"
            f"   AND v IN (SELECT id FROM k{i}))"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT id FROM k{rounds}"


@query("graph_kcore", oracle=_kcore_oracle_sql())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (operators/graph.py k_core, 3 fixed peels) over
    the multiplicity-thresholded interaction graph — the graph-quality
    gate that strips low-connectivity fringe (spam / link-farm nodes
    live in low cores).  Edges must carry ≥ 5/4× the mean pair
    multiplicity (cross-multiplied exact-integer compare, the Q11
    trick) and k adapts to the thresholded graph's mean degree, so
    peeling bites at every scale factor.  Each peel is one degree
    aggregation + two semi-joins, all key-partitioned; the two driver
    scalars (E, V → k) are bounded counts, the k-means-centroid
    exception pattern, never fact data."""
    from ..operators.graph import k_core

    orders = load(spark, sf_dir, "orders")
    raw = (
        orders.select(
            (F.col("o_custkey") % 100).alias("cu"),
            (F.col("o_orderkey") % 100).alias("ov"),
        )
        .filter(F.col("cu") != F.col("ov"))
        .select(
            F.least("cu", "ov").alias("a"),
            F.greatest("cu", "ov").alias("b"),
        )
    )
    mult = raw.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = mult.agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    kept = (
        mult.crossJoin(F.broadcast(tot))
        .filter(4 * F.col("c") * F.col("n_pairs") >= 5 * F.col("total"))
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
        .localCheckpoint(eager=False)  # re-read by counts + every peel
    )
    n_edges = kept.count()
    n_nodes = (
        kept.select(F.col("u").alias("id"))
        .union(kept.select(F.col("v").alias("id")))
        .distinct()
        .count()
    )
    k = (3 * ((2 * n_edges) // max(n_nodes, 1))) // 4 + 1
    return k_core(kept, k, rounds=_KCORE_ROUNDS)


@query(
    "graph_neighbor_jaccard",
    oracle=f"""
    WITH {_ORACLE_GRAPH_PRELUDE},
    deg AS MATERIALIZED (
      SELECT u AS id, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
    ),
    wedged AS MATERIALIZED (
      SELECT e.u AS n, e.v AS w FROM e
      JOIN deg dm ON dm.id = e.v AND dm.deg <= {_WEDGE_CAP}
    ),
    common AS MATERIALIZED (
      SELECT l.n AS a, r.n AS b, CAST(count(*) AS BIGINT) AS common
      FROM wedged l JOIN wedged r ON l.w = r.w AND l.n < r.n
      GROUP BY 1, 2
    )
    SELECT c.a, c.b, c.common,
           CAST((1000000 * c.common)
                // (da.deg + db.deg - c.common) AS BIGINT) AS jaccard_ppm,
           CAST(CASE WHEN gg.a IS NOT NULL THEN 1 ELSE 0 END
                AS INTEGER) AS is_edge
    FROM common c
    JOIN deg da ON da.id = c.a
    JOIN deg db ON db.id = c.b
    LEFT JOIN g gg ON gg.a = c.a AND gg.b = c.b
    """,
)
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard for every co-wedged node pair
    (operators/graph.py neighbor_jaccard): |N(a)∩N(b)| via the shared-
    middle wedge join (triangle_count's two-shuffle pattern), exact-ppm
    Jaccard by BIGINT floor division, and an is_edge flag — is_edge=0
    rows are link-prediction candidates.  Hub middles above the
    frequency cap are excluded from wedge enumeration (declared
    semantics, mirrored in the oracle) so fan-out stays bounded at
    scale, exactly like LSH band caps."""
    from ..operators.graph import neighbor_jaccard

    return neighbor_jaccard(
        _graph_edges(spark, sf_dir), max_wedge_degree=_WEDGE_CAP
    )
