"""Connected components + duplicate-cluster resolution.

Near-dedup produces PAIRS (``dedup.near_dedup_minhash``,
``dedup.jaccard_similar_pairs``); an actual corpus cleanup needs
CLUSTERS — transitive groups of mutually-similar documents — and one
survivor per cluster.  Pairs → clusters is connected components, and at
100 TB the graph does not fit anywhere, so the algorithm here is the
alternating **large-star / small-star** method of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SOCC '14): each round is
two shuffles on node id (a windowed min + an edge rewrite), and the edge
set converges to per-component stars rooted at the component's minimum
id in O(log²) rounds — typically 2–4 for the near-clique clusters LSH
emits.  No driver-side graph, no ``collect()``; per-round state is the
edge list itself.

Reference parity: the reference DSL (dpp.py) has no graph stage; this
implements the cluster-resolution step its users would otherwise do by
hand after a pairwise dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's minimum neighbor.

    Bidirects the edge list, then per node u computes
    ``m = min(neighbors ∪ {u})`` with a windowed min (ONE shuffle on u,
    no groupBy+join round-trip) and rewrites each edge (u, v>u) to
    (v, m)."""
    bidir = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w = Window.partitionBy("u")
    return (
        bidir.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward the larger endpoint, then connect every
    smaller neighbor (and u itself) to u's minimum neighbor."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    w = Window.partitionBy("u")
    with_min = oriented.withColumn("m", F.min("v").over(w))
    out = with_min.select(
        F.col("v").alias("u"), F.col("m").alias("v")
    ).union(with_min.select("u", F.col("m").alias("v")))
    return out.filter(F.col("u") != F.col("v")).distinct()


def _edge_checksum(edges: DataFrame) -> tuple:
    """Order-independent fingerprint of the edge SET (count + hash sum).

    One action per iteration — the unavoidable cost of a data-dependent
    convergence loop.  The checksum job is also what materializes the
    ``localCheckpoint`` for the round."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: xxhash64 sums overflow BIGINT under
        # ANSI mode after ~2^32 edges (and nondeterministically before).
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; component
    = the minimum node id reachable from it.

    Iterative large-star/small-star with per-round ``localCheckpoint``
    to truncate lineage (an iterated self-join otherwise doubles the
    plan each round).  ``localCheckpoint`` keeps blocks on executors —
    on a long-lived production cluster prefer
    ``spark.sparkContext.setCheckpointDir`` + reliable ``checkpoint``;
    semantics are identical and the swap is one line.

    Convergence: the small-star output is compared by set checksum to
    the previous round; equal checksums = star graphs reached.  Raises
    ``RuntimeError`` after ``max_iterations`` (the bound is O(log² n)
    rounds; 25 covers any graph that fits in storage anywhere).
    """
    edges = (
        pairs.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = _edge_checksum(edges)
    if prev[0] == 0:
        return edges.select(
            F.col("u").alias("id"), F.col("v").alias("component")
        )
    for _ in range(max_iterations):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        cur = _edge_checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations"
        )
    # Fixed point = per-component stars oriented (node > root) → every
    # non-root node appears exactly once as u with its root as v.  Roots
    # appear only on the v side; add their self-rows.
    mapping = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return mapping.union(roots).distinct()


def resolve_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Attach (component, n_members, is_survivor) to ``df`` from a
    duplicate-pair list; survivor = the minimum id of each cluster.

    The component map is small relative to the corpus (only documents
    that matched anything), so the enrich join is id-keyed and AQE
    demotes it to broadcast when the map is tiny; singleton documents
    survive via ``coalesce`` to their own id without appearing in the
    map at all — the map never holds the full corpus.
    """
    cc = connected_components(pairs, src, dst).withColumnRenamed(
        "id", "__cc_id"
    )
    out = (
        df.join(cc, df[id_col] == F.col("__cc_id"), "left")
        .drop("__cc_id")
        .withColumn(
            "component", F.coalesce(F.col("component"), F.col(id_col))
        )
    )
    w = Window.partitionBy("component")
    return out.withColumn("n_members", F.count(F.lit(1)).over(w)).withColumn(
        "is_survivor", F.col(id_col) == F.col("component")
    )
