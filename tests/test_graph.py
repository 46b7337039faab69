"""operators/graph.py — connected components (large-star/small-star)
property-checked against a driver-side union-find oracle.

The law: for any edge list, the distributed fixpoint labels every node
with the minimum id reachable from it — same as sequential union-find.
Includes the path-graph worst case (maximum diameter), where naive label
propagation needs O(n) rounds but the star algorithm stays logarithmic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_package_for_python_spark.operators.graph import (
    connected_components,
    resolve_duplicates,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=0,
    max_size=40,
)


def union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _cc_dict(pairs_df):
    return {
        r["id"]: r["component"]
        for r in connected_components(pairs_df).collect()
    }


@SLOW
@given(edges=edges_st)
def test_cc_matches_union_find(spark, edges):
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )
    got = _cc_dict(pairs)
    want = union_find_labels(edges)
    # the operator drops self-loop-only nodes (no information); union-find
    # keeps them as singletons labeled by themselves — align before compare
    want = {k: v for k, v in want.items() if not (k == v and got.get(k) is None)}
    assert got == want


def test_cc_path_graph_worst_case(spark):
    # path 0-1-2-...-63: diameter 63, must still converge (O(log^2) rounds)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    got = _cc_dict(pairs)
    assert got == {i: 0 for i in range(64)}


def test_cc_empty_and_self_loops(spark):
    pairs = spark.createDataFrame([(7, 7)], "id_a long, id_b long")
    assert _cc_dict(pairs) == {}


def test_cc_eager_flag_value_parity(spark):
    """``eager`` only controls WHEN the initial edge checkpoint
    materializes (r8 advice: the default eager=True executes the
    upstream pipeline at call time) — the component labels are
    identical either way."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 5)], "id_a long, id_b long"
    )
    lbl = lambda df: {  # noqa: E731
        r["id"]: r["component"] for r in df.collect()
    }
    assert lbl(connected_components(pairs)) == lbl(
        connected_components(pairs, eager=False)
    )


def test_resolve_duplicates_survivors(spark):
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    rows = {
        r["doc_id"]: (r["component"], r["n_members"], r["is_survivor"])
        for r in resolve_duplicates(docs, pairs, "doc_id").collect()
    }
    assert rows == {
        1: (1, 3, True),
        2: (1, 3, False),
        3: (1, 3, False),
        10: (10, 2, True),
        11: (10, 2, False),
        99: (99, 1, True),  # singleton: survives without a map entry
    }
    # exactly one survivor per component, and it is the component min
    surv = [d for d, (_, _, s) in rows.items() if s]
    assert sorted(surv) == [1, 10, 99]


def test_cc_no_cartesian_in_round(spark):
    # each star round is window + equality ops — a cartesian anywhere
    # would be quadratic at corpus scale
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    plan = connected_components(pairs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
