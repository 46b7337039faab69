"""as-of join: merge-scan implementation vs brute-force semantics.

The operator is linear (union + one keyed window); these tests pin its
semantics against a row-at-a-time Python oracle on adversarial inputs —
time ties, unmatched rows, forward direction, and a hot key where the
naive join-then-rank formulation would build a quadratic intermediate.
"""

import datetime as dt

import pyspark.sql.functions as F

from data_pipeline_package_for_python_spark.operators.joins import (
    asof_join,
    asof_join_nearest,
)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _oracle(left, right, direction, how):
    out = []
    for lk, lt, lv in left:
        cands = [
            (rk, rt, rv)
            for rk, rt, rv in right
            if rk == lk and (rt <= lt if direction == "backward" else rt >= lt)
        ]
        if cands:
            if direction == "backward":
                best = max(cands, key=lambda c: (c[1], c[2]))
            else:
                best = min(cands, key=lambda c: (c[1], c[2]))
            out.append((lk, lt, lv, best[1], best[2]))
        elif how == "left":
            out.append((lk, lt, lv, None, None))
    return sorted(out)


LEFT_SCHEMA = "k long, lt long, lv string"
RIGHT_SCHEMA = "k long, rt long, rv long"

LEFT = [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d"), (3, 10, "e")]
RIGHT = [
    (1, 10, 100),  # exact tie with left (1,10) — inclusive
    (1, 10, 101),  # time tie: backward picks rv=101 (largest tie-break)
    (1, 15, 102),
    (2, 30, 103),  # only a forward match for (2,10)
]


def _run(spark, direction, how):
    left = _mk(spark, LEFT, LEFT_SCHEMA)
    right = _mk(spark, RIGHT, RIGHT_SCHEMA)
    got = asof_join(
        left, right, "k", "lt", "rt",
        left_key="lv", direction=direction, tie_break="rv", how=how,
    )
    rows = sorted(
        (r.k, r.lt, r.lv, r.rt, r.rv) for r in got.collect()
    )
    assert rows == _oracle(LEFT, RIGHT, direction, how), (direction, how)


def test_backward_inner(spark):
    _run(spark, "backward", "inner")


def test_backward_left(spark):
    _run(spark, "backward", "left")


def test_forward_inner(spark):
    _run(spark, "forward", "inner")


def test_forward_left(spark):
    _run(spark, "forward", "left")


def test_hot_key_linear_no_pair_blowup(spark):
    # 2000 × 2000 rows on ONE key: the naive join-then-rank would build
    # ~2M intermediate pairs; the merge-scan handles it as a 4000-row
    # sort.  Correctness: each left t matches right time t-1 (largest
    # rt <= t among even rts when t odd).
    n = 2000
    left = _mk(spark, [(1, 2 * i + 1, str(i)) for i in range(n)], LEFT_SCHEMA)
    right = _mk(spark, [(1, 2 * i, i) for i in range(n)], RIGHT_SCHEMA)
    got = asof_join(
        left, right, "k", "lt", "rt", left_key="lv", tie_break="rv"
    )
    assert got.count() == n
    bad = got.filter(F.col("rt") != F.col("lt") - 1).count()
    assert bad == 0


def test_null_keys_never_match(spark):
    left = _mk(spark, [(None, 10, "x"), (1, 10, "y")], LEFT_SCHEMA)
    right = _mk(spark, [(None, 5, 1), (1, 5, 2)], RIGHT_SCHEMA)
    inner = asof_join(
        left, right, "k", "lt", "rt", left_key="lv", tie_break="rv"
    ).collect()
    assert [(r.lv, r.rv) for r in inner] == [("y", 2)]
    outer = asof_join(
        left, right, "k", "lt", "rt",
        left_key="lv", tie_break="rv", how="left",
    ).collect()
    assert sorted(((r.lv, r.rv) for r in outer), key=str) == [
        ("x", None), ("y", 2),
    ]


# ---------------------------------------------------------------------- #
# property check vs the Python oracle over generated inputs              #
# ---------------------------------------------------------------------- #

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

side_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key (few keys → dense ties)
        st.integers(min_value=0, max_value=8),   # time (collisions likely)
        st.integers(min_value=0, max_value=99),  # payload / tie-break
    ),
    min_size=0,
    max_size=16,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=side_st,
    rrows=side_st,
    direction=st.sampled_from(["backward", "forward"]),
    how=st.sampled_from(["inner", "left"]),
)
def test_asof_matches_python_oracle(spark, lrows, rrows, direction, how):
    left = [(k, t, str(v)) for k, t, v in lrows]
    right = rrows
    got = asof_join(
        _mk(spark, left, LEFT_SCHEMA) if left
        else spark.createDataFrame([], LEFT_SCHEMA),
        _mk(spark, right, RIGHT_SCHEMA) if right
        else spark.createDataFrame([], RIGHT_SCHEMA),
        "k", "lt", "rt",
        left_key="lv", direction=direction, tie_break="rv", how=how,
    )
    rows = sorted((r.k, r.lt, r.lv, r.rt, r.rv) for r in got.collect())
    assert rows == _oracle(left, right, direction, how)


def test_tolerance_bounds_match_staleness(spark):
    """tolerance=3: (1,10) keeps its rt=10 match (diff 0), (1,20)'s
    nearest rt=15 is 5 stale -> dropped under inner, null under left;
    unmatched rows stay unmatched (no resurrection of farther rows)."""
    left = _mk(spark, LEFT, LEFT_SCHEMA)
    right = _mk(spark, RIGHT, RIGHT_SCHEMA)

    def run(how):
        got = asof_join(
            left, right, "k", "lt", "rt",
            left_key="lv", direction="backward", tie_break="rv",
            how=how, tolerance=3,
        )
        return sorted((r.k, r.lt, r.lv, r.rt, r.rv) for r in got.collect())

    base = _oracle(LEFT, RIGHT, "backward", "left")
    want_left = sorted(
        (k, lt, lv, rt, rv)
        if rt is not None and lt - rt <= 3
        else (k, lt, lv, None, None)
        for k, lt, lv, rt, rv in base
    )
    assert run("left") == want_left
    assert run("inner") == [r for r in want_left if r[3] is not None]


# ---------------------------------------------------------------------- #
# direction='nearest'                                                    #
# ---------------------------------------------------------------------- #


def _oracle_nearest(left, right, how, tolerance=None):
    """Row-at-a-time twin of asof_join_nearest's tie ladder: minimum
    |distance|; equal distance prefers the backward side; ties at the
    same time pick the largest tie-break backward (the merge-scan's
    running-`last`) and the smallest forward (the FOLLOWING-frame
    `first`)."""
    out = []
    for lk, lt, lv in left:
        cands = [
            (
                abs(lt - rt),             # distance
                0 if rt <= lt else 1,     # backward wins ties
                -rv if rt <= lt else rv,  # side-specific tie-break
                rt,
                rv,
            )
            for rk, rt, rv in right
            if rk == lk and rk is not None
        ]
        if tolerance is not None:
            cands = [c for c in cands if c[0] <= tolerance]
        if cands:
            best = min(cands)
            out.append((lk, lt, lv, best[3], best[4]))
        elif how == "left":
            out.append((lk, lt, lv, None, None))
    return sorted(out)


def _run_nearest(spark, left, right, how, tolerance=None):
    got = asof_join_nearest(
        _mk(spark, left, LEFT_SCHEMA) if left
        else spark.createDataFrame([], LEFT_SCHEMA),
        _mk(spark, right, RIGHT_SCHEMA) if right
        else spark.createDataFrame([], RIGHT_SCHEMA),
        "k", "lt", "rt", tie_break="rv", how=how, tolerance=tolerance,
    )
    return sorted((r.k, r.lt, r.lv, r.rt, r.rv) for r in got.collect())


def test_nearest_prefers_backward_on_tie(spark):
    # (1,10): rt=10 at distance 0 beats rt=15; time tie rv=100 vs 101
    # resolves to 101 (backward largest).  (1,20): rt=15 (dist 5) is the
    # only side.  (2,10): only a FORWARD match rt=30 — nearest finds it
    # where backward would miss.
    rows = _run_nearest(spark, LEFT, RIGHT, "inner")
    assert rows == _oracle_nearest(LEFT, RIGHT, "inner")
    by_lv = {r[2]: (r[3], r[4]) for r in rows}
    assert by_lv["a"] == (10, 101)
    assert by_lv["d"] == (30, 103)


def test_nearest_left_and_tolerance(spark):
    for tol in (None, 0, 3, 7):
        assert _run_nearest(spark, LEFT, RIGHT, "left", tol) == (
            _oracle_nearest(LEFT, RIGHT, "left", tol)
        ), tol


def test_nearest_equidistant_both_sides(spark):
    # rt=8 and rt=12 are both distance 2 from lt=10 — backward (rt=8)
    # must win even though the forward row has a larger tie-break.
    left = [(1, 10, "x")]
    right = [(1, 8, 1), (1, 12, 9)]
    assert _run_nearest(spark, left, right, "inner") == [
        (1, 10, "x", 8, 1)
    ]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=side_st,
    rrows=side_st,
    how=st.sampled_from(["inner", "left"]),
    tol=st.sampled_from([None, 0, 2, 5]),
)
def test_nearest_matches_python_oracle(spark, lrows, rrows, how, tol):
    left = [(k, t, str(v)) for k, t, v in lrows]
    assert _run_nearest(spark, left, rrows, how, tol) == (
        _oracle_nearest(left, rrows, how, tol)
    )
