"""as-of join: merge-scan implementation vs brute-force semantics.

The operator is linear (union + one keyed window); these tests pin its
semantics against a row-at-a-time Python oracle on adversarial inputs —
time ties, unmatched rows, forward direction, and a hot key where the
naive join-then-rank formulation would build a quadratic intermediate.
"""

import datetime as dt

import pyspark.sql.functions as F

from data_pipeline_package_for_python_spark.operators.joins import asof_join


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
