"""Property-based correctness for the binned range join: on arbitrary
generated points and (possibly inverted/overlapping/negative)
intervals, the bucket-equi-join + exact re-check must return EXACTLY
the rows of the naive cross-join BETWEEN filter, for any bucket
width — bucketing is an optimization, never a semantics change."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_transformation_python_spark.operators.range_join import (
    range_join_binned,
)

VALS = st.integers(min_value=-40, max_value=40)
points_strategy = st.lists(VALS, min_size=0, max_size=12)
intervals_strategy = st.lists(st.tuples(VALS, VALS), min_size=0, max_size=6)
width_strategy = st.sampled_from([1.0, 3.0, 7.5, 50.0])

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


@_SETTINGS
@given(points=points_strategy, intervals=intervals_strategy, width=width_strategy)
def test_binned_equals_naive(spark, points, intervals, width):
    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(points)] or [(None, None)],
        "pid int, x double",
    ).filter("pid IS NOT NULL")
    ivs = spark.createDataFrame(
        [(i, float(lo), float(hi)) for i, (lo, hi) in enumerate(intervals)]
        or [(None, None, None)],
        "iid int, lo double, hi double",
    ).filter("iid IS NOT NULL")
    got = {
        (r["pid"], r["iid"])
        for r in range_join_binned(pts, ivs, "x", "lo", "hi", width).collect()
    }
    expected = {
        (pi, ii)
        for pi, v in enumerate(points)
        for ii, (lo, hi) in enumerate(intervals)
        if lo <= v <= hi
    }
    assert got == expected
