"""Property test for distributed selection: iterative histogram
refinement must return EXACTLY the sorted-list order statistic (the
SQL-standard percentile_disc rank) on arbitrary value multisets, for
any bins/threshold dials — including dials small enough to force
several refinement rounds."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_transformation_python_spark.operators.selection import (
    global_percentile_disc,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


@_SETTINGS
@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=60,
    ),
    q=st.sampled_from([0.01, 0.5, 0.9, 0.99, 1.0]),
    bins=st.sampled_from([2, 4, 16]),
)
def test_refinement_matches_sorted_rank(spark, values, q, bins):
    df = spark.createDataFrame([(v,) for v in values], "value double")
    got = {
        r["quantile"]: r["value"]
        for r in global_percentile_disc(
            df, "value", [q], bins=bins, exact_threshold=3
        ).collect()
    }
    expected = sorted(values)[max(1, math.ceil(q * len(values))) - 1]
    assert got[q] == expected
