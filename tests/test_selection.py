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


def test_denormal_and_negative_zero_edge(spark):
    """Regression (hypothesis-found): values a rounding error below a
    refined bin's lower bound used to bin to -1, vanish from both the
    histogram and the filter, and corrupt the rank accounting; and at
    bins=2 the ±5e-324 / ±0.0 split needs ~1100 halvings, so the
    round budget must bail to exact resolution instead of looping."""
    import math

    values = [
        -0.0, 6.103515625e-05, 5e-324, -1000000.0, -0.99999, 1.1,
        1.192092896e-07, -74535.10177902947, -5e-324, -0.5,
        -6.103515625e-05, -1.5161532621983215e-34, 1.1,
        -80509.13360719103, 999999.9999999999,
    ]
    df = spark.createDataFrame([(v,) for v in values], "value double")
    got = {
        r["quantile"]: r["value"]
        for r in global_percentile_disc(
            df, "value", [0.5], bins=2, exact_threshold=3
        ).collect()
    }
    expected = sorted(values)[max(1, math.ceil(0.5 * len(values))) - 1]
    assert got[0.5] == expected


def test_weighted_sample_topk_plan_and_bias(spark):
    """A-ES weighted sampling: (a) the physical plan is
    TakeOrderedAndProject (per-partition heaps), never a global Sort
    +Exchange; (b) heavier rows are drawn more often — with weights
    1000:1 the heavy minority must dominate the sample; (c) weight<=0
    rows are never drawn; (d) deterministic across calls."""
    import pyspark.sql.functions as F

    from data_transformation_python_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, F.lit(1000.0))
        .when(F.col("id") < 110, F.lit(0.0))
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    out = weighted_sample_topk(df, "doc_id", "w", 50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = out.collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == 50
    heavy = sum(1 for i in ids if i < 100)
    assert heavy >= 40  # 100 rows at weight 1000 vs 1890 at weight 1
    assert not any(100 <= i < 110 for i in ids)  # zero-weight excluded
    assert ids == [r.doc_id for r in weighted_sample_topk(df, "doc_id", "w", 50).collect()]
