"""Binned (bucketed) range join — the scale path for point-in-interval
joins.

Spark plans a plain non-equi join (``p.x BETWEEN i.lo AND i.hi``) as a
broadcast-nested-loop join: every point row is tested against every
interval — O(N·M) work that only survives when one side is tiny.  The
standard fix (used by Databricks' range-join optimization and
interval-join engines) is binning: pick a bucket width W, explode each
interval onto the fixed-width buckets it overlaps (a bounded explode —
``(hi-lo)/W + 1`` rows per interval), map each point to the single
bucket containing it, equi-join on the bucket id, and re-check the
exact predicate to discard bucket-granularity false positives.

The equi-join shuffles on the bucket key (or broadcasts a small
interval side), so the cost is O(N + M·spans + candidates) — linear,
partitionable, AQE-skew-splittable — instead of O(N·M).  Overlapping
and unsorted intervals are fine; W trades bucket fan-out on the
interval side against false-positive candidates per bucket (set W
near the median interval width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (inclusive both ends) via fixed-width
    bucketing.  Returns the joined columns (bucket key dropped).

    ``how`` is restricted to ``inner`` — outer variants would need
    candidate-absence handling that belongs to the caller.
    """
    if how != "inner":
        raise ValueError("range_join_binned supports inner joins only")
    w = F.lit(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("bigint"),
                F.floor(F.col(hi_col) / w).cast("bigint"),
            )
        ),
    )
    pt = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / w).cast("bigint")
    )
    return (
        pt.join(iv, "__bucket")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bucket")
    )
