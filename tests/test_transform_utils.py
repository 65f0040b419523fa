"""Tests for the P5/A3/S11 utility operators."""

from __future__ import annotations

import uuid

import pytest

from data_transformation_python_spark.operators.transform import (
    apply_aliases,
    apply_filters,
    clone_schema,
    grouped_aggregate,
)


def test_grouped_aggregate_aliases(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 3.0, 2), ("b", 5.0, 2)], "g string, v double, u int"
    )
    out = grouped_aggregate(df, ["g"], {"v": ["sum", "mean"], "u": "n_unique"})
    rows = {r.g: r for r in out.collect()}
    assert rows["a"].v_sum == 4.0
    assert rows["a"].v_mean == 2.0
    assert rows["a"].u_n_unique == 2
    assert rows["b"].u_n_unique == 1
    with pytest.raises(ValueError):
        grouped_aggregate(df, ["g"], {"v": "median_of_medians"})


def test_apply_filters_and_aliases(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id int, v int")
    out = apply_filters(df, ["v > 10", "id < 3"])
    assert [r.id for r in out.collect()] == [2]
    renamed = apply_aliases(df, {"v": "value"})
    assert "value" in renamed.columns and "v" not in renamed.columns


def test_clone_schema(spark):
    db = f"clone_{uuid.uuid4().hex[:6]}"
    spark.sql(f"CREATE DATABASE {db}")
    try:
        spark.createDataFrame([(1, "x")], "id bigint, v string").write.saveAsTable(
            f"{db}.src"
        )
        clone_schema(spark, f"{db}.src", f"{db}.dst")
        dst = spark.table(f"{db}.dst")
        assert dst.count() == 0
        assert dst.schema == spark.table(f"{db}.src").schema
    finally:
        spark.sql(f"DROP DATABASE {db} CASCADE")
