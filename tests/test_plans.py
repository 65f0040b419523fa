"""Plan-shape regression tests: the optimizations the engine depends
on at scale must actually appear in the physical plans (pushdown,
column pruning, broadcast joins) — not just in documentation."""

from __future__ import annotations

import re

import pytest

from data_transformation_python_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    # scan metadata (PushedFilters/ReadSchema) is truncated to 100
    # chars by default — widen so assertions see whole filter lists
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = all_queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q03_pushdown_and_broadcast(spark):
    plan = _plan(spark, "q03_shipping_priority")
    # date predicates reach the parquet readers
    assert "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "BroadcastHashJoin" in plan


def test_q03_column_pruning(spark):
    plan = _plan(spark, "q03_shipping_priority")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li_schema = next(s for s in schemas if "l_extendedprice" in s)
    # lineitem has 11 columns; the scan must read only what q03 needs
    assert len(li_schema.split(",")) <= 4, li_schema


def test_q05_all_dimension_joins_broadcast(spark):
    plan = _plan(spark, "q05_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "r_name,ASIA" in plan.replace("EqualTo(", "").replace(")", ",") or (
        "EqualTo(r_name,ASIA)" in plan
    )


def test_q06_full_pushdown_no_join(spark):
    plan = _plan(spark, "q06_forecast_revenue")
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "Join" not in plan


def test_incremental_watermark_pushdown(spark):
    plan = _plan(spark, "q_incremental_watermark")
    # the watermark predicate must reach the parquet scan, not sit in
    # a post-scan filter only
    assert re.search(r"PushedFilters: \[.*GreaterThan\(ts", plan), plan
