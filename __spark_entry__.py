"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()``/``oracle_sql()`` expose the full verified operator
surface (see data_transformation_python_spark/queries/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_transformation_python_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: pricing summary over sf0.001 lineitem."""
    qs = all_queries()
    return qs["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §7
    extensions); each callable takes (spark, sf_dir) → DataFrame."""
    return dict(all_queries())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every oracle-expressible
    query (same aliases, deterministic values)."""
    return dict(all_oracles())
