"""Local replica of the driver's t2 gate: run every registered query
on Spark AND its DuckDB oracle on the same parquet, compare row count,
column names, and order-insensitive values.

This is the self-check that every queries()/oracle_sql() pair stays
hash-identical before the driver measures it at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from data_transformation_python_spark.queries import all_oracles, all_queries

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    # Deliberately NO decimal normalization: the driver's hash is
    # scale-sensitive on one side (trailing-zero decimals mismatch),
    # so the local gate must be at least as strict.  Decimal cells are
    # additionally banned outright by test_no_decimal_outputs.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def _assert_no_decimal(name, df):
    """Final projections must never emit DECIMAL: fixed-scale decimals
    with trailing zeros hash differently across engine client
    libraries (proven driver-gate failure mode).  Internal math stays
    exact DECIMAL; the final cast to DOUBLE is a single
    correctly-rounded conversion, identical on both engines."""
    from pyspark.sql.types import DecimalType

    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, f"{name}: DECIMAL columns in final output: {bad}"


def _assert_no_complex(name, df):
    """Oracle-gated projections must be flat scalars: the driver
    canonicalizer sorts rows with pandas, and list/struct/map cells
    raise ``TypeError: unhashable type`` before any comparison runs
    (proven failure mode — sim_pq_codes_blas, round 5).  Serialize
    arrays to a joined string in the gate surface instead."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name}: complex-typed columns in final output: {bad}"


@pytest.mark.parametrize("name", sorted(all_queries().keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    oracles = all_oracles()
    if name not in oracles:
        # rows-only check for non-SQL-expressible ops
        df = all_queries()[name](spark, sf_dir)
        _assert_no_decimal(name, df)
        assert df.count() >= 0
        return
    sdf = all_queries()[name](spark, sf_dir)
    _assert_no_decimal(name, sdf)
    _assert_no_complex(name, sdf)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sset = _rowset(spark_cols, spark_rows)
    dset = _rowset(duck_cols, duck_rows)
    if sset != dset:
        diffs = [
            (a, b) for a, b in zip(sset, dset) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


