"""Targeted oracle-parity check for NAMED queries (round-15 tooling):
same comparison as parity_sweep.py (row count, schema, order-
insensitive canonical hash vs the DuckDB oracle) but only for the
queries you pass — the fast inner loop while optimizing an operator.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/parity_some.py q1 [q2..]
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import parity_sweep as ps  # noqa: E402
from data_transformation_python_spark.queries import (  # noqa: E402
    all_oracles,
    all_queries,
)
from data_transformation_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="dtps-parity-some")
    con = duckdb.connect()
    for t in ps.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = all_queries(), all_oracles()
    n_bad = 0
    for name in names:
        fn = queries[name]
        sdf = fn(spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        ora = oracles.get(name)
        if ora is None:
            print(f"{name}: no oracle ({len(srows)} rows)")
            continue
        cur = con.execute(ora)
        cols = [d[0] for d in cur.description]
        orows = [dict(zip(cols, r)) for r in cur.fetchall()]
        ok = (
            len(srows) == len(orows)
            and ps._canon(srows) == ps._canon(orows)
        )
        n_bad += 0 if ok else 1
        print(f"{name}: {'OK' if ok else 'MISMATCH'}"
              f" ({len(srows)} vs {len(orows)} rows)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
