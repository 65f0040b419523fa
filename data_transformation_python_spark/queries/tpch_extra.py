"""Extended TPC-H-family analytics — the classic query *shapes*
(volume shipping, market share, product profit, late-shipping
priority, disjunctive-predicate revenue, rich-customers-without-
orders) adapted to the driver's reduced column set (no partsupp /
shipmode / phone columns in the testdata).

Every query here is SHARED SQL: the identical text runs on Spark
(over temp views named like the base tables) and on the DuckDB oracle
(over its pre-registered views) — one source of truth, zero dialect
drift.  Determinism: exact DECIMAL internals, DOUBLE finals, BIGINT
counts, cross-multiplied comparisons instead of AVG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import load, query


def _shared(spark: SparkSession, sf_dir: str, tables: list[str], sql: str) -> DataFrame:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


# --------------------------------------------------------------------------
# q07 shape — volume shipping between nation pairs by year
# --------------------------------------------------------------------------
_Q07_SQL = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name <> sn.n_name
GROUP BY cn.n_name, sn.n_name, EXTRACT(YEAR FROM l_shipdate)
"""


@query("q07_volume_shipping", oracle=_Q07_SQL)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair trade volume: the 6-way join with a self-joined
    dimension (nation aliased twice) — Catalyst broadcasts both
    nation sides; the fact shuffle is on the join keys only."""
    return _shared(
        spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation"], _Q07_SQL
    )


# --------------------------------------------------------------------------
# q08 shape — market share of one supplier nation within a region
# --------------------------------------------------------------------------
_Q08_SQL = """
WITH region_orders AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part     ON l_partkey = p_partkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region    ON cn.n_regionkey = r_regionkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type LIKE '%ECONOMY%'
)
SELECT CAST(o_year AS INT) AS o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share,
       CAST(SUM(volume) AS DOUBLE) AS total_volume
FROM region_orders
GROUP BY o_year
"""


@query("q08_market_share", oracle=_Q08_SQL)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share ratio: both numerator and denominator are exact
    DECIMAL sums; the single double division is correctly rounded on
    identical inputs — the deterministic way to emit a ratio."""
    return _shared(
        spark,
        sf_dir,
        ["lineitem", "orders", "customer", "supplier", "part", "nation", "region"],
        _Q08_SQL,
    )


# --------------------------------------------------------------------------
# q09 shape — product profit by supplier nation and year
# --------------------------------------------------------------------------
_Q09_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS amount
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN part     ON l_partkey = p_partkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
"""


@query("q09_product_profit", oracle=_Q09_SQL)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared(
        spark, sf_dir, ["lineitem", "orders", "supplier", "part", "nation"], _Q09_SQL
    )


# --------------------------------------------------------------------------
# q12 shape — late shipping by order priority (conditional counts +
# date arithmetic; the reference's priority-bucketing CASE pattern)
# --------------------------------------------------------------------------
_Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
"""


@query("q12_late_shipping", oracle=_Q12_SQL)
def q12_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared(spark, sf_dir, ["lineitem", "orders"], _Q12_SQL)


# --------------------------------------------------------------------------
# q19 shape — disjunctive predicate revenue (OR-of-ANDs pushdown)
# --------------------------------------------------------------------------
_Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


@query("q19_disjunctive_revenue", oracle=_Q19_SQL)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicates: Catalyst extracts the common
    subexpressions it can push to each scan and evaluates the
    disjunction post-join — the classic q19 optimizer exercise."""
    return _shared(spark, sf_dir, ["lineitem", "part"], _Q19_SQL)


# --------------------------------------------------------------------------
# q22 shape — rich customers with no RECENT orders, per nation
# (anti-join + scalar aggregate; avg compared by cross-multiplication:
# exact.  The synthetic data gives every customer at least one order,
# so the anti-join is on recent orders to stay non-vacuous.)
# --------------------------------------------------------------------------
_Q22_SQL = """
WITH pos AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1997-06-01 00:00:00')
GROUP BY c_nationkey
"""


@query("q22_rich_no_orders", oracle=_Q22_SQL)
def q22_rich_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Above average balance' compares bal*n > sum (exact decimal ×
    integer — no float average), and the NOT EXISTS (with its date
    predicate pushed into the orders scan) compiles to a left-anti
    join in Spark."""
    return _shared(spark, sf_dir, ["customer", "orders"], _Q22_SQL)


# --------------------------------------------------------------------------
# PIVOT — wide conditional aggregation via the DataFrame pivot operator
# (oracle: CASE-based conditional sums, the relational equivalent)
# --------------------------------------------------------------------------
_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
FROM orders
GROUP BY o_orderpriority
"""


@query("q_pivot_status", oracle=_PIVOT_ORACLE)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame .pivot with EXPLICIT values — never let pivot infer
    the column set (that runs an extra distinct job and makes the
    output schema data-dependent, a schema-stability hazard at scale)."""
    from pyspark.sql import functions as F

    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"))
    )


# --------------------------------------------------------------------------
# UNPIVOT / melt — wide → long (oracle: stacked UNION ALL)
# --------------------------------------------------------------------------
_UNPIVOT_ORACLE = """
SELECT c_custkey, 'c_acctbal' AS measure,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS amount
FROM customer
UNION ALL
SELECT c_custkey, 'c_nationkey',
       CAST(CAST(c_nationkey AS DECIMAL(18,2)) AS DOUBLE)
FROM customer
"""


@query("q_unpivot_measures", oracle=_UNPIVOT_ORACLE)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame unpivot (Spark 3.4+) — the melt operator; the oracle
    is the stacked UNION ALL it is semantically defined as."""
    from pyspark.sql import functions as F

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("c_acctbal"),
        F.col("c_nationkey").cast("decimal(18,2)").cast("double").alias("c_nationkey"),
    )
    return cust.unpivot(
        ids=["c_custkey"],
        values=["c_acctbal", "c_nationkey"],
        variableColumnName="measure",
        valueColumnName="amount",
    )


# --------------------------------------------------------------------------
# JSON metadata extraction — construct a JSON doc column, then extract
# typed fields (the shape every training-data metadata pipeline runs)
# --------------------------------------------------------------------------
_JSON_SQL_SPARK = """
WITH j AS (
  SELECT o_orderkey,
         to_json(named_struct(
           'status', o_orderstatus,
           'prio', o_orderpriority,
           'amount', CAST(o_totalprice AS DECIMAL(18,2)))) AS meta
  FROM {t}
  WHERE o_orderkey <= 2000
)
SELECT o_orderkey,
       get_json_object(meta, '$.status') AS status,
       get_json_object(meta, '$.prio') AS prio,
       CAST(get_json_object(meta, '$.amount') AS DOUBLE) AS amount
FROM j
"""

_JSON_ORACLE = """
WITH j AS (
  SELECT o_orderkey,
         to_json(struct_pack(
           status := o_orderstatus,
           prio := o_orderpriority,
           amount := CAST(o_totalprice AS DECIMAL(18,2)))) AS meta
  FROM orders
  WHERE o_orderkey <= 2000
)
SELECT o_orderkey,
       json_extract_string(meta, '$.status') AS status,
       json_extract_string(meta, '$.prio') AS prio,
       CAST(json_extract(meta, '$.amount') AS DOUBLE) AS amount
FROM j
"""


@query("q_json_metadata", oracle=_JSON_ORACLE)
def q_json_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON round-trip: build a metadata document per row, extract
    typed fields back with JSONPath — all JVM-side (no UDF).  The
    amount goes through DECIMAL→string→DOUBLE on both engines so the
    extracted value is identical."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_json_v")
    return spark.sql(_JSON_SQL_SPARK.format(t="orders_json_v"))
