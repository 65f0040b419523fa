"""Analytical query surface — joins, aggregations, windows, set ops,
scalar functions (SURVEY.md §2.3 J1/J5, §2.4 A1-A3, §2.5 W1, §2.6
O1-O5, §2.7) expressed Spark-first over the TPC-H-ish test tables.

The reference delegates all of these to the warehouse as SQL text
(reference: src/framework/connection.py:346-425); here they are
first-class DataFrame plans so Catalyst does pushdown, pruning, join
selection and AQE.

Determinism: measures are cast to exact DECIMAL before aggregation;
averages use integer division over exact micro-units; every top-k has
a unique tiebreaker.  Final output columns are cast DECIMAL→DOUBLE in
BOTH dialects: decimal→double is a single correctly-rounded IEEE
conversion (identical on both engines) and float64 renders
scale-insensitively, whereas fixed-scale decimals with trailing zeros
hash differently across engine client libraries.  Internal arithmetic
stays exact DECIMAL.  See queries/__init__.py docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load, query

D2 = "decimal(18,2)"
D4 = "decimal(18,4)"


def dec2(c) -> F.Column:
    return F.col(c).cast(D2)


# --------------------------------------------------------------------------
# q01 — pricing summary (A1: multi-aggregate GROUP BY; scalar arith §2.7)
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 1000000 AS BIGINT) // COUNT(*) AS BIGINT) AS avg_qty_micro,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).cast("double").alias("sum_disc_price"),
            F.sum(
                dec2("l_extendedprice")
                * (F.lit(1) - dec2("l_discount"))
                * (F.lit(1) + dec2("l_tax"))
            ).cast("double").alias("sum_charge"),
            F.expr(
                "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 1000000 AS BIGINT)"
                " div COUNT(*) AS BIGINT)"
            ).alias("avg_qty_micro"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q03 — shipping priority (J1 3-way join + top-k O3)
# --------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is the small side at scale → broadcast
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q04 — order priority with EXISTS (semi-join)
# --------------------------------------------------------------------------
@query(
    "q04_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    shipped_late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return shipped_late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --------------------------------------------------------------------------
# q05 — local supplier volume (J1 6-way join; broadcast dims)
# --------------------------------------------------------------------------
@query(
    "q05_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        # nation/region are tiny dimensions → always broadcast
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# q06 — forecast revenue (pure filter+agg; full predicate pushdown)
# --------------------------------------------------------------------------
@query(
    "q06_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & dec2("l_discount").between(F.lit(0.05).cast(D2), F.lit(0.07).cast(D2))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec2("l_extendedprice") * dec2("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q10 — returned items (join + group + top-k)
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q_monthly_revenue — DATE_TRUNC rollup (§2.7 scalar surface; gold-layer
# models, reference README.md:146-157)
# --------------------------------------------------------------------------
@query(
    "q_monthly_revenue",
    oracle="""
SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       CAST(COUNT(*) AS BIGINT) AS order_count,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers
FROM orders
GROUP BY 1
""",
)
def q_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month")
        )
        .agg(
            F.sum(dec2("o_totalprice")).cast("double").alias("total_revenue"),
            F.count(F.lit(1)).alias("order_count"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
    )


# --------------------------------------------------------------------------
# q_top_customers — agg + deterministic top-k
# --------------------------------------------------------------------------
@query(
    "q_top_customers",
    oracle="""
SELECT o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
ORDER BY total_spent DESC, o_custkey
LIMIT 25
""",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(dec2("o_totalprice")).cast("double").alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spent"), F.asc("o_custkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# q_window_rank — top-3 parts per brand by retail price (W1 ranking)
# --------------------------------------------------------------------------
@query(
    "q_window_rank",
    oracle="""
SELECT p_brand, p_partkey, CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS retail_price, CAST(rn AS INT) AS rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY CAST(p_retailprice AS DECIMAL(18,2)) DESC, p_partkey) AS rn
  FROM part) t
WHERE rn <= 3
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        dec2("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            dec2("p_retailprice").cast("double").alias("retail_price"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


# --------------------------------------------------------------------------
# q_running_total — window frame running sum over events (per user)
# --------------------------------------------------------------------------
@query(
    "q_running_total",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4)))
            OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
WHERE event_type = 'purchase'
""",
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(D4)).over(w).cast("double").alias("running_value"),
    )


# --------------------------------------------------------------------------
# q_rollup — hierarchical aggregates (GROUPING SETS family)
# --------------------------------------------------------------------------
@query(
    "q_rollup_returnflag",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# set operations (O4/O5 + §2.6 note: INTERSECT/EXCEPT)
# --------------------------------------------------------------------------
@query(
    "q_union_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
)
def q_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "q_intersect_custkeys",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return o.intersect(f)


@query(
    "q_except_customers",
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders
""",
)
def q_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.exceptAll(o.distinct()).distinct()


# --------------------------------------------------------------------------
# q_customers_without_orders — anti-join (NOT EXISTS)
# --------------------------------------------------------------------------
@query(
    "q_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# --------------------------------------------------------------------------
# q_region_rollup — join + hierarchical rollup (region → nation)
# --------------------------------------------------------------------------
@query(
    "q_region_rollup",
    oracle="""
SELECT r_name, n_name,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(dec2("c_acctbal")).cast("double").alias("total_balance"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


# --------------------------------------------------------------------------
# q_above_nation_average — correlated-aggregate pattern via window
# --------------------------------------------------------------------------
@query(
    "q_above_nation_average",
    oracle="""
WITH stats AS (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
              OVER (PARTITION BY c_nationkey) AS DECIMAL(28,2)) AS nation_sum,
         CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS nation_n
  FROM customer)
SELECT c_custkey, c_name, CAST(bal AS DOUBLE) AS bal
FROM stats
WHERE bal * nation_n > nation_sum
""",
)
def q_above_nation_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Above the group average' without a self-join OR float division:
    compare bal * n > sum (exact decimal × integer) — the window
    computes both per-nation aggregates in one pass."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    stats = cust.select(
        "c_custkey",
        "c_name",
        dec2("c_acctbal").alias("bal"),
        F.sum(dec2("c_acctbal")).over(w).cast("decimal(28,2)").alias("nation_sum"),
        F.count(F.lit(1)).over(w).alias("nation_n"),
    )
    return stats.filter(
        F.col("bal") * F.col("nation_n") > F.col("nation_sum")
    ).select("c_custkey", "c_name", F.col("bal").cast("double").alias("bal"))


# --------------------------------------------------------------------------
# q_status_matrix — pivot-style conditional aggregation
# --------------------------------------------------------------------------
@query(
    "q_status_matrix",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
FROM orders
GROUP BY o_orderpriority
""",
)
def q_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("bigint")
        .alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("n_filled"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
        .cast("bigint")
        .alias("n_pending"),
    )
