-- config: materialized=table, cluster_by=order_date, cluster_files=4
-- Range-clustered layout: every parquet file covers a disjoint
-- order_date range, so date-predicate scans prune whole files via
-- row-group min/max stats.
SELECT order_id, customer_id, order_date, amount
FROM {{ ref('silver_orders') }}
