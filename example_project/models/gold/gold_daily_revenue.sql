-- config: materialized=table, partition_by=order_month
-- meta:
--   owner: analytics
--   sla_hours: 24
SELECT
    DATE_TRUNC('month', order_date) AS order_month,
    order_date,
    SUM(amount) AS revenue,
    COUNT(*) AS n_orders
FROM {{ ref('silver_orders') }}
GROUP BY DATE_TRUNC('month', order_date), order_date
