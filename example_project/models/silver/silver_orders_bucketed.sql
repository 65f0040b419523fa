-- config: materialized=incremental, incremental_strategy=unique_key, unique_key=order_id, merge_buckets=16
-- depends_on: bronze_orders
-- Bucketed-merge variant of silver_orders: the target is partitioned
-- by pmod(xxhash64(order_id), 16) and each incremental run rewrites
-- ONLY buckets containing changed keys (operators/bucketed_merge.py)
-- instead of staging + rewriting the whole table.
SELECT
    order_id,
    customer_id,
    CAST(order_date AS DATE) AS order_date,
    CAST(amount AS DECIMAL(12,2)) AS amount,
    UPPER(TRIM(status)) AS status
FROM {{ ref('bronze_orders') }}
WHERE amount > $min_amount
