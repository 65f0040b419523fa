-- config: materialized=table
-- depends_on: bronze_orders
-- Silver layer: typed, cleaned, filtered.
SELECT
    order_id,
    customer_id,
    CAST(order_date AS DATE) AS order_date,
    CAST(amount AS DECIMAL(12,2)) AS amount,
    UPPER(TRIM(status)) AS status
FROM {{ ref('bronze_orders') }}
WHERE amount > $min_amount
