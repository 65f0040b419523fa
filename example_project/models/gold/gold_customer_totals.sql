-- config: materialized=incremental, incremental_strategy=unique_key, unique_key=customer_id
SELECT
    customer_id,
    SUM(amount) AS total_amount,
    COUNT(*) AS n_orders
FROM {{ ref('silver_orders') }}
{% if is_incremental() %}
-- second-run path: recompute per-key aggregates; MERGE upserts them into {{ this() }}
{% endif %}
GROUP BY customer_id
