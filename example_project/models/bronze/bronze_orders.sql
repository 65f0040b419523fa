-- config: materialized=view
-- Bronze layer: raw orders with load metadata.
SELECT
    o_orderkey   AS order_id,
    o_custkey    AS customer_id,
    o_orderdate  AS order_date,
    o_totalprice AS amount,
    o_orderstatus AS status,
    current_timestamp() AS load_timestamp
FROM {{ source('raw', 'orders') }}
