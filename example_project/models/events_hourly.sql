-- config: materialized=incremental, incremental_strategy=time, time_column=event_ts
SELECT
    event_id,
    timestamp_micros(CAST(ts div 1000 AS BIGINT)) AS event_ts,
    user_id,
    event_type,
    value
FROM {{ source('raw', 'events') }}
