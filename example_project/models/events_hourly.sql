-- config: materialized=incremental, incremental_strategy=time, time_column=event_ts
SELECT
    event_id,
    CAST(ts AS TIMESTAMP_NTZ) AS event_ts,
    user_id,
    event_type,
    value
FROM {{ source('raw', 'events') }}
