-- config: materialized=incremental, incremental_strategy=unique_key, unique_key=doc_id
-- Ingest: raw corpus, typed, with token counts.  Incremental by
-- unique key so re-runs merge new/changed documents instead of
-- rebuilding the table.
SELECT
    doc_id,
    text,
    lang,
    source,
    n_chars,
    CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens
FROM {{ source('raw', 'documents') }}
