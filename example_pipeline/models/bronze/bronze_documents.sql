-- config: materialized=incremental, incremental_strategy=unique_key, unique_key=doc_id
-- Ingest: raw corpus, typed, with token counts.  Incremental by
-- unique key so re-runs merge new/changed documents instead of
-- rebuilding the table.
--
-- Synthetic-PII stamp: the driver fixture corpus carries no PII, so
-- ingest plants one deterministic contact line per document
-- (doc_id-derived email + phone, the text_pii_scrub gate's fixture
-- shape) — which silver_scrubbed MUST redact for every downstream
-- stage to replay.  n_tokens counts the stamped text; the scrub is
-- 1:1 token-preserving (<EMAIL>/<PHONE> placeholders), so the count
-- stays valid corpus-wide.
SELECT
    doc_id,
    concat(text, ' contact user', CAST(doc_id AS STRING),
           '@mail.example or call +1-555-',
           lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) AS text,
    lang,
    source,
    n_chars,
    CAST(size(split(concat(text, ' contact user', CAST(doc_id AS STRING),
                           '@mail.example or call +1-555-',
                           lpad(CAST(doc_id % 10000 AS STRING), 4, '0')),
                    ' ')) AS BIGINT) AS n_tokens
FROM {{ source('raw', 'documents') }}
