-- config: materialized=table
-- Every per-document quality/language signal in ONE narrow scan (the
-- operators/text.py text_signals shape: the token array is
-- materialized once and all signals ride the same pass — no joins
-- between signal stages, no shuffle at all).
WITH staged AS (
    SELECT
        doc_id, text, lang, source, n_chars, n_tokens,
        split(text, ' ') AS toks
    FROM {{ ref('bronze_documents') }}
)
SELECT
    doc_id, text, lang, source, n_chars, n_tokens,
    aggregate(toks, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))
        AS sum_token_len,
    CAST(size(filter(toks, x -> x rlike '[a-zA-Z]')) AS BIGINT)
        AS n_alpha_words,
    CAST(size(regexp_extract_all(text, '#', 0))
         + size(regexp_extract_all(text, '\\.\\.\\.', 0)) AS BIGINT)
        AS n_symbols,
    CAST(size(filter(toks,
        x -> array_contains(array('the','a','and','of','to','is'), x)))
        AS BIGINT) AS n_stop_en,
    CAST(size(filter(toks,
        x -> array_contains(array('der','die','das','und','ist','ein'), x)))
        AS BIGINT) AS n_stop_de,
    CAST(size(filter(toks,
        x -> array_contains(array('el','la','los','y','es','un'), x)))
        AS BIGINT) AS n_stop_es
FROM staged
