-- config: materialized=table
-- Sequence packing: the admitted mix (all labeled-English docs +
-- the DSIR-selected rest) laid out into $pack_budget-PIECE training
-- windows — trained-tokenizer units from silver_tokenized (round 13:
-- a production pipeline packs tokenizer pieces, not whitespace
-- tokens), running piece total in deterministic (lang, doc_id)
-- order, partitioned per language so packing parallelizes across
-- groups at any scale.
WITH sel AS (
    SELECT t.doc_id, t.lang, t.n_tokens, t.n_pieces
    FROM {{ ref('silver_tokenized') }} t
    WHERE t.lang = 'en'
    UNION ALL
    SELECT t.doc_id, t.lang, t.n_tokens, t.n_pieces
    FROM {{ ref('silver_tokenized') }} t
    JOIN {{ ref('gold_dsir_selected') }} s ON t.doc_id = s.doc_id
),
cum AS (
    SELECT doc_id, lang, n_tokens, n_pieces,
           SUM(n_pieces) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM sel
)
SELECT doc_id, lang, n_tokens, n_pieces,
       concat(lang, '/',
              CAST((cum - n_pieces) div $pack_budget AS STRING)) AS pack_id,
       CAST((cum - n_pieces) % $pack_budget AS BIGINT) AS pack_offset
FROM cum
