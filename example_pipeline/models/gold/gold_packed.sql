-- config: materialized=table
-- Sequence packing: the admitted mix (all labeled-English docs +
-- the DSIR-selected rest) laid out into $pack_budget-token training
-- windows — running token total in deterministic (lang, doc_id)
-- order, partitioned per language so packing parallelizes across
-- groups at any scale.
WITH sel AS (
    SELECT d.doc_id, d.lang, d.n_tokens
    FROM {{ ref('silver_decontam') }} d
    WHERE d.lang = 'en'
    UNION ALL
    SELECT d.doc_id, d.lang, d.n_tokens
    FROM {{ ref('silver_decontam') }} d
    JOIN {{ ref('gold_dsir_selected') }} s ON d.doc_id = s.doc_id
),
cum AS (
    SELECT doc_id, lang, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM sel
)
SELECT doc_id, lang, n_tokens,
       concat(lang, '/',
              CAST((cum - n_tokens) div $pack_budget AS STRING)) AS pack_id,
       CAST((cum - n_tokens) % $pack_budget AS BIGINT) AS pack_offset
FROM cum
