-- config: materialized=table
-- DSIR importance selection (Xie et al. 2023, the samp_dsir shape):
-- the trusted labeled-English slice (metadata lang column) of the
-- deduped corpus is the TARGET — the synthetic corpus shares one
-- vocabulary across language labels, so predicted_lang cannot split
-- it, but a real pipeline would swap in any curated target slice;
-- every other document scores by integer-quantized hashed-ngram
-- enrichment weight, and the $dsir_keep_k most target-like are
-- admitted to the training mix.
--
-- REFERENCE-ONCE over the materialized silver_dsir_counts table
-- (optimization round 14): both histograms come from ONE aggregate
-- of the counts table (a bucket appears iff it has any gram, the
-- FULL OUTER JOIN's COALESCE(.., 0) becomes the CASE sums), the
-- smoothing totals ride SUM() OVER () instead of CROSS JOINed
-- scalar-subquery CTEs, and scoring joins the same table — the
-- corpus-sized tokenize chain runs zero times here.
WITH hist AS (
    SELECT bucket,
           CAST(SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END)
                AS BIGINT) AS t_b,
           CAST(SUM(CASE WHEN lang <> 'en' THEN c ELSE 0 END)
                AS BIGINT) AS r_b
    FROM {{ ref('silver_dsir_counts') }}
    GROUP BY bucket
),
wts AS (
    SELECT bucket,
           CAST(1000000 * (t_b + 1) * (rt + 1024)
                div ((r_b + 1) * (tt + 1024))
                - 1000000 AS BIGINT) AS w_b
    FROM (
        SELECT bucket, t_b, r_b,
               SUM(t_b) OVER () AS tt,
               SUM(r_b) OVER () AS rt
        FROM hist
    ) h
),
sc AS (
    SELECT doc_id, CAST(SUM(c * w_b) AS BIGINT) AS dsir_score
    FROM {{ ref('silver_dsir_counts') }} cc
    JOIN wts USING (bucket)
    WHERE cc.lang <> 'en'
    GROUP BY doc_id
)
-- inner ORDER BY + LIMIT is a distributed TakeOrdered; the global
-- single-partition window then runs on <= $dsir_keep_k rows only
-- (same bounded pattern as operators/sampling.py — do not copy onto
-- an unbounded frame)
SELECT doc_id, dsir_score,
       CAST(ROW_NUMBER() OVER (ORDER BY dsir_score DESC, doc_id)
            AS BIGINT) AS rank
FROM (
    SELECT doc_id, dsir_score FROM sc
    ORDER BY dsir_score DESC, doc_id LIMIT $dsir_keep_k
)
