-- config: materialized=table
-- DSIR importance selection (Xie et al. 2023, the samp_dsir shape):
-- the trusted labeled-English slice (metadata lang column) of the
-- deduped corpus is the TARGET — the synthetic corpus shares one
-- vocabulary across language labels, so predicted_lang cannot split
-- it, but a real pipeline would swap in any curated target slice;
-- every other document scores by integer-quantized hashed-ngram
-- enrichment weight, and the $dsir_keep_k most target-like are
-- admitted to the training mix.  Both histograms are one
-- map-side-combined shuffle; scoring joins a 1024-bucket broadcast
-- weight table.
WITH toks AS (
    SELECT doc_id, lang,
           filter(split(text, ' '), x -> x <> '') AS tk
    FROM {{ ref('silver_decontam') }}
),
grams AS (
    SELECT doc_id, lang,
           explode(concat(tk,
               transform(slice(sequence(1, size(tk) + 1), 1,
                               greatest(size(tk) - 1, 0)),
                   i -> concat(element_at(tk, i), ' ',
                               element_at(tk, i + 1))))) AS gram
    FROM toks
),
b AS (
    SELECT doc_id, lang,
           pmod(CAST(conv(substr(md5(gram), 1, 12), 16, 10) AS BIGINT),
                1024) AS bucket
    FROM grams
),
t_hist AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS t_b
           FROM b WHERE lang = 'en' GROUP BY bucket),
r_hist AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS r_b
           FROM b WHERE lang <> 'en' GROUP BY bucket),
tot AS (SELECT (SELECT CAST(SUM(t_b) AS BIGINT) FROM t_hist) AS tt,
               (SELECT CAST(SUM(r_b) AS BIGINT) FROM r_hist) AS rt),
wts AS (
    SELECT COALESCE(r.bucket, t.bucket) AS bucket,
           CAST(1000000 * (COALESCE(t.t_b, 0) + 1) * (rt + 1024)
                div ((COALESCE(r.r_b, 0) + 1) * (tt + 1024))
                - 1000000 AS BIGINT) AS w_b
    FROM r_hist r FULL OUTER JOIN t_hist t ON r.bucket = t.bucket, tot
),
c AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM b WHERE lang <> 'en' GROUP BY doc_id, bucket),
sc AS (SELECT doc_id, CAST(SUM(c * w_b) AS BIGINT) AS dsir_score
       FROM c JOIN wts USING (bucket) GROUP BY doc_id)
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
