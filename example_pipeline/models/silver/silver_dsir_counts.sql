-- config: materialized=table
-- Per-(doc, bucket) hashed-ngram counts of the decontaminated corpus
-- — the shared intermediate BOTH halves of DSIR consume: the
-- target/rest histograms (per-bucket sums) and the per-document
-- scoring join.  Materialized as its own model (optimization round
-- 14, the silver_words pattern): Spark inlines deterministic CTEs,
-- so keeping this inside gold_dsir_selected instantiated the full
-- tokenize→gram-explode→hash chain THREE times (t_hist, r_hist, c)
-- per plan — at production scale three corpus passes for one model.
-- One tokenize pass, one map-side-combined aggregate; downstream
-- reads a narrow table whose row count is bounded by
-- docs × min(1024, grams-per-doc).
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
)
SELECT doc_id, lang,
       pmod(CAST(conv(substr(md5(gram), 1, 12), 16, 10) AS BIGINT),
            1024) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS c
FROM grams
GROUP BY doc_id, lang, bucket
