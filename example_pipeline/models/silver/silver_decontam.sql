-- config: materialized=table
-- Benchmark decontamination (the operators/dedup.py
-- contamination_hits shape): every 20th raw document stands in for
-- an external eval suite; a training document drops if its SCRUBBED
-- text shares ANY 8-gram with the (raw) eval text, and the eval
-- stand-ins themselves never enter the training mix.  The benchmark
-- shingle set is eval-suite-sized and BROADCASTS — shingling stays
-- map-side and only the per-doc hit set shuffles, which is what
-- keeps decontamination tractable against a 100 TB corpus.
WITH bt AS (
    SELECT split(text, ' ') AS t
    FROM {{ ref('bronze_documents') }}
    WHERE doc_id % 20 = 0
),
bi AS (
    SELECT t, explode(sequence(1, size(t) - 7)) AS i
    FROM bt WHERE size(t) >= 8
),
bench AS (
    SELECT DISTINCT
           concat_ws(' ', element_at(t, i), element_at(t, i + 1),
                     element_at(t, i + 2), element_at(t, i + 3),
                     element_at(t, i + 4), element_at(t, i + 5),
                     element_at(t, i + 6), element_at(t, i + 7)) AS shingle
    FROM bi
),
tt AS (
    SELECT doc_id, split(text, ' ') AS t
    FROM {{ ref('silver_scrubbed') }}
    WHERE doc_id % 20 != 0
),
ti AS (
    SELECT doc_id, t, explode(sequence(1, size(t) - 7)) AS i
    FROM tt WHERE size(t) >= 8
),
tsh AS (
    SELECT DISTINCT doc_id,
           concat_ws(' ', element_at(t, i), element_at(t, i + 1),
                     element_at(t, i + 2), element_at(t, i + 3),
                     element_at(t, i + 4), element_at(t, i + 5),
                     element_at(t, i + 6), element_at(t, i + 7)) AS shingle
    FROM ti
),
hits AS (
    SELECT /*+ BROADCAST(b) */ DISTINCT s.doc_id
    FROM tsh s JOIN bench b ON s.shingle = b.shingle
)
SELECT d.*
FROM {{ ref('silver_scrubbed') }} d
LEFT ANTI JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 20 != 0
