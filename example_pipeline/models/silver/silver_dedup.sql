-- config: materialized=table
-- MinHash-LSH near-dup removal (greedy keep-smallest-id): 3-gram
-- shingles → 8 seeded minhashes → 4 bands of 2; a document drops if
-- ANY band bucket contains a smaller doc_id.  Candidates come from
-- banded bucket joins, never an all-pairs compare (the
-- operators/dedup.py discipline); docs under 3 tokens have no bands
-- and are kept.
--
-- REFERENCE-ONCE shape (optimization round 14): Spark inlines
-- deterministic CTEs, so the original bands-as-4-UNION-ALL plus the
-- drops self-join instantiated the whole toks→sh→sig corpus chain
-- EIGHT times in one plan.  posexplode emits the four band keys from
-- one sig pass, and "any smaller doc_id in my bucket" is a window
-- MIN over (band, bkey) — one corpus chain, one shuffle of the
-- 4-rows-per-doc band table, identical survivors.
WITH toks AS (
    SELECT doc_id, split(text, ' ') AS t
    FROM {{ ref('silver_quality') }}
),
idx AS (
    SELECT doc_id, t, explode(sequence(1, size(t) - 2)) AS i
    FROM toks WHERE size(t) >= 3
),
sh AS (
    SELECT DISTINCT doc_id,
           concat_ws(' ', element_at(t, i), element_at(t, i + 1),
                     element_at(t, i + 2)) AS shingle
    FROM idx
),
sig AS (
    SELECT doc_id,
           MIN(md5(concat('0:', shingle))) AS m0,
           MIN(md5(concat('1:', shingle))) AS m1,
           MIN(md5(concat('2:', shingle))) AS m2,
           MIN(md5(concat('3:', shingle))) AS m3,
           MIN(md5(concat('4:', shingle))) AS m4,
           MIN(md5(concat('5:', shingle))) AS m5,
           MIN(md5(concat('6:', shingle))) AS m6,
           MIN(md5(concat('7:', shingle))) AS m7
    FROM sh GROUP BY doc_id
),
bands AS (
    SELECT doc_id, band, bkey
    FROM sig
    LATERAL VIEW posexplode(array(
        md5(concat(m0, m1)), md5(concat(m2, m3)),
        md5(concat(m4, m5)), md5(concat(m6, m7)))) bx AS band, bkey
),
drops AS (
    SELECT DISTINCT doc_id
    FROM (
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY band, bkey) AS mn
        FROM bands
    ) w
    WHERE mn < doc_id
)
SELECT q.*
FROM {{ ref('silver_quality') }} q
LEFT ANTI JOIN drops d ON q.doc_id = d.doc_id
