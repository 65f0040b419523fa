-- config: materialized=table
-- Tokenization of the decontaminated corpus under the TRAINED
-- vocabulary — the serving twin of silver_vocab's config-driven
-- family switch (round 14): the unigram branch is one more Viterbi
-- E-step over the distinct-word cache + a word-key join; the BPE
-- branch (bpe_serve_model_sql(8)) applies the k trained merges in
-- step order as narrow regexp_replace projections, each merge row
-- LEFT-JOINed ON true from the MATERIALIZED merge table (so a
-- shorter-than-k merge list passes steps through unchanged).
-- Every decontam survivor appears EXACTLY ONCE in both branches
-- (doc-level LEFT JOIN, n_pieces 0 when nothing segments), and both
-- emit n_unsegmented — the count of doc words with no segmentation
-- row, the batch twin of unigram_tokenize_serve's OOV column
-- (round-13 verdict item 4).  In-domain (the vocab trains on this
-- same corpus) it is structurally 0, which the tokenized_in_domain
-- DQ test asserts.  gold_packed budgets these PIECE counts.
--
-- Unigram branch (default):
-- Unigram-LM tokenization of the decontaminated corpus under the
-- TRAINED vocabulary (the operators/text.py unigram_tokenize batch
-- join path): one more Viterbi E-step over the distinct-word cache
-- under the final scores, then a word-key join from documents onto
-- the per-word segmentation and a doc-key piece count.  Every
-- decontam survivor appears EXACTLY ONCE (left join: a document
-- whose words all exceed max_word has n_pieces 0 but still packs).
-- gold_packed packs these PIECE counts — trained-tokenizer units,
-- not whitespace tokens.  Same generated-DP contract as
-- silver_vocab.
{% if var('tokenizer', 'unigram') == 'bpe' %}
WITH mt AS (SELECT step, left_sym, right_sym FROM {{ ref('silver_vocab') }}),
dw AS (SELECT doc_id, word FROM (SELECT doc_id, explode(split(text, ' ')) AS word FROM {{ ref('silver_decontam') }}) WHERE word <> ''),
t0 AS (SELECT word, concat(' ', array_join(transform(sequence(1, length(word)), i -> substr(word, i, 1)), ' '), ' ') AS symstr FROM (SELECT word FROM {{ ref('silver_words') }}))
,t1 AS (SELECT word, CASE WHEN m.left_sym IS NULL THEN symstr ELSE regexp_replace(symstr, concat(' ', concat('\\Q', replace(m.left_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), ' ', concat('\\Q', replace(m.right_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), '(?= )'), concat(' ', replace(replace(concat(m.left_sym, m.right_sym), '\\', '\\\\'), '$', '\\$'))) END AS symstr FROM t0 LEFT JOIN (SELECT left_sym, right_sym FROM mt WHERE step = 0) m ON true)
,t2 AS (SELECT word, CASE WHEN m.left_sym IS NULL THEN symstr ELSE regexp_replace(symstr, concat(' ', concat('\\Q', replace(m.left_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), ' ', concat('\\Q', replace(m.right_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), '(?= )'), concat(' ', replace(replace(concat(m.left_sym, m.right_sym), '\\', '\\\\'), '$', '\\$'))) END AS symstr FROM t1 LEFT JOIN (SELECT left_sym, right_sym FROM mt WHERE step = 1) m ON true)
,t3 AS (SELECT word, CASE WHEN m.left_sym IS NULL THEN symstr ELSE regexp_replace(symstr, concat(' ', concat('\\Q', replace(m.left_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), ' ', concat('\\Q', replace(m.right_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), '(?= )'), concat(' ', replace(replace(concat(m.left_sym, m.right_sym), '\\', '\\\\'), '$', '\\$'))) END AS symstr FROM t2 LEFT JOIN (SELECT left_sym, right_sym FROM mt WHERE step = 2) m ON true)
,t4 AS (SELECT word, CASE WHEN m.left_sym IS NULL THEN symstr ELSE regexp_replace(symstr, concat(' ', concat('\\Q', replace(m.left_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), ' ', concat('\\Q', replace(m.right_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), '(?= )'), concat(' ', replace(replace(concat(m.left_sym, m.right_sym), '\\', '\\\\'), '$', '\\$'))) END AS symstr FROM t3 LEFT JOIN (SELECT left_sym, right_sym FROM mt WHERE step = 3) m ON true)
,t5 AS (SELECT word, CASE WHEN m.left_sym IS NULL THEN symstr ELSE regexp_replace(symstr, concat(' ', concat('\\Q', replace(m.left_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), ' ', concat('\\Q', replace(m.right_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), '(?= )'), concat(' ', replace(replace(concat(m.left_sym, m.right_sym), '\\', '\\\\'), '$', '\\$'))) END AS symstr FROM t4 LEFT JOIN (SELECT left_sym, right_sym FROM mt WHERE step = 4) m ON true)
,t6 AS (SELECT word, CASE WHEN m.left_sym IS NULL THEN symstr ELSE regexp_replace(symstr, concat(' ', concat('\\Q', replace(m.left_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), ' ', concat('\\Q', replace(m.right_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), '(?= )'), concat(' ', replace(replace(concat(m.left_sym, m.right_sym), '\\', '\\\\'), '$', '\\$'))) END AS symstr FROM t5 LEFT JOIN (SELECT left_sym, right_sym FROM mt WHERE step = 5) m ON true)
,t7 AS (SELECT word, CASE WHEN m.left_sym IS NULL THEN symstr ELSE regexp_replace(symstr, concat(' ', concat('\\Q', replace(m.left_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), ' ', concat('\\Q', replace(m.right_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), '(?= )'), concat(' ', replace(replace(concat(m.left_sym, m.right_sym), '\\', '\\\\'), '$', '\\$'))) END AS symstr FROM t6 LEFT JOIN (SELECT left_sym, right_sym FROM mt WHERE step = 6) m ON true)
,t8 AS (SELECT word, CASE WHEN m.left_sym IS NULL THEN symstr ELSE regexp_replace(symstr, concat(' ', concat('\\Q', replace(m.left_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), ' ', concat('\\Q', replace(m.right_sym, '\\E', '\\E\\\\E\\Q'), '\\E'), '(?= )'), concat(' ', replace(replace(concat(m.left_sym, m.right_sym), '\\', '\\\\'), '$', '\\$'))) END AS symstr FROM t7 LEFT JOIN (SELECT left_sym, right_sym FROM mt WHERE step = 7) m ON true)
,seg AS (SELECT word, CAST(size(split(substr(symstr, 2, length(symstr) - 2), ' ')) AS BIGINT) AS n_syms FROM t8)
,pc AS (SELECT dw.doc_id, CAST(SUM(seg.n_syms) AS BIGINT) AS n_pieces, CAST(SUM(CASE WHEN seg.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseg FROM dw LEFT JOIN seg ON dw.word = seg.word GROUP BY dw.doc_id)
SELECT d.doc_id, d.lang, d.source, d.n_chars, d.n_tokens,
       d.predicted_lang,
       CAST(COALESCE(pc.n_pieces, 0) AS BIGINT) AS n_pieces,
       CAST(COALESCE(pc.n_unseg, 0) AS BIGINT) AS n_unsegmented
FROM {{ ref('silver_decontam') }} d
LEFT JOIN pc ON d.doc_id = pc.doc_id
{% else %}
WITH m AS (
    SELECT map_from_entries(collect_list(struct(piece, neg_logprob_q)))
           AS vmap
    FROM {{ ref('silver_vocab') }}
),
w AS (
    -- distinct-word cache from the MATERIALIZED silver_words
    -- histogram (round 14) -- same word set, no corpus re-scan
    SELECT word, CAST(n AS INT) AS n
    FROM {{ ref('silver_words') }}
    WHERE n <= 12
),
e AS (
    SELECT w.word, w.n, m.vmap,
           aggregate(sequence(1, n), array(CAST(0 AS BIGINT)), (acc, i) -> array_append(acc, LEAST(IF(i >= 1, element_at(acc, i - 1 + 1) + COALESCE(try_element_at(vmap, substr(word, i - 1 + 1, 1)) * 8192 + shiftleft(1, i), CAST(1099511627776 AS BIGINT)), CAST(1099511627776 AS BIGINT)), IF(i >= 2, element_at(acc, i - 2 + 1) + COALESCE(try_element_at(vmap, substr(word, i - 2 + 1, 2)) * 8192 + shiftleft(1, i), CAST(1099511627776 AS BIGINT)), CAST(1099511627776 AS BIGINT)), IF(i >= 3, element_at(acc, i - 3 + 1) + COALESCE(try_element_at(vmap, substr(word, i - 3 + 1, 3)) * 8192 + shiftleft(1, i), CAST(1099511627776 AS BIGINT)), CAST(1099511627776 AS BIGINT)), IF(i >= 4, element_at(acc, i - 4 + 1) + COALESCE(try_element_at(vmap, substr(word, i - 4 + 1, 4)) * 8192 + shiftleft(1, i), CAST(1099511627776 AS BIGINT)), CAST(1099511627776 AS BIGINT))))) AS dp,
           reverse(aggregate(sequence(1, n), array(CAST(0 AS BIGINT)), (acc, s) -> array_append(acc, LEAST(IF(1 <= s, COALESCE(try_element_at(vmap, substr(word, n - s + 1, 1)) * 8192 + shiftleft(1, n - s + 1), CAST(1099511627776 AS BIGINT)) + element_at(acc, s - 1 + 1), CAST(1099511627776 AS BIGINT)), IF(2 <= s, COALESCE(try_element_at(vmap, substr(word, n - s + 1, 2)) * 8192 + shiftleft(1, n - s + 2), CAST(1099511627776 AS BIGINT)) + element_at(acc, s - 2 + 1), CAST(1099511627776 AS BIGINT)), IF(3 <= s, COALESCE(try_element_at(vmap, substr(word, n - s + 1, 3)) * 8192 + shiftleft(1, n - s + 3), CAST(1099511627776 AS BIGINT)) + element_at(acc, s - 3 + 1), CAST(1099511627776 AS BIGINT)), IF(4 <= s, COALESCE(try_element_at(vmap, substr(word, n - s + 1, 4)) * 8192 + shiftleft(1, n - s + 4), CAST(1099511627776 AS BIGINT)) + element_at(acc, s - 4 + 1), CAST(1099511627776 AS BIGINT)))))) AS sp
    FROM w CROSS JOIN m
),
seg AS (
    -- per-word ON-PATH PIECE COUNT as a row-local higher-order
    -- filter (optimization round 15): the former cand CTE exploded
    -- up to 48 (j, L) rows per word (each carrying dp/sp and the
    -- broadcast vocab map) and the doc join then multiplied doc
    -- words by pieces.  The HOF evaluates the SAME per-(j, L)
    -- equality and keeps only its COUNT, so the join is one row per
    -- distinct word: SUM(np) ≡ the former COUNT(piece), and a word
    -- with zero matches (np 0 here; formerly a NULL piece after the
    -- left join) counts as unsegmented via the np = 0 arm below
    SELECT word,
           CAST(size(flatten(transform(sequence(0, n - 1), j ->
               filter(transform(sequence(1, least(4, n - j)), L ->
                   CASE WHEN element_at(dp, j + 1) + try_element_at(vmap, substr(word, j + 1, L)) * 8192 + shiftleft(1, j + L) + element_at(sp, j + L + 1) = element_at(dp, n + 1)
                        THEN substr(word, j + 1, L) END),
                   p -> p IS NOT NULL)))) AS BIGINT) AS np
    FROM e
),
dw AS (
    SELECT doc_id, word
    FROM (SELECT doc_id, explode(split(text, ' ')) AS word
          FROM {{ ref('silver_decontam') }})
    WHERE word <> '' AND length(word) <= 12
),
pc AS (
    SELECT dw.doc_id, CAST(COALESCE(SUM(s.np), 0) AS BIGINT) AS n_pieces,
           CAST(SUM(CASE WHEN s.np IS NULL OR s.np = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unseg
    FROM dw LEFT JOIN seg s ON dw.word = s.word
    GROUP BY dw.doc_id
)
SELECT d.doc_id, d.lang, d.source, d.n_chars, d.n_tokens,
       d.predicted_lang,
       CAST(COALESCE(pc.n_pieces, 0) AS BIGINT) AS n_pieces,
       CAST(COALESCE(pc.n_unseg, 0) AS BIGINT) AS n_unsegmented
FROM {{ ref('silver_decontam') }} d
LEFT JOIN pc ON d.doc_id = pc.doc_id
{% endif %}
