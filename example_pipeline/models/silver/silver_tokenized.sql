-- config: materialized=table
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
WITH m AS (
    SELECT map_from_entries(collect_list(struct(piece, neg_logprob_q)))
           AS vmap
    FROM {{ ref('silver_vocab') }}
),
w AS (
    SELECT word, CAST(length(word) AS INT) AS n
    FROM (SELECT DISTINCT explode(split(text, ' ')) AS word
          FROM {{ ref('silver_decontam') }})
    WHERE word <> '' AND length(word) <= 12
),
e AS (
    SELECT w.word, w.n, m.vmap,
           aggregate(sequence(1, n), transform(sequence(0, n), p -> IF(p = 0, CAST(0 AS BIGINT), CAST(1099511627776 AS BIGINT))), (acc, i) -> transform(sequence(0, n), p -> IF(p <> i, element_at(acc, p + 1), LEAST(IF(i >= 1, element_at(acc, i - 1 + 1) + COALESCE(try_element_at(vmap, substr(word, i - 1 + 1, 1)) * 8192 + shiftleft(1, i), CAST(1099511627776 AS BIGINT)), CAST(1099511627776 AS BIGINT)), IF(i >= 2, element_at(acc, i - 2 + 1) + COALESCE(try_element_at(vmap, substr(word, i - 2 + 1, 2)) * 8192 + shiftleft(1, i), CAST(1099511627776 AS BIGINT)), CAST(1099511627776 AS BIGINT)), IF(i >= 3, element_at(acc, i - 3 + 1) + COALESCE(try_element_at(vmap, substr(word, i - 3 + 1, 3)) * 8192 + shiftleft(1, i), CAST(1099511627776 AS BIGINT)), CAST(1099511627776 AS BIGINT)), IF(i >= 4, element_at(acc, i - 4 + 1) + COALESCE(try_element_at(vmap, substr(word, i - 4 + 1, 4)) * 8192 + shiftleft(1, i), CAST(1099511627776 AS BIGINT)), CAST(1099511627776 AS BIGINT)))))) AS dp,
           aggregate(sequence(1, n), transform(sequence(0, n), p -> IF(p = n, CAST(0 AS BIGINT), CAST(1099511627776 AS BIGINT))), (acc, s) -> transform(sequence(0, n), p -> IF(p <> n - s, element_at(acc, p + 1), LEAST(IF(n - s + 1 <= n, COALESCE(try_element_at(vmap, substr(word, n - s + 1, 1)) * 8192 + shiftleft(1, n - s + 1), CAST(1099511627776 AS BIGINT)) + element_at(acc, n - s + 1 + 1), CAST(1099511627776 AS BIGINT)), IF(n - s + 2 <= n, COALESCE(try_element_at(vmap, substr(word, n - s + 1, 2)) * 8192 + shiftleft(1, n - s + 2), CAST(1099511627776 AS BIGINT)) + element_at(acc, n - s + 2 + 1), CAST(1099511627776 AS BIGINT)), IF(n - s + 3 <= n, COALESCE(try_element_at(vmap, substr(word, n - s + 1, 3)) * 8192 + shiftleft(1, n - s + 3), CAST(1099511627776 AS BIGINT)) + element_at(acc, n - s + 3 + 1), CAST(1099511627776 AS BIGINT)), IF(n - s + 4 <= n, COALESCE(try_element_at(vmap, substr(word, n - s + 1, 4)) * 8192 + shiftleft(1, n - s + 4), CAST(1099511627776 AS BIGINT)) + element_at(acc, n - s + 4 + 1), CAST(1099511627776 AS BIGINT)))))) AS sp
    FROM w CROSS JOIN m
),
cand AS (
    SELECT word, n, dp, sp, vmap, j, explode(sequence(1, 4)) AS L
    FROM (SELECT word, n, dp, sp, vmap,
                 explode(sequence(0, n - 1)) AS j FROM e)
),
seg AS (
    SELECT word, substr(word, j + 1, L) AS piece
    FROM cand
    WHERE j + L <= n AND element_at(dp, j + 1) + try_element_at(vmap, substr(word, j + 1, L)) * 8192 + shiftleft(1, j + L) + element_at(sp, j + L + 1) = element_at(dp, n + 1)
),
dw AS (
    SELECT doc_id, word
    FROM (SELECT doc_id, explode(split(text, ' ')) AS word
          FROM {{ ref('silver_decontam') }})
    WHERE word <> '' AND length(word) <= 12
),
pc AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pieces
    FROM dw JOIN seg USING (word)
    GROUP BY doc_id
)
SELECT d.doc_id, d.lang, d.source, d.n_chars, d.n_tokens,
       d.predicted_lang,
       CAST(COALESCE(pc.n_pieces, 0) AS BIGINT) AS n_pieces
FROM {{ ref('silver_decontam') }} d
LEFT JOIN pc ON d.doc_id = pc.doc_id
