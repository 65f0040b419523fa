-- config: materialized=table
-- Distinct-word histogram of the decontaminated corpus — the ONE
-- corpus-wide tokenize+count pass that both tokenizer families
-- (silver_vocab: unigram-LM or BPE training) and the serving model
-- (silver_tokenized: distinct-word segmentation cache) share.
--
-- Added in optimization round 14 (guide §3.3 "materialise the
-- intermediate"): Spark inlines deterministic CTEs, so when this
-- histogram lived as a `w` CTE inside silver_vocab it was
-- instantiated up to 129 times per plan — 114 corpus scans in one
-- optimized plan at r13 HEAD.  As a materialized model the corpus is
-- tokenized exactly once per run and every downstream reference is a
-- scan of this vocab-sized table.  Values are identical: the
-- downstream models apply their own length filters on top.
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(length(word) AS INT) AS n
FROM (SELECT explode(split(text, ' ')) AS word
      FROM {{ ref('silver_decontam') }})
WHERE word <> ''
GROUP BY word
