-- The tokenizer (either family: silver_vocab trains unigram-LM or
-- BPE per the `tokenizer` var) is trained on this same corpus, so
-- every word of every decontam survivor must segment — a nonzero
-- n_unsegmented in-domain is a real trainer/serve bug, not data
-- drift.  (Out-of-domain serving legitimately reports nonzero; see
-- unigram_tokenize_serve's OOV contract.)
SELECT COUNT(*) AS failed_rows
FROM analytics_pipeline.silver_tokenized
WHERE n_unsegmented != 0
