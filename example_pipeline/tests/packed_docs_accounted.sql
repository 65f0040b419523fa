-- Every packed document must exist in the tokenized corpus exactly
-- once and carry BOTH counts unchanged: the whitespace token count
-- from ingest (the PII scrub is 1:1 token-preserving) and the
-- trained-tokenizer piece count the packer budgets by.
-- silver_tokenized itself covers every decontam survivor 1:1, so
-- this accounts the whole admitted mix in piece units.
SELECT COUNT(*) AS failed_rows
FROM analytics_pipeline.gold_packed p
LEFT JOIN analytics_pipeline.silver_tokenized t ON p.doc_id = t.doc_id
WHERE t.doc_id IS NULL
   OR p.n_pieces != t.n_pieces
   OR p.n_tokens != t.n_tokens
