-- Every packed document must exist in the decontaminated corpus
-- exactly once and carry its token count unchanged (the PII scrub is
-- 1:1 token-preserving, so the count survives from ingest).
SELECT COUNT(*) AS failed_rows
FROM analytics_pipeline.gold_packed p
LEFT JOIN analytics_pipeline.silver_decontam d ON p.doc_id = d.doc_id
WHERE d.doc_id IS NULL OR p.n_tokens != d.n_tokens
