-- config: materialized=table
-- PII redaction (the operators/text.py pii_scrub shape): pure
-- codegen regexps over the dedup survivors — email and phone
-- patterns become <EMAIL>/<PHONE> placeholders, one token for one
-- token, so n_tokens (and the packed_docs_accounted invariant)
-- survive unchanged.  No shuffle: this is a narrow projection.
-- Scrub runs AFTER dedup on purpose: the stamped contact lines are
-- unique per document pre-scrub (no artificial shared shingles into
-- the MinHash bands) and no text leaves the silver layer unredacted.
SELECT
    doc_id,
    regexp_replace(
        regexp_replace(text, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+', '<EMAIL>'),
        '\\+1-555-[0-9]{4}', '<PHONE>') AS text,
    lang,
    source,
    n_chars,
    n_tokens,
    predicted_lang
FROM {{ ref('silver_dedup') }}
