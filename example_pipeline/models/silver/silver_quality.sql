-- config: materialized=table
-- Language-ID (stopword-argmax heuristic, en > de > es tie order)
-- plus the Gopher quality gates (Rae et al. 2021 §A1.1: mean word
-- length in [3, 10], symbol ratio < 0.1, >= 80% alphabetic words,
-- >= 2 stopwords) — thresholds mirror operators/text.py
-- gopher_quality.
SELECT
    doc_id, text, lang, source, n_chars, n_tokens,
    CASE
        WHEN n_stop_en >= greatest(n_stop_de, n_stop_es)
             AND n_stop_en > 0 THEN 'en'
        WHEN n_stop_de >= n_stop_es AND n_stop_de > 0 THEN 'de'
        WHEN n_stop_es > 0 THEN 'es'
        ELSE 'unknown'
    END AS predicted_lang
FROM {{ ref('silver_signals') }}
WHERE n_tokens > 0
  AND CAST(sum_token_len AS DOUBLE) / n_tokens >= 3.0
  AND CAST(sum_token_len AS DOUBLE) / n_tokens <= 10.0
  AND CAST(n_symbols AS DOUBLE) / n_tokens < 0.1
  AND CAST(n_alpha_words AS DOUBLE) / n_tokens >= 0.8
  AND n_stop_en >= 2
