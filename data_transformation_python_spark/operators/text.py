"""Text-analysis operators for training-data pipelines: token
statistics, quality scoring, language identification (stopword
heuristic), and document fingerprinting.

All expressions are JVM-side builtin functions (whole-stage codegen;
no Python UDFs in the hot path) and every score is derived from exact
integer counts so results are engine-portable for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword language
#: heuristic (deterministic, oracle-portable).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "los", "y", "es", "un"],
}


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token statistics + a deterministic quality score:
    ``unique_token_ratio * min(1, n_tokens/50)`` — favors longer,
    less-repetitive documents (exact-int inputs → portable doubles)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks).cast("bigint")
    n_unique = F.size(F.array_distinct(toks)).cast("bigint")
    n_chars = F.length(F.col(text_col)).cast("bigint")
    n_nonspace = F.length(F.regexp_replace(F.col(text_col), " ", "")).cast("bigint")
    return df.select(
        id_col,
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique_tokens"),
        n_nonspace.alias("n_nonspace_chars"),
        (n_nonspace.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
        (
            (n_unique.cast("double") / n_tokens.cast("double"))
            * F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(50.0))
        ).alias("quality_score"),
    )


def _stopword_score(text_col: str, words: list[str]) -> Column:
    arr = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter(split({text_col}, ' '), x -> array_contains(array({arr}), x)))"
    ).cast("bigint")


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-count language heuristic with deterministic argmax
    (priority order en > de > es on ties; 'unknown' when no signal)."""
    s_en = _stopword_score(text_col, STOPWORDS["en"])
    s_de = _stopword_score(text_col, STOPWORDS["de"])
    s_es = _stopword_score(text_col, STOPWORDS["es"])
    predicted = (
        F.when((s_en >= F.greatest(s_de, s_es)) & (s_en > 0), "en")
        .when((s_de >= s_es) & (s_de > 0), "de")
        .when(s_es > 0, "es")
        .otherwise("unknown")
    )
    return df.select(
        id_col,
        s_en.alias("score_en"),
        s_de.alias("score_de"),
        s_es.alias("score_es"),
        predicted.alias("predicted_lang"),
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Two md5 document fingerprints: raw normalized content, and the
    order-insensitive sorted-unique-token 'bag' fingerprint (catches
    shuffled near-duplicates)."""
    toks = _tokens(text_col)
    return df.select(
        id_col,
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("content_hash"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias(
            "bag_fingerprint"
        ),
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """Corpus-level token frequencies (map-side explode + one shuffle
    on the token), deterministic top-N."""
    return (
        df.select(F.explode(_tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(top_n)
    )
