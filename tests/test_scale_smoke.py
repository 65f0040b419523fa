"""Scale smoke test: the dedup/text operators on a corpus 100× the
fixture size, generated fully distributed (no driver-side loops).
Verifies the pipeline shape holds when the data stops being tiny:
planted exact duplicates are all found, MinHash-LSH recovers planted
near-duplicate pairs, and nothing collects rows to the driver."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from data_transformation_python_spark.operators import dedup as dd
from data_transformation_python_spark.operators import text as tx

N_DOCS = 50_000
VOCAB = [
    "spark", "query", "table", "join", "scan", "merge", "filter", "window",
    "batch", "stream", "hash", "sort", "key", "row", "column", "vector",
    "group", "agg", "order", "part", "small", "fast", "slow", "value",
]


def _corpus(spark):
    """50k docs, ~40 words each, derived deterministically from the id.

    Every id with id % 10 == 1 copies the text of id-1 → 5k planted
    exact-duplicate pairs.  Generation is pure Spark expressions —
    the corpus never exists on the driver."""
    vocab = ", ".join(f"'{w}'" for w in VOCAB)
    seed = "CASE WHEN id % 10 = 1 THEN id - 1 ELSE id END"
    text = (
        f"concat_ws(' ', transform(sequence(0, 39), "
        f"i -> element_at(array({vocab}), "
        f"1 + pmod(hash(({seed}) * 41 + i), {len(VOCAB)}))))"
    )
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), F.expr(text).alias("text")
    )


def test_exact_dedup_at_50k(spark):
    docs = _corpus(spark)
    t0 = time.perf_counter()
    groups = dd.exact_duplicates(docs)
    n_groups = groups.count()
    dup_rows = groups.filter(F.col("n_copies") >= 2).agg(
        F.sum("n_copies").alias("s"), F.count(F.lit(1)).alias("g")
    ).first()
    elapsed = time.perf_counter() - t0
    # 5k planted pairs → ≥5k duplicate groups (random collisions may add)
    assert dup_rows["g"] >= N_DOCS // 10
    assert n_groups < N_DOCS
    assert elapsed < 60, f"exact dedup too slow: {elapsed:.1f}s"


def test_minhash_lsh_finds_planted_dups_at_50k(spark):
    docs = _corpus(spark)
    t0 = time.perf_counter()
    cands = dd.minhash_lsh_candidates(docs, num_hashes=8, bands=4)
    # identical docs share every minhash → every planted pair (k, k+1)
    # with k % 10 == 0 must be a candidate
    planted_found = cands.filter(
        (F.col("doc_id_2") == F.col("doc_id_1") + 1)
        & (F.col("doc_id_1") % 10 == 0)
    ).count()
    elapsed = time.perf_counter() - t0
    assert planted_found == N_DOCS // 10
    assert elapsed < 120, f"minhash-lsh too slow: {elapsed:.1f}s"


def test_token_stats_at_50k(spark):
    docs = _corpus(spark)
    t0 = time.perf_counter()
    stats = tx.token_stats(docs)
    row = stats.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_tokens").alias("mn"),
        F.max("n_tokens").alias("mx"),
    ).first()
    elapsed = time.perf_counter() - t0
    assert row["n"] == N_DOCS
    assert row["mn"] == row["mx"] == 40
    assert elapsed < 60, f"token stats too slow: {elapsed:.1f}s"
