"""Mergeable frequency sketches: Count-Min over the corpus token
stream (Cormode & Muthukrishnan 2005).

The CMS is the standard mergeable structure for approximate
heavy-hitter counts at stream/corpus scale: d independent hash rows ×
w buckets of exact counters.  Point estimates are upper bounds
(min over rows ≥ true count, overestimate ≤ εN with ε = e/w at the
usual depth d = ⌈ln 1/δ⌉); two sketches merge by cell-wise addition —
which in Spark is simply the partial aggregation the groupBy already
performs, so the build is ONE map-side-combined shuffle of d×w cells
regardless of corpus size.

Determinism contract: bucket = first 6 md5 nibbles of "r:token" mod
width — the same engine-portable hash used by the hashed-feature
classifier (Spark ``conv``, DuckDB ``'0x' ||`` parse), so the sketch
and every estimate replay exactly in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_expr(r: int, token_sql: str, width: int) -> str:
    """Engine-portable bucket for hash row ``r`` (Spark dialect)."""
    return (
        f"CAST(conv(substr(md5(concat('{r}:', {token_sql})), 1, 6), 16, 10)"
        f" AS BIGINT) % {width}"
    )


def countmin_build(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the corpus token-frequency CMS: (r, bucket, cnt) rows,
    d×w of them total — control-plane sized however large the corpus.

    The token stream is a map-side explode (multiset — repeats are
    counts); each token emits its ``depth`` (row, bucket) cells in the
    same projection, and the ONLY shuffle is the final groupBy over
    d×w cells, fully collapsed by map-side partial aggregation.
    """
    toks = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    return countmin_build_tokens(toks, depth=depth, width=width)


def countmin_build_tokens(
    toks: DataFrame, depth: int = 4, width: int = 1024
) -> DataFrame:
    """CMS cells for a pre-tokenized frame (column ``token``) — the
    building block batch AND streaming builds share: a micro-batch's
    cells merge into the running sketch by plain cell-wise addition,
    so continuous maintenance is an append + aggregate, no custom
    state store needed."""
    cells = ", ".join(
        f"named_struct('r', {r}, 'bucket', {_bucket_expr(r, 'token', width)})"
        for r in range(depth)
    )
    return (
        toks.select(F.explode(F.expr(f"array({cells})")).alias("c"))
        .groupBy(
            F.col("c.r").cast("int").alias("r"),
            F.col("c.bucket").cast("bigint").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame, tokens: DataFrame, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-estimate each token in ``tokens`` (column ``token``)
    against a built sketch: est = min over rows of the token's cell.

    The probe side is tiny (|tokens|×depth cells) and broadcasts; the
    sketch side is d×w rows — nothing here scales with the corpus.
    """
    probe_cells = ", ".join(
        f"named_struct('r', {r}, 'bucket', {_bucket_expr(r, 'token', width)})"
        for r in range(depth)
    )
    probes = tokens.select(
        "token", F.explode(F.expr(f"array({probe_cells})")).alias("c")
    ).select(
        "token",
        F.col("c.r").cast("int").alias("r"),
        F.col("c.bucket").cast("bigint").alias("bucket"),
    )
    # LEFT join + coalesce(0): a cell the sketch never incremented has no
    # row, and the CMS point estimate must treat it as count 0 (an unseen
    # token estimates to 0, not NULL / dropped).  The sketch side is the
    # broadcast side here (bounded d×w cells); probes stream through it.
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy("token")
        .agg(F.min("cnt").cast("bigint").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — the membership-side companion of the
# CMS above, with the same mergeable-cells shape: the bit array is
# stored as (chunk, bits) rows of 32 bits per BIGINT chunk, so two
# filters merge by per-chunk BIT_OR — which in Spark is again just
# the partial aggregation the groupBy already performs, one
# map-side-combined shuffle of m/32 cells regardless of corpus size.
# 32 (not 64) bits per chunk keeps every mask positive, sidestepping
# sign-bit divergence between engines' two's-complement handling.
#
# Pipeline use: the cheap decontamination pre-filter — build over the
# benchmark side's fingerprints, probe the corpus, and only rows the
# filter says MAYBE run the exact (expensive) containment check.  No
# false negatives by construction; false-positive rate ≈ (1 - e^(-kn/m))^k.
#
# Determinism contract: bit index for hash row i = first 12 md5
# nibbles of "bi:token" mod m — engine-portable exactly like
# _bucket_expr (Spark ``conv``, DuckDB ``'0x' ||`` parse), so the
# filter and every probe replay bit-identically in the SQL oracle.
# ---------------------------------------------------------------------------
def _bit_expr(i: int, token_sql: str, m_bits: int) -> str:
    """Engine-portable global bit index for hash row ``i``."""
    return (
        f"CAST(conv(substr(md5(concat('b{i}:', {token_sql})), 1, 12), 16, 10)"
        f" AS BIGINT) % {m_bits}"
    )


def bloom_build_tokens(
    toks: DataFrame, m_bits: int = 32768, k: int = 4
) -> DataFrame:
    """Build the Bloom bit array over a token frame (column
    ``token``): (chunk, bits) rows, ≤ m/32 of them — control-plane
    sized at any corpus scale.  One narrow map emits each token's k
    (chunk, mask) cells; the ONLY shuffle is the BIT_OR groupBy,
    collapsed by map-side partial aggregation (BIT_OR is associative
    and idempotent, so this same aggregate IS the merge of any number
    of per-split/per-micro-batch filters)."""
    if m_bits % 32:
        raise ValueError("m_bits must be a multiple of 32")
    cells = ", ".join(
        f"named_struct('chunk', ({_bit_expr(i, 'token', m_bits)}) div 32, "
        f"'mask', shiftleft(CAST(1 AS BIGINT), "
        f"CAST(({_bit_expr(i, 'token', m_bits)}) % 32 AS INT)))"
        for i in range(k)
    )
    return (
        toks.select(F.explode(F.expr(f"array({cells})")).alias("c"))
        .groupBy(F.col("c.chunk").cast("bigint").alias("chunk"))
        .agg(F.expr("bit_or(c.mask)").cast("bigint").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame, tokens: DataFrame, m_bits: int = 32768, k: int = 4
) -> DataFrame:
    """(token, maybe_present): true iff ALL k of the token's bits are
    set.  The filter side broadcasts (≤ m/32 rows); probes stream
    through it.  A missing chunk row means those 32 bits are all
    zero, so the LEFT join + COALESCE(bits, 0) makes never-seen
    tokens definitively absent rather than dropped (the CMS
    estimate's missing-cell lesson, applied here from the start)."""
    cells = ", ".join(
        f"named_struct('chunk', ({_bit_expr(i, 'token', m_bits)}) div 32, "
        f"'mask', shiftleft(CAST(1 AS BIGINT), "
        f"CAST(({_bit_expr(i, 'token', m_bits)}) % 32 AS INT)))"
        for i in range(k)
    )
    probes = tokens.select(
        "token", F.explode(F.expr(f"array({cells})")).alias("c")
    ).select(
        "token",
        F.col("c.chunk").cast("bigint").alias("chunk"),
        F.col("c.mask").cast("bigint").alias("mask"),
    )
    return (
        probes.join(F.broadcast(bloom), ["chunk"], "left")
        .withColumn(
            "__hit",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                != 0
            ),
        )
        .groupBy("token")
        .agg(F.expr("bool_and(__hit)").alias("maybe_present"))
    )
