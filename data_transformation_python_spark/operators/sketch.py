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
