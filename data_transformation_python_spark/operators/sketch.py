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

from .transform import lit_long_array


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


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — the cardinality-side companion
# of the CMS/Bloom above, with the same mergeable-cells shape: the
# register array is (bucket, rho) rows and two sketches merge by
# per-bucket MAX — which in Spark is again just the partial
# aggregation the groupBy already performs, one map-side-combined
# shuffle of ≤ m registers per group regardless of corpus size.
#
# Both engines ship their own HLL (approx_count_distinct /
# approx_distinct) but their sketches are NOT portable — this one is:
# the hash is the same engine-portable md5 arithmetic as the
# CMS/Bloom cells, and rho (leading-zero rank) is derived from the
# EXACT integer bit length length(bin(w)) (identical unpadded binary
# strings in Spark and DuckDB), so the registers replay
# bit-identically in the SQL oracle.
#
# The estimator is made hash-comparable too: the harmonic sum
# Σ 2^(-M_j) is computed in FIXED POINT as the exact BIGINT
# Σ 2^(q+1-M_j) (q = 48-p bits of rank domain; ≤ m·2^(q+1) ≤ 2^49,
# no overflow, no float-summation order sensitivity), and the final
# estimate is one correctly-rounded IEEE division/multiplication
# chain over exact integers — identical across engines.  The
# small-range branch (E ≤ 2.5m with empty registers) uses linear
# counting m·ln(m/V) on exact integers.
# ---------------------------------------------------------------------------
def _hll_exprs(value_sql: str, p: int) -> tuple[str, str]:
    """Engine-portable (bucket, rho) for one value: 48-bit md5 prefix,
    low p bits route, remaining q = 48-p bits rank (Spark dialect)."""
    q = 48 - p
    h = f"CAST(conv(substr(md5({value_sql}), 1, 12), 16, 10) AS BIGINT)"
    bucket = f"({h}) % {1 << p}"
    w = f"({h}) div {1 << p}"
    rho = (
        f"CAST({q + 1} - (CASE WHEN ({w}) = 0 THEN 0"
        f" ELSE length(bin({w})) END) AS INT)"
    )
    return bucket, rho


def hll_build(
    df: DataFrame,
    value_col: str = "token",
    group_cols: tuple[str, ...] = (),
    p: int = 10,
) -> DataFrame:
    """HLL registers (group..., bucket, rho) over ``value_col``: one
    narrow map emits each value's (bucket, rank) cell; the ONLY
    shuffle is the MAX groupBy over ≤ 2^p registers per group,
    collapsed by map-side partial aggregation (MAX is associative and
    idempotent, so this same aggregate IS the merge of any number of
    per-split/per-micro-batch sketches)."""
    bucket, rho = _hll_exprs(value_col, p)
    return (
        df.select(
            *group_cols,
            F.expr(bucket).cast("bigint").alias("bucket"),
            F.expr(rho).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    p: int = 10,
) -> DataFrame:
    """Branch-selected HLL estimate per group from (bucket, rho)
    registers: (group..., v_zero, harmonic_fp, hll_estimate).
    harmonic_fp is the exact fixed-point BIGINT Σ 2^(q+1-M_j)
    including empty registers at M=0, so the float work is a single
    deterministic division — the whole row hash-compares across
    engines."""
    m, q = 1 << p, 48 - p
    scale = 1 << (q + 1)
    alpha = f"(0.7213 / (1.0 + 1.079 / {m}.0))"
    agg = registers.groupBy(*group_cols).agg(
        (F.lit(m) - F.count(F.lit(1))).cast("bigint").alias("v_zero"),
        # coalesce(.., 0): a GLOBAL (ungrouped) aggregate over an
        # empty register frame still emits one row with a NULL sum —
        # the empty sketch must estimate 0 via the linear-counting
        # branch, not propagate NULL
        F.coalesce(
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST({q + 1} - rho AS INT))"
                )
            ),
            F.lit(0),
        ).alias("__present_fp"),
    )
    return (
        agg.withColumn(
            "harmonic_fp",
            (F.col("v_zero") * F.lit(scale) + F.col("__present_fp")).cast(
                "bigint"
            ),
        )
        .withColumn(
            "__raw",
            F.expr(
                f"{alpha} * {m}.0 * {m}.0 * CAST({scale} AS DOUBLE)"
                " / CAST(harmonic_fp AS DOUBLE)"
            ),
        )
        .withColumn(
            "hll_estimate",
            F.expr(
                f"CAST(floor(CASE WHEN __raw <= {int(2.5 * m)}.0 AND v_zero > 0"
                f" THEN {m}.0 * ln({m}.0 / CAST(v_zero AS DOUBLE))"
                " ELSE __raw END) AS BIGINT)"
            ),
        )
        .select(*group_cols, "v_zero", "harmonic_fp", "hll_estimate")
    )


# ---------------------------------------------------------------------------
# KMV / bottom-k sketch (Bar-Yossef et al. 2002; Beyer et al. 2007) —
# the set-operation member of the sketch family: where HLL answers
# "how many distinct", KMV answers "how much do two sets OVERLAP"
# without ever joining them.  The sketch is the k smallest distinct
# 48-bit hash values of the set; two sketches merge by
# union-then-rekeep-bottom-k (an EXACT identity: bottom-k of A ∪ B ==
# bottom-k of bottom-k(A) ∪ bottom-k(B)), and
#   D̂(A ∪ B)  = (k-1) · 2^48 / h_(k)          (k-th smallest hash)
#   ρ̂(Jaccard) = |{h ∈ L : h ∈ K_A ∧ h ∈ K_B}| / k   (L = merged sketch)
#   D̂(A ∩ B)  = ρ̂ · D̂(A ∪ B)
# Scale shape: the build is one map-side-combined distinct shuffle of
# hash values followed by a TakeOrderedAndProject (per-partition
# bottom-k, merged at the driver — no global sort); estimation joins
# are over ≤ k-row broadcast sides.
#
# Determinism contract: the same engine-portable 48-bit md5 prefix as
# the HLL above; every sketch row and both estimates replay
# bit-identically in the SQL oracle (the only float op is one IEEE
# division of exact integers).
# ---------------------------------------------------------------------------
def _kmv_hash_expr(value_sql: str) -> str:
    """Engine-portable 48-bit hash (Spark dialect)."""
    return f"CAST(conv(substr(md5({value_sql}), 1, 12), 16, 10) AS BIGINT)"


def kmv_build(df: DataFrame, value_col: str = "token", k: int = 256) -> DataFrame:
    """Bottom-k sketch of a value set: the k smallest distinct 48-bit
    hashes, one ``h`` column.  distinct() collapses map-side; the
    orderBy+limit compiles to TakeOrderedAndProject (each partition
    keeps its own k, the driver merges) — no global sort."""
    return (
        df.select(F.expr(_kmv_hash_expr(value_col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_overlap_estimate(
    ka: DataFrame, kb: DataFrame, k: int = 256
) -> DataFrame:
    """Union/Jaccard/intersection estimates from two bottom-k
    sketches: one row (kth_hash, n_shared, union_est, intersect_est).
    The merged sketch L is the bottom-k of the two sketches' union
    (exactly the sketch of A ∪ B); n_shared counts L's hashes present
    in BOTH input sketches.  Everything is ≤ 2k rows — control-plane
    sized regardless of the underlying corpora."""
    from pyspark.sql.window import Window

    merged = (
        ka.unionByName(kb)
        .distinct()
        .withColumn("__rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    both = ka.join(kb, "h").select("h")
    shared = merged.join(both, "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shared")
    )
    agg = merged.agg(
        F.max("h").cast("bigint").alias("kth_hash"),
        F.count(F.lit(1)).cast("bigint").alias("__m"),
    )
    return (
        agg.join(shared, F.lit(True), "inner")
        .withColumn(
            "union_est",
            F.expr(
                # fewer than k distinct hashes exist -> the "sketch" IS
                # the exact distinct set of the union
                f"CAST(CASE WHEN __m < {k} THEN __m ELSE "
                f"floor(CAST({k} - 1 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / CAST(kth_hash AS DOUBLE)) "
                "END AS BIGINT)"
            ),
        )
        .withColumn(
            "intersect_est",
            F.expr(
                # exact branch: with every distinct hash in the merged
                # sketch, n_shared IS the exact intersection — routing
                # it through the ratio would re-introduce float wobble
                # (floor(111/147*147) == 110)
                f"CAST(CASE WHEN __m < {k} THEN n_shared ELSE "
                "floor(CAST(n_shared AS DOUBLE) / CAST(__m AS DOUBLE)"
                " * CAST(union_est AS DOUBLE)) END AS BIGINT)"
            ),
        )
        .select("kth_hash", "n_shared", "union_est", "intersect_est")
    )


# ---------------------------------------------------------------------------
# Misra-Gries / mergeable heavy-hitters summary (Misra & Gries 1982;
# Agarwal et al. 2013 "Mergeable Summaries") — the deterministic
# frequent-items member of the sketch family: where Count-Min answers
# "how often does THIS token appear" (point query, upper bound), MG
# answers "WHICH tokens are frequent" with a two-sided bound and NO
# hashing at all.
#
# Canonical order-free construction (so the summary — not just its
# guarantees — replays bit-exactly in the SQL oracle): compress a
# count vector by θ = the (k+1)-th largest count (0 when ≤ k items),
# keep {item → cnt − θ : cnt > θ}.  This equals running classic MG
# decrements to completion on the aggregated multiset, is independent
# of stream order, and keeps ≤ k rows.  Guarantee per kept item:
#   w ≤ true_count ≤ w + θ,   θ ≤ N/(k+1)
# and every item with true_count > θ is present.  Merging two
# summaries = add weights (absent → 0), re-compress with the merged
# θ_m; the error intervals ADD (θ = θ_a + θ_b + θ_m), which is the
# mergeable-summaries theorem — shard/time-window summaries combine
# control-plane-side without re-scanning data.
#
# Scale shape: the build is one map-side-combined count shuffle
# followed by TakeOrderedAndProject (per-partition top-(k+1), driver
# merge — no global sort); everything after runs on ≤ k+1 rows.
# ---------------------------------------------------------------------------
def _mg_compress(counts: DataFrame, k: int) -> DataFrame:
    """Compress an (item, w) count frame to the canonical ≤ k-row MG
    summary (item, w, theta) with theta = this compression's loss.

    θ comes from a whole-frame window over the ≤ k+1-row top frame
    (NOT a second aggregate over ``counts`` — that would re-execute
    the full count subtree, doubling the corpus scan; the
    single-partition window is over control-plane rows only)."""
    top = counts.orderBy(F.col("w").desc(), F.col("item")).limit(k + 1)
    return (
        top.withColumn(
            "theta",
            F.expr(
                f"CAST(CASE WHEN count(*) OVER"
                f" (PARTITION BY 1) = {k + 1}"
                " THEN min(w) OVER (PARTITION BY 1) ELSE 0 END AS BIGINT)"
            ),
        )
        .filter(F.col("w") > F.col("theta"))
        .select(
            "item",
            (F.col("w") - F.col("theta")).cast("bigint").alias("w"),
            F.col("theta"),
        )
    )


def mg_build(df: DataFrame, value_col: str = "item", k: int = 32) -> DataFrame:
    """Heavy-hitters summary of a value stream (multiset — repeats are
    counts): ≤ k rows (item, w, theta).  The only data-sized work is
    the map-side-combined count shuffle."""
    counts = (
        df.select(F.col(value_col).cast("string").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    return _mg_compress(counts, k)


def mg_merge(sa: DataFrame, sb: DataFrame, k: int = 32) -> DataFrame:
    """Merge two MG summaries: add weights item-wise (absent → 0),
    re-compress, and carry the summed error bound
    theta = theta_a + theta_b + theta_merge.  Runs entirely on
    ≤ 2k control-plane rows, and each input frame is referenced
    EXACTLY once (θ_a/θ_b are recovered from the joined rows via a
    whole-frame window, not a second aggregate — a second reference
    would re-execute the input's entire count pipeline).

    Caveat (documented, unreachable for non-degenerate corpora): a
    count vector whose top k+1 values are ALL tied compresses to an
    empty summary, losing its θ; merging such a summary treats its
    θ as 0 and the upper bound no longer covers the dropped ties.
    """
    joined = (
        sa.select("item", F.col("w").alias("wa"), F.col("theta").alias("__ta"))
        .join(
            sb.select(
                "item", F.col("w").alias("wb"), F.col("theta").alias("__tb")
            ),
            "item",
            "full_outer",
        )
    )
    combined = joined.select(
        "item",
        (
            F.coalesce(F.col("wa"), F.lit(0))
            + F.coalesce(F.col("wb"), F.lit(0))
        ).cast("bigint").alias("w"),
        F.expr(
            "CAST(coalesce(max(__ta) OVER (PARTITION BY 1), 0)"
            " + coalesce(max(__tb) OVER (PARTITION BY 1), 0) AS BIGINT)"
        ).alias("__tab"),
    )
    top = combined.orderBy(F.col("w").desc(), F.col("item")).limit(k + 1)
    return (
        top.withColumn(
            "__tm",
            F.expr(
                f"CAST(CASE WHEN count(*) OVER (PARTITION BY 1) = {k + 1}"
                " THEN min(w) OVER (PARTITION BY 1) ELSE 0 END AS BIGINT)"
            ),
        )
        .filter(F.col("w") > F.col("__tm"))
        .select(
            "item",
            (F.col("w") - F.col("__tm")).cast("bigint").alias("w"),
            (F.col("__tm") + F.col("__tab")).cast("bigint").alias("theta"),
        )
    )


# --------------------------------------------------------------------------
# integer log-histogram quantile sketch (HDR-histogram / DDSketch
# family: bounded relative error, mergeable by cell-wise addition)
# --------------------------------------------------------------------------
def hdr_build(
    df: DataFrame,
    value_sql: str,
    m: int = 64,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fixed-shape log₂ histogram over a positive BIGINT expression —
    the mergeable quantile sketch (HdrHistogram; DDSketch, Masson et
    al. VLDB 2019, with an integer base-2 index instead of a float
    log): bucket = 64·e + sub where e = ⌊log₂ v⌋ via the bit length
    and sub = ⌊v·m / 2^e⌋ - m subdivides each octave into ``m``
    cells, giving relative error ≤ 1/m per served bound.

    Everything is BIGINT bit arithmetic (``length(bin(v))``, shifts,
    ``DIV``) — no float log — so the sketch replays bit-exactly in the
    SQL oracle.  The build is ONE map-side-combined groupBy over at
    most 63·m cells regardless of input size, and two sketches merge
    by adding counts cell-wise — the same aggregate — so per-split /
    per-micro-batch partials compose into the corpus sketch for free.

    Values < 1 are clamped into bucket 0's octave start (v=1);
    callers scale to an integer domain first (e.g. cents).
    """
    v = f"GREATEST(CAST({value_sql} AS BIGINT), 1)"
    e = f"(length(bin({v})) - 1)"
    p2 = f"shiftleft(CAST(1 AS BIGINT), {e})"
    bucket = f"{e} * {m} + (({v} * {m}) DIV {p2} - {m})"
    return (
        df.select(
            *group_cols, F.expr(bucket).cast("bigint").alias("bucket_id")
        )
        .groupBy(*group_cols, "bucket_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def hdr_quantiles(
    hist: DataFrame,
    pcts: tuple[int, ...] = (50, 90, 99),
    m: int = 64,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Serve percentile bounds from an ``hdr_build`` histogram: the
    smallest bucket whose cumulative count reaches ⌈pct·N/100⌉
    contains the pct-quantile, and its [lo, hi] value range bounds it
    within a factor (m+1)/m.

    The cumulative window and the per-percentile argmin run over the
    SKETCH (≤ 63·m rows), not the data — sketch-sized single-partition
    work, identical at any corpus scale.  Rank arithmetic is integer
    (⌈x⌉ as (x + 99) DIV 100); bucket → value bounds invert the build
    mapping with shifts and DIV only.

    Returns (quantile_pct, n_total, bucket_id, est_lo, est_hi) —
    all BIGINT.
    """
    from pyspark.sql.window import Window

    g = list(group_cols)
    w = (
        Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    ).orderBy("bucket_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    part = ", ".join(g) if g else "1"
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n_total",
        F.expr(
            f"CAST(sum(cnt) OVER (PARTITION BY {part}) AS BIGINT)"
        ),
    )
    pct_df = cum.sparkSession.createDataFrame(
        [(int(p),) for p in pcts], "quantile_pct bigint"
    )
    hit = (
        cum.crossJoin(F.broadcast(pct_df))
        .filter(F.expr("cum >= (quantile_pct * n_total + 99) DIV 100"))
        .groupBy(*g, "quantile_pct")
        .agg(
            F.min("bucket_id").cast("bigint").alias("bucket_id"),
            F.max("n_total").cast("bigint").alias("n_total"),
        )
    )
    e = f"(bucket_id DIV {m})"
    sub = f"(bucket_id % {m})"
    p2 = f"shiftleft(CAST(1 AS BIGINT), {e})"
    return hit.select(
        *g,
        "quantile_pct",
        "n_total",
        "bucket_id",
        F.expr(f"CAST(({p2} * ({m} + {sub})) DIV {m} AS BIGINT)").alias(
            "est_lo"
        ),
        # largest integer still mapping to this cell: cells narrower
        # than one integer (octaves below 2^log2(m)) collapse to
        # est_hi == est_lo instead of inverting
        F.expr(
            f"CAST(({p2} * ({m} + {sub} + 1) - 1) DIV {m} AS BIGINT)"
        ).alias("est_hi"),
    )


def hdr_oracle_sql(
    value_sql: str,
    pcts: tuple[int, ...],
    m: int = 64,
    table: str = "lineitem",
) -> str:
    """DuckDB twin of hdr_build + hdr_quantiles (``//`` = ``DIV``,
    ``<<`` = ``shiftleft``, ``bin`` identical minimal binary)."""
    v = f"GREATEST(CAST({value_sql} AS BIGINT), 1)"
    e = f"(length(bin({v})) - 1)"
    p2 = f"(CAST(1 AS BIGINT) << {e})"
    pct_rows = ", ".join(f"({int(p)})" for p in pcts)
    return f"""
WITH vals AS (
  SELECT {e} * {m} + (({v} * {m}) // {p2} - {m}) AS bucket_id
  FROM {table}),
hist AS (
  SELECT bucket_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM vals GROUP BY 1),
cum AS (
  SELECT bucket_id, cnt,
         SUM(cnt) OVER (ORDER BY bucket_id
                        ROWS UNBOUNDED PRECEDING) AS cum,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n_total
  FROM hist),
pcts(quantile_pct) AS (VALUES {pct_rows}),
hit AS (
  SELECT quantile_pct,
         CAST(MIN(bucket_id) AS BIGINT) AS bucket_id,
         CAST(MAX(n_total) AS BIGINT) AS n_total
  FROM cum CROSS JOIN pcts
  WHERE cum >= (quantile_pct * n_total + 99) // 100
  GROUP BY quantile_pct)
SELECT quantile_pct, n_total, bucket_id,
       CAST(((CAST(1 AS BIGINT) << (bucket_id // {m}))
             * ({m} + bucket_id % {m})) // {m} AS BIGINT) AS est_lo,
       CAST(((CAST(1 AS BIGINT) << (bucket_id // {m}))
             * ({m} + bucket_id % {m} + 1) - 1) // {m} AS BIGINT) AS est_hi
FROM hit
"""


def bloom_prune_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    m_bits: int = 32768,
    k: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Runtime-filter (Bloom-pruned) join: build the Bloom filter over
    the SMALL side's join keys, collect its ≤ m/32 chunk words to the
    driver (control-plane, like k-means centroids), and prefilter the
    BIG side with a pure row-local expression — every probe is k
    element_at/bitwise-AND ops inside codegen, no join, no shuffle —
    before the exact equi-join.  No false negatives, so the result is
    IDENTICAL to the plain join; the win is shuffle volume: rows that
    cannot match never enter the exchange (the semi-join-reduction /
    Spark-runtime-bloom-filter shape, here as an explicit operator
    with a portable md5 hash).

    The md5 probe is computed per row, so this prunes the SHUFFLE,
    not the parquet scan — at 100 TB that is the expensive half of a
    selective join (the scan is column-pruned regardless).
    """
    keys_as_tokens = small.select(
        F.col(key_col).cast("string").alias("token")
    )
    bloom = bloom_build_tokens(keys_as_tokens, m_bits=m_bits, k=k)
    words = [0] * (m_bits // 32)
    for r in bloom.collect():  # control-plane: <= m/32 rows
        words[int(r["chunk"])] = int(r["bits"])
    # the m/32-word bit array rides as ONE ArrayType literal column
    # (F.lit, staged as __bf) — spliced as an "array(..L, ..)" string
    # it appeared k times in the predicate (~4096 literal nodes at the
    # 32768-bit default), costing ~1-2 s of driver parse/analysis per
    # call.  Same bits, same probe arithmetic.
    tok = f"CAST({key_col} AS STRING)"
    cond = " AND ".join(
        f"(element_at(__bf, CAST(({_bit_expr(i, tok, m_bits)}) div 32"
        f" AS INT) + 1) & shiftleft(CAST(1 AS BIGINT),"
        f" CAST(({_bit_expr(i, tok, m_bits)}) % 32 AS INT))) != 0"
        for i in range(k)
    )
    return (
        big.withColumn("__bf", lit_long_array(words))
        .filter(F.expr(cond))
        .drop("__bf")
        .join(small, key_col, how)
    )
