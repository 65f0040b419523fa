"""Deterministic sampling + sequence-packing operators for
training-data curation.

Random sampling is useless in a reproducible pipeline (Spark's
``df.sample`` is seed-stable only for a fixed partitioning, which no
100 TB job has): every operator here derives its randomness from
``md5`` of a stable row key, so the same row makes the same decision
on any cluster, any partitioning, any engine — and the DuckDB oracle
can replay it exactly.

All expressions are JVM-side builtins (whole-stage codegen; zero
Python UDFs); windows are partitioned by the stratum key so no
operator ever funnels the corpus through one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window

from .text import n_tokens_col


def _hash_key(id_col: str) -> Column:
    """First 4 md5 hex chars of the row key — a uniform draw from
    65536 buckets, identical on every engine that has md5."""
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    thresholds: dict[str, str],
    default_threshold: str = "g",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sampling.

    ``thresholds`` maps stratum value → 4-hex-char cutoff: a row
    survives iff ``md5(id)[:4] < cutoff`` (e.g. ``"4000"`` keeps
    ~25%, ``"8000"`` ~50%).  The default ``"g"`` sorts above every
    hex digit, i.e. keep-all.  This is how a 100 TB corpus is
    down-sampled per language/source with no shuffle at all — the
    predicate is map-side and pushes into the scan."""
    cutoff = F.col(strata_col)
    expr = F.lit(default_threshold)
    for value, thr in sorted(thresholds.items(), reverse=True):
        expr = F.when(cutoff == value, F.lit(thr)).otherwise(expr)
    return df.filter(_hash_key(id_col) < expr)


def reservoir_per_group(
    df: DataFrame, id_col: str, group_col: str, k: int
) -> DataFrame:
    """Deterministic k-per-group sample ("reservoir" without the
    order-dependence): rank rows inside each group by the md5 of
    their key (a uniform random order that every engine agrees on,
    with the raw key as tiebreaker) and keep the first k.

    One shuffle on the group key; each group's ranking is a single
    partition-local sort — the group count, not the corpus, bounds
    the window.

    Orders by the FULL md5, not the 4-hex prefix the Bernoulli
    operators threshold on: with a prefix, two keys colliding in the
    first 16 bits order by the raw-id tiebreaker while any full-hash
    replay orders by the remaining digits — a real mismatch the
    round-9 sf0.1 parity sweep caught (collisions are a birthday
    problem: ~2% at 50 rows/group, near-certain at 300+)."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    group_col: str,
    text_col: str,
    budget: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document the
    fixed-size pack (context window) in which its first token lands.

    Documents are laid out in deterministic (group, id) order; a
    running token total places each at offset ``cum - n`` in the
    group's token stream, so ``pack_id = group/(cum-n) div budget``
    and ``pack_offset = (cum-n) mod budget``.  Long documents span
    pack boundaries — the standard pretraining layout (no padding
    waste), not bin packing.

    The window is partitioned by the group key: each group's
    cumulative sum is an independent partition-local pass, so the
    operator scales with the largest group, never the corpus."""
    n_tokens = n_tokens_col(text_col)
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.select(id_col, group_col, n_tokens.alias("n_tokens"))
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .withColumn("__start", F.col("__cum") - F.col("n_tokens"))
    )
    return out.select(
        id_col,
        group_col,
        "n_tokens",
        F.concat_ws(
            "/",
            F.col(group_col),
            F.expr(f"__start div {budget}").cast("string"),
        ).alias("pack_id"),
        (F.col("__start") % budget).cast("bigint").alias("pack_offset"),
    )


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    target_total: int,
) -> DataFrame:
    """Temperature-based mixture sampling (alpha = 0.5): per-source
    quotas proportional to sqrt(source size) — the standard way a
    multi-source pretraining mixture up-weights small/rare sources
    relative to their raw counts (e.g. mT5's alpha-scaled sampling).

    Determinism contract: weights are ``isqrt(n)`` (exact integer
    square root — ``floor(sqrt)`` of a BIGINT is exact in any engine
    with correctly-rounded sqrt), quotas are one integer
    multiply+divide, and each source admits its first ``quota`` rows
    in the md5 shuffle order — all replayable by the SQL oracle.

    Scale shape: the per-source counts are a control-plane aggregate
    (one row per source) collected to the driver; the admission pass
    is one shuffle on the source key with a partition-local window —
    the same shape as ``samp_token_quota``.
    """
    import math

    counts = {
        r["g"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    weights = {g: math.isqrt(int(n)) for g, n in counts.items()}
    total_w = sum(weights.values()) or 1
    quota = {g: (target_total * w) // total_w for g, w in weights.items()}
    # quotas join back as a BROADCAST dimension (one row per source),
    # not a chained literal CASE: at thousands of sources a CASE tree
    # grows the expression/analysis cost linearly while the broadcast
    # hash join stays a single O(1)-lookup plan node.  Null-safe join
    # keeps legitimately-NULL source keys.
    group_type = df.schema[group_col].dataType
    quota_df = df.sparkSession.createDataFrame(
        [(g, q) for g, q in quota.items()],
        StructType(
            [
                StructField("__qg", group_type, True),
                StructField("__quota", LongType(), False),
            ]
        ),
    )
    w = Window.partitionBy(group_col).orderBy(_hash_key(id_col), F.col(id_col))
    return (
        df.select(id_col, group_col)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .join(
            F.broadcast(quota_df),
            F.col(group_col).eqNullSafe(F.col("__qg")),
            "left",
        )
        .filter(F.col("rk") <= F.coalesce(F.col("__quota"), F.lit(0)))
        .drop("__qg", "__quota")
    )


def weighted_sample_topk(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, algorithm A-ES): each row draws key = ln(u)/w with u a
    deterministic uniform in (0,1] from md5(id); the global top-k by
    key is distributed exactly as k weighted draws without
    replacement.  The pipeline use: quality-weighted corpus selection
    (weight = a quality/importance score) where plain Bernoulli
    over/under-shoots small high-value strata.

    Plan shape: one narrow map for the key, then ``orderBy().limit(k)``
    — Spark compiles that to TakeOrderedAndProject (per-partition
    top-k heaps, driver merges k rows), NOT a global sort shuffle, so
    the cost is one scan regardless of corpus size.

    Determinism: u has 48 explicit bits from md5 and both engines
    evaluate ln/division within 1 ulp, so orderings agree except for
    keys within ~1 ulp — probability ~2^-47 per pair; the id
    tiebreaker pins exact ties.  Rows with weight <= 0 are excluded
    (a zero-weight row must never be drawn)."""
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 48))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__wkey", F.log(u) / F.col(weight_col))
        .orderBy(F.col("__wkey").desc(), F.col(id_col))
        .limit(k)
        .drop("__wkey")
    )


def dsir_importance_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int = 20,
    num_buckets: int = 1024,
    scale: int = 10**6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    each RAW document by how target-like its hashed n-gram profile
    is, and keep the top-k.

    Features are unigrams + bigrams hashed into ``num_buckets`` via
    md5 (the engine-portable hash this module standardizes on).  Both
    corpora reduce to bucket histograms — ONE map-side-combined
    shuffle of <= num_buckets rows each, the same constant-size shape
    as the sketch family — and the per-bucket importance weight is
    the INTEGER-QUANTIZED enrichment ratio

        w_b = scale * (t_b + 1) * (R + B) // ((r_b + 1) * (T + B)) - scale

    — the add-one-smoothed target/raw probability ratio, floor-
    quantized and centered (the linearized ``r - 1`` surrogate of
    DSIR's log-ratio: per-bucket MONOTONE in the ratio, and log-free
    like the quantized BM25, so scores replay bit-for-bit in the SQL
    oracle; with raw log-ratios the two engines' ``ln`` low bits
    could disagree).  A document's score is the weight-weighted sum
    of its own bucket counts, and selection is deterministic top-k on
    (score DESC, id).

    Scale posture: the weight table is <= num_buckets rows and
    BROADCASTS; each corpus is scanned once (explode + map-side
    combine); the per-document scoring join never shuffles the
    corpus.  Intermediate products are bounded by
    scale·(T+B)·(R+B)/(T+B) — at 10^12-token corpora drop ``scale``
    to keep BIGINT headroom.
    """
    B = num_buckets

    def _grams(df: DataFrame) -> DataFrame:
        toks = f"filter(split({text_col}, ' '), x -> x <> '')"
        return df.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"concat({toks}, transform("
                    f"slice(sequence(1, size({toks}) + 1), 1,"
                    f" greatest(size({toks}) - 1, 0)),"
                    f" i -> concat(element_at({toks}, i), ' ',"
                    f" element_at({toks}, i + 1))))"
                )
            ).alias("gram"),
        ).select(
            id_col,
            F.expr(
                f"pmod(CAST(conv(substr(md5(gram), 1, 12), 16, 10)"
                f" AS BIGINT), {B})"
            ).alias("bucket"),
        )

    t_hist = (
        _grams(target)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t_b"))
    )
    # (doc, bucket) pre-counts feed BOTH the raw histogram and the
    # scoring join (optimization round 14): deriving r_b as sum(c)
    # over the same aggregate — identical values — makes the two
    # consumers share one canonical subplan, so ReuseExchange runs
    # the raw-corpus tokenize+explode ONCE (previously each consumer
    # re-derived its own gram stream: two full corpus passes).
    doc_counts = _grams(raw).groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    r_hist = (
        doc_counts.groupBy("bucket")
        .agg(F.sum("c").cast("bigint").alias("r_b"))
    )
    # smoothing totals as window sums over the joined (<= num_buckets
    # row) histogram instead of separate .agg() frames (optimization
    # round 14): t_tot/r_tot were EXTRA consumers of each histogram,
    # so each corpus gram chain instantiated twice more in the plan;
    # SUM() OVER () on the tiny joined frame reads the same values
    # from one instantiation (T = sum of per-bucket t_b either way).
    # Degenerate-input note (r14 ADVICE): when ONE side's histogram is
    # empty, the old scalar .agg() yielded a NULL total (aggregate
    # over zero rows) and hence NULL weights, while the window sum
    # over the coalesced zeros yields 0 and finite weights.  When
    # BOTH corpora are non-empty — every caller, and anything the
    # oracle gates — at least one bucket row exists on each side, the
    # totals are positive, and the two forms are bit-identical; an
    # EMPTY target corpus now scores every doc with the uniform
    # smoothing weight instead of NULL, which is the better-defined
    # behavior and is what gold_dsir_selected.sql's window totals
    # compute too.
    weights = (
        r_hist.join(t_hist, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col("t_b"), F.lit(0)).alias("t_b"),
            F.coalesce(F.col("r_b"), F.lit(0)).alias("r_b"),
        )
        .select(
            "bucket",
            "t_b",
            "r_b",
            F.expr(
                "CAST(sum(t_b) OVER () AS BIGINT)"
            ).alias("T"),
            F.expr(
                "CAST(sum(r_b) OVER () AS BIGINT)"
            ).alias("R"),
        )
        .select(
            "bucket",
            # try_multiply returns NULL on BIGINT wrap (Spark's default
            # non-ANSI mode would otherwise wrap silently → wrong
            # selections with no error); the guard turns overflow into
            # a hard failure instead of relying on callers reading the
            # scale/corpus-size caveat in the docstring.  BOTH products
            # are guarded — the denominator (r_b+1)*(T+B) wraps first
            # when the raw pool dwarfs the target (r_b~1e9, T~1e10)
            # while the numerator stays in range.  Non-overflow values
            # are bit-identical to the plain products.
            (
                F.expr(
                    f"if(try_multiply(try_multiply("
                    f"CAST({scale} AS BIGINT), t_b + 1), R + {B}) IS NULL"
                    f" OR try_multiply(r_b + 1, T + {B}) IS NULL,"
                    f" CAST(raise_error('dsir_importance_sample: weight"
                    f" numerator or denominator overflows BIGINT —"
                    f" lower scale or n_buckets') AS BIGINT),"
                    f" CAST({scale} AS BIGINT) * (t_b + 1) * (R + {B})"
                    f" div ((r_b + 1) * (T + {B})) - {scale})"
                )
            ).cast("bigint").alias("w_b"),
        )
    )
    # pre-counted (doc, bucket) pairs join the broadcast weights: the
    # extra exchange looks redundant on paper (partial aggregation
    # combines map-side either way), but measured A/B at sf0.1 the
    # pre-counted form runs ~2.9 s vs ~4.8 s for joining raw gram
    # instances — the join + wide post-join aggregate over every
    # instance costs more than the small extra exchange saves
    scores = (
        doc_counts.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c") * F.col("w_b"))
            .cast("bigint")
            .alias("dsir_score")
        )
    )
    # global single-partition window: safe ONLY because it runs on
    # <= k rows post-limit (TakeOrdered does the distributed work) —
    # do not copy this pattern onto an unbounded frame
    w = Window.orderBy(F.desc("dsir_score"), F.asc(id_col))
    return (
        scores.orderBy(F.desc("dsir_score"), F.asc(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )
