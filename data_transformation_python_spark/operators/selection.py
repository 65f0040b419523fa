"""Distributed selection: EXACT global order statistics without a
global sort.

A global percentile over 100 TB cannot sort the corpus (a total sort
is a single-reducer tail) and ``percentile_disc`` as a global
aggregate funnels every value through one group.  The standard scale
algorithm is iterative histogram refinement (the selection analogue of
binary search): ONE aggregate per round computes fixed-width bin
counts over the candidate range, the driver (holding only ``bins``
numbers) locates the bin containing the target rank, and the search
recurses into that bin's analytic bounds — no per-round count or
min/max jobs, and the candidate set shrinks by ~``bins``× per round,
so a 10^11-row corpus needs 3-4 rounds before an exact bounded sort
finishes the job.

Determinism: the returned value is an actual data value at the
SQL-standard ``percentile_disc`` rank (smallest value whose cumulative
count ≥ ⌈q·n⌉), so any engine agrees exactly — the bin boundaries are
internal and never affect the result.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exact_rank(cur: DataFrame, rank: int) -> float:
    """Resolve the ``rank``-th smallest value of a SMALL candidate set
    with a bounded sort-limit."""
    row = cur.orderBy("v").limit(rank).orderBy(F.desc("v")).limit(1).first()
    return float(row["v"])


def global_percentile_disc(
    df: DataFrame,
    col: str,
    qs: list[float],
    bins: int = 1024,
    exact_threshold: int = 100_000,
) -> DataFrame:
    """Exact global discrete percentiles of ``col`` (NULLs ignored)
    for each fraction in ``qs``.  Returns (quantile, value) rows.

    ``exact_threshold`` is the candidate-set size below which the
    remaining rows are resolved by a bounded sort-limit; ``bins``
    trades rounds against per-round aggregate width.  One combined
    count/min/max aggregate runs up front (shared by every quantile);
    each refinement round costs exactly one histogram aggregate —
    the round's count and bounds come from the PREVIOUS histogram
    (the selected bin's count and analytic edges), not extra jobs.
    """
    from .transform import materialize

    spark = df.sparkSession
    # Materialize the PRUNED single-value column once: every
    # refinement round (histogram + filter) re-reads these values, and
    # without the checkpoint the full upstream plan (often an
    # expensive projection, e.g. vector quantization) re-executes per
    # round.  The checkpoint is one double per row — the cheapest
    # possible representation of the input at any scale.
    vals = materialize(
        df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    )
    g = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    ).first()
    n = g["n"]
    out: list[tuple[float, float]] = []
    for q in sorted(qs):
        if n == 0:
            break
        rank = max(1, math.ceil(q * n))
        cur, cnt = vals, n
        lo, hi = float(g["mn"]), float(g["mx"])
        # Round budget: each round shrinks the candidate range by
        # ~``bins``×, so 64 rounds cover ≥2^64 dynamic range — any
        # real distribution resolves far earlier.  The budget exists
        # for pathological value sets (e.g. denormals next to ±0.0,
        # hypothesis-found) where candidates stop separating: at
        # bins=2 the range would otherwise have to halve ~1100 times
        # (one Spark job each) to split ±5e-324 from ±0.0.  On
        # exhaustion the remaining bin resolves exactly — a bounded
        # sort-limit, still the SQL-standard order statistic.
        rounds_left = 64
        while True:
            if rounds_left <= 0:
                out.append((q, _exact_rank(cur, rank)))
                break
            rounds_left -= 1
            if cnt <= exact_threshold:
                out.append((q, _exact_rank(cur, rank)))
                break
            if lo == hi:
                out.append((q, lo))
                break
            width = (hi - lo) / bins
            if not math.isfinite(width) or width <= 0:
                # ulp-close range (width underflows) or non-finite
                # values: binning can't subdivide — resolve exactly
                # (slow path, only on degenerate data)
                out.append((q, _exact_rank(cur, rank)))
                break
            # the SAME bin expression bins and filters, so boundary
            # rounding can never drop or double-count a row WITHIN a
            # round; the clamp must cover BOTH ends because a row can
            # survive the previous round's bin filter while sitting a
            # rounding error below this round's lo (floor((x-lo)/width)
            # can equal sel even though x < lo + sel*width exactly) —
            # unclamped it would bin to -1, vanish from the histogram
            # AND the filter, and corrupt the rank accounting
            # (hypothesis-found with -0.0/denormal values).
            bin_expr = F.greatest(
                F.lit(0),
                F.least(
                    F.lit(bins - 1),
                    F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
                ),
            ).cast("int")
            hist = {
                r["b"]: r["c"]
                for r in cur.select(bin_expr.alias("b"))
                .groupBy("b")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            }
            cum, sel = 0, bins - 1
            for b in range(bins):
                c = hist.get(b, 0)
                if cum + c >= rank:
                    sel = b
                    rank -= cum
                    break
                cum += c
            cur = cur.filter(bin_expr == sel)
            cnt = hist.get(sel, 0)
            new_lo = lo + sel * width
            hi = hi if sel == bins - 1 else lo + (sel + 1) * width
            lo = new_lo
    return spark.createDataFrame(
        out or [(None, None)], "quantile double, value double"
    ).filter("quantile IS NOT NULL")


def cusum_changepoint(
    df,
    time_col: str = "ts",
    group_col: str = "event_type",
    k_x100: int = 50,
    h_x100: int = 600,
):
    """One-sided CUSUM change-point detection over per-hour event
    volumes (Page 1954): s_i = max(0, s_{i-1} + x_i − μ − k), alarm
    when s crosses h — the classic drift monitor a pipeline runs per
    source to catch volume shifts a global mean test smears out.

    The clamped recursion is rewritten in closed form:
    s_i = P_i − min(0, min_{j≤i} P_j) with P the running prefix sum
    of y_i = 100·x_i − μ − k — so the whole trajectory is TWO window
    functions over (group, hour) order, no recursion, no per-group
    array collect, fully distributed at any series length.  All
    arithmetic is ×100 fixed-point BIGINT (μ = (100·Σx) DIV n), so
    every s_i replays bit-exactly in the SQL oracle.

    Returns (group, n_hours, mu_x100, max_cusum, n_alarm_hours).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    hourly = (
        df.select(
            F.col(group_col).alias("g"),
            F.date_trunc("hour", F.col(time_col)).alias("h"),
        )
        .groupBy("g", "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return cusum_serve(hourly, group_col, k_x100, h_x100)


def cusum_serve(hourly, group_col: str = "event_type",
                k_x100: int = 50, h_x100: int = 600):
    """Serve the CUSUM verdicts from a (g, h, c) hourly-count series —
    shared by the batch monitor and the streaming log-structured gate
    (hourly counts merge by SUM, so stream-maintained series feed the
    identical serving pass)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    mu = hourly.groupBy("g").agg(
        F.expr("CAST((100 * SUM(c)) DIV COUNT(1) AS BIGINT)").alias(
            "mu_x100"
        )
    )
    w = Window.partitionBy("g").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    traj = (
        hourly.join(F.broadcast(mu), "g")
        .withColumn("y", F.expr(f"100 * c - mu_x100 - {k_x100}"))
        .withColumn("P", F.sum("y").over(w))
        .withColumn(
            "s",
            F.expr("P - LEAST(CAST(0 AS BIGINT), min(P) OVER "
                   "(PARTITION BY g ORDER BY h ROWS BETWEEN UNBOUNDED "
                   "PRECEDING AND CURRENT ROW))"),
        )
    )
    return traj.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.max("mu_x100").cast("bigint").alias("mu_x100"),
        F.max("s").cast("bigint").alias("max_cusum"),
        F.sum((F.col("s") > h_x100).cast("int"))
        .cast("bigint")
        .alias("n_alarm_hours"),
    ).withColumnRenamed("g", group_col)
