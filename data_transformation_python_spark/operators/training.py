"""Distributed classifier TRAINING — quantized logistic regression by
full-batch gradient descent over hashed bag-of-words features.

The repo has long SERVED linear quality classifiers (text.py
``quality_classifier``: token → md5 bucket → weight → sum, one narrow
codegen'd projection) but never *fitted* one distributed.  This module
closes that gap with the same iterative shape as PageRank / k-means /
BPE (graph.py, similarity.py, text.py): the corpus is scanned ONCE
into a compact persisted feature frame, and each training iteration
costs one narrow scoring map plus one map-side-combined aggregate down
to ``n_buckets`` rows — never a corpus-sized shuffle.

Algorithm (all arithmetic 64-bit integer, so the DuckDB oracle replays
it bit-for-bit — see ``lr_unrolled_oracle_sql``):

- Features: token → ``md5`` bucket (hashing trick, same formula the
  serving path uses), per-doc counts ``c_b``; a constant feature
  (bucket −1, count 1) carries the BIAS so it trains uniformly.
- Labels: the deterministic teacher the repo already serves —
  ``y = (Σ_t (bucket_4096(t) % 1001 − 500) > 0)`` — making the fit a
  DISTILLATION of ``text_quality_classifier``'s scorer: the teacher is
  exactly linear in the hashed counts, so a linear student can recover
  it, and the learned weight table drops straight into the serving
  path (``text.quality_classifier_serve``).
- Loss: logistic with a HARD sigmoid ``σ(z) = clamp(z/4 + ½, 0, 1)``
  (the standard quantized-net surrogate) — piecewise-linear, hence
  exactly representable in fixed point: with weights scaled by
  ``S = 2^scale_log2`` the scaled probability is
  ``p4 = clamp(z + 2S, 0, 4S)`` (no division at all).
- Class balance, SYMMETRIC: minority-class residuals are multiplied
  by the integer imbalance ratio — positives by
  ``Kp = max(1, (N−P) // P)``, negatives by
  ``Kn = max(1, P // (N−P))`` — because an unbalanced fit converges to
  the majority-class predictor from EITHER side (measured: the ~8%-
  positive teacher needed Kp; the 78%-positive Gopher verdict sat at
  majority until Kn landed — 0.776 → 0.952 accuracy).  With positives
  in the minority Kn = 1 and the arithmetic is bit-identical to the
  one-sided form, so pre-existing gates replay unchanged.
- Step: per-bucket normalized with harmonic decay,
  ``Δw_b = −trunc(E·g_b / (4S·m_b·k))`` where ``m_b`` is the bucket's
  total occurrence count and ``k`` the iteration — sign-SGD-like,
  robust to the 1000× frequency spread between buckets; the 1/k decay
  stops the small-margin oscillation a constant step exhibits
  (measured: constant step peaks then degrades; decayed step is
  monotone to ~97% teacher agreement vs the 92% majority baseline).

Scale posture (100 TB): the corpus is tokenized once into
(doc, distinct-bucket) count rows — two build shuffles, then persisted
serialized.  Per iteration: the weight vector (≤ n_buckets+1 BIGINTs,
~8 KB) folds into a LITERAL array (the DSIR pattern, sampling.py), so
scoring is a narrow map; the gradient is one map-side-combined
aggregate to ≤ n_buckets+1 rows collected to the driver (pure
control-plane — same row-count discipline as k-means centroids).
Gradient sums ride ``try_sum``: BIGINT headroom is
``4S·K·(tokens per bucket)`` ≈ 10^9 tokens/bucket at the defaults —
raise ``n_buckets`` or lower ``scale_log2`` beyond that; overflow
raises instead of silently wrapping.

No reference counterpart (the reference engine has no training
operator); this is LLM-pipeline extension surface per SURVEY.md §2.12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .transform import lit_long_array

__all__ = [
    "lr_train",
    "lr_train_score",
    "lr_unrolled_oracle_sql",
]


# Feature-row count below which the GD loop runs driver-local on the
# ONE-time collected (y, counts) frame (~16 bytes/feature row — the
# bound keeps the collect broadcast-sized, the same discipline as a
# small-side join).  At or above it, per-iteration gradients run as
# mapInArrow partials; unprovable int64 bounds always fall back to
# the JVM try_sum plan.  All three produce identical integer
# gradients (pinned by tests/test_training.py).
_LR_DRIVER_MAX = 500_000

# flattened (b, c) pairs per task for the mapInArrow gradient loop —
# see the task-sizing comment at the coalesce in lr_train
_LR_ARROW_PAIRS_PER_TASK = 500_000

# Test hook: True pins every iteration to the JVM try_sum plan (the
# bounds-unprovable branch) so its equality with the fast paths stays
# directly assertable without faking an overflow-scale corpus.
_LR_FORCE_JVM = False


def _bucket_expr(tok: str, n_buckets: int) -> str:
    """Token → hashed feature bucket (Spark dialect) — the SAME
    formula the serving path uses (text.quality_classifier)."""
    return (
        f"pmod(CAST(conv(substr(md5({tok}), 1, 6), 16, 10)"
        f" AS BIGINT), {n_buckets})"
    )


def _teacher_expr(tok: str) -> str:
    """Per-token teacher weight — text.quality_classifier's
    deterministic table (4096 buckets, weights in [-500, 500])."""
    return (
        f"pmod(CAST(conv(substr(md5({tok}), 1, 6), 16, 10)"
        f" AS BIGINT), 4096) % 1001 - 500"
    )


def _sdiv(a: int, d: int) -> int:
    """Truncate-toward-zero division on ints — matches the SQL form
    ``sign(a) * (abs(a) // d)`` used by the oracle (Python's bare //
    floors, which differs for negative numerators)."""
    q = abs(a) // d
    return q if a >= 0 else -q


def lr_train(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 1024,
    scale_log2: int = 16,
    step_mult: int = 16,
    iters: int = 12,
    label_expr: str | None = None,
) -> dict[int, int]:
    """Fit the quantized logistic regression; returns the learned
    weight table ``{bucket: scaled_weight}`` with the bias at key −1.

    Weights are fixed-point BIGINTs scaled by ``2**scale_log2``; feed
    them to ``text.quality_classifier_serve`` (or ``lr_train_score``)
    to score documents.

    ``label_expr`` (a boolean SQL expression over ``df``'s columns,
    e.g. ``"lang = 'en'"``) switches the target from the default
    DISTILLATION teacher — which is exactly linear in the hashed
    counts, so the student can recover it bit-for-bit — to a GROUND-
    TRUTH label the feature space cannot perfectly represent: the
    honest-classifier regime, where the contract is a pinned accuracy
    floor, not teacher equality.  The GD loop, fixed-point arithmetic,
    and oracle replay are identical either way.
    """
    S = 1 << scale_log2
    S2, S4 = 2 * S, 4 * S
    E = step_mult * S
    b_expr = _bucket_expr("t", n_buckets)
    tw_expr = _teacher_expr("t")

    # ---- one corpus scan → compact per-doc feature rows -------------
    # (doc_id, y, counts: array<struct<b,c>>) with the bias feature
    # (b=-1, c=1) appended; the label is either the teacher (a narrow
    # HOF aggregate over the same tokenization) or the caller's
    # ground-truth column expression.
    if label_expr is None:
        tok = df.select(
            F.col(id_col).alias("doc_id"),
            F.expr(
                f"transform(split({text_col}, ' '),"
                f" t -> named_struct('b', {b_expr}, 'tw', {tw_expr}))"
            ).alias("bt"),
        )
        lab = tok.select(
            "doc_id",
            F.expr(
                "CASE WHEN aggregate(bt, CAST(0 AS BIGINT),"
                " (a, x) -> a + x.tw) > 0"
                " THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            ).alias("y"),
            F.explode(F.col("bt.b")).alias("b"),
        )
    else:
        tok = df.select(
            F.col(id_col).alias("doc_id"),
            F.expr(
                f"CASE WHEN ({label_expr}) THEN CAST(1 AS BIGINT)"
                f" ELSE CAST(0 AS BIGINT) END"
            ).alias("y"),
            F.expr(
                f"transform(split({text_col}, ' '), t -> {b_expr})"
            ).alias("bt"),
        )
        lab = tok.select("doc_id", "y", F.explode("bt").alias("b"))
    feats = (
        lab.groupBy("doc_id", "y", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .groupBy("doc_id", "y")
        .agg(F.collect_list(F.struct("b", "c")).alias("counts"))
        .select(
            "doc_id",
            "y",
            F.expr(
                "array_append(counts, named_struct('b',"
                " CAST(-1 AS BIGINT), 'c', CAST(1 AS BIGINT)))"
            ).alias("counts"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # ---- control-plane constants (ONE tiny job) ---------------------
    # m_b = total occurrences per bucket (iteration-invariant step
    # normalizer); P = positive-doc count, recovered from the bias rows
    # (exactly one per doc) so no second scan is needed.
    m_rows = (
        feats.select(
            "y",
            F.expr(
                "aggregate(counts, CAST(0 AS BIGINT),"
                " (a, x) -> a + x.c)"
            ).alias("dl"),
            F.explode("counts").alias("x"),
        )
        .groupBy(F.col("x.b").alias("b"))
        .agg(
            F.sum("x.c").cast("bigint").alias("m"),
            F.sum(
                F.when(F.col("x.b") == -1, F.col("y")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("p"),
            F.max("dl").cast("bigint").alias("dlmax"),
        )
        .collect()
    )
    m = {r["b"]: r["m"] for r in m_rows}
    max_doc_len = max(int(r["dlmax"]) for r in m_rows) if m_rows else 0
    if -1 not in m:
        feats.unpersist()
        raise ValueError("lr_train: empty corpus")
    N = m[-1]
    P = next(r["p"] for r in m_rows if r["b"] == -1)
    kkp = max(1, (N - P) // max(P, 1))
    kkn = max(1, P // max(N - P, 1))

    # ---- GD loop: T tiny jobs, weights as a broadcast literal -------
    # The weight vector is staged as ONE ArrayType literal column
    # (F.lit) referenced by name from the SQL, not spliced in as an
    # "array(CAST(..),..)" string: parsing + analyzing the 1025-element
    # array expression cost ~0.5-1 s of pure driver planning PER
    # ITERATION (measured; the optimized plan and the arithmetic are
    # identical either way).
    z = (
        "aggregate(counts, CAST(0 AS BIGINT), (acc, x) ->"
        " acc + x.c * element_at(__w, CAST(x.b + 2 AS INT)))"
    )
    r = (
        f"(least(greatest({z} + {S2}, CAST(0 AS BIGINT)),"
        f" CAST({S4} AS BIGINT)) - {S4} * y)"
        f" * ({kkn} + {kkp - kkn} * y)"
    )
    # The per-iteration gradient runs as ONE mapInArrow pass handing
    # each partition's (y, counts) batches to numpy (optimization
    # round 14, guide §4.2: bulk per-element work belongs in
    # vectorized native code — the interpreted HOF z-aggregate plus
    # the 36x struct explode per doc was ~1.5 s/iteration at 50k
    # docs; the numpy dot/clip/scatter is milliseconds).  int64 numpy
    # wraps silently where try_sum returns NULL, so the fast path is
    # GUARDED by driver-checked magnitude bounds re-proved every
    # iteration: |z| <= max_doc_len·max|w|, |r| <= 4S·K, |g_b| <=
    # 4S·K·m_b — all kept below 2^61, far under wraparound.  If a
    # bound ever fails the iteration falls back to the bit-identical
    # JVM try_sum plan (same arithmetic, fail-loud overflow).
    W = {b: 0 for b in m}
    kk = max(kkp, kkn)
    max_m = max(int(v) for v in m.values())
    lim = 1 << 61
    # size-adaptive plan choice — three rungs, identical gradients:
    # - DRIVER-LOCAL numpy loop below _LR_DRIVER_MAX feature rows: at
    #   that bound the collected (y, counts) frame is ~8 MB, i.e.
    #   broadcast-sized control-plane data, and the 12 per-iteration
    #   Spark jobs (~0.4 s each of pure planning/scheduling at
    #   fixture scale, measured round 15) collapse to one collect;
    # - mapInArrow above it (round 14): per-partition numpy partials,
    #   one tiny job per iteration;
    # - the JVM try_sum plan whenever the driver-checked magnitude
    #   bounds cannot prove int64 safety (fail-loud overflow).
    n_feat_rows = sum(int(v) for v in m.values())
    use_driver = n_feat_rows < _LR_DRIVER_MAX and not _LR_FORCE_JVM
    use_arrow = not use_driver and not _LR_FORCE_JVM

    # Python-boundary iteration jobs pay a fixed per-task round-trip
    # (schedule + worker IPC + Arrow frame per task), so size tasks by
    # DATA: ~500k flattened feature pairs each (measured at 50k docs /
    # 1.85M pairs: 32 tasks 0.39 s/iteration, 4-8 tasks 0.25-0.29 s,
    # 1 task 0.41 s — single-task serializes transfer and compute).
    # coalesce() is shuffle-free over the persisted frame, the count
    # grows linearly with data, and the floor of 2 keeps transfer and
    # numpy work overlapping.  Partition layout cannot change values:
    # per-doc z never crosses batches and the (b, g) partials are
    # summed by the same try_sum regardless of grouping.
    feats_loop = feats.select("y", "counts")
    if use_arrow:
        nparts = max(2, min(
            df.sparkSession.sparkContext.defaultParallelism,
            -(-n_feat_rows // _LR_ARROW_PAIRS_PER_TASK),
        ))
        feats_loop = feats_loop.coalesce(nparts)

    def _extract_np(y_col, counts_col):
        """(y, idx, c, lens, starts) numpy views of one Arrow batch /
        table — shared by the driver-local and mapInArrow paths."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        y = y_col.to_numpy(zero_copy_only=False).astype(np.int64)
        la = counts_col
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        lens = pc.list_value_length(la).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # the appended bias struct guarantees every list is non-empty;
        # a zero-length list would make reduceat silently repeat a
        # neighbour's slot (ADVICE r14) — fail loudly instead
        assert len(lens) == 0 or lens.min() > 0, (
            "lr_train: empty counts list — bias append invariant broken"
        )
        flat = la.flatten()
        b = flat.field("b").to_numpy(zero_copy_only=False)
        c = flat.field("c").to_numpy(zero_copy_only=False)
        idx = (b + 1).astype(np.intp)
        starts = np.zeros(len(lens), dtype=np.intp)
        np.cumsum(lens[:-1], out=starts[1:])
        return y, idx, c, lens, starts

    def _grad_np(w_np, y, idx, c, lens, starts, gacc, seen):
        """One exact int64 gradient accumulation (numpy twin of the
        JVM r-expression; bounds proved by the caller)."""
        import numpy as np

        z = np.add.reduceat(c * w_np[idx], starts)
        rr = (np.clip(z + S2, 0, S4) - S4 * y) * (
            kkn + (kkp - kkn) * y
        )
        np.add.at(gacc, idx, np.repeat(rr, lens) * c)
        seen[idx] = True

    def _grad_arrow(arr: list[int]) -> list:
        import numpy as np
        import pyarrow as pa

        w_np = np.asarray(arr, dtype=np.int64)
        nb = len(arr)

        def fn(batches):
            gacc = np.zeros(nb, dtype=np.int64)
            seen = np.zeros(nb, dtype=bool)
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                y, idx, c, lens, starts = _extract_np(
                    batch.column(0), batch.column(1)
                )
                _grad_np(w_np, y, idx, c, lens, starts, gacc, seen)
            ix = np.flatnonzero(seen)
            yield pa.record_batch(
                [pa.array(ix.astype(np.int64) - 1),
                 pa.array(gacc[ix])],
                names=["b", "g"],
            )

        return (
            feats_loop
            .mapInArrow(fn, "b bigint, g bigint")
            .groupBy("b")
            .agg(F.expr("try_sum(g)").alias("g"))
            .collect()
        )

    local = None
    if use_driver:
        import numpy as np

        tbl = feats.select("y", "counts").toArrow()
        local = _extract_np(tbl.column("y"), tbl.column("counts"))

    for k in range(1, iters + 1):
        arr = [W[-1]] + [W.get(b, 0) for b in range(n_buckets)]
        w_abs = max(abs(v) for v in arr)
        safe = (
            max_doc_len * max(w_abs, 1) < lim
            and S4 * kk * max(max_doc_len, max_m) < lim
        )
        if local is not None and safe:
            import numpy as np

            w_np = np.asarray(arr, dtype=np.int64)
            gacc = np.zeros(len(arr), dtype=np.int64)
            seen = np.zeros(len(arr), dtype=bool)
            y, idx, c, lens, starts = local
            _grad_np(w_np, y, idx, c, lens, starts, gacc, seen)
            grad = [
                {"b": int(i) - 1, "g": int(gacc[i])}
                for i in np.flatnonzero(seen)
            ]
        elif use_arrow and safe:
            grad = _grad_arrow(arr)
        else:
            grad = (
                feats.withColumn("__w", lit_long_array(arr))
                .select(
                    F.expr(r).alias("r"), F.explode("counts").alias("x")
                )
                .groupBy(F.col("x.b").alias("b"))
                .agg(F.expr("try_sum(r * x.c)").alias("g"))
                .collect()
            )
        for row in grad:
            b, g = row["b"], row["g"]
            if g is None:
                feats.unpersist()
                raise ArithmeticError(
                    "lr_train: gradient sum overflows BIGINT — raise"
                    " n_buckets or lower scale_log2"
                )
            W[b] = W[b] - _sdiv(E * g, S4 * m[b] * k)
    feats.unpersist()
    return W


def lr_train_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 1024,
    scale_log2: int = 16,
    step_mult: int = 16,
    iters: int = 12,
    label_expr: str | None = None,
) -> DataFrame:
    """End-to-end train → score: fit the classifier, then score every
    document THROUGH THE SERVING PATH (text.quality_classifier_serve)
    with the learned weights, alongside the target label.

    Output: (doc_id, z_scaled, pred_label, teacher_label, agree);
    with ``label_expr`` the fourth column is the ground-truth label
    and is named ``true_label``.
    """
    from .text import quality_classifier_serve

    W = lr_train(
        df,
        text_col,
        id_col,
        n_buckets=n_buckets,
        scale_log2=scale_log2,
        step_mult=step_mult,
        iters=iters,
        label_expr=label_expr,
    )
    weights = [W.get(b, 0) for b in range(n_buckets)]
    scored = quality_classifier_serve(
        df,
        weights,
        bias=W.get(-1, 0),
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
    )
    if label_expr is None:
        tw = _teacher_expr("t")
        label_col, label_sql = "teacher_label", (
            f"CASE WHEN aggregate(transform(split({text_col}, ' '),"
            f" t -> {tw}), CAST(0 AS BIGINT), (a, x) -> a + x) > 0"
            f" THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    else:
        label_col, label_sql = "true_label", (
            f"CASE WHEN ({label_expr}) THEN CAST(1 AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END"
        )
    target = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(label_sql).alias(label_col),
    )
    return (
        scored.join(target, "doc_id")
        .select(
            "doc_id",
            "z_scaled",
            "pred_label",
            label_col,
            F.expr(f"pred_label = ({label_col} = 1)").alias("agree"),
        )
    )


def lr_unrolled_oracle_sql(
    *,
    n_buckets: int = 1024,
    scale_log2: int = 16,
    step_mult: int = 16,
    iters: int = 12,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    label_sql: str | None = None,
) -> str:
    """DuckDB twin: the full GD loop unrolled as a MATERIALIZED-CTE
    chain (4 CTEs per iteration), bit-exact with ``lr_train_score``.

    ``label_sql`` mirrors ``lr_train``'s ``label_expr``: a boolean
    DuckDB expression over the table's columns replaces the distilled
    teacher as the target, and the output's fourth column is named
    ``true_label``.

    MATERIALIZED is load-bearing: each w{k} is referenced by both
    z{k+1} and w{k+1}; inlined CTEs would re-evaluate the whole prefix
    exponentially (same pattern as the BPE/PageRank oracles)."""
    S = 1 << scale_log2
    S2, S4 = 2 * S, 4 * S
    E = step_mult * S
    h = f"CAST(('0x' || substr(md5(t), 1, 6)) AS BIGINT)"

    def sdiv(g: str, d: str) -> str:
        return f"CAST(sign({g}) AS BIGINT) * CAST((abs({g}) // ({d})) AS BIGINT)"

    if label_sql is None:
        lab_cte = """lab AS MATERIALIZED (SELECT doc_id,
  CASE WHEN SUM(tw) > 0 THEN CAST(1 AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS y FROM fb GROUP BY doc_id)"""
        label_name = "teacher_label"
    else:
        lab_cte = f"""lab AS MATERIALIZED (SELECT {id_col} AS doc_id,
  CASE WHEN ({label_sql}) THEN CAST(1 AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS y FROM {table})"""
        label_name = "true_label"

    parts = [
        f"""WITH toks AS (SELECT {id_col} AS doc_id,
  unnest(string_split({text_col}, ' ')) AS t FROM {table}),
fb AS MATERIALIZED (SELECT doc_id, {h} % {n_buckets} AS b,
  {h} % 4096 % 1001 - 500 AS tw FROM toks),
{lab_cte},
cnt AS MATERIALIZED (
  SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM fb GROUP BY 1, 2
  UNION ALL
  SELECT doc_id, CAST(-1 AS BIGINT), CAST(1 AS BIGINT) FROM lab),
m AS MATERIALIZED (SELECT b, SUM(c) AS m FROM cnt GROUP BY b),
bal AS MATERIALIZED (SELECT
  GREATEST(1, (COUNT(*) - SUM(y)) // GREATEST(SUM(y), 1)) AS kkp,
  GREATEST(1, SUM(y) // GREATEST(COUNT(*) - SUM(y), 1)) AS kkn
  FROM lab),
w0 AS MATERIALIZED (SELECT b, CAST(0 AS BIGINT) AS w FROM m)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""z{k} AS MATERIALIZED (SELECT c.doc_id,
  CAST(SUM(c.c * w.w) AS BIGINT) AS z
  FROM cnt c JOIN w{p} w USING (b) GROUP BY 1)"""
        )
        parts.append(
            f"""r{k} AS MATERIALIZED (SELECT lab.doc_id,
  (LEAST(GREATEST(z + {S2}, 0), {S4}) - {S4} * y) * (kkn + (kkp - kkn) * y) AS r
  FROM z{k} JOIN lab USING (doc_id), bal)"""
        )
        parts.append(
            f"""g{k} AS MATERIALIZED (SELECT b, SUM(r * c) AS g
  FROM cnt JOIN r{k} USING (doc_id) GROUP BY b)"""
        )
        parts.append(
            f"""w{k} AS MATERIALIZED (SELECT g.b,
  w.w - {sdiv(f'{E} * g.g', f'{S4} * m.m * {k}')} AS w
  FROM g{k} g JOIN m USING (b) JOIN w{p} w USING (b))"""
        )
    parts.append(
        f"""zf AS (SELECT c.doc_id, CAST(SUM(c.c * w.w) AS BIGINT) AS z
  FROM cnt c JOIN w{iters} w USING (b) GROUP BY 1)"""
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT zf.doc_id AS doc_id, z AS z_scaled, z > 0 AS pred_label,
       y AS {label_name}, (z > 0) = (y = 1) AS agree
FROM zf JOIN lab USING (doc_id)"""
    )


def gopher_label_exprs() -> tuple[str, str]:
    """(spark_expr, duckdb_sql) boolean expressions for the Gopher
    §A1.1 combined verdict over a ``text`` column — the same gates
    and thresholds as ``text.gopher_quality`` / its oracle (mean word
    length in [3, 10], symbol ratio < 0.1, ≥ 80% alphabetic words,
    ≥ 2 English stopwords).  The honest training target for
    ``lr_train(label_expr=...)``: computed FROM the text, so it is
    learnable, but built from ratio thresholds, so the hashed-count
    feature space cannot represent it exactly.  (The fixture's
    ``lang`` column was measured NOT learnable — it is metadata
    uncorrelated with the synthetic token stream; a bag-of-words fit
    on it converges to the majority class by construction.)"""
    toks_s = "split(text, ' ')"
    sum_s = (
        f"aggregate({toks_s}, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))"
    )
    n_s = f"size({toks_s})"
    spark = (
        f"CAST({sum_s} AS DOUBLE) / {n_s} >= 3.0"
        f" AND CAST({sum_s} AS DOUBLE) / {n_s} <= 10.0"
        f" AND CAST(size(regexp_extract_all(text, '#', 0))"
        f" + size(regexp_extract_all(text, '\\\\.\\\\.\\\\.', 0))"
        f" AS DOUBLE) / {n_s} < 0.1"
        f" AND CAST(size(filter({toks_s}, x -> x rlike '[a-zA-Z]'))"
        f" AS DOUBLE) / {n_s} >= 0.8"
        f" AND size(filter({toks_s}, x -> array_contains("
        f"array('the','a','and','of','to','is'), x))) >= 2"
    )
    toks_d = "string_split(text, ' ')"
    sum_d = f"list_sum(list_transform({toks_d}, x -> CAST(length(x) AS BIGINT)))"
    n_d = f"len({toks_d})"
    duck = (
        f"CAST({sum_d} AS DOUBLE) / {n_d} >= 3.0"
        f" AND CAST({sum_d} AS DOUBLE) / {n_d} <= 10.0"
        f" AND CAST(len(regexp_extract_all(text, '#'))"
        f" + len(regexp_extract_all(text, '\\.\\.\\.'))"
        f" AS DOUBLE) / {n_d} < 0.1"
        f" AND CAST(len(list_filter({toks_d},"
        f" x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / {n_d} >= 0.8"
        f" AND len(list_filter({toks_d}, x -> list_contains("
        f"['the','a','and','of','to','is'], x))) >= 2"
    )
    return spark, duck
