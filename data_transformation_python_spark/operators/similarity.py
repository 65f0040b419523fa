"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline; LSH bucketing (random
hyperplane signs) is the approximate scale path that avoids the full
cross join at corpus scale.

Determinism contract: embeddings are quantized to integer milli-units
(``round(double(x) * 1000)``) so dot products and norms are *exact*
integer arithmetic carried in doubles (well under 2^53); the final
``dot / sqrt(na*nb)`` is a fixed sequence of correctly-rounded IEEE
ops on identical inputs → bit-identical across engines (oracle-safe).

Scale posture: the query side is broadcast; the corpus side streams —
no shuffle at all for top-k against a bounded query set.  For
corpus×corpus jobs use the LSH variant, which shuffles on small
bucket keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT_EXPR = "transform({col}, x -> round(CAST(x AS DOUBLE) * 1000))"
DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
    " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
)


def _plane_sign(plane: int, dim: int) -> float:
    """±1 hyperplane component — parity of the first hex digit of
    md5('{plane}:{dim}').  Identical to the SQL formula the DuckDB
    oracles use, so Python-precomputed literal arrays and in-engine
    md5 produce the same buckets."""
    import hashlib

    h = hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()
    return 1.0 if int(h[0], 16) % 2 == 0 else -1.0


def _plane_array_sql(plane: int, dim: int) -> str:
    """Literal ±1.0 array for one hyperplane — constant-folded by
    Catalyst instead of 2·dim md5 calls per row per plane."""
    return "array(" + ", ".join(
        f"{_plane_sign(plane, d):.1f}D" for d in range(dim)
    ) + ")"


def _probe_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"]) if row and row["d"] is not None else 0


def _literal_argmin_sql(cents: list[tuple[int, list[int]]]) -> str:
    """SQL expression finding the nearest centroid of a quantized row
    (columns ``__v``/``__nrm``): the centroid matrix is embedded as a
    constant struct-array and the argmin is one ``array_min`` over a
    (d2, cid) struct — so nearest-centroid assignment is a pure narrow
    map over the scan: no join, no shuffle, no Python workers.  Ties
    break to the smaller cid via struct ordering.  Returns the struct
    ``(d2, cid)`` so callers get the distance for free (inertia).
    ``cents`` must be sorted by cid."""
    entries = ", ".join(
        "named_struct('cid', {cid}L, 'cn', {cn}.0D, 'cv', array({cv}))".format(
            cid=cid,
            cn=sum(x * x for x in cv),
            cv=", ".join(f"{x}.0D" for x in cv),
        )
        for cid, cv in cents
    )
    d2_term = "__nrm + c.cn - 2 * " + DOT_EXPR.format(a="__v", b="c.cv")
    return (
        f"array_min(transform(array({entries}), "
        f"c -> struct({d2_term} AS d2, c.cid AS cid)))"
    )


def quantized(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """id, quantized vector, squared norm (exact integers in doubles)."""
    q = df.select(
        id_col, F.expr(QUANT_EXPR.format(col=vec_col)).alias("__v")
    )
    return q.withColumn("__nrm", F.expr(DOT_EXPR.format(a="__v", b="__v")))


def cosine_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    The (small) query set is broadcast against the corpus — a map-side
    nested loop per partition, no shuffle; ranking shuffles only the
    per-query candidate rows.
    """
    query_ids = list(query_ids)
    qn = quantized(df, vec_col, id_col)
    queries = qn.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__nrm").alias("__qn"),
    )
    corpus = qn.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("__cv"),
        F.col("__nrm").alias("__cn"),
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            F.expr(DOT_EXPR.format(a="__qv", b="__cv"))
            / F.sqrt(F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            "cosine_sim",
        )
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_broadcast_cells: int = 16_000_000,
    max_pair_cells: int = 400_000_000,
    lsh_planes_per_band: int | None = None,
    lsh_bands: int = 16,
) -> DataFrame:
    """All corpus pairs above a cosine threshold.

    Two physical strategies behind one logical operator, picked by a
    size probe (one cheap count job):

    - **Broadcast BLAS** (corpus ≤ ``max_broadcast_cells`` id×dim
      cells, default 16M ≈ 128 MB of float64, AND N² ≤
      ``max_pair_cells`` — the block products are O(N²·d) compute and
      O(block·N) memory regardless of how small the matrix broadcast
      is, so both budgets must hold): the corpus is collected once
      into a numpy matrix and broadcast — exactly how Spark builds a
      broadcast-hash-join side, and bounded the same way.  Each Arrow
      batch computes a BLAS ``block × corpusᵀ`` product; O(N²·d /
      partitions), no shuffle.
    - **LSH + exact verify** (anything larger): banded random-
      hyperplane candidates (OR of ``lsh_bands`` independent
      ``lsh_planes_per_band``-bit buckets), then the exact integer
      cosine on candidate pairs only — fully distributed, nothing
      corpus-sized ever reaches the driver.  Recall follows the LSH
      S-curve (see ``_neardup_lsh_verified``); exact-by-construction
      only the broadcast path is.

    ``lsh_planes_per_band=None`` (the DEFAULT) auto-sizes the band
    width to ``ceil(log2(n)) + 1`` so expected bucket occupancy stays
    < 1 at ANY corpus size — candidate pairs (and therefore the
    verify join) then grow linearly in n instead of quadratically
    (measured: with the dial pinned at 16, 300k→500k rows cost
    9.8→36.2 s, ~n^2.6 locally; auto-sized it is near-linear —
    SCALING.md "Measured scaling exponents").  Auto became the
    default in round 8 precisely because of that measurement: a
    pinned width is a quadratic plan waiting for a big corpus.  Pass
    an integer width as an explicit recall dial only when you know
    the corpus size; the trade is the standard LSH one: wider bands
    lower per-band recall at a FIXED similarity (compensate with more
    bands, cost ∝ bands), while recall for near-exact duplicates
    (sim → 1) stays ≈ 1 at any width — the dedup shape this operator
    feeds.

    Determinism: quantized components are integers, so every partial
    sum (BLAS or SQL ``aggregate``) is an exact integer < 2^53 —
    reordering/FMA cannot change the result, and the final /sqrt ops
    are correctly-rounded IEEE on identical inputs → bit-equal across
    both strategies and the SQL oracle on shared pairs.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .transform import materialize

    # Quantize ONCE and checkpoint: the size probe, the broadcast
    # build, and the LSH fallback all read the same materialized
    # corpus (previously the LSH path re-quantized from scratch and
    # the probe ran the quantization a second time).
    qn_full = materialize(quantized(df, vec_col, id_col))
    stats = qn_full.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.size("__v")).alias("dim")
    ).first()
    n_rows, dim = stats["n"] or 0, stats["dim"] or 0
    if n_rows * dim > max_broadcast_cells or n_rows * n_rows > max_pair_cells:
        import warnings

        warnings.warn(
            f"cosine_neardup_pairs: corpus ({n_rows} rows x {dim} dims) "
            f"exceeds the exact-path budget (max_broadcast_cells="
            f"{max_broadcast_cells}, max_pair_cells={max_pair_cells}); "
            "switching from the exact broadcast path to LSH+verify "
            "(recall follows the LSH S-curve, ~0.94 at sim 0.8 with "
            "defaults). Raise the budgets or add bands for higher recall.",
            stacklevel=2,
        )
        return _neardup_lsh_verified(
            df,
            threshold,
            vec_col,
            id_col,
            lsh_planes_per_band,
            lsh_bands,
            dim,
            qn=qn_full,
        )

    # Build the broadcast side (driver-side, like a broadcast join
    # build — size-guarded above).
    qn = qn_full.select(F.col(id_col).alias("id"), "__v")
    rows = qn.collect()
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["__v"], dtype=np.float64) for r in rows])
    nrm = (mat * mat).sum(axis=1)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((ids, mat, nrm))

    out_schema = T.StructType(
        [
            T.StructField("vec_id_1", T.LongType()),
            T.StructField("vec_id_2", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def _blocks(batches):
        c_ids, c_mat, c_nrm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            b_ids = pdf["id"].to_numpy(dtype=np.int64)
            block = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
            b_nrm = (block * block).sum(axis=1)
            dots = block @ c_mat.T
            sims = dots / np.sqrt(np.outer(b_nrm, c_nrm))
            mask = (sims >= threshold) & (b_ids[:, None] < c_ids[None, :])
            bi, ci = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "vec_id_1": b_ids[bi],
                    "vec_id_2": c_ids[ci],
                    "cosine_sim": sims[bi, ci],
                }
            )

    return qn.mapInPandas(_blocks, schema=out_schema)


def _neardup_lsh_verified(
    df: DataFrame,
    threshold: float,
    vec_col: str,
    id_col: str,
    planes_per_band: int | None,
    bands: int,
    dim: int | None = None,
    qn: DataFrame | None = None,
) -> DataFrame:
    """Distributed near-dup path: banded-LSH candidates → exact
    quantized-integer cosine on candidate pairs only.  Shuffles on
    bucket keys and pair ids; no driver-side corpus materialization.
    Mirrors the dedup pipeline's candidates→verify shape
    (queries/advanced.py dedup_pipeline_survivors).

    OR-banding: ``bands`` independent bucket keys, each the sign
    pattern of ``planes_per_band`` hyperplanes; a pair is a candidate
    if it collides in ANY band.  With per-plane agreement probability
    p = 1 - arccos(sim)/π, recall ≈ 1 - (1 - p^planes)^bands — the
    defaults (8 planes × 16 bands) give ≈0.94 recall at sim 0.8 and
    ≈0.996 at 0.9; low thresholds inherently need more bands (or the
    broadcast BLAS path), the standard LSH dial.

    Plan shape: the quantized corpus is materialized ONCE; all
    ``bands × planes_per_band`` sign bits come from one projection
    over it (hyperplane signs are precomputed ±1 literal arrays —
    constant-folded, no per-row md5), posexploded into (band, bucket)
    keys, and pairs are emitted per bucket group — a single corpus
    scan and one shuffle on the bucket keys, not one pass per band.

    ``qn`` lets a caller that already materialized the quantized
    corpus (cosine_neardup_pairs' size probe) hand it over instead of
    paying a second quantization pass."""
    import math

    import numpy as np
    import pandas as pd

    from .transform import materialize

    if not dim:
        dim = _probe_dim(df, vec_col)
    if qn is None:
        qn = materialize(quantized(df, vec_col, id_col))
    if planes_per_band is None:
        # Auto width: occupancy n/2^planes < 1 keeps per-bucket pair
        # generation O(1) per row — linear total cost at any n.
        n_rows = qn.count()
        planes_per_band = max(8, min(24, int(math.ceil(math.log2(max(n_rows, 2)))) + 1))
    # All bands×planes sign bits in ONE Arrow BLAS pass: the SQL
    # higher-order-function dot (zip_with+aggregate) is interpreted
    # per element — at 128 planes × 64 dims that is ~8k lambda evals
    # and 128 array allocations per row; `block @ P` is one matmul.
    # Determinism is unchanged: quantized components are exact
    # integers, ±1 planes keep every partial sum integral (< 2^53),
    # so the float64 matmul is exact and the sign bits match the SQL
    # formula bit-for-bit.  Bucket keys pack the band's bits into an
    # int64 (internal to this operator — 8-byte shuffle keys instead
    # of 16-char strings).
    n_planes = bands * planes_per_band
    plane_mat = np.array(
        [[_plane_sign(p, d) for p in range(n_planes)] for d in range(dim)],
        dtype=np.float64,
    )
    bc_planes = df.sparkSession.sparkContext.broadcast(plane_mat)
    weights = 1 << np.arange(planes_per_band, dtype=np.int64)

    def _band_batches(batches):
        P = bc_planes.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            block = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
            )
            bits = (block @ P) > 0
            buckets = np.stack(
                [
                    bits[:, b * planes_per_band : (b + 1) * planes_per_band]
                    @ weights
                    for b in range(bands)
                ],
                axis=1,
            )
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, bands),
                    "band": np.tile(
                        np.arange(bands, dtype=np.int32), len(ids)
                    ),
                    "bucket": buckets.reshape(-1),
                }
            )

    banded = qn.select(id_col, "__v").mapInPandas(
        _band_batches, schema=f"{id_col} bigint, band int, bucket bigint"
    )
    # pairs within each (band, bucket) group: sorted member list →
    # JVM-side combination arrays → one explode; distinct across bands
    grouped = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS vec_id_1, y AS vec_id_2))))"
    )
    cand = (
        grouped.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.vec_id_1", "p.vec_id_2")
        .distinct()
    )
    left = qn.select(
        F.col(id_col).alias("vec_id_1"),
        F.col("__v").alias("__v1"),
        F.col("__nrm").alias("__n1"),
    )
    right = qn.select(
        F.col(id_col).alias("vec_id_2"),
        F.col("__v").alias("__v2"),
        F.col("__nrm").alias("__n2"),
    )
    return (
        cand.join(left, "vec_id_1")
        .join(right, "vec_id_2")
        .withColumn(
            "cosine_sim",
            F.expr(DOT_EXPR.format(a="__v1", b="__v2"))
            / F.sqrt(F.col("__n1") * F.col("__n2")),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("vec_id_1", "vec_id_2", "cosine_sim")
    )


def _ivf_auto_stride(n: int) -> int:
    """Scale-safe default for the IVF coarse-list sample: stride √n →
    √n inverted lists, so assignment work is O(n·√n) and the probed
    candidate set is O(n·nprobe/√n) — the balanced FAISS sizing.  A
    FIXED stride makes the list count grow linearly with the corpus
    and assignment quadratic (measured: stride 500 went 16.4→82.6 s
    for 150k→300k rows, ~n^2.3 — the same failure class as the pinned
    LSH band width, caught by the same sweep)."""
    import math

    return max(1, math.isqrt(max(n, 1)))


def _pq_auto_stride(n: int) -> int:
    """Scale-safe default for PQ codebooks: at most 256 codewords per
    subspace (the 8-bit PQ standard) — a fixed stride instead grows
    the codebook linearly with the corpus, making encode O(n²/stride)
    and the ADC table corpus-sized."""
    return max(1, -(-n // 256))


def _assign_nearest(
    qn: DataFrame, id_col: str, cent_rows, out_col: str
) -> DataFrame:
    """(out_col, cid) nearest-centroid assignment of the quantized
    corpus ``qn`` (columns id, __v, __nrm) against ``cent_rows``
    [(cid, [int vector])] — three physical strategies by centroid-set
    size, all bit-identical (quantized integers: every product/sum is
    an exact integer < 2^53, immune to reordering; ties go to the
    smaller cid):

    1. literal-embed (k·dim ≤ 2k): constant struct-array argmin — a
       pure NARROW MAP over the scan, no join/shuffle/Python workers;
       interpreted lambdas only win while the set is tiny.
    2. Arrow BLAS (k·dim ≤ 4M): mapInPandas matmul against the
       broadcast centroid matrix.
    3. argmin aggregate: crossJoin(broadcast) + min (d2, cid) struct —
       map-side combinable, never a window over N×C rows.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as _T

    cent_rows = sorted(cent_rows)
    n_cent = len(cent_rows)
    c_dim = len(cent_rows[0][1]) if cent_rows else 0
    if cent_rows and n_cent * c_dim <= 2_000:
        argmin = _literal_argmin_sql(cent_rows)
        return qn.select(
            F.col(id_col).alias(out_col),
            F.expr(f"({argmin}).cid").alias("cid"),
        )
    if cent_rows and n_cent * c_dim <= 4_000_000:
        c_ids = np.array([c for c, _ in cent_rows], dtype=np.int64)
        c_mat = np.array([v for _, v in cent_rows], dtype=np.float64)
        c_nrm = (c_mat * c_mat).sum(axis=1)
        bc = qn.sparkSession.sparkContext.broadcast((c_ids, c_mat, c_nrm))
        a_schema = _T.StructType(
            [
                _T.StructField(out_col, _T.LongType()),
                _T.StructField("cid", _T.LongType()),
            ]
        )

        def _assign(batches):
            ids, mat, nrm = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.stack(
                    [np.asarray(x, dtype=np.float64) for x in pdf["__v"]]
                )
                d2 = (v * v).sum(axis=1)[:, None] + nrm[None, :] - 2.0 * (
                    v @ mat.T
                )
                yield pd.DataFrame(
                    {
                        out_col: pdf[id_col].astype("int64"),
                        "cid": ids[d2.argmin(axis=1)],
                    }
                )

        return qn.select(id_col, "__v").mapInPandas(_assign, a_schema)
    cent = qn.sparkSession.createDataFrame(
        [
            (cid, [float(x) for x in cv], float(sum(x * x for x in cv)))
            for cid, cv in cent_rows
        ],
        "cid bigint, __cv array<double>, __cn double",
    )
    dist2 = (
        F.col("__nrm")
        + F.col("__cn")
        - 2 * F.expr(DOT_EXPR.format(a="__v", b="__cv"))
    )
    return (
        qn.crossJoin(F.broadcast(cent))
        .withColumn("__d2", dist2)
        .groupBy(id_col)
        .agg(F.min(F.struct("__d2", "cid")).alias("__m"))
        .select(F.col(id_col).alias(out_col), F.col("__m.cid").alias("cid"))
    )


def _lloyd_partials_blas(qn: DataFrame, cents, d: int):
    """One distributed corpus pass computing per-partition partial
    (cluster, count, element-wise sum vector, inertia) in exact int64
    via float64 BLAS (identical bits to the SQL argmin: integers below
    2^53, ties to the first/smaller cid).  Returns the driver-combined
    list [(cid, n, sums[d], inertia)] for clusters with members — k×d
    integers of driver state, same as the aggregate .collect() it
    replaces, but the per-row work runs in BLAS instead of the
    interpreted lambda (measured ~3x on k=100·d=64)."""
    import numpy as np
    import pandas as pd

    cids = np.array([c for c, _ in cents], dtype=np.int64)
    cmat = np.array([v for _, v in cents], dtype=np.float64)
    cnrm = (cmat * cmat).sum(axis=1)
    bc = qn.sparkSession.sparkContext.broadcast((cids, cmat, cnrm))

    def _part(batches):
        b_cids, b_cmat, b_cnrm = bc.value
        k = len(b_cids)
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, b_cmat.shape[1]), dtype=np.int64)
        inertia = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["__v"]])
            d2 = (v * v).sum(axis=1)[:, None] + b_cnrm[None, :] - 2.0 * (
                v @ b_cmat.T
            )
            pick = d2.argmin(axis=1)
            np.add.at(counts, pick, 1)
            np.add.at(sums, pick, v.astype(np.int64))
            np.add.at(inertia, pick, d2[np.arange(len(pick)), pick].astype(np.int64))
        nz = np.nonzero(counts)[0]
        yield pd.DataFrame(
            {
                "cid": b_cids[nz],
                "n": counts[nz],
                "s": list(sums[nz]),
                "inertia": inertia[nz],
            }
        )

    rows = qn.select("__v").mapInPandas(
        _part, "cid bigint, n bigint, s array<bigint>, inertia bigint"
    ).collect()
    agg: dict[int, list] = {}
    for r in rows:
        cur = agg.setdefault(int(r["cid"]), [0, [0] * d, 0])
        cur[0] += int(r["n"])
        cur[1] = [a + int(b) for a, b in zip(cur[1], r["s"])]
        cur[2] += int(r["inertia"])
    return sorted((cid, n, s, i) for cid, (n, s, i) in agg.items())


def _lloyd_update_passes(
    qn: DataFrame,
    id_col: str,
    cents: list[tuple[int, list[int]]],
    d: int,
    passes: int,
    converge: bool = True,
) -> tuple[list[tuple[int, list[int]]], int, bool]:
    """Run up to ``passes`` exact-integer Lloyd update passes over the
    materialized quantized corpus (columns ``__v``/``__nrm``): each
    pass is ONE map-side-combinable aggregate keyed by the
    literal-centroid argmin, and the loop stops early at the integer
    fixed point.  Shared by ``kmeans_lloyd`` and the refined-centroid
    IVF path.  Returns (centroids, passes_run, converged)."""
    passes_run, converged = 0, False
    for _ in range(max(passes, 0)):
        if len(cents) * d > 2_000:
            # BLAS pass (same crossover as pq_encode/IVF assignment)
            triples = [
                (cid, n, s) for cid, n, s, _ in _lloyd_partials_blas(qn, cents, d)
            ]
        else:
            sums = (
                qn.groupBy(
                    F.expr(f"({_literal_argmin_sql(cents)}).cid").alias("cluster")
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.sum(
                            F.expr(f"CAST(element_at(__v, {p + 1}) AS BIGINT)")
                        ).alias(f"s{p}")
                        for p in range(d)
                    ],
                )
                .collect()
            )
            triples = [
                (int(r["cluster"]), int(r["n"]), [int(r[f"s{p}"]) for p in range(d)])
                for r in sorted(sums, key=lambda r: int(r["cluster"]))
            ]
        new_cents = [
            (
                cid,
                [
                    (2 * (s_p + KMEANS_OFFSET * n) + n) // (2 * n) - KMEANS_OFFSET
                    for s_p in s
                ],
            )
            for cid, n, s in triples
        ]
        passes_run += 1
        if converge and new_cents == cents:
            converged = True
            break
        cents = new_cents
    return cents, passes_run, converged


def ivf_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    centroid_stride: int | None = None,
    nprobe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine_passes: int = 0,
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors are bucketed by
    nearest centroid; each query searches only its ``nprobe`` nearest
    centroid buckets.

    Centroids start as a deterministic sample (every
    ``centroid_stride``-th vector); with ``refine_passes > 0`` they
    are refined by that many exact-integer Lloyd update passes first
    (``_lloyd_update_passes``) — the production k-means→IVF path,
    still fully reproducible (and oracle-verifiable, since the update
    arithmetic is exact).  Distances use exact quantized integers;
    assignment ties break to the smaller centroid id.

    ``centroid_stride=None`` (the DEFAULT) auto-sizes the stride to
    √n — √n inverted lists at any corpus size, so assignment stays
    O(n·√n) and probing O(n·nprobe/√n).  A pinned stride grows the
    list count linearly with the corpus and assignment quadratically
    (``_ivf_auto_stride``); pass an integer only as an explicit
    recall/latency dial for a known corpus size.

    Scale: the candidate set per query is |corpus| * nprobe / n_centroids
    instead of |corpus| — the standard recall/latency dial.
    """
    from pyspark.sql.window import Window

    from .transform import materialize

    query_ids = list(query_ids)
    # quantize ONCE — four subtrees below read it (assign, probes,
    # query vectors, neighbor vectors); inlined it would re-scan and
    # re-quantize the corpus each time
    qn = materialize(quantized(df, vec_col, id_col))
    if centroid_stride is None:
        centroid_stride = _ivf_auto_stride(qn.count())
    if refine_passes > 0:
        init = (
            qn.filter((F.col(id_col) % centroid_stride) == 0)
            .select(id_col, "__v")
            .collect()
        )
        cents = sorted(
            (int(r[id_col]), [int(x) for x in r["__v"]]) for r in init
        )
        d0 = len(cents[0][1]) if cents else 0
        cents, _, _ = _lloyd_update_passes(qn, id_col, cents, d0, refine_passes)
        cent = df.sparkSession.createDataFrame(
            [
                (cid, [float(x) for x in cv], float(sum(x * x for x in cv)))
                for cid, cv in cents
            ],
            "cid bigint, __cv array<double>, __cn double",
        )
    else:
        cent = qn.filter((F.col(id_col) % centroid_stride) == 0).select(
            F.col(id_col).alias("cid"),
            F.col("__v").alias("__cv"),
            F.col("__nrm").alias("__cn"),
        )
    # squared distance = |v|^2 + |c|^2 - 2 v·c (all exact integers)
    dist2 = (
        F.col("__nrm")
        + F.col("__cn")
        - 2 * F.expr(DOT_EXPR.format(a="__v", b="__cv"))
    )
    # nearest-centroid assignment: three physical strategies by
    # centroid-set size, shared with ivfpq_topk (see _assign_nearest;
    # measured on 50k×64: k=100 literal 8 s vs Arrow BLAS 2.9 s —
    # same crossover as pq_encode)
    assign = _assign_nearest(
        qn,
        id_col,
        [
            (int(r["cid"]), [int(x) for x in r["__cv"]])
            for r in cent.collect()
        ],
        "neighbor_id",
    )
    # probe ranking touches |queries|×C rows only — filter the corpus
    # side BEFORE the centroid cross join, then a tiny window is fine
    w_assign = Window.partitionBy(id_col).orderBy(F.asc("__d2"), F.asc("cid"))
    probes = (
        qn.filter(F.col(id_col).isin(query_ids))
        .crossJoin(F.broadcast(cent))
        .withColumn("__d2", dist2)
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") <= nprobe)
        .select(F.col(id_col).alias("query_id"), "cid")
    )
    cand = probes.join(assign, "cid").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    qv = qn.select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__nrm").alias("__qn"),
    )
    cv = qn.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("__cv2"),
        F.col("__nrm").alias("__cn2"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "cosine_sim",
            F.expr(DOT_EXPR.format(a="__qv", b="__cv2"))
            / F.sqrt(F.col("__qn") * F.col("__cn2")),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            "cosine_sim",
        )
    )


def lsh_bucket_candidates(
    df: DataFrame,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    plane_offset: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: bucket by the sign pattern of ``num_planes``
    deterministic pseudo-random hyperplanes; pairs sharing a bucket are
    near-neighbor candidates.

    Hyperplane components are derived from md5 of (plane, dim) so the
    plan is fully deterministic and reproducible across runs/engines —
    but the md5 runs in PYTHON at plan-build time (``_plane_sign``):
    the signs depend only on (plane, dim), so each hyperplane becomes
    a ±1 literal array and the per-row work is one fused
    multiply-accumulate per plane, not 2·dim md5 calls.
    ``plane_offset`` shifts the plane ids so callers can build multiple
    independent bands (OR-construction) from one primitive.
    At scale this replaces the corpus×corpus cross join with a join on
    bucket keys.
    """
    if dim is None:
        dim = _probe_dim(df, vec_col)
    qn = quantized(df, vec_col, id_col)
    sign_terms = []
    for p in range(plane_offset, plane_offset + num_planes):
        comp = DOT_EXPR.format(a="__v", b=_plane_array_sql(p, dim))
        sign_terms.append(f"(CASE WHEN {comp} > 0 THEN '1' ELSE '0' END)")
    bucket = F.expr("concat(" + ", ".join(sign_terms) + ")")
    bucketed = qn.select(id_col, bucket.alias("bucket"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_id_1"),
            F.col(f"b.{id_col}").alias("vec_id_2"),
            F.col("a.bucket").alias("bucket"),
        )
    )


def centroid_sums(
    df: DataFrame,
    assign_col: str = "__cluster",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Element-wise sums + member counts per cluster — the k-means /
    IVF-training building block (centroid = sum/n, updated per Lloyd
    round).

    Long-form output (cluster, pos, sum_q, n_vectors): posexplode +
    one shuffle on (cluster, pos) — fully distributed and
    skew-resistant (a hot cluster spreads across its dim positions),
    where an array-typed elementwise aggregate would put each cluster
    on one reducer.  Sums are quantized integers → exact BIGINTs,
    engine-portable."""
    qn = quantized(df, vec_col, id_col).join(
        df.select(id_col, assign_col), id_col
    )
    return (
        qn.select(
            F.col(assign_col).alias("cluster"),
            F.posexplode(F.col("__v")).alias("pos0", "val"),
        )
        .groupBy("cluster", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.sum(F.col("val").cast("bigint")).alias("sum_q"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


def random_projection(
    df: DataFrame,
    out_dim: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    plane_offset: int = 1000,
    dim: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each
    quantized vector onto ``out_dim`` deterministic ±1 hyperplanes
    (Achlioptas 2003 — sign-random projections preserve pairwise
    distances within 1±ε at out_dim = O(log n / ε²)).

    Components are EXACT integers (±1 times milli-quantized ints, left
    unscaled — the conventional 1/√out_dim factor is a constant that
    cancels in any distance comparison), so the output is
    engine-portable.  Long-form output (vec_id, proj_pos, proj_value):
    a pure narrow map over the scan, no shuffle.  ``plane_offset``
    keeps the plane family disjoint from the LSH bucket planes."""
    if dim is None:
        dim = _probe_dim(df, vec_col)
    qn = quantized(df, vec_col, id_col)
    comps = ", ".join(
        DOT_EXPR.format(a="__v", b=_plane_array_sql(plane_offset + p, dim))
        for p in range(out_dim)
    )
    return qn.select(
        id_col,
        F.posexplode(F.expr(f"array({comps})")).alias("proj_pos", "__pv"),
    ).select(
        id_col,
        F.col("proj_pos").cast("int").alias("proj_pos"),
        F.col("__pv").cast("bigint").alias("proj_value"),
    )


#: fixed-point offset making every per-dimension centroid sum positive
#: before the integer round-half-up division (quantized components lie
#: in [-OFFSET, OFFSET]); shared with the SQL oracles.
KMEANS_OFFSET = 1_000_000


def kmeans_lloyd(
    df: DataFrame,
    stride: int = 50,
    assign_passes: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    converge: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Lloyd's k-means over the quantized corpus, fully deterministic
    and engine-exact — the iterative-algorithm pattern (like connected
    components) where the DRIVER holds only the k×d centroid state and
    every corpus pass is distributed.

    - init: every ``stride``-th vector (spread, reproducible);
    - each pass assigns via the literal-centroid argmin (a narrow map
      — no join, no shuffle, no Python); between passes centroids
      update as the round-half-up integer mean of members, computed in
      exact integer arithmetic (``(2·(s+OFF·n)+n) div (2·n) − OFF``)
      so re-quantized centroids match any engine running the same
      formula — no float summation order anywhere;
    - clusters that lose all members drop out (both engines
      identically).

    Driver state per round: k×d sums (control-plane scale, like the
    CC frontier).  Output per surviving cluster: member count, |c|²
    checksum, and exact integer inertia (Σ d²).

    ``assign_passes`` bounds the pass count; with ``converge`` (the
    default) the loop also stops EARLY at the exact fixed point —
    when an update leaves every centroid integer-identical (Lloyd's
    guarantees inertia is then stationary; exact arithmetic means no
    epsilon is needed).  ``stats``, if given, is filled with
    ``passes_run``/``converged`` for observability.  The quantized
    corpus is checkpointed through ``materialize`` — reliable
    (checkpoint-dir-backed) whenever the session configures it, the
    multi-executor posture a many-pass loop needs.
    """
    from .transform import materialize

    qn = materialize(quantized(df, vec_col, id_col))
    init = (
        qn.filter((F.col(id_col) % stride) == 0)
        .select(id_col, "__v")
        .collect()
    )
    cents = sorted(
        (int(r[id_col]), [int(x) for x in r["__v"]]) for r in init
    )
    spark = df.sparkSession
    d = len(cents[0][1]) if cents else 0
    # per-cluster element-wise sums as d parallel SUM aggregates keyed
    # by the argmin expression: the argmin is the groupBy key
    # (evaluated ONCE per row), partials combine map-side, and nothing
    # explodes — a posexplode here would collapse into the projection
    # and re-evaluate the argmin per array element
    cents, passes_run, converged = _lloyd_update_passes(
        qn, id_col, cents, d, max(assign_passes - 1, 0), converge
    )
    if stats is not None:
        stats["passes_run"] = passes_run
        stats["converged"] = converged
    if len(cents) * d > 2_000:
        # final stats via the same BLAS corpus pass (bit-identical)
        partials = _lloyd_partials_blas(qn, cents, d)
        return spark.createDataFrame(
            [
                (cid, n, sum(x * x for x in dict(cents)[cid]), inertia)
                for cid, n, _, inertia in partials
            ],
            "cluster_id bigint, n_members bigint, centroid_norm bigint, inertia bigint",
        )
    final = qn.select(
        F.expr(_literal_argmin_sql(cents)).alias("__m")
    ).select(
        F.col("__m.cid").alias("cluster_id"),
        F.col("__m.d2").cast("bigint").alias("d2"),
    )
    norms = spark.createDataFrame(
        [(cid, sum(x * x for x in cv)) for cid, cv in cents],
        "cluster_id bigint, centroid_norm bigint",
    )
    return (
        final.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("d2").alias("inertia"),
        )
        .join(F.broadcast(norms), "cluster_id")
        .select("cluster_id", "n_members", "centroid_norm", "inertia")
    )


def semantic_cluster_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    centroid_stride: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_literal_cells: int = 2_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the corpus, then mark as duplicates only
    vectors with a higher-similarity lower-id neighbor WITHIN their
    cluster — the published way to cut the embedding-dedup pair search
    from O(N²) to Σ|cluster|² at web scale.

    Returns (vec_id, cid, is_kept): ``is_kept`` is false iff some
    lower-id vector in the same cluster has cosine ≥ ``threshold``
    (the kept one is the cluster-local minimum id of each duplicate
    group — deterministic, engine-replayable).

    Plan shape: centroids = every ``centroid_stride``-th vector
    (driver holds k×d integers only); assignment is the same strategy
    tier as IVF (literal-argmin narrow map below
    ``max_literal_cells``, Arrow-BLAS block distances above); the
    within-cluster pair search is ONE self-join shuffled on cid whose
    cost is bounded by the largest cluster, never the corpus.  All
    similarity math is exact quantized integers (identical across
    engines and both assignment tiers).

    ``centroid_stride=None`` (the DEFAULT) auto-sizes the stride to
    √n — the balance point of the two cost terms (assignment is
    n·k·d = n²d/stride flops, within-cluster verify is ~n·stride
    pair dots; equal at stride = √n, both O(n^1.5·d)).  A pinned
    stride makes the centroid count grow linearly with the corpus
    and assignment quadratic — the same failure class the round-8
    sweep measured on ivfpq_topk.  Larger auto clusters also mean
    the within-cluster search sees MORE candidate pairs than a
    pinned-50 stride once n > 2500, so recall only improves.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as _T

    from .transform import materialize

    qn = materialize(quantized(df, vec_col, id_col))
    if centroid_stride is None:
        centroid_stride = _ivf_auto_stride(qn.count())
    cent = qn.filter((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("cid"),
        F.col("__v").alias("__cv"),
        F.col("__nrm").alias("__cn"),
    )
    cent_rows = sorted(cent.collect(), key=lambda r: r["cid"])
    if not cent_rows:
        # No id is a multiple of centroid_stride (ids not anchored at
        # 0): anchor on the smallest id instead so there is always one
        # centroid and np.stack below never sees an empty list.  A
        # genuinely empty input yields one empty collect and falls
        # through to an empty result via the normal path.
        cent_rows = (
            qn.orderBy(F.col(id_col).asc())
            .limit(1)
            .select(
                F.col(id_col).alias("cid"),
                F.col("__v").alias("__cv"),
                F.col("__nrm").alias("__cn"),
            )
            .collect()
        )
        if not cent_rows:
            return qn.select(
                id_col,
                F.col(id_col).cast("bigint").alias("cid"),
                F.lit(True).alias("is_kept"),
            ).limit(0)
    n_cent = len(cent_rows)
    c_dim = len(cent_rows[0]["__cv"]) if cent_rows else 0
    if cent_rows and n_cent * c_dim <= max_literal_cells:
        argmin = _literal_argmin_sql(
            [(int(r["cid"]), [int(x) for x in r["__cv"]]) for r in cent_rows]
        )
        assign = qn.select(
            id_col, "__v", "__nrm", F.expr(f"({argmin}).cid").alias("cid")
        )
    else:
        c_ids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
        c_mat = np.stack(
            [np.asarray(r["__cv"], dtype=np.float64) for r in cent_rows]
        )
        c_nrm = np.array([float(r["__cn"]) for r in cent_rows])
        bc = df.sparkSession.sparkContext.broadcast((c_ids, c_mat, c_nrm))

        def _assign(batches):
            ids, mat, nrm = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.stack(
                    [np.asarray(x, dtype=np.float64) for x in pdf["__v"]]
                )
                d2 = (v * v).sum(axis=1)[:, None] + nrm[None, :] - 2.0 * (
                    v @ mat.T
                )
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].astype("int64"),
                        "cid": ids[d2.argmin(axis=1)],
                    }
                )

        a_schema = _T.StructType(
            [
                _T.StructField(id_col, _T.LongType()),
                _T.StructField("cid", _T.LongType()),
            ]
        )
        assign = qn.join(
            qn.select(id_col, "__v").mapInPandas(_assign, a_schema), id_col
        )
    # Within-cluster pair search as ONE per-cluster BLAS similarity
    # matrix (the literal SemDeDup formulation): a SQL self-join on
    # cid evaluates |c|²/2 interpreted higher-order dot products —
    # measured 45 s at 50k×100 clusters — while `mat @ mat.T` per
    # cluster is milliseconds.  Exactness is unchanged: integer
    # entries make the matmul exact, and sim = dot / sqrt(n_i·n_j)
    # uses the identical IEEE op sequence as the SQL/oracle formula.
    # Cluster size is the operator's scale knob (SemDeDup dials k so
    # clusters stay small); each group must fit one executor's memory.
    def _cluster_dropped(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"__dropped": np.array([], dtype=np.int64)})
        order = np.argsort(pdf[id_col].to_numpy(np.int64), kind="stable")
        ids = pdf[id_col].to_numpy(np.int64)[order]
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
        )[order]
        nrm = pdf["__nrm"].to_numpy(np.float64)[order]
        sims = (mat @ mat.T) / np.sqrt(np.outer(nrm, nrm))
        hit = np.triu(sims >= threshold, k=1)  # i < j by ascending id
        dropped = ids[np.unique(np.nonzero(hit)[1])]
        return pd.DataFrame({"__dropped": dropped})

    dropped = (
        assign.select(id_col, "cid", "__v", "__nrm")
        .groupBy("cid")
        .applyInPandas(_cluster_dropped, "__dropped bigint")
    )
    return (
        assign.join(
            dropped, F.col(id_col) == F.col("__dropped"), "left"
        )
        .select(
            id_col,
            F.col("cid").cast("bigint").alias("cid"),
            F.col("__dropped").isNull().alias("is_kept"),
        )
    )


def pq_codebook(qn: DataFrame, id_col: str, centroid_stride: int):
    """Stride-sampled codebook rows (cid, quantized vector) — k × d
    integers of driver state, shared by encode and serve so the
    quantization pass runs once per caller."""
    return sorted(
        (int(r[0]), [int(x) for x in r[1]])
        for r in qn.filter((F.col(id_col) % centroid_stride) == 0)
        .select(id_col, "__v")
        .collect()
    )


def pq_encode(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    centroid_stride: int | None = None,
    cent_rows=None,
) -> DataFrame:
    """Product-quantization encoding — the memory side of production
    ANN (IVF-PQ): split each vector into ``m`` subspaces and store,
    per subspace, only the id of the nearest codebook centroid.  A
    d-dim float vector becomes m small codes (here the sampled
    centroid's id, so the oracle can replay the exact codebook).

    Codebooks are deterministic stride samples of the corpus's own
    subvectors (the same bootstrap ``ivf_topk`` uses; swap in
    Lloyd-refined codebooks per subspace via ``kmeans_lloyd`` for the
    production build).  Assignment is the literal-centroid argmin as
    ONE narrow map per row across all m subspaces — no join, no
    shuffle, no Python: the codebook (k × d integers) is embedded as
    constant struct-arrays, exactly like IVF assignment.

    Returns (id, codes array<bigint>[m], pq_err double): ``pq_err``
    is the total squared quantization error (exact integer arithmetic
    in doubles), the quality dial for choosing m/k.

    Scale posture: the collect is k × d integers of driver state
    (codebook build), the encode pass is shuffle-free, and the output
    is m bigints per vector — the 100 TB memory win that makes
    billion-vector ANN fit a cluster's RAM.
    """
    dim = _probe_dim(df, vec_col)
    if dim == 0 or dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    sub = dim // m
    qn = quantized(df, vec_col, id_col)
    if cent_rows is None:
        if centroid_stride is None:
            # scale-safe default: ≤256 codewords per subspace
            centroid_stride = _pq_auto_stride(qn.count())
        cent_rows = pq_codebook(qn, id_col, centroid_stride)
    if not cent_rows:
        raise ValueError("empty codebook: no rows matched the stride")
    # Beyond a small codebook the interpreted literal-argmin lambda
    # loses to the Arrow BLAS path (measured: k=100·d=64 → 2.9 s vs
    # 8 s; k=500 → 5.8 s vs 24.5 s at 50k vectors).  Both paths are
    # bit-identical (exact integers in fp64; ties to the first =
    # smaller cid), so the switch is purely physical — tiny codebooks
    # keep the zero-Python-worker plan.
    if len(cent_rows) * dim > 2_000:
        return _pq_encode_blas(qn, id_col, m, sub, cent_rows)
    staged = qn.select(
        id_col,
        *[
            F.expr(f"slice(__v, {j * sub + 1}, {sub})").alias(f"__v{j}")
            for j in range(m)
        ],
    ).select(
        id_col,
        *[F.col(f"__v{j}") for j in range(m)],
        *[
            F.expr(DOT_EXPR.format(a=f"__v{j}", b=f"__v{j}")).alias(f"__n{j}")
            for j in range(m)
        ],
    )
    picks = []
    for j in range(m):
        cents_j = [(cid, v[j * sub : (j + 1) * sub]) for cid, v in cent_rows]
        expr = (
            _literal_argmin_sql(cents_j)
            .replace("__nrm", f"__n{j}")
            .replace("__v", f"__v{j}")
        )
        picks.append(F.expr(expr).alias(f"__p{j}"))
    coded = staged.select(id_col, *picks)
    return coded.select(
        id_col,
        F.array(*[F.col(f"__p{j}.cid") for j in range(m)]).alias("codes"),
        sum(F.col(f"__p{j}.d2") for j in range(m)).alias("pq_err"),
    )


def pq_adc_topk(
    df: DataFrame,
    query_ids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    m: int = 4,
    centroid_stride: int | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes — the serving path of
    IVF-PQ: queries stay exact, the corpus is m codes per vector, and
    the approximate distance is a table lookup, never a d-dim dot
    against raw vectors.

    ``centroid_stride=None`` (the DEFAULT) caps codebooks at 256
    codewords per subspace (``_pq_auto_stride`` — the 8-bit PQ
    standard); a pinned stride grows the codebook linearly with the
    corpus and encode quadratically.

    Formulated as joins, so it is fully distributed with a tiny
    broadcast: the distance table (query × subspace × centroid, all
    exact integers) is |Q|·m·k rows; codes posexplode to (vec, j,
    cid); one broadcast join + a map-side-combinable sum per
    (query, vec) + a per-query window gives the top-k.  Corpus-side
    state is only the m codes per vector — the entire point of PQ at
    100 TB.

    Ties break on (distance, vec_id); ranks are dense 1..k.
    """
    from pyspark.sql.window import Window

    from .transform import materialize

    query_ids = list(query_ids)
    sub_dim = _probe_dim(df, vec_col) // m
    qn = quantized(df, vec_col, id_col)
    if centroid_stride is None:
        centroid_stride = _pq_auto_stride(qn.count())
    cent_rows = pq_codebook(qn, id_col, centroid_stride)
    # Materialized: the posexplode below would otherwise inline the
    # m literal-argmin expressions into the generator and re-evaluate
    # the whole codebook scan per exploded row (measured ~12x).
    codes = materialize(
        pq_encode(df, vec_col, id_col, m, centroid_stride, cent_rows=cent_rows)
    )
    q_rows = sorted(
        (int(r[0]), [int(x) for x in r[1]])
        for r in qn.filter(F.col(id_col).isin(query_ids))
        .select(id_col, "__v")
        .collect()
    )
    dtab = df.sparkSession.createDataFrame(
        [
            (
                qid,
                j,
                cid,
                float(
                    sum(
                        (qv[j * sub_dim + i] - cv[j * sub_dim + i]) ** 2
                        for i in range(sub_dim)
                    )
                ),
            )
            for qid, qv in q_rows
            for cid, cv in cent_rows
            for j in range(m)
        ],
        "query_id bigint, j int, cid bigint, d2 double",
    )
    exploded = codes.select(
        id_col, F.posexplode("codes").alias("j", "cid")
    )
    scored = (
        exploded.join(F.broadcast(dtab), ["j", "cid"])
        .groupBy("query_id", id_col)
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "adc_d2", "rank")
    )


def _pq_encode_blas(
    qn: DataFrame, id_col: str, m: int, sub: int, cent_rows
) -> DataFrame:
    """Arrow-batched PQ assignment for large codebooks: per-subspace
    squared distances in exact int64 (quantized values are small
    integers, so sums stay far inside 2^63 — identical bits to the
    SQL path), argmin over the cid-sorted codebook (ties to the first
    = smaller cid, matching the struct-ordering tie-break)."""
    import numpy as np
    import pandas as pd

    spark = qn.sparkSession
    cids = np.array([c for c, _ in cent_rows], dtype=np.int64)
    cmat = np.array([v for _, v in cent_rows], dtype=np.int64)  # k × d
    bc = spark.sparkContext.broadcast((cids, cmat))

    def _blocks(batches):
        b_cids, b_cmat = bc.value
        cmatf = b_cmat.astype(np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            # float64 carries these integers exactly (|x| ≤ ~2000, so
            # products/sums stay far below 2^53) and x @ yᵀ dispatches
            # to real BLAS — int64 matmul would be a slow numpy loop
            block = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
            )  # n × d
            codes = np.empty((len(ids), m), dtype=np.int64)
            err = np.zeros(len(ids), dtype=np.float64)
            for j in range(m):
                bj = block[:, j * sub : (j + 1) * sub]  # n × sub
                cj = cmatf[:, j * sub : (j + 1) * sub]  # k × sub
                d2 = (
                    (bj * bj).sum(axis=1)[:, None]
                    + (cj * cj).sum(axis=1)[None, :]
                    - 2.0 * (bj @ cj.T)
                )  # n × k, exact integers in fp64
                pick = d2.argmin(axis=1)  # first min = smaller cid
                codes[:, j] = b_cids[pick]
                err += d2[np.arange(len(ids)), pick]
            yield pd.DataFrame(
                {id_col: ids, "codes": list(codes), "pq_err": err}
            )

    schema = f"{id_col} bigint, codes array<bigint>, pq_err double"
    return qn.select(id_col, "__v").mapInPandas(_blocks, schema=schema)


def ivfpq_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    centroid_stride: int | None = None,
    nprobe: int = 3,
    m: int = 4,
    pq_stride: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ serving — the production ANN architecture (Jégou et al.
    2011 "Product Quantization for Nearest Neighbor Search"; the
    FAISS IVFPQ index): a coarse quantizer routes each query to its
    ``nprobe`` nearest inverted lists, and ranking within the probed
    lists uses ASYMMETRIC DISTANCE COMPUTATION over the corpus's PQ
    codes — so the search touches |corpus|·nprobe/n_lists candidates
    and reads only m small code ids per candidate, never the full
    vectors.  Composes the repo's IVF routing (ivf_topk) with its PQ
    machinery (pq_codebook/pq_encode/ADC).

    Scale-safe defaults (round-8 sweep): ``centroid_stride=None``
    auto-sizes to √n inverted lists and ``pq_stride=None`` caps
    codebooks at 256 codewords per subspace.  The previous pinned
    strides made both the coarse-list count and the PQ codebooks grow
    linearly with the corpus — coarse assignment measured ~n^2.3
    (16.4→82.6 s for 150k→300k rows) before the fix; assignment also
    now routes through the tiered ``_assign_nearest`` (literal /
    Arrow-BLAS / agg) instead of the always-interpreted cross join.

    Plan shape: coarse assignment is a narrow map or one
    broadcast-centroid aggregation (never a window over the corpus);
    probing is a |queries|×C window; the ADC distance table is
    |queries|·m·k_pq rows built driver-side and BROADCAST (like a
    broadcast-join build side); candidate scoring is one join from
    the probed lists to the exploded codes plus one groupBy — at
    scale the memory-resident state per executor is codes (m bytes a
    vector) + the broadcast tables, which is the reason IVF-PQ is the
    100 TB serving layout.

    Determinism: same exact-integer contract as the parts it
    composes; ties break on (adc_d2, neighbor_id).
    """
    from pyspark.sql.window import Window

    from .transform import materialize

    # normalize once: a one-shot iterator consumed by the probes
    # filter below would silently leave the q_rows collect empty
    query_ids = list(query_ids)
    sub_dim = _probe_dim(df, vec_col) // m
    qn = materialize(quantized(df, vec_col, id_col))
    if centroid_stride is None or pq_stride is None:
        n_corpus = qn.count()
        if centroid_stride is None:
            centroid_stride = _ivf_auto_stride(n_corpus)
        if pq_stride is None:
            pq_stride = _pq_auto_stride(n_corpus)
    cent = qn.filter((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("cid"),
        F.col("__v").alias("__cv"),
        F.col("__nrm").alias("__cn"),
    )
    dist2 = (
        F.col("__nrm")
        + F.col("__cn")
        - 2 * F.expr(DOT_EXPR.format(a="__v", b="__cv"))
    )
    assign = _assign_nearest(
        qn,
        id_col,
        [
            (int(r["cid"]), [int(x) for x in r["__cv"]])
            for r in cent.collect()
        ],
        "neighbor_id",
    )
    w_probe = Window.partitionBy(id_col).orderBy(F.asc("__d2"), F.asc("cid"))
    probes = (
        qn.filter(F.col(id_col).isin(query_ids))
        .crossJoin(F.broadcast(cent))
        .withColumn("__d2", dist2)
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select(F.col(id_col).alias("query_id"), "cid")
    )
    # PQ side: codebook + codes (materialized once), ADC table per query
    cent_rows = pq_codebook(qn, id_col, pq_stride)
    codes = materialize(
        pq_encode(df, vec_col, id_col, m, pq_stride, cent_rows=cent_rows)
    )
    q_rows = sorted(
        (int(r[0]), [int(x) for x in r[1]])
        for r in qn.filter(F.col(id_col).isin(query_ids))
        .select(id_col, "__v")
        .collect()
    )
    dtab = df.sparkSession.createDataFrame(
        [
            (
                qid,
                j,
                pq_cid,
                float(
                    sum(
                        (qv[j * sub_dim + i] - cv[j * sub_dim + i]) ** 2
                        for i in range(sub_dim)
                    )
                ),
            )
            for qid, qv in q_rows
            for pq_cid, cv in cent_rows
            for j in range(m)
        ],
        "query_id bigint, j int, pq_cid bigint, d2 double",
    )
    cand = probes.join(assign, "cid").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    exploded = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("j", "pq_cid"),
    )
    scored = (
        cand.join(exploded, "neighbor_id")
        .join(F.broadcast(dtab), ["query_id", "j", "pq_cid"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w_rank = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_d2", "rank")
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (the FAISS "SQ" family member): per-dimension
# min/max calibration, each component stored as one 0..255 code —
# 4x compression over float32 with NO codebook training, the
# middle rung between raw vectors and PQ on the serving-memory ladder.
#
# Everything is exact integer arithmetic on the milli-unit grid
# (round(x*1000), BIGINT): code = floor((v-mn)*255 / (mx-mn)),
# reconstruction = mn + floor(code*(mx-mn) / 255), distances are
# integer sums of squares — numerators are non-negative by
# construction, so Spark's truncating `div` and DuckDB's flooring `//`
# agree and the whole path (codes, reconstructions, distances, ranks)
# replays bit-exactly in the SQL oracle.
#
# Scale shape: calibration is ONE map-side-combined (dim, min, max)
# shuffle of d groups; encoding is a narrow map under a 1-row
# broadcast; serving broadcasts the query block and streams the coded
# corpus — per-candidate state is d bytes, never a float vector.
# ---------------------------------------------------------------------------
def sq8_stats(qn: DataFrame) -> DataFrame:
    """Per-dimension calibration over a quantized frame (column
    ``__v``): ONE row (mn array<bigint>, mx array<bigint>).  The only
    shuffle is the d-group min/max aggregate (map-side combined)."""
    ex = qn.select(F.posexplode("__v").alias("i", "x"))
    per = ex.groupBy("i").agg(
        F.min("x").cast("bigint").alias("mn"),
        F.max("x").cast("bigint").alias("mx"),
    )
    return per.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(i, mn))), s -> s.mn)"
        ).alias("mn"),
        F.expr(
            "transform(array_sort(collect_list(struct(i, mx))), s -> s.mx)"
        ).alias("mx"),
    )


_SQ8_CODE_EXPR = (
    "transform(sequence(0, size(__v) - 1),"
    " i -> ((CAST(__v[i] AS BIGINT) - mn[i]) * 255)"
    " div greatest(mx[i] - mn[i], 1))"
)
_SQ8_RECON_EXPR = (
    "transform(codes, (c, i) -> mn[i] + (c * (mx[i] - mn[i])) div 255)"
)


def sq8_encode(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, codes array<bigint> of 0..255) under the broadcast 1-row
    calibration — the stored serving state, d bytes per vector."""
    qn = quantized(df, vec_col, id_col)
    return qn.crossJoin(F.broadcast(sq8_stats(qn))).select(
        id_col, F.expr(_SQ8_CODE_EXPR).alias("codes")
    )


def sq8_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric SQ8 top-k: queries stay exact milli-unit integers,
    corpus candidates are reconstructed from their 8-bit codes row-
    locally (decode is two integer ops per dimension — no table, no
    codebook).  Broadcast query block × streamed coded corpus; the
    only shuffle is the per-query candidate window."""
    query_ids = list(query_ids)
    qn = quantized(df, vec_col, id_col)
    stats = sq8_stats(qn)
    corpus = (
        qn.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.expr(_SQ8_CODE_EXPR).alias("codes"),
            "mn",
            "mx",
        )
        .select(
            "neighbor_id", F.expr(_SQ8_RECON_EXPR).alias("__recon")
        )
    )
    queries = qn.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.expr("transform(__v, x -> CAST(x AS BIGINT))").alias("__qv"),
    )
    scored = corpus.join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    ).withColumn(
        "sq8_d2",
        F.expr(
            "aggregate(zip_with(__qv, __recon, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ),
    )
    w = Window.partitionBy("query_id").orderBy("sq8_d2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sq8_d2", "rank")
    )


# ---------------------------------------------------------------------------
# Binary quantization (sign bits) + Hamming shortlist + exact rerank —
# the 1-bit rung of the quantization ladder (below SQ8 and PQ):
# 32x compression, candidate generation by popcount over packed words
# (whole-stage-codegen bit ops, no floats), then exact cosine rerank
# of the tiny shortlist.  Sign bits are packed into 32-bit halves
# carried in BIGINTs (the Bloom-filter chunk pattern) so no engine
# needs wrapping 2^63 arithmetic; hamming = bit_count(xor) summed
# over the two halves replays bit-exactly in SQL.
# ---------------------------------------------------------------------------
def _bq_word_expr(lo: int, hi: int) -> str:
    """Packed sign word for dimensions [lo, hi): bit (d-lo) set iff
    quantized component d is positive."""
    return (
        f"aggregate(sequence({lo}, {hi - 1}),"
        " CAST(0 AS BIGINT),"
        f" (acc, i) -> acc + CASE WHEN __v[i] > 0 THEN"
        f" CAST(shiftleft(CAST(1 AS BIGINT), i - {lo}) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
    )


def bq_encode(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, sig_lo, sig_hi): 64 sign bits in two 32-bit halves — the
    stored serving state, 8 bytes per vector.  A pure narrow map."""
    dim = _probe_dim(df, vec_col)
    if dim > 64:
        raise ValueError("bq_encode packs at most 64 dimensions")
    half = min(32, dim)
    qn = quantized(df, vec_col, id_col)
    return qn.select(
        id_col,
        F.expr(_bq_word_expr(0, half)).alias("sig_lo"),
        (
            F.expr(_bq_word_expr(half, dim)) if dim > half else F.lit(0).cast("bigint")
        ).alias("sig_hi"),
    )


def bq_hamming_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    shortlist: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage serving: Hamming shortlist over packed sign words
    (broadcast queries × streamed 8-byte codes, popcount only), then
    exact integer-cosine rerank of the ≤ shortlist rows per query.
    The corpus never shuffles; float work is confined to the
    shortlist.  Output: (query_id, neighbor_id, hamming, cosine_sim,
    rank), ranks by (cosine DESC, neighbor_id)."""
    query_ids = list(query_ids)
    qn = quantized(df, vec_col, id_col)
    sigs = bq_encode(df, vec_col, id_col)
    q_sigs = sigs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("sig_lo").alias("__qlo"),
        F.col("sig_hi").alias("__qhi"),
    )
    ham = (
        sigs.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(q_sigs), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "hamming",
            F.expr(
                "CAST(bit_count(sig_lo ^ __qlo)"
                " + bit_count(sig_hi ^ __qhi) AS BIGINT)"
            ),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    short = (
        ham.withColumn("__sr", F.row_number().over(w_short))
        .filter(F.col("__sr") <= shortlist)
        .select("query_id", "neighbor_id", "hamming")
    )
    corpus = qn.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("__cv"),
        F.col("__nrm").alias("__cn"),
    )
    queries = qn.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__nrm").alias("__qn"),
    )
    scored = (
        F.broadcast(short)
        .join(corpus, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn(
            "cosine_sim",
            F.expr(DOT_EXPR.format(a="__qv", b="__cv"))
            / F.sqrt(F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "hamming", "cosine_sim", "rank")
    )


def knn_classify(
    df: DataFrame,
    labels: DataFrame,
    query_ids,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """kNN-vote classifier served from the binary-quantized index —
    the embedding-classifier upgrade of the hashed-linear quality
    filter (DCLM/fastText-style filtering moved to exactly this
    shape: a labeled seed set + nearest-neighbor vote).

    ``labels`` is the seed table (id, label); only labeled vectors
    are candidate neighbors.  Per query: Hamming top-k over the
    packed 64-bit sign codes (8 bytes/vector streamed against
    broadcast query codes — the corpus never shuffles), then a
    majority vote.  Everything is integer (popcounts, counts), so
    predictions replay bit-for-bit in an oracle.  Vote ties are
    deterministic: (votes DESC, best_hamming ASC, label ASC).

    At 100 TB the seed set is the small side (10³-10⁶ labeled rows):
    seeds' codes+labels broadcast; each unlabeled document computes
    its k nearest seeds map-side — one narrow pass over the corpus,
    zero corpus shuffles, the same plan ann-route serving uses.
    Output: (query_id, pred_label, votes, best_hamming).

    Wide-batch shape (measured on the sim_knn_classify_wide bench
    twin: 2 000 queries × 45k seeds = 90M pairs): a single per-query
    ROW_NUMBER window would SORT the full pair stream — even with
    Spark's map-side WindowGroupLimit trim the sort dominated (7.7 s
    of a 10 s run; OOM-prone at bench heap).  Instead the top-k runs
    in two passes with IDENTICAL output: (1) aggregate pairs into a
    (query, hamming) HISTOGRAM — hash-agg into ≤ 129 cells per query,
    map-side combined, no sort — and derive each query's CUT distance
    (the k-th-nearest Hamming value) from the tiny cumulative
    histogram; (2) regenerate the pairs (popcounts are ~0.6 s for all
    90M — far cheaper than sorting them) and keep only
    ``hamming <= cut``, leaving ≤ k+ties rows per query for the exact
    ROW_NUMBER tie-break.  Degenerate corpora where many seeds tie AT
    the cut re-inflate pass 2 toward the old cost — never beyond it.

    Contract boundary (measured, scaling sweep r10): the brute-force
    pair stream is |seeds|×|queries| popcounts per pass and goes
    superlinear past ~10⁵ seeds × 10³ queries (540M pairs ≈ 40 s at
    300k×2000).  Brute force is the recall-1.0 baseline; beyond that
    regime shard the query batch or serve through ``knn_classify_auto``
    (this module), which size-probes the pair volume and flips to the
    banded-Hamming candidate route past the boundary.
    """
    query_ids = list(query_ids)
    sigs = bq_encode(df, vec_col, id_col)
    seed_sigs = sigs.join(labels.select(id_col, label_col), id_col)
    q_sigs = sigs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("sig_lo").alias("__qlo"),
        F.col("sig_hi").alias("__qhi"),
    )
    ham = (
        seed_sigs.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(q_sigs), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "hamming",
            F.expr(
                "CAST(bit_count(sig_lo ^ __qlo)"
                " + bit_count(sig_hi ^ __qhi) AS BIGINT)"
            ),
        )
    )
    return _knn_topk_vote(ham, k, label_col)


def _knn_topk_vote(ham, k: int, label_col: str) -> DataFrame:
    """Shared tail of the kNN-vote classifiers: two-pass histogram-cut
    top-k over a (query_id, neighbor_id, hamming, label) pair stream,
    then the deterministic majority vote.  See ``knn_classify`` for
    why the histogram cut replaces a full per-query sort."""
    # pass 1: per-query cut distance from the Hamming histogram
    w_cum = (
        Window.partitionBy("query_id")
        .orderBy("hamming")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cuts = (
        ham.groupBy("query_id", "hamming")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        .withColumn("__cum", F.sum("__c").over(w_cum))
        .groupBy("query_id")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("__cum") >= k, F.col("hamming"))),
                F.max("hamming"),  # fewer than k seeds: keep all
            ).alias("__cut")
        )
    )
    # pass 2: only the <= cut survivors reach the exact tie-break
    w_k = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    topk = (
        ham.join(F.broadcast(cuts), "query_id")
        .filter(F.col("hamming") <= F.col("__cut"))
        .withColumn("__r", F.row_number().over(w_k))
        .filter(F.col("__r") <= k)
    )
    votes = topk.groupBy("query_id", label_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("votes"),
        F.min("hamming").alias("best_hamming"),
    )
    w_v = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("best_hamming"), F.asc(label_col)
    )
    return (
        votes.withColumn("__vr", F.row_number().over(w_v))
        .filter(F.col("__vr") == 1)
        .select(
            "query_id",
            F.col(label_col).alias("pred_label"),
            "votes",
            "best_hamming",
        )
    )


def knn_classify_auto(
    df: DataFrame,
    labels: DataFrame,
    query_ids,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    max_pair_cells: int = 100_000_000,
    bands: int | None = None,
) -> DataFrame:
    """``knn_classify`` with the measured contract boundary built in:
    one cheap size probe (seed count × query count), and past
    ``max_pair_cells`` (default 10⁸ = the r10-measured ~10⁵ seeds ×
    10³ queries knee) the serve flips — loudly, via ``warnings`` —
    from the recall-1.0 brute-force pair stream to banded-Hamming
    candidate generation:

    - the 64 packed sign bits split into ``bands`` equal bands;
      ``bands=None`` (default) auto-sizes by the seed count — 8 ×
      8-bit bands up to 2²⁰ seeds (≤ ~4 000 seeds per bucket value),
      4 × 16-bit bands beyond (the cosine_neardup lesson: a fixed
      band width is a linear-blowup dial waiting for a big corpus;
      wider bands trade the pigeonhole radius 7 → 3 for 256× smaller
      buckets).  Seeds explode into (band, value) keys once
      (bands rows × ~10 B per seed — a narrow map, never a corpus
      shuffle), queries likewise on the broadcast side;
    - a band-key broadcast join yields candidates = seeds sharing at
      least one band with the query; expected candidates per query ≈
      bands · |seeds| / 2^(64/bands) — at 10⁶ seeds ≈ 31× fewer
      pairs than brute force;
    - PIGEONHOLE GUARANTEE: any seed within Hamming ≤ bands-1 of the
      query is ALWAYS a candidate (64 bits into 8 bands: a distance
      ≤ 7 cannot disagree in every band).  Whenever a query has ≥ k
      seeds within that radius its top-k — and therefore its vote —
      is EXACTLY the brute-force answer; only queries whose k-th
      neighbor is farther can diverge (their candidate recall
      follows the banded S-curve, like MinHash-LSH);
    - the exact two-pass histogram-cut top-k + deterministic vote
      then run on the candidate stream, unchanged.

    Same output contract as ``knn_classify``:
    (query_id, pred_label, votes, best_hamming).
    """
    query_ids = list(query_ids)
    n_queries = len(query_ids)
    n_seeds = labels.count()  # size probe: one cheap count job
    if n_seeds * n_queries <= max_pair_cells:
        return knn_classify(
            df, labels, query_ids, k=k, vec_col=vec_col,
            id_col=id_col, label_col=label_col,
        )
    import warnings

    if bands is None:
        bands = 8 if n_seeds <= 1 << 20 else 4
    if bands not in (4, 8):
        raise ValueError(
            "knn_classify_auto: bands must be 4 (16-bit) or 8 (8-bit)"
            " — the 64-bit code splits on byte boundaries"
        )
    warnings.warn(
        f"knn_classify_auto: {n_seeds} seeds x {n_queries} queries ="
        f" {n_seeds * n_queries} pairs exceeds max_pair_cells="
        f"{max_pair_cells}; switching from brute force to the"
        f" banded-Hamming candidate route ({bands} bands — exact for"
        f" queries with >= k seeds within Hamming {bands - 1};"
        f" S-curve recall beyond). Raise max_pair_cells to force"
        f" brute force.",
        stacklevel=2,
    )
    sigs = bq_encode(df, vec_col, id_col)
    seed_sigs = sigs.join(labels.select(id_col, label_col), id_col)
    q_sigs = sigs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("sig_lo").alias("__qlo"),
        F.col("sig_hi").alias("__qhi"),
    )
    width = 64 // bands
    mask = (1 << width) - 1
    half_bands = 32 // width  # bands served from sig_lo

    def _band_val(lo: str, hi: str) -> str:
        return (
            f"CASE WHEN __b < {half_bands}"
            f" THEN shiftright({lo}, __b * {width}) & {mask}"
            f" ELSE shiftright({hi}, (__b - {half_bands}) * {width})"
            f" & {mask} END"
        )

    band_ix = f"explode(sequence(0, {bands - 1})) AS __b"
    seed_bands = seed_sigs.withColumnRenamed(id_col, "neighbor_id").selectExpr(
        "neighbor_id", "sig_lo", "sig_hi", label_col, band_ix
    ).selectExpr(
        "neighbor_id", "sig_lo", "sig_hi", label_col, "__b",
        _band_val("sig_lo", "sig_hi") + " AS __bv",
    )
    q_bands = q_sigs.selectExpr(
        "query_id", "__qlo", "__qhi", band_ix
    ).selectExpr(
        "query_id", "__qlo", "__qhi", "__b",
        _band_val("__qlo", "__qhi") + " AS __bv",
    )
    # A pair may collide in several bands; emit it exactly once — at
    # its FIRST matching band — via a row-local filter instead of a
    # candidate-wide DISTINCT (measured: the distinct's 7M-row wide
    # shuffle dominated the route; this check is a few JVM byte ops
    # per joined row and leaves the plan with ZERO wide shuffles).
    first_band = (
        f"__b = 0 OR size(filter(sequence(0, __b - 1), bb -> "
        f"CASE WHEN bb < {half_bands}"
        f" THEN (shiftright(sig_lo ^ __qlo, bb * {width}) & {mask}) = 0"
        f" ELSE (shiftright(sig_hi ^ __qhi, (bb - {half_bands})"
        f" * {width}) & {mask}) = 0 END)) = 0"
    )
    cand = (
        seed_bands.join(F.broadcast(q_bands), ["__b", "__bv"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter(F.expr(first_band))
        .select(
            "query_id", "neighbor_id", "sig_lo", "sig_hi",
            "__qlo", "__qhi", label_col,
        )
    )
    ham = cand.withColumn(
        "hamming",
        F.expr(
            "CAST(bit_count(sig_lo ^ __qlo)"
            " + bit_count(sig_hi ^ __qhi) AS BIGINT)"
        ),
    )
    return _knn_topk_vote(ham, k, label_col)
