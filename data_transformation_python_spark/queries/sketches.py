"""Sketch-based operators: SimHash hamming near-dup pairs (nibble
banding, pigeonhole-complete for hamming ≤ 3) and an
approximate-distinct quality gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import simhash_sql
from ..operators.transform import materialize
from . import load, query


def _simhash_pairs_sql(source_sql: str, dialect: str, max_hamming: int = 3) -> str:
    """Banded SimHash pair detection over the generated simhash query.

    16-bit fingerprints split into 4 nibbles: any pair within hamming
    ``max_hamming`` = 3 must agree on ≥1 nibble (pigeonhole), so the
    band join finds every such pair without a quadratic pass.
    """
    div = "div" if dialect == "spark" else "//"
    xor = "(a.simhash ^ b.simhash)" if dialect == "spark" else "xor(a.simhash, b.simhash)"
    inner = simhash_sql(source_sql, bits=16, dialect=dialect).strip().rstrip(";")
    bands = "\n  UNION ALL ".join(
        f"SELECT doc_id, simhash, {k} AS band,"
        f" (simhash {div} {16 ** k}) % 16 AS nib FROM sh"
        for k in range(4)
    )
    return f"""
WITH sh AS ({inner}),
bands AS (
  {bands}
)
SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       CAST(bit_count({xor}) AS INT) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
WHERE bit_count({xor}) <= {max_hamming}
"""


@query(
    "dedup_simhash_pairs",
    oracle=_simhash_pairs_sql("SELECT doc_id, text FROM documents", "duckdb"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The banding SQL references the simhash subquery in 4 band
    # branches × 2 join sides; Spark inlines CTEs, so the expensive
    # signature computation (16 md5-nibble bit-sums + a groupBy) would
    # run up to 8×.  Materialize the signatures ONCE and band over the
    # cached frame — DuckDB's oracle materializes its CTE natively, so
    # the shared SQL text stays the single source of semantics.
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_shp_v")
    sig = materialize(
        spark.sql(
            simhash_sql(
                "SELECT doc_id, text FROM documents_shp_v", bits=16, dialect="spark"
            )
        )
    )
    sig.createOrReplaceTempView("simhash_sig_v")
    full = _simhash_pairs_sql("SELECT doc_id, text FROM documents_shp_v", "spark")
    banded_part = full.split("WITH sh AS (", 1)[1].split("),\nbands AS (", 1)[1]
    return spark.sql("WITH sh AS (SELECT * FROM simhash_sig_v),\nbands AS (" + banded_part)


# --------------------------------------------------------------------------
# approximate-distinct sketch gate: both engines use different HLL
# implementations, so the oracle compares the *quality contract*
# (within 5% of exact) rather than the raw sketch value.
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# approximate-percentile sketch gate: like the HLL gate, the sketches
# differ across engines (Spark uses QuantileSummaries/KLL-ish, DuckDB
# t-digest), so the portable contract is the error bound vs the exact
# rank-selected quantile, emitted as a BIGINT 0/1 gate.
# --------------------------------------------------------------------------
_APPROX_PCT_ORACLE = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders),
exact AS (
  SELECT o_orderpriority,
         CAST(MAX(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                       THEN o_totalprice END) AS DOUBLE) AS exact_p50,
         CAST(MAX(n) AS BIGINT) AS n_orders
  FROM ranked GROUP BY o_orderpriority),
approx AS (
  SELECT o_orderpriority,
         CAST(approx_quantile(o_totalprice, 0.5) AS DOUBLE) AS approx_p50
  FROM orders GROUP BY o_orderpriority)
SELECT e.o_orderpriority, e.exact_p50, e.n_orders,
       CAST(CASE WHEN ABS(a.approx_p50 - e.exact_p50)
                      <= 0.10 * GREATEST(e.exact_p50, 1.0)
                 THEN 1 ELSE 0 END AS BIGINT) AS approx_within_10pct
FROM exact e JOIN approx a ON e.o_orderpriority = a.o_orderpriority
"""


@query("q_approx_percentile", oracle=_APPROX_PCT_ORACLE)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50 (rank selection — engine-portable, hash-compared
    directly) plus each engine's own percentile sketch verified only
    through its ≤10% relative-error gate.  TPC-H-ish totalprice is
    near-uniform per priority, so both sketches land well inside the
    bound at every sf."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    exact = ranked.groupBy("o_orderpriority").agg(
        F.max(
            F.when(
                F.col("rn")
                == (F.floor(0.5 * (F.col("n") - 1)).cast("bigint") + 1),
                F.col("o_totalprice"),
            )
        )
        .cast("double")
        .alias("exact_p50"),
        F.max("n").cast("bigint").alias("n_orders"),
    )
    approx = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5).cast("double").alias("approx_p50")
    )
    return exact.join(approx, "o_orderpriority").select(
        "o_orderpriority",
        "exact_p50",
        "n_orders",
        F.when(
            F.abs(F.col("approx_p50") - F.col("exact_p50"))
            <= 0.10 * F.greatest(F.col("exact_p50"), F.lit(1.0)),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("approx_within_10pct"),
    )


_APPROX_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
       CAST(CASE WHEN ABS(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey))
                      <= 0.05 * COUNT(DISTINCT o_custkey)
                 THEN 1 ELSE 0 END AS BIGINT) AS approx_within_5pct
FROM orders
GROUP BY o_orderpriority
"""


@query("q_approx_distinct", oracle=_APPROX_ORACLE)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketches differ across engines; what is portable is the
    accuracy contract.  Exact count is hash-compared directly, the
    sketch only through its ≤5% error bound, emitted as a BIGINT 0/1
    gate (portable across client hash normalizations).  One exact
    countDistinct is computed and reused; rsd=0.02 (~2% standard
    error, measured worst-case <2% on both engines across
    sf0.001-0.1) keeps the 5% bound with margin at ~1/25 the sketch
    memory of rsd=0.01."""
    orders = load(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct"),
        F.approx_count_distinct("o_custkey", 0.02).alias("__approx"),
    )
    return agg.select(
        "o_orderpriority",
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        F.when(
            F.abs(F.col("__approx") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("approx_within_5pct"),
    )


# --------------------------------------------------------------------------
# EXACT global percentiles by iterative histogram refinement — the
# distributed-selection scale path (operators/selection.py); the
# approx_percentile query above is the sketched counterpart
# --------------------------------------------------------------------------
_GLOBAL_PCT_ORACLE = """
WITH s AS (
  SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rn
  FROM events WHERE value IS NOT NULL),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM s),
t AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS quantile)
SELECT t.quantile,
       CAST((SELECT value FROM s, n
             WHERE rn = GREATEST(1, CAST(ceil(t.quantile * n.c) AS BIGINT)))
         AS DOUBLE) AS value
FROM t
"""


@query("q_global_percentile_exact", oracle=_GLOBAL_PCT_ORACLE)
def q_global_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of event values with no global sort:
    iterative histogram refinement narrows the candidate range by
    ~bins× per round (min/max + bin counts are one map-side
    aggregate; the driver holds only the bin histogram), then a
    bounded sort resolves the final rank.  Dials are set small here
    (bins=16, exact_threshold=100) so the gate actually exercises
    several refinement rounds; at 100 TB you'd run bins=4096 and a
    ~1M exact threshold — 3 rounds.  The oracle computes the same
    SQL-standard percentile_disc rank by direct row numbering."""
    from ..operators.selection import global_percentile_disc

    ev = load(spark, sf_dir, "events")
    return global_percentile_disc(
        ev, "value", [0.5, 0.9, 0.99], bins=16, exact_threshold=100
    )


# --------------------------------------------------------------------------
# Count-Min sketch: mergeable approximate token counts (Cormode &
# Muthukrishnan 2005).  The gate builds the d×w sketch over the
# documents token stream, then point-estimates the exact top-5 tokens
# — est must be >= truth (upper-bound property) and both engines
# replay the identical md5 bucket arithmetic.
# --------------------------------------------------------------------------
_CMS_ORACLE = """
WITH toks AS (
  SELECT t AS token FROM documents, unnest(string_split(text, ' ')) AS u(t)
  WHERE t != ''),
cells AS (
  SELECT r, CAST(('0x' || substr(md5(r || ':' || token), 1, 6)) AS BIGINT) % 1024 AS bucket
  FROM toks, unnest(generate_series(0, 3)) AS g(r)),
sketch AS (
  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM cells GROUP BY 1, 2),
exact AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count FROM toks
  GROUP BY 1 ORDER BY exact_count DESC, token LIMIT 5),
probes AS (
  SELECT token, exact_count, g.r,
         CAST(('0x' || substr(md5(g.r || ':' || token), 1, 6)) AS BIGINT) % 1024 AS bucket
  FROM exact, unnest(generate_series(0, 3)) AS g(r))
SELECT p.token, ANY_VALUE(p.exact_count) AS exact_count,
       CAST(MIN(s.cnt) AS BIGINT) AS cms_estimate
FROM probes p JOIN sketch s ON s.r = p.r AND s.bucket = p.bucket
GROUP BY p.token
"""


@query("sketch_countmin_tokens", oracle=_CMS_ORACLE)
def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS build + point estimates for the exact top-5 tokens: the
    sketch is one map-side-combined shuffle of 4×1024 cells (constant
    size at any corpus scale; merging sketches IS the partial
    aggregation), the probe join broadcasts 20 cells."""
    from pyspark.sql.window import Window

    from ..operators import sketch as sk

    docs = load(spark, sf_dir, "documents")
    cms = sk.countmin_build(docs, depth=4, width=1024)
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    w = Window.orderBy(F.desc("exact_count"), F.asc("token"))
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .drop("__rn")
    )
    return top.join(
        sk.countmin_estimate(cms, top.select("token"), depth=4, width=1024),
        "token",
    ).select("token", "exact_count", "cms_estimate")


_BLOOM_ORACLE = """
WITH bench AS (
  SELECT DISTINCT t AS token
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
  WHERE doc_id % 10 = 0 AND t != ''),
cells AS (
  SELECT b.chunk, BIT_OR(b.mask) AS bits FROM (
    SELECT CAST(('0x' || substr(md5('b' || g.i || ':' || token), 1, 12)) AS BIGINT) % 32768 // 32 AS chunk,
           (CAST(1 AS BIGINT) << CAST(CAST(('0x' || substr(md5('b' || g.i || ':' || token), 1, 12)) AS BIGINT) % 32768 % 32 AS INT)) AS mask
    FROM bench, unnest(generate_series(0, 3)) AS g(i)) b
  GROUP BY b.chunk),
probes AS (
  SELECT DISTINCT t AS token
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
  WHERE doc_id % 10 = 1 AND t != ''
  ORDER BY token LIMIT 200),
probe_cells AS (
  SELECT token,
         CAST(('0x' || substr(md5('b' || g.i || ':' || token), 1, 12)) AS BIGINT) % 32768 // 32 AS chunk,
         (CAST(1 AS BIGINT) << CAST(CAST(('0x' || substr(md5('b' || g.i || ':' || token), 1, 12)) AS BIGINT) % 32768 % 32 AS INT)) AS mask
  FROM probes, unnest(generate_series(0, 3)) AS g(i))
SELECT p.token,
       BOOL_AND((COALESCE(c.bits, 0) & p.mask) != 0) AS maybe_present,
       BOOL_AND(p.token IN (SELECT token FROM bench)) AS exactly_present
FROM probe_cells p LEFT JOIN cells c ON c.chunk = p.chunk
GROUP BY p.token
"""


_HLL_ORACLE = """
WITH vals AS (
  SELECT o_orderpriority, CAST(o_custkey AS VARCHAR) AS token FROM orders),
cells AS (
  SELECT o_orderpriority,
         CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) % 1024 AS bucket,
         CAST(39 - (CASE WHEN CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) // 1024 = 0 THEN 0
              ELSE length(bin(CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) // 1024)) END) AS INT) AS rho
  FROM vals),
regs AS (SELECT o_orderpriority, bucket, MAX(rho) AS rho FROM cells GROUP BY 1, 2),
agg AS (
  SELECT o_orderpriority, CAST(1024 - COUNT(*) AS BIGINT) AS v_zero,
         SUM(CAST(1 AS BIGINT) << CAST(39 - rho AS INT)) AS present_fp
  FROM regs GROUP BY 1),
est AS (
  SELECT o_orderpriority, v_zero,
         CAST(v_zero * 549755813888 + present_fp AS BIGINT) AS harmonic_fp,
         (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 * CAST(549755813888 AS DOUBLE)
           / CAST(v_zero * 549755813888 + present_fp AS DOUBLE) AS raw
  FROM agg),
hll AS (
  SELECT o_orderpriority, v_zero, harmonic_fp,
         CAST(floor(CASE WHEN raw <= 2560.0 AND v_zero > 0
              THEN 1024.0 * ln(1024.0 / CAST(v_zero AS DOUBLE)) ELSE raw END) AS BIGINT) AS hll_estimate
  FROM est),
exact AS (
  SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM orders GROUP BY 1)
SELECT e.o_orderpriority, e.exact_distinct, h.v_zero, h.harmonic_fp, h.hll_estimate,
       CAST(CASE WHEN ABS(h.hll_estimate - e.exact_distinct)
                      <= 0.10 * e.exact_distinct THEN 1 ELSE 0 END AS BIGINT) AS within_10pct
FROM exact e JOIN hll h ON e.o_orderpriority = h.o_orderpriority
"""


@query("sketch_hll_distinct", oracle=_HLL_ORACLE)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog (operators/sketch.py hll_build /
    hll_estimate): unlike the q_approx_distinct gate (which can only
    check each engine's OWN opaque HLL through an error bound), this
    sketch's registers AND estimate hash-compare bit-exactly — md5
    routing, exact bin()-length ranks, fixed-point BIGINT harmonic
    sum, one deterministic IEEE division.  The build is one
    map-side-combined MAX shuffle of ≤ 1024 registers per group at
    any corpus scale; the 10% gate is ~3σ of the m=1024 standard
    error (measured ≤ 6% across sf0.001-0.1)."""
    from ..operators import sketch as sk

    orders = load(spark, sf_dir, "orders")
    vals = orders.select(
        "o_orderpriority", F.col("o_custkey").cast("string").alias("token")
    )
    regs = sk.hll_build(vals, "token", ("o_orderpriority",), p=10)
    est = sk.hll_estimate(regs, ("o_orderpriority",), p=10)
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct")
    )
    return exact.join(est, "o_orderpriority").select(
        "o_orderpriority",
        "exact_distinct",
        "v_zero",
        "harmonic_fp",
        "hll_estimate",
        F.when(
            F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
            <= 0.10 * F.col("exact_distinct"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("within_10pct"),
    )


@query("sketch_bloom_decontam", oracle=_BLOOM_ORACLE)
def sketch_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-filter — the cheap first stage of
    benchmark decontamination at corpus scale: build the filter over
    the benchmark split's distinct tokens (ONE bit_or-combined
    shuffle of ≤ m/32 BIGINT chunks — mergeable and constant-sized at
    any corpus), probe 200 corpus tokens, and emit the filter verdict
    NEXT TO exact membership, driver-hashing both the
    no-false-negative guarantee and the deterministic false-positive
    pattern.  Only maybe_present rows would proceed to the exact
    n-gram containment join (operators/dedup.py contamination_hits)."""
    from ..operators import sketch as sk

    docs = load(spark, sf_dir, "documents")

    def toks(pred: str) -> DataFrame:
        return (
            docs.filter(pred)
            .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
            .filter(F.col("token") != "")
            .distinct()
        )

    bench = toks("doc_id % 10 = 0")
    bloom = sk.bloom_build_tokens(bench, m_bits=32768, k=4)
    probes = toks("doc_id % 10 = 1").orderBy("token").limit(200)
    return (
        sk.bloom_probe(bloom, probes, m_bits=32768, k=4)
        .join(
            probes.withColumn("__in", F.lit(True)).join(
                bench.withColumn("exactly_present", F.lit(True)), "token", "left"
            ).select(
                "token", F.coalesce("exactly_present", F.lit(False)).alias("exactly_present")
            ),
            "token",
        )
        .select("token", "maybe_present", "exactly_present")
    )


# --------------------------------------------------------------------------
# KMV / bottom-k sketch: set-overlap estimation WITHOUT a join (the
# cross-corpus contamination-overlap question at 100 TB: "how much of
# corpus B's vocabulary is already in corpus A" from two
# control-plane-sized sketches).  Registers, k-th hash, and both
# estimates replay bit-exactly; accuracy is additionally gated vs the
# exact overlap computed next to it.
# --------------------------------------------------------------------------
_KMV_ORACLE = """
WITH ta AS (SELECT DISTINCT CAST(('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,12)) AS BIGINT) AS h
            FROM orders WHERE o_orderpriority = '1-URGENT'),
tb AS (SELECT DISTINCT CAST(('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,12)) AS BIGINT) AS h
            FROM orders WHERE o_orderpriority = '2-HIGH'),
kka AS (SELECT h FROM ta ORDER BY h LIMIT 256),
kkb AS (SELECT h FROM tb ORDER BY h LIMIT 256),
merged AS (SELECT DISTINCT h FROM (SELECT h FROM kka UNION ALL SELECT h FROM kkb) ORDER BY h LIMIT 256),
agg AS (SELECT CAST(MAX(h) AS BIGINT) AS kth_hash, CAST(COUNT(*) AS BIGINT) AS m FROM merged),
sh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_shared FROM merged
       WHERE h IN (SELECT h FROM kka) AND h IN (SELECT h FROM kkb)),
est AS (
  SELECT kth_hash, n_shared,
    CAST(CASE WHEN m < 256 THEN m ELSE floor(CAST(255 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / CAST(kth_hash AS DOUBLE)) END AS BIGINT) AS union_est,
    CAST(CASE WHEN m < 256 THEN n_shared ELSE
      floor(CAST(n_shared AS DOUBLE) / CAST(m AS DOUBLE) *
        CAST(CAST(CASE WHEN m < 256 THEN m ELSE floor(CAST(255 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / CAST(kth_hash AS DOUBLE)) END AS BIGINT) AS DOUBLE))
      END AS BIGINT) AS intersect_est
  FROM agg, sh),
exact AS (
  SELECT CAST((SELECT COUNT(*) FROM (SELECT h FROM ta UNION SELECT h FROM tb)) AS BIGINT) AS exact_union,
         CAST((SELECT COUNT(*) FROM ta WHERE h IN (SELECT h FROM tb)) AS BIGINT) AS exact_intersect)
SELECT e.kth_hash, e.n_shared, e.union_est, e.intersect_est,
       x.exact_union, x.exact_intersect,
       CAST(CASE WHEN ABS(e.union_est - x.exact_union) <= 0.15 * x.exact_union
            THEN 1 ELSE 0 END AS BIGINT) AS union_within_15pct,
       CAST(CASE WHEN ABS(e.intersect_est - x.exact_intersect)
                 <= 0.20 * GREATEST(x.exact_intersect, 1) THEN 1 ELSE 0 END AS BIGINT) AS intersect_within_20pct
FROM est e, exact x
"""


@query("sketch_kmv_overlap", oracle=_KMV_ORACLE)
def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) set-overlap sketch (operators/sketch.py
    kmv_build / kmv_overlap_estimate) over the distinct customer sets
    of two order-priority classes: each build is one map-side-combined
    distinct shuffle + TakeOrderedAndProject (per-partition bottom-k,
    no global sort); the merge-then-estimate runs over ≤ 2k rows.
    Exercises BOTH branches across sf: exact (union < k at sf0.001)
    and estimator (k-th-hash scaling at sf0.01+, measured union error
    ≤ 8%, intersection ≤ 11% vs the 15%/20% gates)."""
    from ..operators import sketch as sk

    orders = load(spark, sf_dir, "orders")

    def vals(pri: str) -> DataFrame:
        return orders.filter(f"o_orderpriority = '{pri}'").select(
            F.col("o_custkey").cast("string").alias("token")
        )

    ka = sk.kmv_build(vals("1-URGENT"), k=256)
    kb = sk.kmv_build(vals("2-HIGH"), k=256)
    est = sk.kmv_overlap_estimate(ka, kb, k=256)
    a = vals("1-URGENT").distinct()
    b = vals("2-HIGH").distinct()
    exact = a.union(b).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_union")
    ).join(
        a.join(b, "token").agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_intersect")
        ),
        F.lit(True),
        "inner",
    )
    return est.join(exact, F.lit(True), "inner").select(
        "kth_hash",
        "n_shared",
        "union_est",
        "intersect_est",
        "exact_union",
        "exact_intersect",
        F.when(
            F.abs(F.col("union_est") - F.col("exact_union"))
            <= 0.15 * F.col("exact_union"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("union_within_15pct"),
        F.when(
            F.abs(F.col("intersect_est") - F.col("exact_intersect"))
            <= 0.20 * F.greatest(F.col("exact_intersect"), F.lit(1)),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("intersect_within_20pct"),
    )


# --------------------------------------------------------------------------
# Misra-Gries mergeable heavy hitters: WHICH tokens are frequent, with
# a deterministic two-sided bound and no hashing — the shard-summary
# shape at 100 TB: each shard/time window emits ≤ k rows, summaries
# merge control-plane-side (error intervals add), no re-scan.  The
# summary itself (not just its guarantee) replays bit-exactly: the
# canonical compression is θ = (k+1)-th largest count, all integer.
# --------------------------------------------------------------------------
_MG_ORACLE = """
WITH toks AS (
  SELECT doc_id, t AS item
  FROM (SELECT doc_id, string_split(text, ' ') AS a FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
       unnest(list_transform(range(1, len(a)),
              i -> a[i] || ' ' || a[i + 1])) AS u(t)),
ca AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS w FROM toks
       WHERE doc_id % 2 = 0 GROUP BY item),
cb AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS w FROM toks
       WHERE doc_id % 2 = 1 GROUP BY item),
topa AS (SELECT * FROM ca ORDER BY w DESC, item LIMIT 33),
tha AS (SELECT CAST(CASE WHEN COUNT(*) = 33 THEN MIN(w) ELSE 0 END AS BIGINT) AS th
        FROM topa),
sa AS (SELECT item, CAST(w - th AS BIGINT) AS w, th AS theta
       FROM topa, tha WHERE w > th),
topb AS (SELECT * FROM cb ORDER BY w DESC, item LIMIT 33),
thb AS (SELECT CAST(CASE WHEN COUNT(*) = 33 THEN MIN(w) ELSE 0 END AS BIGINT) AS th
        FROM topb),
sb AS (SELECT item, CAST(w - th AS BIGINT) AS w, th AS theta
       FROM topb, thb WHERE w > th),
comb AS (
  SELECT COALESCE(a.item, b.item) AS item,
         CAST(COALESCE(a.w, 0) + COALESCE(b.w, 0) AS BIGINT) AS w
  FROM sa a FULL OUTER JOIN sb b ON a.item = b.item),
topm AS (SELECT * FROM comb ORDER BY w DESC, item LIMIT 33),
thm AS (SELECT CAST(CASE WHEN COUNT(*) = 33 THEN MIN(w) ELSE 0 END AS BIGINT) AS th
        FROM topm),
sm AS (SELECT t.item, CAST(t.w - m.th AS BIGINT) AS w,
              CAST(m.th
                   + (SELECT COALESCE(MAX(theta), 0) FROM sa)
                   + (SELECT COALESCE(MAX(theta), 0) FROM sb) AS BIGINT) AS theta
       FROM topm t, thm m WHERE t.w > m.th),
top20 AS (SELECT * FROM sm ORDER BY w DESC, item LIMIT 20),
exact AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS exact_cnt
          FROM toks GROUP BY item)
SELECT s.item, s.w, s.theta, e.exact_cnt,
       CAST(CASE WHEN e.exact_cnt >= s.w THEN 1 ELSE 0 END AS BIGINT) AS lower_ok,
       CAST(CASE WHEN e.exact_cnt <= s.w + s.theta THEN 1 ELSE 0 END AS BIGINT) AS upper_ok
FROM top20 s JOIN exact e ON e.item = s.item
"""


@query("sketch_mg_heavyhitters", oracle=_MG_ORACLE)
def sketch_mg_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Misra-Gries heavy hitters (operators/sketch.py
    mg_build / mg_merge) over the corpus BIGRAM stream (916 distinct
    at sf0.01 ≫ k=32, so the lossy θ-compression branch is the one
    exercised — unigrams would fit exactly), built as two
    half-corpus shard summaries (doc_id parity) merged
    control-plane-side: each build is one map-side-combined count
    shuffle + TakeOrderedAndProject (per-partition top-(k+1), no
    global sort); the merge runs on ≤ 2k rows.  The top-20 merged
    heavy hitters are emitted NEXT TO their exact counts with the
    two-sided w ≤ exact ≤ w + θ guarantee driver-hashed (lower_ok /
    upper_ok must be all-1 — a theorem, not a tolerance)."""
    from ..operators import sketch as sk

    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__t) - 2),"
                    " i -> concat_ws(' ', __t[i], __t[i + 1]))"
                )
            ).alias("item"),
        )
    )
    sa = sk.mg_build(toks.filter("doc_id % 2 = 0").select("item"), "item", k=32)
    sb = sk.mg_build(toks.filter("doc_id % 2 = 1").select("item"), "item", k=32)
    merged = sk.mg_merge(sa, sb, k=32)
    top20 = merged.orderBy(F.col("w").desc(), F.col("item")).limit(20)
    exact = toks.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    return (
        F.broadcast(top20)
        .join(exact, "item")
        .select(
            "item",
            "w",
            "theta",
            "exact_cnt",
            F.when(F.col("exact_cnt") >= F.col("w"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("lower_ok"),
            F.when(F.col("exact_cnt") <= F.col("w") + F.col("theta"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("upper_ok"),
        )
    )


# --------------------------------------------------------------------------
# HDR-histogram quantile sketch: mergeable log-bucket percentiles over
# lineitem price cents (bounded relative error 1/64, zero floats)
# --------------------------------------------------------------------------
_HDR_VALUE = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

from ..operators.sketch import hdr_oracle_sql as _hdr_oracle_sql  # noqa: E402


@query(
    "sketch_hdr_quantiles",
    oracle=_hdr_oracle_sql(_HDR_VALUE, (50, 90, 99)),
)
def sketch_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of lineitem extended price (cents) from a 63×64-cell
    log₂ histogram: the build is one map-side-combined groupBy whose
    output size is constant in corpus size; serving is sketch-sized
    window work.  Identical cell-wise-sum semantics make the same
    aggregate the merge operator for per-split or per-micro-batch
    partials."""
    from ..operators import sketch as sk

    li = load(spark, sf_dir, "lineitem")
    hist = sk.hdr_build(li, _HDR_VALUE)
    return sk.hdr_quantiles(hist, (50, 90, 99))


# --------------------------------------------------------------------------
# Bloom-pruned (runtime-filter) join: identical result to the plain
# join — the Bloom prefilter has no false negatives — with the big
# side cut before the shuffle
# --------------------------------------------------------------------------
_BLOOM_JOIN_ORACLE = """
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN (SELECT o_orderkey, o_orderstatus FROM orders
      WHERE o_orderkey % 97 = 0) o
  ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
"""


@query("sketch_bloom_join", oracle=_BLOOM_JOIN_ORACLE)
def sketch_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join: the ~1%-selective orders side builds a
    Bloom filter whose chunk words ship driver-side (control-plane);
    lineitem is prefiltered by a pure codegen expression (k md5
    probes + bitwise AND against an array literal) before the exact
    equi-join, so non-matching rows never enter the exchange.  No
    false negatives ⇒ bit-identical to the plain join the oracle
    runs."""
    from ..operators import sketch as sk

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("__price"),
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter("o_orderkey % 97 = 0")
        .select("o_orderkey", "o_orderstatus")
    )
    joined = sk.bloom_prune_join(li, orders, "o_orderkey")
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("__price").cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------------
# grouped HDR quantiles: per-key percentile bounds from one histogram
# build (constant cells per group), mergeable cell-wise like the
# global sketch
# --------------------------------------------------------------------------
_HDR_GROUPED_ORACLE = """
WITH v AS (
  SELECT event_type,
         GREATEST(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS BIGINT), 1) AS c
  FROM events),
b AS (
  SELECT event_type,
         (length(bin(c)) - 1) * 64
           + ((c * 64) // (CAST(1 AS BIGINT) << (length(bin(c)) - 1)) - 64)
           AS bucket_id
  FROM v),
hist AS (
  SELECT event_type, bucket_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bucket_id, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket_id
                        ROWS UNBOUNDED PRECEDING) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_total
  FROM hist),
pcts(quantile_pct) AS (VALUES (50), (90), (99)),
hit AS (
  SELECT event_type, quantile_pct,
         CAST(MIN(bucket_id) AS BIGINT) AS bucket_id,
         CAST(MAX(n_total) AS BIGINT) AS n_total
  FROM cum CROSS JOIN pcts
  WHERE cum >= (quantile_pct * n_total + 99) // 100
  GROUP BY event_type, quantile_pct)
SELECT event_type, quantile_pct, n_total, bucket_id,
       CAST(((CAST(1 AS BIGINT) << (bucket_id // 64))
             * (64 + bucket_id % 64)) // 64 AS BIGINT) AS est_lo,
       CAST(((CAST(1 AS BIGINT) << (bucket_id // 64))
             * (64 + bucket_id % 64 + 1) - 1) // 64 AS BIGINT) AS est_hi
FROM hit
"""


@query("sketch_hdr_grouped", oracle=_HDR_GROUPED_ORACLE)
def sketch_hdr_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p90/p99 bounds from ONE grouped histogram
    build: the groupBy emits ≤ 63·64 cells per key (map-side
    combined), serving windows partition by the key — per-group
    sketch work never scales with the corpus, and the same cell-wise
    sum merges per-split partials exactly like the global sketch."""
    from ..operators import sketch as sk

    ev = load(spark, sf_dir, "events")
    hist = sk.hdr_build(
        ev,
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)",
        group_cols=("event_type",),
    )
    return sk.hdr_quantiles(hist, (50, 90, 99), group_cols=("event_type",))
