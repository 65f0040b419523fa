"""Advanced operator surface: as-of joins, batch sessionization
(gaps-and-islands), exact quantiles, CUBE/GROUPING, lag/lead, the
salted-join skew pattern, LSH-bucketed ANN, and the full
candidates→verify→survivors dedup pipeline.

Several queries share one SQL text across engines (executed via
``spark.sql`` on temp views and via DuckDB verbatim) — where the
dialects genuinely coincide, a single source of truth beats two
implementations.  Casts pin exact types (SUM over ints is BIGINT in
Spark but HUGEINT in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators.dedup import HEX
from . import load, query

D2 = "decimal(18,2)"


def _sql_on_view(spark: SparkSession, sf_dir: str, table: str, sql_tpl: str, view: str) -> DataFrame:
    load(spark, sf_dir, table).createOrReplaceTempView(view)
    return spark.sql(sql_tpl.format(t=view))


# --------------------------------------------------------------------------
# as-of join: for each purchase, the most recent prior click (same user)
# --------------------------------------------------------------------------
_ASOF_SQL = """
WITH w AS (
  SELECT event_id, user_id, event_type, ts,
         MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
  FROM {t})
SELECT event_id, user_id, ts, last_click_ts
FROM w WHERE event_type = 'purchase'
"""


@query("q_asof_join", oracle=_ASOF_SQL.format(t="events"))
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (most-recent-prior) join expressed as a running-max
    window — one shuffle on user_id, no range-join blowup.  SURVEY
    §2.3 notes the reference has no as-of join; this is the Spark
    scale path for one."""
    return _sql_on_view(spark, sf_dir, "events", _ASOF_SQL, "events_asof_v")


# --------------------------------------------------------------------------
# batch sessionization (gaps-and-islands) — batch twin of streaming/sessionize
# --------------------------------------------------------------------------
_SESSION_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM {t}),
flags AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS new_sess
  FROM ordered),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flags)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM sess GROUP BY user_id, session_seq
"""


@query("q_sessionize_batch", oracle=_SESSION_SQL.format(t="events"))
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_on_view(spark, sf_dir, "events", _SESSION_SQL, "events_sess_v")


# --------------------------------------------------------------------------
# exact quantiles by discrete selection (deterministic across engines)
# --------------------------------------------------------------------------
def _quantile_sql(ps: list[float]) -> str:
    cols = ",\n       ".join(
        f"CAST(CAST(MAX(CASE WHEN rn = CAST(floor({p} * (n - 1)) AS BIGINT) + 1 "
        f"THEN o_totalprice END) AS DECIMAL(18,2)) AS DOUBLE) AS p{int(p * 100)}"
        for p in ps
    )
    return f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM {{t}})
SELECT o_orderpriority,
       {cols},
       CAST(MAX(n) AS BIGINT) AS n_orders
FROM ranked GROUP BY o_orderpriority
"""


_QUANTILE_SQL = _quantile_sql([0.5, 0.9, 0.99])


@query("q_quantiles", oracle=_QUANTILE_SQL.format(t="orders"))
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles via rank selection — engine-portable
    (interpolating quantiles differ in float evaluation across
    engines; rank selection is pure integer logic)."""
    return _sql_on_view(spark, sf_dir, "orders", _QUANTILE_SQL, "orders_quant_v")


# --------------------------------------------------------------------------
# CUBE + GROUPING bitmask
# --------------------------------------------------------------------------
_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM {t}
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("q_cube_grouping", oracle=_CUBE_SQL.format(t="lineitem"))
def q_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_on_view(spark, sf_dir, "lineitem", _CUBE_SQL, "lineitem_cube_v")


# --------------------------------------------------------------------------
# lag/lead navigation with a named window
# --------------------------------------------------------------------------
_LAGLEAD_SQL = """
SELECT event_id, user_id,
       CAST(LAG(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS prev_value,
       LEAD(event_type) OVER w AS next_event_type,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq
FROM {t}
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("q_lag_lead", oracle=_LAGLEAD_SQL.format(t="events"))
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_on_view(spark, sf_dir, "events", _LAGLEAD_SQL, "events_nav_v")


# --------------------------------------------------------------------------
# salted join — the skew-mitigation pattern, verified against the
# plain join (results must be identical)
# --------------------------------------------------------------------------
_SALTED_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@query("q_salted_join", oracle=_SALTED_ORACLE)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key mitigation: the probe side salts its key deterministically,
    the build side explodes across all salts, the join key becomes
    (key, salt) — splitting any skewed key's rows across SALTS
    reducers.  AQE's skew-join does this adaptively; explicit salting
    is the portable fallback.  Result provably equals the plain join."""
    salts = 4
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_extendedprice",
        (F.col("l_linenumber") % salts).alias("__salt"),
    )
    orders = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
        )
    )
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey) & (li.__salt == orders.__salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice").cast(D2)).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# LSH-bucketed ANN candidates (deterministic md5 hyperplanes) — the
# scale path for similarity search, oracle-verified exactly
# --------------------------------------------------------------------------
def _lsh_sign_case_duck(p: int) -> str:
    return (
        f"CASE WHEN list_dot_product(v, list_transform(range(64), d -> "
        f"CASE WHEN (strpos('{HEX}', substr(md5('{p}:' || CAST(d AS VARCHAR)), 1, 1)) - 1) % 2 = 0 "
        f"THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)) > 0 THEN '1' ELSE '0' END"
    )


_LSH_ORACLE = f"""
WITH q AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
b AS (SELECT vec_id,
       {" || ".join(_lsh_sign_case_duck(p) for p in range(8))} AS bucket
      FROM q)
SELECT a.vec_id AS vec_id_1, c.vec_id AS vec_id_2, a.bucket
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
"""


@query("sim_lsh_buckets", oracle=_LSH_ORACLE)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_bucket_candidates

    emb = load(spark, sf_dir, "embeddings")
    return lsh_bucket_candidates(emb, num_planes=8)


# --------------------------------------------------------------------------
# full dedup pipeline: MinHash-LSH candidates → exact-Jaccard verify →
# survivor set (keep the smallest doc_id of each verified pair group)
# --------------------------------------------------------------------------
_SURVIVOR_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx),
sig AS (SELECT doc_id,
  MIN(md5('0:' || shingle)) AS m0, MIN(md5('1:' || shingle)) AS m1,
  MIN(md5('2:' || shingle)) AS m2, MIN(md5('3:' || shingle)) AS m3,
  MIN(md5('4:' || shingle)) AS m4, MIN(md5('5:' || shingle)) AS m5,
  MIN(md5('6:' || shingle)) AS m6, MIN(md5('7:' || shingle)) AS m7
  FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(m0 || m1) AS bkey FROM sig
  UNION ALL SELECT doc_id, 1, md5(m2 || m3) FROM sig
  UNION ALL SELECT doc_id, 2, md5(m4 || m5) FROM sig
  UNION ALL SELECT doc_id, 3, md5(m6 || m7) FROM sig),
cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                                   AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          JOIN cand ON cand.d1 = a.doc_id AND cand.d2 = b.doc_id
          GROUP BY 1, 2),
verified AS (
  SELECT i.d1, i.d2 FROM inter i
  JOIN sizes sa ON sa.doc_id = i.d1
  JOIN sizes sb ON sb.doc_id = i.d2
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= CAST(0.5 AS DOUBLE))
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT d2 FROM verified)
"""


@query("dedup_pipeline_survivors", oracle=_SURVIVOR_ORACLE)
def dedup_pipeline_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup removal at scale: candidates come from
    LSH banding (no quadratic pass), exact Jaccard runs only on
    candidate pairs, and every doc appearing as the larger id of a
    verified duplicate pair is dropped (keep-smallest policy)."""
    docs = load(spark, sf_dir, "documents")
    cands = dd.minhash_lsh_candidates(docs, num_hashes=8, bands=4)
    # The candidate gate sits BELOW the exact-Jaccard aggregation
    # (operators/dedup.py): only candidate docs enter the shingle
    # self-join and only candidate pairs reach the intersection count,
    # so a hot shingle cannot fan out into a quadratic pair stream.
    verified = (
        dd.ngram_jaccard_pairs(docs, threshold=0.5, candidates=cands)
        .select(F.col("doc_id_2").alias("doc_id"))
        .distinct()
    )
    return docs.select("doc_id").join(verified, "doc_id", "left_anti")


# --------------------------------------------------------------------------
# quality + language gate — the standard pre-training filter shape
# --------------------------------------------------------------------------
_QFILTER_ORACLE = """
WITH s AS (
  SELECT doc_id,
    (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       / CAST(len(string_split(text, ' ')) AS DOUBLE))
      * LEAST(CAST(1.0 AS DOUBLE),
              CAST(len(string_split(text, ' ')) AS DOUBLE) / CAST(50.0 AS DOUBLE)) AS q,
    CAST(len(list_filter(string_split(text, ' '),
             x -> list_contains(['the','a','and','of','to','is'], x))) AS BIGINT) AS s_en
  FROM documents)
SELECT CASE WHEN s_en > 0 THEN 'en' ELSE 'unknown' END AS lang_gate,
       CASE WHEN q >= CAST(0.8 AS DOUBLE) THEN 'high'
            WHEN q >= CAST(0.5 AS DOUBLE) THEN 'medium'
            ELSE 'low' END AS quality_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM s GROUP BY 1, 2
"""


@query("text_quality_filter", oracle=_QFILTER_ORACLE)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks).cast("double")
    q = (F.size(F.array_distinct(toks)).cast("double") / n_tokens) * F.least(
        F.lit(1.0), n_tokens / F.lit(50.0)
    )
    s_en = F.expr(
        "size(filter(split(text, ' '), "
        "x -> array_contains(array('the','a','and','of','to','is'), x)))"
    ).cast("bigint")
    return (
        docs.select(
            F.when(s_en > 0, "en").otherwise("unknown").alias("lang_gate"),
            F.when(q >= 0.8, "high")
            .when(q >= 0.5, "medium")
            .otherwise("low")
            .alias("quality_bucket"),
        )
        .groupBy("lang_gate", "quality_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# explicit GROUPING SETS (beyond ROLLUP/CUBE: an arbitrary set list)
# --------------------------------------------------------------------------
_GSETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM {t}
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority), ())
"""


@query("q_grouping_sets", oracle=_GSETS_SQL.format(t="orders"))
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping-set list (not expressible as one ROLLUP or
    CUBE) with GROUPING() disambiguation of NULL group keys."""
    return _sql_on_view(spark, sf_dir, "orders", _GSETS_SQL, "orders_gsets_v")


# --------------------------------------------------------------------------
# RANGE window frame over event time — 7-day trailing revenue per
# customer (ROWS frames count rows; RANGE frames cover a time span)
# --------------------------------------------------------------------------
_RANGE_FRAME_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_7d_total
FROM {t}
WHERE o_custkey <= 200
"""


@query("q_range_frame_trailing", oracle=_RANGE_FRAME_SQL.format(t="orders"))
def q_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: the trailing sum includes ALL rows
    within the interval regardless of count — peer rows (equal
    o_orderdate) aggregate identically on both engines, so no
    tiebreaker is needed (unlike ROWS frames, where peer order would
    be nondeterministic)."""
    return _sql_on_view(spark, sf_dir, "orders", _RANGE_FRAME_SQL, "orders_rangef_v")


# --------------------------------------------------------------------------
# binned range join — point-in-interval join without the
# broadcast-nested-loop O(N·M) plan (operators/range_join.py)
# --------------------------------------------------------------------------
_RANGE_JOIN_ORACLE = """
WITH tiers AS (
  SELECT CAST(i AS BIGINT) AS tier_id,
         CAST(-1000 + i * 550 AS DOUBLE) AS lo,
         CAST(-300 + i * 550 AS DOUBLE) AS hi
  FROM generate_series(0, 19) AS t(i))
SELECT t.tier_id,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c JOIN tiers t ON c.c_acctbal BETWEEN t.lo AND t.hi
GROUP BY 1
"""


@query("q_range_join_binned", oracle=_RANGE_JOIN_ORACLE)
def q_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers joined to OVERLAPPING balance tiers (20 intervals of
    width 700 every 550) through the binned range join: intervals
    explode onto fixed-width buckets, points map to one bucket, and
    the join is a plain equi-join on the bucket id + exact re-check —
    never the broadcast-nested-loop plan Spark gives a raw BETWEEN
    join.  The oracle runs the naive BETWEEN join; identical results
    prove the binning introduces no false positives/negatives at
    bucket boundaries (the overlap makes boundary rows multi-match)."""
    from ..operators.range_join import range_join_binned

    tiers = spark.range(20).select(
        F.col("id").alias("tier_id"),
        (F.lit(-1000.0) + F.col("id") * 550.0).alias("lo"),
        (F.lit(-300.0) + F.col("id") * 550.0).alias("hi"),
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    joined = range_join_binned(cust, tiers, "c_acctbal", "lo", "hi", 500.0)
    return joined.groupBy("tier_id").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_bal"),
    )


# --------------------------------------------------------------------------
# winsorized robust aggregation — exact order-statistic clipping
# (percentile_disc picks REAL data values, so both engines clip at
# bit-identical thresholds; interpolated percentiles would not be
# oracle-portable)
# --------------------------------------------------------------------------
_WINSORIZE_ORACLE = """
WITH bounds AS (
  SELECT event_type,
         quantile_disc(value, 0.05) AS lo,
         quantile_disc(value, 0.95) AS hi
  FROM events GROUP BY event_type)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped,
       CAST(SUM(CAST(LEAST(GREATEST(e.value, b.lo), b.hi) AS DECIMAL(18,4)))
            AS DOUBLE) AS winsorized_sum
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type
"""


@query("q_winsorize_values", oracle=_WINSORIZE_ORACLE)
def q_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-clipped) aggregation: per event type, clip
    values to the exact [p05, p95] order statistics and sum the
    clipped values — the robust-stats pass a quality pipeline runs
    before thresholding on means.  Two shuffles on the group key (one
    for the bounds, one for the final agg); the small bounds side is
    broadcast back.  ``percentile_disc`` is a within-group sort — at
    100 TB the sort is bounded per group, never corpus-wide."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("hi"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.col("value"),
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("w"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .cast("int")
        .alias("c"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("c").cast("bigint").alias("n_clipped"),
        F.sum(F.col("w").cast("decimal(18,4)")).cast("double").alias("winsorized_sum"),
    )


# --------------------------------------------------------------------------
# equi-width value histogram — one shuffle on the bucket id
# --------------------------------------------------------------------------
_HISTOGRAM_ORACLE = """
SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS min_value,
       CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS max_value
FROM events
GROUP BY 1
"""


@query("q_value_histogram", oracle=_HISTOGRAM_ORACLE)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values (width 50): the bucket id
    is a narrow map over the scan and the count is one
    map-side-combinable aggregate — distribution profiling at any
    scale.  FLOOR of the same double division is bit-identical on
    both engines; min/max route through DECIMAL for the usual
    portability contract."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.floor(F.col("value") / F.lit(50.0)).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min(F.col("value").cast("decimal(18,4)")).cast("double").alias("min_value"),
            F.max(F.col("value").cast("decimal(18,4)")).cast("double").alias("max_value"),
        )
    )


# --------------------------------------------------------------------------
# ordered funnel over the event stream — per-user stage progression
# (view -> click-after-view -> purchase-after-click), the canonical
# product-analytics shape.  Each stage is one groupBy(user) aggregate
# over a filtered slice joined to the previous stage's per-user
# timestamp; stage frames shrink monotonically, so every join after
# the first runs against an already-reduced side.  Counts cross-join
# as one-row frames (no data movement).
# --------------------------------------------------------------------------
_FUNNEL_ORACLE = """
WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_viewed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_clicked_after,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchased_after,
       CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE) AS view_to_purchase_rate
"""


@query("q_event_funnel", oracle=_FUNNEL_ORACLE)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_viewed"))
    n2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n_clicked_after"))
    n3 = s3.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchased_after"))
    return (
        n1.crossJoin(n2)
        .crossJoin(n3)
        .withColumn(
            "view_to_purchase_rate",
            F.col("n_purchased_after").cast("double")
            / F.col("n_viewed").cast("double"),
        )
    )


# --------------------------------------------------------------------------
# weekly retention cohorts — users bucketed by first-activity week,
# activity counted per week offset.  Week ids are integer arithmetic
# on days-since-a-fixed-Monday (engine-portable; no week-truncation
# semantics to disagree on).  Two shuffles: first-activity per user,
# then the (cohort, offset) distinct-user aggregate.
# --------------------------------------------------------------------------
_RETENTION_ORACLE = """
WITH wk AS (SELECT user_id,
                   date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) // 7 AS w
            FROM events),
first AS (SELECT user_id, MIN(w) AS cohort_week FROM wk GROUP BY 1)
SELECT CAST(f.cohort_week AS BIGINT) AS cohort_week,
       CAST(wk.w - f.cohort_week AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT wk.user_id) AS BIGINT) AS n_active_users
FROM wk JOIN first f ON wk.user_id = f.user_id
GROUP BY 1, 2
"""


@query("q_retention_cohorts", oracle=_RETENTION_ORACLE)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wk = ev.select(
        "user_id",
        # FLOOR, not `div`: Spark's `div` truncates toward zero while
        # DuckDB's `//` floors — they diverge for dates before the
        # 1970-01-05 anchor (negative datediff).
        F.expr(
            "CAST(FLOOR(datediff(CAST(ts AS DATE), DATE '1970-01-05') / 7.0D)"
            " AS BIGINT)"
        ).alias("w"),
    )
    first = wk.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    return (
        wk.join(first, "user_id")
        .groupBy(
            F.col("cohort_week").cast("bigint").alias("cohort_week"),
            (F.col("w") - F.col("cohort_week")).cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active_users"))
    )


# --------------------------------------------------------------------------
# robust outlier detection — exact grouped median/MAD (the
# median-absolute-deviation screen quality pipelines run where a
# stddev rule would be wrecked by the outliers it hunts)
# --------------------------------------------------------------------------
_MAD_ORACLE = """
WITH v AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM events),
med AS (
  SELECT event_type,
         CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT)
           AS med_c
  FROM v GROUP BY event_type),
dev AS (
  SELECT v.event_type, v.c, med.med_c, ABS(v.c - med.med_c) AS d
  FROM v JOIN med USING (event_type)),
mad AS (
  SELECT event_type,
         CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS BIGINT)
           AS mad_c
  FROM dev GROUP BY event_type)
SELECT dev.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(dev.med_c) AS BIGINT) AS median_cents,
       CAST(MAX(mad.mad_c) AS BIGINT) AS mad_cents,
       CAST(SUM(CASE WHEN dev.d > 3 * mad.mad_c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
"""


@query("q_mad_outliers", oracle=_MAD_ORACLE)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped median/MAD outlier screen on exact integer cents: per
    event type, median via percentile_disc (within-group sort, bounded
    per group — never corpus-wide), deviations against the broadcast
    medians, MAD as the median deviation, flag |v - med| > 3·MAD.
    Two grouped order-statistic shuffles + two broadcast joins; every
    comparison is BIGINT so the verdict replays bit-exactly."""
    ev = load(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c",
    )
    med = ev.groupBy("event_type").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT)")
        .alias("med_c")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("c") - F.col("med_c"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS BIGINT)")
        .alias("mad_c")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("med_c").cast("bigint").alias("median_cents"),
            F.max("mad_c").cast("bigint").alias("mad_cents"),
            F.sum(
                (F.col("d") > 3 * F.col("mad_c")).cast("int")
            ).cast("bigint").alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# CUSUM change-point detection — per-source hourly-volume drift monitor
# (Page 1954), fixed-point recursion as an in-row fold
# --------------------------------------------------------------------------
_CUSUM_ORACLE = """
WITH hourly AS (
  SELECT event_type AS g, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
mu AS (
  SELECT g, CAST((100 * SUM(c)) // COUNT(*) AS BIGINT) AS mu_x100
  FROM hourly GROUP BY g),
traj AS (
  SELECT hourly.g, h, mu_x100,
         SUM(100 * c - mu_x100 - 50) OVER
           (PARTITION BY hourly.g ORDER BY h
            ROWS UNBOUNDED PRECEDING) AS P
  FROM hourly JOIN mu ON hourly.g = mu.g),
svals AS (
  SELECT g, mu_x100,
         P - LEAST(CAST(0 AS BIGINT),
                   MIN(P) OVER (PARTITION BY g ORDER BY h
                                ROWS UNBOUNDED PRECEDING)) AS s
  FROM traj)
SELECT g AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(MAX(mu_x100) AS BIGINT) AS mu_x100,
       CAST(MAX(s) AS BIGINT) AS max_cusum,
       CAST(SUM(CASE WHEN s > 600 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarm_hours
FROM svals GROUP BY g
"""


@query("q_cusum_changepoint", oracle=_CUSUM_ORACLE)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM drift monitor over hourly volumes: the
    recursion s_i = max(0, s_{i-1} + x_i - mu - k) runs as one
    JVM-side fold over each group's bounded, time-ordered count array
    (hours, not events — control-plane sized), in x100 fixed-point
    BIGINTs so the whole trajectory replays bit-exactly in the
    list_reduce oracle."""
    from ..operators.selection import cusum_changepoint

    return cusum_changepoint(load(spark, sf_dir, "events"))
