"""Connected-components dedup groups (iterative distributed algorithm
vs a recursive-CTE oracle) and the broad scalar-function parity
surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators.graph import connected_components
from . import load, query

# --------------------------------------------------------------------------
# duplicate GROUPS via connected components over verified near-dup pairs
# (pair-level dedup misses transitive chains; groups are the real unit)
# --------------------------------------------------------------------------
_CC_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3),
sh0 AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx),
keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 50),
sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
pairs AS (
  SELECT i.d1, i.d2 FROM inter i
  JOIN sizes sa ON sa.doc_id = i.d1
  JOIN sizes sb ON sb.doc_id = i.d2
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= CAST(0.5 AS DOUBLE)),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION SELECT d2, d1 FROM pairs),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach AS (
  -- transitive closure by recursion: all (node, reachable-node) pairs
  WITH RECURSIVE r(node, lbl) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.a, r.lbl FROM r JOIN edges e ON e.b = r.node
  ) SELECT * FROM r)
SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS component
FROM reach GROUP BY node
"""


@query("dedup_connected_components", oracle=_CC_ORACLE)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup *groups*: verified Jaccard pairs → min-label
    connected components (operators/graph.py).  The oracle computes
    the same closure with a recursive CTE.

    The edge builder caps shingle document-frequency at 50: a
    boilerplate shingle shared by f documents otherwise meets itself
    f²/2 times in the inverted-index self-join — the quadratic hazard
    at corpus scale.  Real near-dup clusters are small, so their
    shingles sit far below any sane cap; the oracle applies the same
    cap, keeping Jaccard exact over the capped shingle space."""
    docs = load(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=50).select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    )
    # near-dup pair graphs are tiny vs the corpus → narrow shuffles
    cc = connected_components(pairs, "src", "dst", shuffle_partitions=4)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").cast("bigint")
    )


# --------------------------------------------------------------------------
# scalar-function parity surface (§2.7 + common model-SQL functions)
# Only functions with engine-identical IEEE/integer semantics: no
# transcendentals (libm last-ulp differences), no locale-sensitive ops.
# --------------------------------------------------------------------------
_SCALAR_SQL = """
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month_n,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS order_quarter,
       UPPER(SUBSTR(o_orderpriority, 3)) AS priority_name,
       LPAD(CAST(o_orderkey AS STRING), 12, '0') AS padded_key,
       REPLACE(o_orderpriority, '-', '_') AS priority_snake,
       CAST(LENGTH(o_orderpriority) AS INT) AS priority_len,
       CONCAT(o_orderstatus, ':', o_orderpriority) AS status_tag,
       CAST(ABS(CAST(o_totalprice AS DECIMAL(18,2)) - 150000) AS DOUBLE) AS dist_from_150k,
       CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS price_bucket,
       CAST(CEIL(o_totalprice / 10000) AS BIGINT) AS price_bucket_hi,
       SQRT(CAST(o_orderkey AS DOUBLE)) AS key_sqrt,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_decoded,
       CASE WHEN o_totalprice > 300000 THEN 'large'
            WHEN o_totalprice > 100000 THEN 'medium'
            ELSE 'small' END AS size_class,
       (o_orderkey % 7 = 0) AS lucky
FROM {t}
WHERE o_orderkey <= 5000
"""


# --------------------------------------------------------------------------
# string/array aggregation: sorted collect + array_join (LISTAGG shape)
# --------------------------------------------------------------------------
_STRAGG_ORACLE = """
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') AS nations_csv,
       CAST(len(list(n_name)) AS BIGINT) AS n_nations
FROM nation
GROUP BY n_regionkey
"""


@query("q_string_agg", oracle=_STRAGG_ORACLE)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG-equivalent: sorted collect_list + array_join (the shape
    the dialect shim rewrites LISTAGG into; sorting makes the
    aggregation order-insensitive → deterministic under any
    parallelism)."""
    nat = load(spark, sf_dir, "nation")
    return nat.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "nations_csv"
        ),
        F.count(F.lit(1)).alias("n_nations"),
    )


@query("q_scalar_functions", oracle=_SCALAR_SQL.format(t="orders"))
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broad deterministic scalar surface: date extraction/arithmetic/
    truncation, string slicing/padding/replacement, numeric
    abs/floor/ceil/sqrt, NULLIF/COALESCE/CASE, modulo booleans."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_scalar_v")
    return spark.sql(_SCALAR_SQL.format(t="orders_scalar_v"))


@query("dedup_cc_twophase", oracle=_CC_ORACLE)
def dedup_cc_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same duplicate groups via the O(log n)-round large-star/
    small-star algorithm (Kiveris et al.) — the web-scale/
    high-diameter path, gated against the identical recursive-CTE
    oracle as the frontier variant (components are canonical
    min-labels, so both algorithms must agree bit-for-bit)."""
    from ..operators.graph import connected_components_two_phase

    docs = load(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=50).select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    )
    cc = connected_components_two_phase(pairs, "src", "dst", shuffle_partitions=4)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").cast("bigint")
    )


# --------------------------------------------------------------------------
# weighted PageRank over the token bigram graph — the iterative-join
# fixed-point family (Pregel's PageRank as DataFrame plans)
# --------------------------------------------------------------------------
_PR_EDGES_SQL = """
SELECT t[i] AS src, t[i + 1] AS dst, CAST(COUNT(*) AS BIGINT) AS w
FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents),
     unnest(range(1, len(t))) AS u(i)
GROUP BY 1, 2
"""


def _pr_oracle() -> str:
    from ..operators.graph import pagerank_oracle_sql

    return pagerank_oracle_sql(_PR_EDGES_SQL, iterations=3)


@query("graph_pagerank_tokens", oracle=_pr_oracle())
def graph_pagerank_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token centrality under 3 synchronous weighted-PageRank
    iterations over the corpus bigram graph — integer-quantized ranks
    so the whole trajectory replays bit-exactly in the unrolled
    oracle.  Edge derivation is one corpus explode + groupBy; each
    iteration is an edges⋈ranks shuffle join + a dst groupBy on
    nodes-sized state."""
    from ..operators.graph import pagerank_fixed

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("__t")
    ).filter(F.size("__t") >= 2)
    edges = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__t) - 1),"
                    " i -> struct(element_at(__t, i) AS src,"
                    " element_at(__t, i + 1) AS dst))"
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    return pagerank_fixed(edges, iterations=3)


# --------------------------------------------------------------------------
# leakage-safe train/val/test split — the split unit is the near-dup
# CONNECTED COMPONENT, so duplicated documents can never straddle
# train and eval (the classic contamination bug)
# --------------------------------------------------------------------------
_SPLIT_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3),
sh0 AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx),
keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 50),
sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
pairs AS (
  SELECT i.d1, i.d2 FROM inter i
  JOIN sizes sa ON sa.doc_id = i.d1
  JOIN sizes sb ON sb.doc_id = i.d2
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= CAST(0.5 AS DOUBLE)),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION SELECT d2, d1 FROM pairs),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach AS (
  WITH RECURSIVE r(node, lbl) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.a, r.lbl FROM r JOIN edges e ON e.b = r.node
  ) SELECT * FROM r),
comp AS (
  SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS component
  FROM reach GROUP BY node),
assigned AS (
  SELECT d.doc_id,
         CAST(COALESCE(comp.component, d.doc_id) AS BIGINT) AS component
  FROM documents d LEFT JOIN comp USING (doc_id)),
bucketed AS (
  SELECT doc_id, component,
         CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 6))
              AS BIGINT) % 100 AS bucket
  FROM assigned)
SELECT doc_id, component, CAST(bucket AS BIGINT) AS bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
FROM bucketed
"""


@query("dedup_leakage_split", oracle=_SPLIT_ORACLE)
def dedup_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition gate: verified n-gram Jaccard pairs → connected
    components → component-keyed deterministic md5 split buckets —
    every near-dup cluster lands whole in one of train/val/test.
    Same doc-freq winnowing gate and frontier CC as the dedup gates;
    the split assignment is pure integer/md5 arithmetic, bit-exact in
    the oracle."""
    return dd.leakage_safe_split(load(spark, sf_dir, "documents"))
