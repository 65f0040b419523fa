"""Large-scale pipeline operator surface: deduplication (exact /
n-gram Jaccard / MinHash-LSH / SimHash), similarity search over
embeddings, text analysis, and multimodal plumbing — each verified
against a DuckDB oracle computing the identical deterministic result.

All hashing is md5-based (identical across engines); all similarity
math runs on exact quantized integers (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import multimodal as mm
from ..operators import similarity as sim
from ..operators import text as tx
from ..operators.dedup import simhash_sql
from ..operators.transform import materialize
from . import load, query

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS content_hash,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_duplicates(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# exact n-gram Jaccard near-dup pairs
# --------------------------------------------------------------------------
@query(
    "dedup_ngram_jaccard",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, CAST(COUNT(*) AS BIGINT) AS n_intersect
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_id_1, doc_id_2, n_intersect,
       CAST(sa.n + sb.n - n_intersect AS BIGINT) AS n_union,
       CAST(n_intersect AS DOUBLE) / CAST(sa.n + sb.n - n_intersect AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_id_1
JOIN sizes sb ON sb.doc_id = doc_id_2
WHERE CAST(n_intersect AS DOUBLE) / CAST(sa.n + sb.n - n_intersect AS DOUBLE) >= CAST(0.5 AS DOUBLE)
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = dd.ngram_jaccard_pairs(docs, threshold=0.5)
    return out.select(
        "doc_id_1",
        "doc_id_2",
        F.col("n_intersect").cast("bigint").alias("n_intersect"),
        F.col("n_union").cast("bigint").alias("n_union"),
        "jaccard",
    )


# --------------------------------------------------------------------------
# MinHash + LSH banding candidates
# --------------------------------------------------------------------------
_MINHASH_ORACLE = """
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
  UNION ALL SELECT doc_id, 3, md5(m6 || m7) FROM sig)
SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
"""


@query("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dd.minhash_lsh_candidates(docs, num_hashes=8, bands=4)


# --------------------------------------------------------------------------
# exact edit-distance verification of the LSH candidates — the
# recall-then-confirm pipeline shape: the band join prunes to
# near-dup candidates, JVM-side levenshtein confirms, and the
# integer relative-distance filter replays bit-identically.
# --------------------------------------------------------------------------
# the candidate CTEs are _MINHASH_ORACLE's WITH-prefix verbatim (one
# source of truth for the banding semantics); only the final SELECT
# is replaced by the verify stage
_EDITDIST_ORACLE = (
    _MINHASH_ORACLE.rstrip().rsplit("SELECT DISTINCT", 1)[0]
    + """,
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
v AS (
  SELECT c.doc_id_1, c.doc_id_2,
         CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
         CAST(GREATEST(length(da.text), length(db.text), 1) AS BIGINT) AS max_len
  FROM cand c
  JOIN documents da ON da.doc_id = c.doc_id_1
  JOIN documents db ON db.doc_id = c.doc_id_2)
SELECT doc_id_1, doc_id_2, edit_distance, max_len
FROM v WHERE edit_distance * 100 <= 20 * max_len
"""
)


@query("dedup_editdist_verify", oracle=_EDITDIST_ORACLE)
def dedup_editdist_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-recall → exact-confirm: minhash band candidates verified by
    JVM-side levenshtein (operators/dedup.py editdist_verify), pairs
    kept at relative edit distance ≤ 20% of the longer text.  The
    quadratic per-pair cost is bounded by the candidate count; the
    corpus streams through both text joins (candidate side
    broadcast)."""
    docs = load(spark, sf_dir, "documents")
    cand = dd.minhash_lsh_candidates(docs, num_hashes=8, bands=4)
    return dd.editdist_verify(docs, cand, max_rel_dist_pct=20)


# --------------------------------------------------------------------------
# SimHash fingerprints (same generated SQL, two dialects)
# --------------------------------------------------------------------------
@query(
    "dedup_simhash",
    oracle=simhash_sql("SELECT doc_id, text FROM documents", bits=16, dialect="duckdb"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_simhash_v")
    return spark.sql(
        simhash_sql(
            "SELECT doc_id, text FROM documents_simhash_v", bits=16, dialect="spark"
        )
    )


# --------------------------------------------------------------------------
# similarity search: exact brute-force top-k over quantized embeddings
# --------------------------------------------------------------------------
_TOPK_ORACLE = """
WITH q AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM q),
qs AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         list_dot_product(qv, c.v) / sqrt(qn * c.nrm) AS cosine_sim
  FROM qs CROSS JOIN n c WHERE c.vec_id <> query_id)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, cosine_sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= 5
"""


@query("sim_cosine_topk", oracle=_TOPK_ORACLE)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return sim.cosine_topk(emb, query_ids=range(10), k=5)


# --------------------------------------------------------------------------
# similarity search: IVF-style probe search (the bounded-candidate
# scale path; deterministic centroids → exact oracle)
# --------------------------------------------------------------------------
_IVF_ORACLE = """
WITH q AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM q),
cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % 50 = 0),
pairs AS (
  SELECT n.vec_id, cent.cid,
         n.nrm + cent.cn - 2 * list_dot_product(n.v, cent.cv) AS d2
  FROM n CROSS JOIN cent),
assign AS (
  SELECT vec_id AS neighbor_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM pairs) t WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM pairs WHERE vec_id < 10) t WHERE rn <= 3),
cand AS (
  SELECT p.query_id, a.neighbor_id FROM probes p
  JOIN assign a ON a.cid = p.cid
  WHERE a.neighbor_id <> p.query_id),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_dot_product(qv.v, nv.v) / sqrt(qv.nrm * nv.nrm) AS cosine_sim
  FROM cand c
  JOIN n qv ON qv.vec_id = c.query_id
  JOIN n nv ON nv.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, cosine_sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= 5
"""


@query("sim_ivf_topk", oracle=_IVF_ORACLE)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return sim.ivf_topk(emb, query_ids=range(10), k=5, centroid_stride=50, nprobe=3)


# --------------------------------------------------------------------------
# similarity: IVF over kmeans-REFINED centroids — the production
# k-means→IVF build path (one exact-integer Lloyd update on the
# stride sample, then the same assign→probe→rank search)
# --------------------------------------------------------------------------
_IVF_KMEANS_ORACLE = """
WITH q AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM q),
c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % 50 = 0),
a0 AS (SELECT vec_id, cid FROM (
   SELECT n.vec_id, c0.cid,
          ROW_NUMBER() OVER (PARTITION BY n.vec_id
                             ORDER BY n.nrm + c0.cn - 2 * list_dot_product(n.v, c0.cv),
                                      c0.cid) AS rn
   FROM n CROSS JOIN c0) t WHERE rn = 1),
s0 AS (SELECT a0.cid, gs.d AS d,
              CAST(SUM(CAST(n.v[gs.d + 1] AS BIGINT)) AS BIGINT) AS s,
              CAST(COUNT(*) AS BIGINT) AS nm
       FROM a0 JOIN n USING (vec_id)
       CROSS JOIN generate_series(0, 63) AS gs(d)
       GROUP BY 1, 2),
u1 AS (SELECT cid, d,
              (2 * (s + 1000000 * nm) + nm) // (2 * nm) - 1000000 AS c
       FROM s0),
c1 AS (SELECT cid, list(CAST(c AS DOUBLE) ORDER BY d) AS cv FROM u1 GROUP BY cid),
cent AS (SELECT cid, cv, list_dot_product(cv, cv) AS cn FROM c1),
pairs AS (
  SELECT n.vec_id, cent.cid,
         n.nrm + cent.cn - 2 * list_dot_product(n.v, cent.cv) AS d2
  FROM n CROSS JOIN cent),
assign AS (
  SELECT vec_id AS neighbor_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM pairs) t WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM pairs WHERE vec_id < 10) t WHERE rn <= 3),
cand AS (
  SELECT p.query_id, a.neighbor_id FROM probes p
  JOIN assign a ON a.cid = p.cid
  WHERE a.neighbor_id <> p.query_id),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_dot_product(qv.v, nv.v) / sqrt(qv.nrm * nv.nrm) AS cosine_sim
  FROM cand c
  JOIN n qv ON qv.vec_id = c.query_id
  JOIN n nv ON nv.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, cosine_sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= 5
"""


@query("sim_ivf_kmeans_topk", oracle=_IVF_KMEANS_ORACLE)
def sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over kmeans-refined centroids: the stride sample is
    improved by one exact-integer Lloyd update pass before the
    assign→probe→rank search — the production ANN build (k-means then
    IVF), end-to-end deterministic so the oracle can replay both the
    refinement and the search in SQL."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ivf_topk(
        emb, query_ids=range(10), k=5, centroid_stride=50, nprobe=3,
        refine_passes=1,
    )


# --------------------------------------------------------------------------
# similarity: Johnson-Lindenstrauss ±1 random projection (embedding
# compression before ANN — exact integer components, shuffle-free)
# --------------------------------------------------------------------------
def _rp_plane_duck(p: int) -> str:
    return (
        f"list_transform(range(64), d -> "
        f"CASE WHEN (strpos('0123456789abcdef', "
        f"substr(md5('{p}:' || CAST(d AS VARCHAR)), 1, 1)) - 1) % 2 = 0 "
        f"THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)"
    )


_RP_ORACLE = f"""
WITH q AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings)
{" UNION ALL ".join(
    f"SELECT vec_id, CAST({p} AS INT) AS proj_pos, "
    f"CAST(list_dot_product(v, {_rp_plane_duck(1000 + p)}) AS BIGINT) AS proj_value FROM q"
    for p in range(8)
)}
"""


@query("sim_random_projection", oracle=_RP_ORACLE)
def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-dim embeddings projected to 8 signed components (JL sketch)
    — a narrow map over the scan, long-form output."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.random_projection(emb, out_dim=8)


# --------------------------------------------------------------------------
# similarity: full Lloyd's k-means (iterative; driver holds only k×d
# centroid state; every pass distributed) — exact integer contract
# --------------------------------------------------------------------------
_KMEANS_ORACLE = """
WITH q AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM q),
c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % 50 = 0),
a0 AS (SELECT vec_id, cid FROM (
   SELECT n.vec_id, c0.cid,
          ROW_NUMBER() OVER (PARTITION BY n.vec_id
                             ORDER BY n.nrm + c0.cn - 2 * list_dot_product(n.v, c0.cv),
                                      c0.cid) AS rn
   FROM n CROSS JOIN c0) t WHERE rn = 1),
s0 AS (SELECT a0.cid, gs.d AS d,
              CAST(SUM(CAST(n.v[gs.d + 1] AS BIGINT)) AS BIGINT) AS s,
              CAST(COUNT(*) AS BIGINT) AS nm
       FROM a0 JOIN n USING (vec_id)
       CROSS JOIN generate_series(0, 63) AS gs(d)
       GROUP BY 1, 2),
u1 AS (SELECT cid, d,
              (2 * (s + 1000000 * nm) + nm) // (2 * nm) - 1000000 AS c
       FROM s0),
c1 AS (SELECT cid, list(CAST(c AS DOUBLE) ORDER BY d) AS cv FROM u1 GROUP BY cid),
c1n AS (SELECT cid, cv, list_dot_product(cv, cv) AS cn FROM c1),
a1 AS (SELECT vec_id, cid, d2 FROM (
   SELECT n.vec_id, c1n.cid,
          n.nrm + c1n.cn - 2 * list_dot_product(n.v, c1n.cv) AS d2,
          ROW_NUMBER() OVER (PARTITION BY n.vec_id
                             ORDER BY n.nrm + c1n.cn - 2 * list_dot_product(n.v, c1n.cv),
                                      c1n.cid) AS rn
   FROM n CROSS JOIN c1n) t WHERE rn = 1)
SELECT a1.cid AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(ANY_VALUE(c1n.cn) AS BIGINT) AS centroid_norm,
       CAST(SUM(a1.d2) AS BIGINT) AS inertia
FROM a1 JOIN c1n ON a1.cid = c1n.cid
GROUP BY 1
"""


@query("sim_kmeans", oracle=_KMEANS_ORACLE)
def sim_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass Lloyd's k-means (init = every 50th vector, one exact
    integer centroid update, final assignment + inertia)."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.kmeans_lloyd(emb, stride=50, assign_passes=2)


# --------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs
# --------------------------------------------------------------------------
_NEARDUP_ORACLE = """
WITH q AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM q)
SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       list_dot_product(a.v, b.v) / sqrt(a.nrm * b.nrm) AS cosine_sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / sqrt(a.nrm * b.nrm) >= CAST(0.4 AS DOUBLE)
"""


@query("sim_embedding_neardup", oracle=_NEARDUP_ORACLE)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return sim.cosine_neardup_pairs(emb, threshold=0.4)


# --------------------------------------------------------------------------
# text analysis: token stats + quality score
# --------------------------------------------------------------------------
@query(
    "text_token_stats",
    oracle="""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars_m,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace_chars,
  CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
  (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE))
    * LEAST(CAST(1.0 AS DOUBLE), CAST(len(string_split(text, ' ')) AS DOUBLE) / CAST(50.0 AS DOUBLE)) AS quality_score
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.token_stats(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# text analysis: language identification heuristic
# --------------------------------------------------------------------------
def _ora_score(words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return (
        f"CAST(len(list_filter(string_split(text, ' '),"
        f" x -> list_contains([{arr}], x))) AS BIGINT)"
    )


_LANGID_ORACLE = f"""
WITH s AS (
  SELECT doc_id,
         {_ora_score(tx.STOPWORDS["en"])} AS score_en,
         {_ora_score(tx.STOPWORDS["de"])} AS score_de,
         {_ora_score(tx.STOPWORDS["es"])} AS score_es
  FROM documents)
SELECT doc_id, score_en, score_de, score_es,
       CASE WHEN score_en >= GREATEST(score_de, score_es) AND score_en > 0 THEN 'en'
            WHEN score_de >= score_es AND score_de > 0 THEN 'de'
            WHEN score_es > 0 THEN 'es'
            ELSE 'unknown' END AS predicted_lang
FROM s
"""


@query("text_language_id", oracle=_LANGID_ORACLE)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.language_id(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# text analysis: document fingerprints
# --------------------------------------------------------------------------
@query(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(lower(trim(text))) AS content_hash,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fingerprint
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.fingerprints(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# text analysis: corpus token frequencies (top-20)
# --------------------------------------------------------------------------
@query(
    "text_token_freq",
    oracle="""
SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS freq
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
WHERE tok <> ''
GROUP BY 1
ORDER BY freq DESC, token
LIMIT 20
""",
)
def text_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.token_frequencies(load(spark, sf_dir, "documents"), top_n=20)


# --------------------------------------------------------------------------
# text analysis: Gopher-style intra-document repetition metrics
# --------------------------------------------------------------------------
_TOKS = "string_split(text, ' ')"
_GRAM2 = (
    f"list_transform(range(1, len({_TOKS})), "
    f"i -> array_to_string(list_slice({_TOKS}, i, i + 1), ' '))"
)
_GRAM3 = (
    f"list_transform(range(1, len({_TOKS}) - 1), "
    f"i -> array_to_string(list_slice({_TOKS}, i, i + 2), ' '))"
)


def _ora_maxcount(arr: str) -> str:
    return (
        f"list_max(list_transform(list_distinct({arr}), "
        f"t2 -> len(list_filter({arr}, x -> x = t2))))"
    )


_REPETITION_ORACLE = f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
       CAST({_ora_maxcount(_TOKS)} AS BIGINT) AS max_token_count,
       CAST(CASE WHEN len({_TOKS}) >= 2
                 THEN {_ora_maxcount(_GRAM2)} ELSE 0 END AS BIGINT)
         AS top_bigram_count,
       CAST(CASE WHEN len({_TOKS}) - 2 > 0
                 THEN 1.0 - len(list_distinct({_GRAM3}))
                       / CAST(len({_TOKS}) - 2 AS DOUBLE)
                 ELSE 0.0 END AS DOUBLE) AS dup_3gram_frac
FROM documents
"""


@query("text_repetition_stats", oracle=_REPETITION_ORACLE)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (max token frequency, top-bigram
    frequency, duplicate-trigram fraction) — the Gopher §A1.1 quality
    thresholds — as a shuffle-free narrow map over the scan."""
    return tx.repetition_stats(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# text analysis: remaining Gopher quality gates (mean word length,
# alpha-word fraction, symbol ratio, stopword presence + verdict)
# --------------------------------------------------------------------------
_GOPHER_ORACLE = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT)))
              AS BIGINT) AS sum_len,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
              AS BIGINT) AS n_alpha,
         CAST(len(regexp_extract_all(text, '#'))
              + len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_sym,
         CAST(len(list_filter(toks,
              x -> list_contains(['the','a','and','of','to','is'], x)))
              AS BIGINT) AS n_stopwords
  FROM t),
r AS (
  SELECT doc_id, n_tokens,
         CAST(sum_len AS DOUBLE) / n_tokens AS mean_word_len,
         CAST(n_alpha AS DOUBLE) / n_tokens AS frac_alpha_words,
         CAST(n_sym AS DOUBLE) / n_tokens AS symbol_word_ratio,
         n_stopwords
  FROM m)
SELECT doc_id, n_tokens, mean_word_len, frac_alpha_words,
       symbol_word_ratio, n_stopwords,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_word_ratio < 0.1 AND frac_alpha_words >= 0.8
        AND n_stopwords >= 2) AS passes_gopher
FROM r
"""


@query("text_gopher_quality", oracle=_GOPHER_ORACLE)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining Gopher §A1.1 quality gates (mean word length,
    alphabetic-word fraction, symbol-to-word ratio, stopword count)
    plus the combined pass/fail verdict — a shuffle-free narrow map;
    with ``text_repetition_stats`` this completes the Gopher document
    filter."""
    return tx.gopher_quality(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# text: context-window chunking with overlap
# --------------------------------------------------------------------------
_CHUNK_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
d AS (
  SELECT doc_id, toks,
         GREATEST(1, (len(toks) - 16 + 111) // 112) AS n_chunks
  FROM t),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
  FROM d)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(toks, chunk_idx * 112 + 1, chunk_idx * 112 + 128))
            AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(
             list_slice(toks, chunk_idx * 112 + 1, chunk_idx * 112 + 128), ' '))
         AS chunk_hash
FROM c
"""


@query("text_chunk_windows", oracle=_CHUNK_ORACLE)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (128-token windows, 16-token overlap):
    one row per chunk with its exact token count and an md5 witness of
    the chunk text — a bounded explode over a narrow map, no shuffle,
    integer-exact chunk counts replayed by the oracle."""
    return tx.chunk_documents(
        load(spark, sf_dir, "documents"), chunk_tokens=128, overlap=16
    )


# --------------------------------------------------------------------------
# multimodal plumbing: binary payload + Arrow-batched feature UDF
# (decoder itself is stubbed — see operators/multimodal.py)
# --------------------------------------------------------------------------
@query(
    "multimodal_features",
    oracle="""
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       md5(text) AS content_digest,
       'image' AS media_kind
FROM documents
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    payloads = mm.attach_binary_payload(docs, kind="image")
    return mm.extract_features(payloads)


# --------------------------------------------------------------------------
# text analysis: BPE-ish regex token counting (LLM token-cost estimate)
# --------------------------------------------------------------------------
_BPE_SQL_PATTERN = tx.BPE_PATTERN.replace("'", "''")

_BPE_ORACLE = f"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '{_BPE_SQL_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
  CAST(len(regexp_extract_all(text, '{_BPE_SQL_PATTERN}')) AS DOUBLE)
    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS tokens_per_word
FROM documents
"""


@query("text_bpe_tokens", oracle=_BPE_ORACLE)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-pretokenizer token counts (operators/text.py
    BPE_PATTERN is lookahead-free so Java regex and RE2 agree)."""
    return tx.bpe_token_stats(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# text analysis: Rabin-Karp rolling-hash fingerprints (order-sensitive
# sequence hash + winnowing min-k-gram hash)
# --------------------------------------------------------------------------
def _duck_tokval(tok: str) -> str:
    parts = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({tok}), {i + 1}, 1)) - 1) * {16 ** i}"
        for i in range(6)
    )
    return f"CAST({parts} AS BIGINT)"


_ROLL_ORACLE = f"""
WITH kv AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), t -> {_duck_tokval('t')}) AS v
  FROM documents)
SELECT doc_id,
  CAST(list_reduce(v, (acc, x) -> (acc * {tx.ROLL_BASE} + x) % {tx.ROLL_MOD}) AS BIGINT) AS seq_hash,
  CAST(CASE WHEN len(v) >= 5 THEN
    list_min(list_transform(range(1, len(v) - 3),
      i -> list_reduce(v[i:i+4], (acc, x) -> (acc * {tx.ROLL_BASE} + x) % {tx.ROLL_MOD})))
  END AS BIGINT) AS winnow_hash
FROM kv
"""


@query("text_rolling_fingerprint", oracle=_ROLL_ORACLE)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hashes over the token sequence — DuckDB's
    init-less list_reduce equals Spark's aggregate with 0 init because
    the first fold step is 0*B + x = x."""
    return tx.rolling_fingerprints(load(spark, sf_dir, "documents"), k=5)


# --------------------------------------------------------------------------
# winnowing candidates: docs sharing a min-k-gram rolling hash are
# near-dup candidates (the MOSS/winnowing pairing step) — ties the
# rolling-hash fingerprint into the dedup candidate family
# --------------------------------------------------------------------------
_WINNOW_PAIRS_ORACLE = f"""
WITH kv AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), t -> {_duck_tokval('t')}) AS v
  FROM documents),
fp AS (
  SELECT doc_id,
    CAST(CASE WHEN len(v) >= 5 THEN
      list_min(list_transform(range(1, len(v) - 3),
        i -> list_reduce(v[i:i+4], (acc, x) -> (acc * {tx.ROLL_BASE} + x) % {tx.ROLL_MOD})))
    END AS BIGINT) AS winnow_hash
  FROM kv)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, a.winnow_hash
FROM fp a JOIN fp b
  ON a.winnow_hash = b.winnow_hash AND a.doc_id < b.doc_id
WHERE a.winnow_hash IS NOT NULL
"""


@query("dedup_winnow_candidates", oracle=_WINNOW_PAIRS_ORACLE)
def dedup_winnow_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs by shared winnowing fingerprint: one groupBy-
    equivalent self-join on the hash — no quadratic pass, same shape
    as the LSH band join but from the rolling-hash family.

    Fingerprints are materialized before the self-join: inlined, each
    join side (and every probe) re-evaluates the O(n·k) rolling-hash
    expression tree — measured 60× slower at sf0.1."""
    fp = materialize(tx.rolling_fingerprints(load(spark, sf_dir, "documents"), k=5))
    a = fp.select(F.col("doc_id").alias("doc_id_1"), "winnow_hash").filter(
        F.col("winnow_hash").isNotNull()
    )
    b = fp.select(F.col("doc_id").alias("doc_id_2"), F.col("winnow_hash").alias("__wh"))
    return (
        a.join(
            b,
            (F.col("winnow_hash") == F.col("__wh"))
            & (F.col("doc_id_1") < F.col("doc_id_2")),
        )
        .select("doc_id_1", "doc_id_2", "winnow_hash")
    )


# --------------------------------------------------------------------------
# centroid sums — the k-means/IVF-training primitive: element-wise
# cluster sums over quantized vectors (long form: one row per
# (cluster, dimension); centroid = sum_q / n_vectors)
# --------------------------------------------------------------------------
_CENTROID_ORACLE = """
WITH q AS (
  SELECT vec_id, vec_id % 8 AS cluster,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
  FROM embeddings)
SELECT cluster, i AS pos,
       CAST(SUM(CAST(v[i] AS BIGINT)) AS BIGINT) AS sum_q,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM q, unnest(generate_series(1, len(v))) AS u(i)
GROUP BY cluster, i
"""


@query("sim_centroid_sums", oracle=_CENTROID_ORACLE)
def sim_centroid_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "__cluster", F.col("vec_id") % 8
    )
    return sim.centroid_sums(emb).select(
        "cluster",
        F.col("pos").cast("bigint").alias("pos"),
        "sum_q",
        "n_vectors",
    )


# --------------------------------------------------------------------------
# repeated n-token spans — exact-substring dedup candidates (Lee et
# al. 2022 at cluster scale: rolling n-gram hashes instead of a
# single-machine suffix array)
# --------------------------------------------------------------------------
@query(
    "dedup_repeated_spans",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
        FROM toks WHERE len(t) >= 8),
sp AS (SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS span_hash FROM idx)
SELECT span_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
FROM sp GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
""",
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.repeated_spans(load(spark, sf_dir, "documents"), n=8, min_docs=2)


# --------------------------------------------------------------------------
# maximal duplicated-span extraction (the ExactSubstr removal step:
# merge consecutive duplicated n-gram positions into cut ranges)
# --------------------------------------------------------------------------
@query(
    "dedup_span_extract",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
        FROM toks WHERE len(t) >= 8),
sp AS (SELECT doc_id, i - 1 AS pos,
              md5(array_to_string(t[i:i+7], ' ')) AS span_hash FROM idx),
rep AS (SELECT span_hash FROM sp
        GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
dup AS (SELECT s.doc_id, s.pos FROM sp s JOIN rep r USING (span_hash)),
isl AS (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                 AS grp
        FROM dup)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) - MIN(pos) + 8 AS BIGINT) AS span_len_tokens
FROM isl GROUP BY doc_id, grp
""",
)
def dedup_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.duplicated_span_extract(
        load(spark, sf_dir, "documents"), n=8, min_docs=2
    )


# --------------------------------------------------------------------------
# bigram stupid-backoff LM quality scoring (integer-quantized
# probabilities; CCNet-style predictability signal)
# --------------------------------------------------------------------------
@query("text_lm_backoff", oracle=tx.lm_backoff_oracle_sql())
def text_lm_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.lm_backoff_score(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# hashed-feature linear quality scorer (fastText-filter shape; the
# deterministic weight table makes the score oracle-replayable)
# --------------------------------------------------------------------------
@query(
    "text_quality_classifier",
    oracle="""
WITH scored AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_transform(string_split(text, ' '),
           t -> CAST(('0x' || substr(md5(t), 1, 6)) AS BIGINT) % 4096 % 1001 - 500
         )) AS BIGINT) AS logit_sum
  FROM documents)
SELECT doc_id, n_tokens, logit_sum,
       CAST(logit_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_token_weight,
       logit_sum > 0 AS quality_label
FROM scored
""",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.quality_classifier(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# incremental batch-vs-corpus dedup — the production ingest shape:
# band-key index probe + exact verify, never all-pairs.  The split
# (doc_id % 5) stands in for "today's batch" vs "accepted corpus".
# --------------------------------------------------------------------------
_INCR_DEDUP_ORACLE = """
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
cands AS (SELECT DISTINCT a.doc_id AS new_doc_id, b.doc_id AS corpus_doc_id
          FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
          WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 != 0),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT c.new_doc_id, c.corpus_doc_id, CAST(COUNT(*) AS BIGINT) AS ni
          FROM cands c
          JOIN sh a ON a.doc_id = c.new_doc_id
          JOIN sh b ON b.doc_id = c.corpus_doc_id AND b.shingle = a.shingle
          GROUP BY 1, 2)
SELECT new_doc_id, corpus_doc_id, ni AS n_intersect,
       CAST(sa.n + sb.n - ni AS BIGINT) AS n_union,
       CAST(ni AS DOUBLE) / CAST(sa.n + sb.n - ni AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = new_doc_id
JOIN sizes sb ON sb.doc_id = corpus_doc_id
WHERE CAST(ni AS DOUBLE) / CAST(sa.n + sb.n - ni AS DOUBLE) >= CAST(0.5 AS DOUBLE)
"""


@query("dedup_incremental_batch", oracle=_INCR_DEDUP_ORACLE)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return dd.incremental_dedup(new, corpus, threshold=0.5)


# --------------------------------------------------------------------------
# per-document boilerplate load — fraction of a doc's spans repeated
# elsewhere in the corpus (the removal-policy signal over
# dedup_repeated_spans)
# --------------------------------------------------------------------------
@query(
    "dedup_span_dup_stats",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
        FROM toks WHERE len(t) >= 8),
sp AS (SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS span_hash FROM idx),
rep AS (SELECT span_hash FROM sp GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN rep.span_hash IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeated_spans,
       CAST(SUM(CASE WHEN rep.span_hash IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS repeated_frac
FROM sp LEFT JOIN rep ON sp.span_hash = rep.span_hash
GROUP BY doc_id
""",
)
def dedup_span_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.span_dup_stats(load(spark, sf_dir, "documents"), n=8, min_docs=2)


# --------------------------------------------------------------------------
# product-quantization codes — the IVF-PQ memory side: m codebook ids
# per vector + exact squared quantization error
# --------------------------------------------------------------------------
_PQ_ORACLE = """
WITH q AS (SELECT vec_id,
                  list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
sub AS (SELECT q.vec_id, js.j, q.v[js.j*16+1 : js.j*16+16] AS vj FROM q, js),
cent AS (SELECT q.vec_id AS cid, js.j, q.v[js.j*16+1 : js.j*16+16] AS cj
         FROM q, js WHERE q.vec_id % 50 = 0),
d AS (SELECT sub.vec_id, sub.j, cent.cid,
             list_sum(list_transform(generate_series(1, 16),
               i -> (sub.vj[i] - cent.cj[i]) * (sub.vj[i] - cent.cj[i]))) AS d2
      FROM sub JOIN cent ON sub.j = cent.j),
best AS (SELECT vec_id, j, cid, d2,
                ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rn
         FROM d)
SELECT vec_id,
       array_to_string(list(cid ORDER BY j), '|') AS codes,
       CAST(SUM(d2) AS DOUBLE) AS pq_err
FROM best WHERE rn = 1
GROUP BY vec_id
"""


def _serialize_codes(df: DataFrame) -> DataFrame:
    """Flatten the ``array<bigint>`` codes column to a '|'-joined
    string for the oracle gate: the driver canonicalizer sorts rows
    with pandas and cannot hash list cells.  ``pq_encode`` keeps its
    array return for API callers; only the gate surface serializes."""
    return df.withColumn(
        "codes",
        F.concat_ws("|", F.transform("codes", lambda c: c.cast("string"))),
    )


@query("sim_pq_codes", oracle=_PQ_ORACLE)
def sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _serialize_codes(
        sim.pq_encode(load(spark, sf_dir, "embeddings"), m=4, centroid_stride=50)
    )


# --------------------------------------------------------------------------
# PQ asymmetric-distance top-k — serving over codes: distance-table
# broadcast join + per-query window (exact queries, coded corpus)
# --------------------------------------------------------------------------
_PQ_ADC_ORACLE = """
WITH q AS (SELECT vec_id,
                  list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
sub AS (SELECT q.vec_id, js.j, q.v[js.j*16+1 : js.j*16+16] AS vj FROM q, js),
cent AS (SELECT q.vec_id AS cid, js.j, q.v[js.j*16+1 : js.j*16+16] AS cj
         FROM q, js WHERE q.vec_id % 50 = 0),
dists AS (SELECT sub.vec_id, sub.j, cent.cid,
             list_sum(list_transform(generate_series(1, 16),
               i -> (sub.vj[i] - cent.cj[i]) * (sub.vj[i] - cent.cj[i]))) AS d2
      FROM sub JOIN cent ON sub.j = cent.j),
codes AS (SELECT vec_id, j, cid FROM (
            SELECT vec_id, j, cid, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rn
            FROM dists) WHERE rn = 1),
dtab AS (SELECT d.vec_id AS query_id, d.j, d.cid, d.d2 FROM dists d WHERE d.vec_id < 10),
scored AS (SELECT dtab.query_id, codes.vec_id, CAST(SUM(dtab.d2) AS DOUBLE) AS adc_d2
           FROM codes JOIN dtab ON codes.j = dtab.j AND codes.cid = dtab.cid
           GROUP BY 1, 2),
ranked AS (SELECT query_id, vec_id, adc_d2,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY adc_d2, vec_id) AS BIGINT) AS rank
           FROM scored)
SELECT query_id, vec_id, adc_d2, rank FROM ranked WHERE rank <= 5
"""


@query("sim_pq_adc_topk", oracle=_PQ_ADC_ORACLE)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.pq_adc_topk(
        load(spark, sf_dir, "embeddings"),
        query_ids=range(10),
        k=5,
        m=4,
        centroid_stride=50,
    )


# --------------------------------------------------------------------------
# BLAS-path gates: identical semantics at a codebook size past the
# literal/Arrow crossover (k*d > 2000), so the driver oracle verifies
# the Arrow BLAS strategy itself, not only the literal plan the small
# fixtures pick.  The oracles are the same replays at stride 10.
# --------------------------------------------------------------------------
@query("sim_kmeans_blas", oracle=_KMEANS_ORACLE.replace("% 50", "% 10"))
def sim_kmeans_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass Lloyd at k=50 (stride 10): k*d = 3200 forces the
    Arrow-BLAS update/stats passes; the SQL oracle replays the exact
    same integer arithmetic."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.kmeans_lloyd(emb, stride=10, assign_passes=2)


@query("sim_pq_codes_blas", oracle=_PQ_ORACLE.replace("% 50", "% 10"))
def sim_pq_codes_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode with a 50-centroid codebook per subspace — past the
    crossover, so the Arrow path runs under the oracle."""
    return _serialize_codes(
        sim.pq_encode(load(spark, sf_dir, "embeddings"), m=4, centroid_stride=10)
    )


# --------------------------------------------------------------------------
# multi-round convergence gate: THREE assignment passes / TWO exact
# integer centroid updates at stride 10 — the Arrow-BLAS update path
# runs across several rounds toward the fixed point, not just one
# round trip.  The oracle replays both update rounds; because the
# arithmetic is an exact integer fixed point, early convergence on
# the Spark side is indistinguishable from the oracle's unconditional
# second update (a fixed-point update is the identity).
# --------------------------------------------------------------------------
_KMEANS3_ORACLE = """
WITH q AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM q),
c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % 10 = 0),
a0 AS (SELECT vec_id, cid FROM (
   SELECT n.vec_id, c0.cid,
          ROW_NUMBER() OVER (PARTITION BY n.vec_id
                             ORDER BY n.nrm + c0.cn - 2 * list_dot_product(n.v, c0.cv),
                                      c0.cid) AS rn
   FROM n CROSS JOIN c0) t WHERE rn = 1),
s0 AS (SELECT a0.cid, gs.d AS d,
              CAST(SUM(CAST(n.v[gs.d + 1] AS BIGINT)) AS BIGINT) AS s,
              CAST(COUNT(*) AS BIGINT) AS nm
       FROM a0 JOIN n USING (vec_id)
       CROSS JOIN generate_series(0, 63) AS gs(d)
       GROUP BY 1, 2),
u1 AS (SELECT cid, d,
              (2 * (s + 1000000 * nm) + nm) // (2 * nm) - 1000000 AS c
       FROM s0),
c1 AS (SELECT cid, list(CAST(c AS DOUBLE) ORDER BY d) AS cv FROM u1 GROUP BY cid),
c1n AS (SELECT cid, cv, list_dot_product(cv, cv) AS cn FROM c1),
a1 AS (SELECT vec_id, cid FROM (
   SELECT n.vec_id, c1n.cid,
          ROW_NUMBER() OVER (PARTITION BY n.vec_id
                             ORDER BY n.nrm + c1n.cn - 2 * list_dot_product(n.v, c1n.cv),
                                      c1n.cid) AS rn
   FROM n CROSS JOIN c1n) t WHERE rn = 1),
s1 AS (SELECT a1.cid, gs.d AS d,
              CAST(SUM(CAST(n.v[gs.d + 1] AS BIGINT)) AS BIGINT) AS s,
              CAST(COUNT(*) AS BIGINT) AS nm
       FROM a1 JOIN n USING (vec_id)
       CROSS JOIN generate_series(0, 63) AS gs(d)
       GROUP BY 1, 2),
u2 AS (SELECT cid, d,
              (2 * (s + 1000000 * nm) + nm) // (2 * nm) - 1000000 AS c
       FROM s1),
c2 AS (SELECT cid, list(CAST(c AS DOUBLE) ORDER BY d) AS cv FROM u2 GROUP BY cid),
c2n AS (SELECT cid, cv, list_dot_product(cv, cv) AS cn FROM c2),
a2 AS (SELECT vec_id, cid, d2 FROM (
   SELECT n.vec_id, c2n.cid,
          n.nrm + c2n.cn - 2 * list_dot_product(n.v, c2n.cv) AS d2,
          ROW_NUMBER() OVER (PARTITION BY n.vec_id
                             ORDER BY n.nrm + c2n.cn - 2 * list_dot_product(n.v, c2n.cv),
                                      c2n.cid) AS rn
   FROM n CROSS JOIN c2n) t WHERE rn = 1)
SELECT a2.cid AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(ANY_VALUE(c2n.cn) AS BIGINT) AS centroid_norm,
       CAST(SUM(a2.d2) AS BIGINT) AS inertia
FROM a2 JOIN c2n ON a2.cid = c2n.cid
GROUP BY 1
"""


@query("sim_kmeans_converged", oracle=_KMEANS3_ORACLE)
def sim_kmeans_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-pass Lloyd at stride 10: the BLAS update branch runs for
    multiple rounds; early fixed-point exit is exact-arithmetic
    equivalent to the oracle's unconditional two updates."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.kmeans_lloyd(emb, stride=10, assign_passes=3)


# --------------------------------------------------------------------------
# SemDeDup semantic-cluster dedup: cluster (stride centroids, argmin
# assignment), then mark vectors having a higher-similarity lower-id
# neighbor WITHIN their cluster — the published recipe for cutting
# embedding dedup from O(N²) to Σ|cluster|² (Abbas et al. 2023).
# --------------------------------------------------------------------------
_SEMANTIC_DEDUP_ORACLE = """
WITH q AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM q),
c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % 50 = 0),
a0 AS (SELECT vec_id, cid FROM (
   SELECT n.vec_id, c0.cid,
          ROW_NUMBER() OVER (PARTITION BY n.vec_id
                             ORDER BY n.nrm + c0.cn - 2 * list_dot_product(n.v, c0.cv),
                                      c0.cid) AS rn
   FROM n CROSS JOIN c0) t WHERE rn = 1),
v AS (SELECT a0.vec_id, a0.cid, n.v, n.nrm FROM a0 JOIN n USING (vec_id)),
dropped AS (SELECT DISTINCT y.vec_id
            FROM v x JOIN v y ON x.cid = y.cid AND x.vec_id < y.vec_id
            WHERE list_dot_product(x.v, y.v) / sqrt(x.nrm * y.nrm) >= 0.9)
SELECT v.vec_id, CAST(v.cid AS BIGINT) AS cid,
       v.vec_id NOT IN (SELECT vec_id FROM dropped) AS is_kept
FROM v
"""


@query("dedup_semantic_clusters", oracle=_SEMANTIC_DEDUP_ORACLE)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: stride-50 centroids, exact
    integer cosine within clusters at threshold 0.9; is_kept pins the
    deterministic keep-lowest-id policy the oracle replays."""
    return sim.semantic_cluster_dedup(
        load(spark, sf_dir, "embeddings"), threshold=0.9, centroid_stride=50
    )


_IVFPQ_ORACLE = """
WITH q AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM q),
cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % 50 = 0),
pairs AS (
  SELECT n.vec_id, cent.cid,
         n.nrm + cent.cn - 2 * list_dot_product(n.v, cent.cv) AS d2
  FROM n CROSS JOIN cent),
assign AS (
  SELECT vec_id AS neighbor_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM pairs) t WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM pairs WHERE vec_id < 10) t WHERE rn <= 3),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
sub AS (SELECT q.vec_id, js.j, q.v[js.j*16+1 : js.j*16+16] AS vj FROM q, js),
pqcent AS (SELECT q.vec_id AS pq_cid, js.j, q.v[js.j*16+1 : js.j*16+16] AS cj
           FROM q, js WHERE q.vec_id % 50 = 0),
dists AS (SELECT sub.vec_id, sub.j, pqcent.pq_cid,
             list_sum(list_transform(generate_series(1, 16),
               i -> (sub.vj[i] - pqcent.cj[i]) * (sub.vj[i] - pqcent.cj[i]))) AS d2
          FROM sub JOIN pqcent ON sub.j = pqcent.j),
codes AS (SELECT vec_id AS neighbor_id, j, pq_cid FROM (
            SELECT vec_id, j, pq_cid, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, pq_cid) AS rn
            FROM dists) WHERE rn = 1),
dtab AS (SELECT d.vec_id AS query_id, d.j, d.pq_cid, d.d2 FROM dists d WHERE d.vec_id < 10),
cand AS (
  SELECT p.query_id, a.neighbor_id FROM probes p
  JOIN assign a ON a.cid = p.cid
  WHERE a.neighbor_id <> p.query_id),
scored AS (
  SELECT c.query_id, c.neighbor_id, CAST(SUM(dt.d2) AS DOUBLE) AS adc_d2
  FROM cand c
  JOIN codes co ON co.neighbor_id = c.neighbor_id
  JOIN dtab dt ON dt.query_id = c.query_id AND dt.j = co.j AND dt.pq_cid = co.pq_cid
  GROUP BY 1, 2)
SELECT query_id, neighbor_id, adc_d2,
       CAST(rn AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_d2, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= 5
"""


@query("sim_ivfpq_topk", oracle=_IVFPQ_ORACLE)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ serving (FAISS-style): coarse lists route each query to
    nprobe inverted lists; ranking inside the probed lists is
    asymmetric-distance over PQ codes — m code bytes per candidate,
    never full vectors.  The oracle replays coarse routing AND the
    subspace quantization + ADC sums exactly (all integer
    arithmetic)."""
    return sim.ivfpq_topk(
        load(spark, sf_dir, "embeddings"),
        query_ids=range(10),
        k=5,
        centroid_stride=50,
        nprobe=3,
        m=4,
        pq_stride=50,
    )


# --------------------------------------------------------------------------
# similarity serving: SQ8 scalar quantization — per-dimension min/max
# calibration, 8-bit codes, row-local integer reconstruction (no
# codebook, no distance table).  The middle rung between raw floats
# and PQ on the serving-memory ladder; every stage is exact integer
# arithmetic, so codes, reconstructions, distances, and ranks replay
# bit-identically in the oracle.
# --------------------------------------------------------------------------
_SQ8_ORACLE = """
WITH q AS (SELECT vec_id, list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
           FROM embeddings),
per AS (SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
        FROM q, unnest(generate_series(1, 64)) AS g(i) GROUP BY i),
st AS (SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM per),
recon AS (
  SELECT vec_id,
         list_transform(generate_series(1, 64),
           i -> mn[i] + ((((v[i] - mn[i]) * 255) // GREATEST(mx[i] - mn[i], 1))
                         * (mx[i] - mn[i])) // 255) AS r
  FROM q, st),
qs AS (SELECT vec_id AS query_id, v AS qv FROM q WHERE vec_id < 10),
scored AS (
  SELECT query_id, rc.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(generate_series(1, 64),
              i -> (qv[i] - rc.r[i]) * (qv[i] - rc.r[i]))) AS BIGINT) AS sq8_d2
  FROM qs CROSS JOIN recon rc WHERE rc.vec_id <> query_id)
SELECT query_id, neighbor_id, sq8_d2, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sq8_d2, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= 5
"""


@query("sim_sq8_topk", oracle=_SQ8_ORACLE)
def sim_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 asymmetric top-k (operators/similarity.py sq8_encode /
    sq8_topk): calibration is one d-group min/max shuffle broadcast
    back as a single row; the corpus streams as 8-bit codes (d bytes
    per vector) reconstructed row-locally with two integer ops per
    dimension; the broadcast query block scores against it with no
    corpus shuffle — only the per-query top-k window moves rows."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.sq8_topk(emb, query_ids=range(10), k=5)


# --------------------------------------------------------------------------
# text: BPE merge LEARNING — the tokenizer-training operator.  One
# corpus shuffle (word histogram), then k vocabulary-sized iterations;
# greedy-left merge semantics replay declaratively (gaps-and-islands)
# so the learned merge table is bit-exact against the unrolled oracle.
# --------------------------------------------------------------------------
@query("text_bpe_learn", oracle=tx.bpe_learn_oracle_sql(8))
def text_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 8 BPE merges from the documents corpus
    (operators/text.py bpe_learn): the merge table (step, pair,
    count) a tokenizer trainer ships.  Corpus-sized work is ONE
    map-side-combined word-histogram shuffle; each iteration's pair
    count + argmax + merge application runs on the vocab-sized symbol
    state, materialized per step so the plan stays flat.  Tie-breaks
    on (count DESC, left, right) make every step deterministic; the
    DuckDB twin unrolls the same stage SQL with MATERIALIZED CTEs."""
    return tx.bpe_learn(load(spark, sf_dir, "documents"), k=8)


# --------------------------------------------------------------------------
# text: unigram-LM tokenizer training (round 12) — the SentencePiece-
# family counterpart to the BPE learner: substring seed inventory,
# integer-quantized log2 likelihoods, two Viterbi hard-EM rounds with
# a prune in between.  The cut-set-bitmask cost encoding makes every
# word's optimal segmentation UNIQUE, so expected counts extract from
# prefix+suffix DPs without backpointers and the whole trajectory
# replays bit-exactly against the unrolled ~70-CTE oracle.
# --------------------------------------------------------------------------
@query("text_unigram_lm_train", oracle=tx.unigram_lm_oracle_sql())
def text_unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the unigram-LM tokenizer on the documents corpus
    (operators/text.py unigram_lm_train): seed -> E -> M -> prune ->
    E -> M, emitting the final vocabulary (piece, piece_len, cnt,
    neg_logprob_q).  Corpus-sized work is ONE word-histogram shuffle;
    each E-step is a single narrow projection over the distinct-word
    cache with the vocabulary broadcast as a map literal (the per-
    word Viterbi runs JVM-side inside one aggregate() expression) +
    one vocab-sized groupBy.  Driver state is vocab-sized, like
    k-means centroids and the BPE merge table."""
    return tx.unigram_lm_train(load(spark, sf_dir, "documents"))


@query("text_unigram_tokenize", oracle=tx.unigram_tokenize_oracle_sql())
def text_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram-LM SERVING path (round 12 — the train→tokenize
    composition, the counterpart of text_bpe_tokenize): train the
    vocabulary, segment the distinct-word cache under the FINAL
    quantized scores (a third Viterbi pass), and join the per-word
    segmentation onto the documents — per-document piece totals, the
    numbers a training pipeline's packer/budgeter consumes.  Serving
    adds one narrow E-step projection + one word-key join (cache
    broadcast by AQE) + one doc-key groupBy on top of training; the
    whole trajectory replays bit-exactly against the extended
    unrolled oracle (a third dp/sp chain + the document join)."""
    return tx.unigram_tokenize(load(spark, sf_dir, "documents"))


def _tokenizer_compare_oracle() -> str:
    """Both trained-tokenizer chains over ONE corpus in one query:
    the unrolled BPE learn+segment stages (s4 = the final word
    segmentation) and the unrolled unigram trainer+serve chain (pc =
    per-doc piece counts, spliced via parts_only — the CTE name sets
    are disjoint, verified), joined per document."""
    bpe_parts = "\n".join(tx._bpe_oracle_ctes(4))
    ulm_parts = tx.unigram_lm_oracle_sql(serve=True, parts_only=True)
    return bpe_parts + ulm_parts + """
,docwords AS (
  SELECT doc_id, t AS word
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
  WHERE t <> '')
,bpc AS (
  SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(len(s.syms)) AS BIGINT) AS bpe_pieces
  FROM docwords d JOIN s4 s ON d.word = s.word GROUP BY 1)
SELECT b.doc_id, b.n_words, b.bpe_pieces,
       pc.n_pieces AS ulm_pieces,
       CAST(1000000 * pc.n_pieces // b.bpe_pieces AS BIGINT)
       AS ulm_per_bpe_q
FROM bpc b JOIN pc ON b.doc_id = pc.doc_id
ORDER BY b.doc_id
"""


@query("text_tokenizer_compare", oracle=_tokenizer_compare_oracle())
def text_tokenizer_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer EVALUATION (round 13): train BOTH tokenizer families
    the repo carries — BPE (greedy-merge, text_bpe_tokenize) and
    unigram-LM (Viterbi-EM, text_unigram_tokenize) — on the same
    corpus and emit the per-document comparison table a tokenizer
    selection would read: word count, piece count under each family,
    and the integer-quantized ULM/BPE piece ratio.  Both serving
    paths are the distinct-word-cache join shape, so the comparison
    costs two trainings plus two word-key joins — corpus touched
    once per family.  The oracle runs both unrolled chains (disjoint
    CTE namespaces) in one query; everything is BIGINT, so the
    comparison replays bit-exactly.  Documents whose words all
    exceed the unigram max_word (none in this corpus family) would
    drop from the inner join on both sides identically."""
    from pyspark import StorageLevel

    docs = load(spark, sf_dir, "documents")
    # ONE shared word histogram for both trainer families
    # (optimization round 14): each trainer otherwise re-tokenizes
    # the identical corpus into its own (word, cnt) table.  Both
    # eager training phases (merge collects, vocab E-steps, the
    # persisted/checkpointed segmentation caches) complete inside
    # the two calls below, so the histogram unpersists before the
    # lazy doc-side joins run — those read the trainers' own caches.
    try:
        target = spark.sparkContext.defaultParallelism
        wsrc = docs if docs.rdd.getNumPartitions() >= target else (
            docs.repartition(target)
        )
    except Exception:
        wsrc = docs
    wh = (
        wsrc.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        bpe = tx.bpe_tokenize_stats(docs, words=wh).select(
            "doc_id", "n_words",
            F.col("n_pieces").alias("bpe_pieces"),
        )
        ulm = tx.unigram_tokenize(docs, words_hist=wh).select(
            "doc_id", F.col("n_pieces").alias("ulm_pieces")
        )
    finally:
        wh.unpersist()
    return bpe.join(ulm, "doc_id").select(
        "doc_id", "n_words", "bpe_pieces", "ulm_pieces",
        F.expr(
            "CAST(1000000 * ulm_pieces DIV bpe_pieces AS BIGINT)"
        ).alias("ulm_per_bpe_q"),
    )


# --------------------------------------------------------------------------
# similarity serving: binary quantization — the 1-bit rung of the
# quantization ladder (32x compression): popcount Hamming shortlist
# over packed sign words, exact integer-cosine rerank of the
# shortlist.  Sign packing, hamming, shortlist, and rerank all replay
# bit-exactly (the packed halves are plain BIGINT sums).
# --------------------------------------------------------------------------
_BQ_ORACLE = """
WITH q AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM q),
sig AS (SELECT vec_id,
  CAST(list_sum(list_transform(generate_series(1, 32),
       i -> CASE WHEN v[i] > 0 THEN CAST(1 AS BIGINT) << (i - 1)
            ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS lo,
  CAST(list_sum(list_transform(generate_series(33, 64),
       i -> CASE WHEN v[i] > 0 THEN CAST(1 AS BIGINT) << (i - 33)
            ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS hi
  FROM q),
qs AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM sig WHERE vec_id < 10),
ham AS (
  SELECT query_id, s.vec_id AS neighbor_id,
         CAST(bit_count(xor(s.lo, qlo)) + bit_count(xor(s.hi, qhi)) AS BIGINT)
           AS hamming
  FROM qs CROSS JOIN sig s WHERE s.vec_id <> query_id),
short AS (
  SELECT query_id, neighbor_id, hamming FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY hamming, neighbor_id) AS sr
    FROM ham) t WHERE sr <= 20),
scored AS (
  SELECT c.query_id, c.neighbor_id, c.hamming,
         list_dot_product(qv.v, nv.v) / sqrt(qv.nrm * nv.nrm) AS cosine_sim
  FROM short c
  JOIN n qv ON qv.vec_id = c.query_id
  JOIN n nv ON nv.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, hamming, cosine_sim, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= 5
"""


@query("sim_bq_hamming_topk", oracle=_BQ_ORACLE)
def sim_bq_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized serving (operators/similarity.py bq_encode /
    bq_hamming_topk): 64 sign bits per vector in two 32-bit halves
    (8 bytes — 32x under float32), Hamming shortlist by
    whole-stage-codegen popcount with NO corpus shuffle, exact
    integer-cosine rerank confined to ≤ 20 rows per query."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.bq_hamming_topk(emb, query_ids=range(10), k=5, shortlist=20)


# --------------------------------------------------------------------------
# kNN-vote classifier served from the BQ index — the embedding-
# classifier quality filter (the DCLM/fastText-filter upgrade):
# labeled seed set, Hamming top-k neighbor vote, all-integer
# --------------------------------------------------------------------------
_KNN_ORACLE = """
WITH q AS (SELECT vec_id, label,
                  list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
sig AS (SELECT vec_id, label,
  CAST(list_sum(list_transform(generate_series(1, 32),
       i -> CASE WHEN v[i] > 0 THEN CAST(1 AS BIGINT) << (i - 1)
            ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS lo,
  CAST(list_sum(list_transform(generate_series(33, 64),
       i -> CASE WHEN v[i] > 0 THEN CAST(1 AS BIGINT) << (i - 33)
            ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS hi
  FROM q),
qs AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM sig
       WHERE vec_id % 5 = 0 AND vec_id < 50),
ham AS (
  SELECT query_id, s.vec_id AS neighbor_id, CAST(s.label AS BIGINT) AS label,
         CAST(bit_count(xor(s.lo, qlo)) + bit_count(xor(s.hi, qhi)) AS BIGINT)
           AS hamming
  FROM qs CROSS JOIN sig s WHERE s.vec_id % 5 <> 0),
topk AS (
  SELECT query_id, label, hamming FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY hamming, neighbor_id) AS r
    FROM ham) t WHERE r <= 5),
votes AS (
  SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS votes,
         MIN(hamming) AS best_hamming
  FROM topk GROUP BY 1, 2)
SELECT query_id, label AS pred_label, votes, best_hamming
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY votes DESC, best_hamming, label) AS vr
      FROM votes) t
WHERE vr = 1
"""


@query("text_knn_classifier", oracle=_KNN_ORACLE)
def text_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-vote document classifier (operators/similarity.py
    knn_classify): the fixture's labeled vectors where
    vec_id % 5 ≠ 0 are the seed set; the ten vec_id % 5 = 0,
    vec_id < 50 vectors are classified by majority vote of their 5
    Hamming-nearest seeds over the packed BQ sign codes.  Everything
    is integer — popcounts, vote counts, (votes DESC, best_hamming,
    label) ties — so predictions replay bit-for-bit in DuckDB.  At
    scale the seed codes+labels broadcast and the corpus classifies
    map-side: zero corpus shuffles, the ann-route serving plan."""
    emb = load(spark, sf_dir, "embeddings")
    seeds = emb.filter("vec_id % 5 != 0").select(
        "vec_id", F.col("label").cast("bigint").alias("label")
    )
    return sim.knn_classify(emb, seeds, query_ids=range(0, 50, 5), k=5)


@query("sim_knn_classify_auto", oracle=_KNN_ORACLE)
def sim_knn_classify_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-routing kNN serve (operators/similarity.py
    knn_classify_auto): size-probes |seeds| × |queries| and stays on
    the recall-1.0 brute-force plan below the measured boundary —
    which the fixture is, so this gate must be BIT-IDENTICAL to
    text_knn_classifier (same oracle).  Past the boundary the serve
    flips to banded-Hamming candidate generation (pigeonhole-exact
    within Hamming ≤ bands-1); the route flip and the banded path's
    agreement contract are pinned by tests/test_similarity_paths.py,
    the sim_neardup size-probe shape."""
    emb = load(spark, sf_dir, "embeddings")
    seeds = emb.filter("vec_id % 5 != 0").select(
        "vec_id", F.col("label").cast("bigint").alias("label")
    )
    return sim.knn_classify_auto(emb, seeds, query_ids=range(0, 50, 5), k=5)


# --------------------------------------------------------------------------
# BPE tokenizer train -> apply composition (distinct-word cache)
# --------------------------------------------------------------------------
@query("text_bpe_tokenize", oracle=tx.bpe_tokenize_oracle_sql(4))
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.bpe_tokenize_stats(load(spark, sf_dir, "documents"), k=4)


# --------------------------------------------------------------------------
# vocabulary-growth (Heaps'-law) curve — is the corpus still adding
# new token types, or repeating itself?
# --------------------------------------------------------------------------
_VOCAB_GROWTH_ORACLE = """
WITH toks AS (
  SELECT doc_id AS d, t AS token
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
  WHERE t <> ''),
mx AS (SELECT MAX(d) AS m FROM toks),
firstseen AS (SELECT token, MIN(d) AS d FROM toks GROUP BY token),
first AS (
  SELECT CAST((d * 20) // (m + 1) AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS new_types
  FROM firstseen, mx
  GROUP BY 1),
volume AS (
  SELECT CAST((d * 20) // (m + 1) AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM toks, mx GROUP BY 1)
SELECT v.bucket,
       CAST(COALESCE(f.new_types, 0) AS BIGINT) AS new_types,
       CAST(SUM(COALESCE(f.new_types, 0)) OVER
            (ORDER BY v.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_types,
       v.n_tokens,
       CAST(SUM(v.n_tokens) OVER
            (ORDER BY v.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_tokens
FROM volume v LEFT JOIN first f ON v.bucket = f.bucket
"""


@query("text_vocab_growth", oracle=_VOCAB_GROWTH_ORACLE)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law diagnostic over 20 ingest slices: new token types per
    slice (per-token MIN(doc_id) first-sight, one map-side-combined
    groupBy) vs cumulative token volume; window work is
    buckets-sized."""
    return tx.vocab_growth(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# exact-substring trim — the removal step APPLIED (cut every maximal
# duplicated span, witness the trimmed corpus by md5)
# --------------------------------------------------------------------------
@query(
    "dedup_span_trim",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
        FROM toks WHERE len(t) >= 8),
sp AS (SELECT doc_id, i - 1 AS pos,
              md5(array_to_string(t[i:i+7], ' ')) AS span_hash FROM idx),
rep AS (SELECT span_hash FROM sp
        GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
dup AS (SELECT s.doc_id, s.pos FROM sp s JOIN rep r USING (span_hash)),
isl AS (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                 AS grp
        FROM dup),
cuts AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) - MIN(pos) + 8 AS l
         FROM isl GROUP BY doc_id, grp),
cutpos AS (SELECT doc_id, unnest(generate_series(s, s + l - 1)) AS p
           FROM cuts),
tok AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
        FROM toks),
kept AS (SELECT tok.doc_id, tok.i, tok.t[tok.i] AS w
         FROM tok LEFT JOIN cutpos c
           ON tok.doc_id = c.doc_id AND tok.i - 1 = c.p
         WHERE c.p IS NULL),
agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               md5(string_agg(w, ' ' ORDER BY i)) AS h
        FROM kept GROUP BY doc_id)
SELECT toks.doc_id,
       CAST(len(toks.t) AS BIGINT) AS n_tokens,
       COALESCE(agg.n_kept, 0) AS n_kept,
       CAST(len(toks.t) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_cut,
       COALESCE(agg.h, md5('')) AS trimmed_md5
FROM toks LEFT JOIN agg USING (doc_id)
""",
)
def dedup_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup END-TO-END (Lee et al. 2022): extract maximal
    duplicated-span cut lists, then actually trim them out of every
    document — exact kept/cut token counts plus an md5 witness of each
    trimmed document, so the oracle re-derives the entire removal
    (spans → islands → cut ranges → token filter → reassembled text)
    independently."""
    return dd.exact_substring_trim(
        load(spark, sf_dir, "documents"), n=8, min_docs=2
    )


# --------------------------------------------------------------------------
# quality-classifier TRAINING: quantized logistic regression by
# full-batch GD over hashed features, distilling the deterministic
# teacher the serving path (text_quality_classifier) already scores.
# The Spark side runs the real iterative loop (persisted compact
# feature frame; per-iteration one narrow scoring map + one
# map-side-combined gradient aggregate to <=1025 rows); the oracle
# unrolls the identical integer GD as a MATERIALIZED-CTE chain.
# --------------------------------------------------------------------------
from ..operators import training as tr  # noqa: E402


@query("text_lr_train", oracle=tr.lr_unrolled_oracle_sql())
def text_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tr.lr_train_score(load(spark, sf_dir, "documents"))


_GOPHER_SPARK_LABEL, _GOPHER_DUCK_LABEL = tr.gopher_label_exprs()


@query(
    "text_lr_train_gopher",
    oracle=tr.lr_unrolled_oracle_sql(label_sql=_GOPHER_DUCK_LABEL),
)
def text_lr_train_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trainer on a NON-DISTILLATION target: the Gopher §A1.1
    combined verdict — computed from the text, so it is learnable,
    but built from ratio thresholds, so the hashed-count feature
    space cannot represent it exactly: the honest-classifier regime
    (text_lr_train's teacher is linear in the features by
    construction).  Same fixed-point GD loop, still replayed
    bit-for-bit by the unrolled DuckDB oracle — the weights and every
    per-doc score are exact; only the CONTRACT changes: a pinned
    accuracy floor + confusion counts (tests/test_training.py)
    instead of teacher equality.  Target selection was measured, not
    assumed: the fixture's ``lang`` column is metadata uncorrelated
    with the synthetic token stream (a fit on it converges to the
    majority class — Bayes = majority), while the Gopher verdict on
    this corpus is driven by the stopword gate and fits to 0.952 vs
    the 0.776 majority baseline once class balancing is symmetric."""
    return tr.lr_train_score(
        load(spark, sf_dir, "documents"), label_expr=_GOPHER_SPARK_LABEL
    )


# --------------------------------------------------------------------------
# HTML-to-text extraction front door: deterministic synthetic pages
# built from the documents corpus (nav/script/style/ad/footer
# furniture around real paragraph content), then the density-based
# boilerplate-strip cascade — both stages pure string algebra shared
# with the oracle through per-dialect expression builders.
# --------------------------------------------------------------------------
from ..operators import extraction as ex  # noqa: E402


def _html_extract_oracle() -> str:
    e = ex.html_extract_expr("html", "duckdb")
    synth = ex.synth_html_expr("text", "doc_id", "duckdb")
    return f"""
WITH pages AS (SELECT doc_id, {synth} AS html FROM documents)
SELECT doc_id,
       CAST(len({e['blocks']}) AS BIGINT) AS n_blocks,
       CAST(len({e['kept']}) AS BIGINT) AS n_kept,
       CAST(length({e['extracted']}) AS BIGINT) AS extracted_len,
       {e['extracted']} AS extracted
FROM pages
"""


@query("text_html_extract", oracle=_html_extract_oracle())
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.expr(ex.synth_html_expr("text", "doc_id", "spark")).alias("html"),
    )
    return ex.html_extract(pages)


def _html_extract_dirty_oracle() -> str:
    e = ex.html_extract_expr("html", "duckdb", dirty=True)
    synth = ex.synth_html_dirty_expr("text", "doc_id", "duckdb")
    return f"""
WITH pages AS (SELECT doc_id, {synth} AS html FROM documents)
SELECT doc_id,
       CAST(len({e['blocks']}) AS BIGINT) AS n_blocks,
       CAST(len({e['kept']}) AS BIGINT) AS n_kept,
       CAST(length({e['extracted']}) AS BIGINT) AS extracted_len,
       {e['extracted']} AS extracted
FROM pages
"""


@query("text_html_extract_dirty", oracle=_html_extract_dirty_oracle())
def text_html_extract_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hardened extraction over the MESSY fixture grammar
    (synth_html_dirty_expr): quoted-``>`` attributes, unclosed and
    mis-nested tags, body-level CDATA, general numeric character
    references (decimal / hex / supra-BMP surrogate pair / invalid
    surrogate left literal / ``&amp;#NN;`` staying literal), and
    odd-doc pages truncated mid-tag — all replayed bit-for-bit by the
    DuckDB oracle through the same dual-dialect expression builders.
    Still ONE shuffle-free JVM projection per document, zero UDFs."""
    docs = load(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.expr(
            ex.synth_html_dirty_expr("text", "doc_id", "spark")
        ).alias("html"),
    )
    return ex.html_extract(pages, dirty=True)
