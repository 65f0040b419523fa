"""Text-analysis operators for training-data pipelines: token
statistics, quality scoring, language identification (stopword
heuristic), and document fingerprinting.

All expressions are JVM-side builtin functions (whole-stage codegen;
no Python UDFs in the hot path) and every score is derived from exact
integer counts so results are engine-portable for oracle checks.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword language
#: heuristic (deterministic, oracle-portable).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "los", "y", "es", "un"],
}


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def n_tokens_col(text_col: str) -> Column:
    """Whitespace token count, explicitly NULL for NULL text.

    ``F.size`` on a NULL array returns NULL under the default
    ``spark.sql.legacy.sizeOfNull=false`` but -1 under the legacy
    setting; the explicit guard makes the oracle-matching NULL
    independent of session config."""
    return F.when(
        F.col(text_col).isNull(), F.lit(None).cast("bigint")
    ).otherwise(F.size(_tokens(text_col)).cast("bigint"))


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token statistics + a deterministic quality score:
    ``unique_token_ratio * min(1, n_tokens/50)`` — favors longer,
    less-repetitive documents (exact-int inputs → portable doubles)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks).cast("bigint")
    n_unique = F.size(F.array_distinct(toks)).cast("bigint")
    n_chars = F.length(F.col(text_col)).cast("bigint")
    n_nonspace = F.length(F.regexp_replace(F.col(text_col), " ", "")).cast("bigint")
    return df.select(
        id_col,
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique_tokens"),
        n_nonspace.alias("n_nonspace_chars"),
        (n_nonspace.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
        (
            (n_unique.cast("double") / n_tokens.cast("double"))
            * F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(50.0))
        ).alias("quality_score"),
    )


def _stopword_score(text_col: str, words: list[str]) -> Column:
    arr = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter(split({text_col}, ' '), x -> array_contains(array({arr}), x)))"
    ).cast("bigint")


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-count language heuristic with deterministic argmax
    (priority order en > de > es on ties; 'unknown' when no signal)."""
    s_en = _stopword_score(text_col, STOPWORDS["en"])
    s_de = _stopword_score(text_col, STOPWORDS["de"])
    s_es = _stopword_score(text_col, STOPWORDS["es"])
    predicted = (
        F.when((s_en >= F.greatest(s_de, s_es)) & (s_en > 0), "en")
        .when((s_de >= s_es) & (s_de > 0), "de")
        .when(s_es > 0, "es")
        .otherwise("unknown")
    )
    return df.select(
        id_col,
        s_en.alias("score_en"),
        s_de.alias("score_de"),
        s_es.alias("score_es"),
        predicted.alias("predicted_lang"),
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Two md5 document fingerprints: raw normalized content, and the
    order-insensitive sorted-unique-token 'bag' fingerprint (catches
    shuffled near-duplicates)."""
    toks = _tokens(text_col)
    return df.select(
        id_col,
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("content_hash"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias(
            "bag_fingerprint"
        ),
    )


#: BPE-style pretokenizer regex (GPT-2 family shape, ASCII classes,
#: no lookahead — portable between Java regex and RE2): contraction
#: suffixes, space-prefixed letter runs, digit runs, punctuation runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"

#: rolling-hash parameters (Rabin-Karp): base 257, Mersenne-ish
#: modulus 2^31-1.  All intermediates < 2^40 — exact in BIGINT.
ROLL_BASE = 257
ROLL_MOD = 2147483647
_HEX = "0123456789abcdef"


def _tokval_expr(tok: str) -> str:
    """24-bit integer from a token's first 6 md5 nibbles — the same
    engine-portable nibble-parse trick as SimHash (no engine-specific
    string→int conversion needed)."""
    parts = " + ".join(
        f"(instr('{_HEX}', substr(md5({tok}), {i + 1}, 1)) - 1) * {16 ** i}"
        for i in range(6)
    )
    return f"CAST({parts} AS BIGINT)"


def bpe_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace vs BPE-pretokenizer token counts per document.

    The BPE count approximates LLM token cost far better than
    whitespace words (punctuation and contractions split); the
    ratio is the standard tokens-per-word calibration factor."""
    n_bpe = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0))
    ).cast("bigint")
    n_ws = F.size(_tokens(text_col)).cast("bigint")
    return df.select(
        id_col,
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (n_bpe.cast("double") / n_ws.cast("double")).alias("tokens_per_word"),
    )


def rolling_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Rabin-Karp rolling-hash fingerprints over the token sequence:

    - ``seq_hash``: polynomial hash of the WHOLE sequence — order-
      sensitive (the bag fingerprint misses reordered plagiarism).
    - ``winnow_hash``: min over all k-gram rolling hashes — the
      winnowing fingerprint; shared k-grams give shared candidates
      even under truncation/insertion.  NULL for docs shorter than k.

    Everything is builtin JVM expressions (higher-order functions);
    one pass over the corpus, no shuffle at all.

    The token-value array is materialized into a column FIRST: inlining
    it into the window lambda makes Catalyst re-evaluate the md5 chain
    for every window position — O(n²) hash calls per document instead
    of O(n) (measured 20× slower).
    """
    tv = _tokval_expr("t")
    kv = df.select(
        id_col,
        F.expr(f"transform(split({text_col}, ' '), t -> {tv})").alias("__kv"),
    )
    seq = (
        f"aggregate(__kv, CAST(0 AS BIGINT),"
        f" (acc, x) -> (acc * {ROLL_BASE} + x) % {ROLL_MOD})"
    )
    kgram = (
        f"CASE WHEN size(__kv) >= {k} THEN "
        f"array_min(transform(sequence(1, size(__kv) - {k - 1}),"
        f" i -> aggregate(slice(__kv, i, {k}), CAST(0 AS BIGINT),"
        f" (acc, x) -> (acc * {ROLL_BASE} + x) % {ROLL_MOD}))) END"
    )
    return kv.select(
        id_col,
        F.expr(seq).alias("seq_hash"),
        F.expr(kgram).alias("winnow_hash"),
    )


def term_counts_rle(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document (token, tf) pairs computed ENTIRELY map-side: the
    token array is sorted in-row, run starts are one O(n) ``filter``
    pass, and each run's length is the gap to the next start — so the
    exploded output is already aggregated and the corpus never pays a
    (doc, token) shuffle just to count within-document occurrences
    (the repetition-stats lesson applied to TF).  Each (doc, token)
    appears exactly once, which also makes downstream document
    frequency a plain ``count(*)`` with map-side partial aggregation
    instead of a two-phase ``countDistinct``."""
    pairs = (
        "transform(sequence(0, size(__st) - 1), k -> named_struct("
        "'token', __s[__st[k]], "
        "'tf', CAST(IF(k = size(__st) - 1, size(__s), __st[k + 1]) - __st[k] AS BIGINT)))"
    )
    return (
        df.select(
            id_col, F.expr(f"array_sort(split({text_col}, ' '))").alias("__s")
        )
        .select(
            id_col,
            "__s",
            F.expr(
                "filter(sequence(0, size(__s) - 1),"
                " i -> i = 0 OR __s[i] != __s[i - 1])"
            ).alias("__st"),
        )
        .select(id_col, F.explode(F.expr(pairs)).alias("__p"))
        .select(id_col, F.col("__p.token").alias("token"), F.col("__p.tf").alias("tf"))
    )


def tfidf_topterms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
) -> DataFrame:
    """Top-N distinguishing terms per document by the rational
    relevance score tf·N/df (TF-IDF ordering without the log —
    monotone in the same ranking for fixed tf, exactly portable:
    integer products, one IEEE division).

    Shuffle budget after the map-side-RLE rewrite: ONE shuffle on
    token (the tf⋈df join; document frequency is a map-side-combined
    count over the already-unique (doc, token) stream and lands on the
    same key) and ONE window shuffle on doc — the third shuffle the
    naive explode→groupBy plan pays for within-document counting is
    gone."""
    from pyspark.sql.window import Window

    tf = term_counts_rle(df, text_col, id_col)
    docfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "token")
    return (
        tf.join(docfreq, "token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_docs")).cast("double")
            / F.col("df").cast("double"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "token", "score", "rank")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """BM25 top-k retrieval WITHOUT an index — the full-text search
    counterpart of the ANN serving family: given a bag of query
    terms, return the k best documents under a quantized, log-free
    BM25 (k1 = 6/5, b = 3/4).

    Scoring contract (exact integer arithmetic, like the engine's
    other quantized scores — PageRank's rank_q, the integer-cents
    MAD, integer-dB PSNR): with N docs, AV total tokens, per-doc
    length dl and per-(doc, term) frequency tf,

      idf ratio     (2(N − df) + 1) / (2df + 1)      — the Robertson
                    idf with the log dropped, monotone in df exactly
                    like tfidf_topterms' rational relevance score
      tf saturation 22·tf·AV / (10·AV·tf + 3·AV + 9·dl·N)
                    — tf·(k1+1) / (tf + k1(1 − b + b·dl/avgdl))
                    cross-multiplied to integers (avgdl = AV/N)
      score_q       Σ_t (scale · idf_num · 22 · tf · AV)
                        DIV (idf_den · (10·AV·tf + 3·AV + 9·dl·N))

    Every product and the floor division are exact, and the sum is a
    BIGINT sum — no float-order sensitivity, so the DuckDB twin
    replays bit-for-bit.  Intermediates are DECIMAL(38,0): products
    stay under 10³⁸ out to billions of documents.

    Plan shape at 100 TB: tf for each query term is a ROW-LOCAL
    higher-order ``filter`` count over the split token array, so the
    whole search is TWO shuffle-free narrow passes over the corpus —
    one reducing to the ONE global-stats row (N, AV, per-term df),
    one scoring against that row broadcast back — and the top-k is
    ORDER BY + LIMIT, which Spark executes as TakeOrderedAndProject
    (per-partition heaps, no global sort).  Searching q terms costs
    those two scans regardless of corpus size — the no-index
    brute-force baseline, exactly like sim_cosine_topk is to the IVF
    ladder.  (The pre-built inverted index — bm25_index /
    bm25_query_topk — is the serving upgrade that drops per-query
    cost to the posting lists.)

    Duplicate query terms are ignored (a query is a term SET — the
    same contract as the serving path).
    """
    from pyspark.sql.window import Window

    query_terms = list(dict.fromkeys(query_terms))
    toks = f"filter(split({text_col}, ' '), x -> x <> '')"
    cols = [
        F.col(id_col),
        F.expr(f"size({toks})").cast("bigint").alias("__dl"),
    ]
    for i, t in enumerate(query_terms):
        tq = t.replace("'", "''")
        cols.append(
            F.expr(f"size(filter({toks}, x -> x = '{tq}'))")
            .cast("bigint")
            .alias(f"__tf{i}")
        )
    sel = df.select(*cols)
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__dl").cast("bigint").alias("__av"),
    ]
    for i in range(len(query_terms)):
        aggs.append(
            F.sum((F.col(f"__tf{i}") > 0).cast("bigint"))
            .cast("bigint")
            .alias(f"__df{i}")
        )
    glob = sel.agg(*aggs)
    parts = []
    for i in range(len(query_terms)):
        tf, dfq = f"__tf{i}", f"__df{i}"
        num = (
            f"CAST({scale} AS DECIMAL(38,0))"
            f" * (2 * (__n - {dfq}) + 1) * 22 * {tf} * __av"
        )
        den = (
            f"CAST(2 * {dfq} + 1 AS DECIMAL(38,0))"
            f" * (10 * __av * {tf} + 3 * __av + 9 * __dl * __n)"
        )
        parts.append(f"IF({tf} > 0, ({num}) DIV ({den}), CAST(0 AS BIGINT))")
    score = " + ".join(parts) if parts else "CAST(0 AS BIGINT)"
    w = Window.orderBy(F.desc("score_q"), F.asc(id_col))
    return (
        sel.join(F.broadcast(glob))
        .select(
            id_col, F.expr(score).cast("bigint").alias("score_q")
        )
        .filter(F.col("score_q") > 0)
        .orderBy(F.desc("score_q"), F.asc(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def bm25_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the inverted-index state for BM25 SERVING: returns
    (postings, term_stats, global_stats) —

    - postings (term, doc_id, tf, dl): the inverted index, ONE
      map-side-combined shuffle on (doc, term) via the RLE counter
      then a narrow reshape; the document length rides INSIDE each
      posting row (the Lucene norm trick) so serving a query never
      touches the corpus again; at scale this is written bucketed by
      term so query probes prune to one bucket,
    - term_stats (term, df): document frequencies, derived from the
      postings with a map-side-combined count,
    - global_stats (n, av): one row.

    ``bm25_query_topk`` probes this state with a broadcast term list
    — per-query cost is proportional to the query terms' posting
    lists, not the corpus: the serving shape, vs ``bm25_topk``'s
    one-shot full scan.  Same quantized scoring contract, so the two
    plans agree bit-for-bit (contract-tested)."""
    toks = f"filter(split({text_col}, ' '), x -> x <> '')"
    dl = df.select(
        F.col(id_col), F.expr(f"size({toks})").cast("bigint").alias("dl")
    )
    postings = (
        term_counts_rle(df, text_col, id_col)
        .select(
            F.col("token").alias("term"),
            id_col,
            F.col("tf").cast("bigint"),
        )
        .join(dl, id_col)
    )
    term_stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    global_stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("av"),
    )
    return postings, term_stats, global_stats


def bm25_query_topk(
    df: DataFrame,
    postings: DataFrame,
    term_stats: DataFrame,
    global_stats: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Serve one BM25 query from the prebuilt inverted index: the
    query terms broadcast against the postings (a broadcast hash
    semi-probe — only the matching posting rows survive the scan;
    with term-bucketed postings the scan itself prunes), document
    lengths ride inside the posting rows, and the same quantized
    scoring contract as ``bm25_topk`` produces the identical top-k
    bit-for-bit.  Per-query work is O(Σ posting-list lengths), not
    O(corpus) — the corpus itself is NEVER rescanned at query time:
    one index build amortized across every query, exactly like
    ivf/pq serving vs brute-force cosine.  (``df`` is accepted only
    for the session handle / API symmetry.)"""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(t,) for t in dict.fromkeys(query_terms)], "term string"
    )
    num = (
        f"CAST({scale} AS DECIMAL(38,0))"
        " * (2 * (n - df) + 1) * 22 * tf * av"
    )
    den = (
        "CAST(2 * df + 1 AS DECIMAL(38,0))"
        " * (10 * av * tf + 3 * av + 9 * dl * n)"
    )
    # global single-partition window: safe ONLY because it runs on
    # <= k rows post-limit (TakeOrdered does the distributed work) —
    # do not copy this pattern onto an unbounded frame
    w = Window.orderBy(F.desc("score_q"), F.asc(id_col))
    return (
        postings.join(F.broadcast(qdf), "term")
        .join(F.broadcast(term_stats.join(qdf, "term")), "term")
        .join(F.broadcast(global_stats))
        .select(
            id_col,
            F.expr(f"({num}) DIV ({den})").cast("bigint").alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.sum("__s").cast("bigint").alias("score_q"))
        .filter(F.col("score_q") > 0)
        .orderBy(F.desc("score_q"), F.asc(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Exact-phrase search: top-k documents by occurrence count of a
    consecutive token sequence — the classic inverted-index hard case
    (BM25's bag-of-words can't see adjacency), solved scan-side.

    The phrase count per document is ROW-LOCAL: positions
    j ∈ [1, len − n + 1] where every phrase term matches
    ``arr[j + d]`` are counted with one higher-order filter — the
    corpus is scanned once with ZERO shuffles and the top-k runs as
    TakeOrderedAndProject, exactly the bm25_topk shape.  Overlapping
    occurrences count ("x x x" contains "x x" twice — the same
    convention as BPE pair counting).  The serving upgrade is
    POSITIONAL postings (term, doc, pos) bucketed by term with an
    adjacency self-join probing only the phrase terms' buckets; this
    operator is the one-shot/ad-hoc form.

    Returns (doc_id, phrase_tf, rank), phrase_tf > 0, ties on
    (phrase_tf DESC, doc_id) — all-integer, so the oracle replays
    bit-for-bit."""
    from pyspark.sql.window import Window

    n = len(phrase)
    if n == 0:
        raise ValueError("empty phrase")
    toks = f"filter(split({text_col}, ' '), x -> x <> '')"
    conds = " AND ".join(
        f"element_at(__t, j + {d}) = '{t.replace(chr(39), chr(39) * 2)}'"
        for d, t in enumerate(phrase)
    )
    # slice form: Spark's sequence(1, 0) runs DESCENDING, so the
    # candidate positions come from an always-ascending sequence
    # sliced to greatest(len - n + 1, 0) entries (same trick as
    # bpe_pair_count_sql)
    cnt = (
        f"size(filter(slice(sequence(1, size(__t) + 1), 1,"
        f" greatest(size(__t) - {n - 1}, 0)), j -> {conds}))"
    )
    w = Window.orderBy(F.desc("phrase_tf"), F.asc(id_col))
    return (
        df.select(F.col(id_col), F.expr(toks).alias("__t"))
        .select(
            id_col, F.expr(cnt).cast("bigint").alias("phrase_tf")
        )
        .filter(F.col("phrase_tf") > 0)
        .orderBy(F.desc("phrase_tf"), F.asc(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def positional_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional postings (term, doc_id, pos) — the index phrase and
    proximity queries need (plain tf postings can't see adjacency).
    One posexplode of the filtered token array; at scale this is
    written bucketed by term so a phrase probe reads only its terms'
    buckets.  Positions are 1-based over the empty-filtered tokens,
    matching phrase_search's row-local convention."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(f"filter(split({text_col}, ' '), x -> x <> '')")
        ).alias("__p0", "term"),
    ).select(
        "term", id_col, (F.col("__p0") + 1).cast("bigint").alias("pos")
    )


def phrase_search_indexed(
    postings: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Serve an exact-phrase query from the positional index: the
    first term's postings anchor the candidates, and each later term
    joins on (doc, pos + d) — the classic adjacency self-join.  Every
    join side is first pruned to ONE term's posting list (broadcast
    term literals reach the scan as pushed filters; with
    term-bucketed postings the scan prunes to the phrase's buckets),
    so per-query work is O(Σ phrase-term posting lists), never the
    corpus.  Same output contract as phrase_search — (doc_id,
    phrase_tf, rank), overlaps counted, ties (tf DESC, doc_id) —
    and contract-tested identical to it."""
    from pyspark.sql.window import Window

    if not phrase:
        raise ValueError("empty phrase")
    cur = postings.filter(F.col("term") == phrase[0]).select(
        id_col, F.col("pos").alias("__anchor")
    )
    for d, t in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("term") == t).select(
            id_col, (F.col("pos") - d).alias("__anchor")
        )
        cur = cur.join(nxt, [id_col, "__anchor"])
    w = Window.orderBy(F.desc("phrase_tf"), F.asc(id_col))
    return (
        cur.groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("phrase_tf"))
        .orderBy(F.desc("phrase_tf"), F.asc(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """Corpus-level token frequencies (map-side explode + one shuffle
    on the token), deterministic top-N."""
    return (
        df.select(F.explode(_tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(top_n)
    )


#: PII patterns shared by the scrub operator and its oracle — RE2-safe
#: (no lookahead/backreferences) and ASCII-classed so Java regex and
#: RE2 tokenize identically.
PII_EMAIL_RE = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+"
PII_PHONE_RE = r"\+1-555-[0-9]{4}"


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact email/phone PII and report per-document counts.

    Pure JVM regexp expressions (replace-all is Spark's default), so
    the scrub runs inside whole-stage codegen over the scan — the
    shape a 100 TB redaction pass needs: zero shuffles, zero Python.
    The scrubbed text is emitted as an md5 witness so equality checks
    don't ship full documents."""
    col = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>"), PII_PHONE_RE, "<PHONE>"
    )
    return df.select(
        id_col,
        F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL_RE), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(col, F.lit(PII_PHONE_RE), 0))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrub_hash"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap —
    the context-window chunking a training/RAG ingest runs before
    embedding or packing.  Chunk i covers tokens
    ``[i·step, i·step + chunk_tokens)`` with ``step = chunk_tokens −
    overlap``; the last chunk may be short; docs shorter than one
    chunk yield exactly one.

    A controlled explode (fan-out = n_tokens/step) over a narrow map —
    no shuffle; chunk text is emitted as an md5 witness so verification
    never ships full documents.  Chunk count uses pure integer
    arithmetic (``(n − overlap + step − 1) div step``) so the oracle
    replays it exactly.
    """
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    staged = df.select(id_col, _tokens(text_col).alias("__toks")).select(
        id_col,
        "__toks",
        F.expr(
            f"greatest(1, (size(__toks) - {overlap} + {step - 1}) div {step})"
        ).alias("__n_chunks"),
    )
    return staged.select(
        id_col,
        F.explode(F.expr("sequence(0, __n_chunks - 1)")).alias("chunk_idx"),
        "__toks",
    ).select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.expr(f"size(slice(__toks, chunk_idx * {step} + 1, {chunk_tokens}))")
        .cast("bigint")
        .alias("n_chunk_tokens"),
        F.expr(
            f"md5(array_join(slice(__toks, chunk_idx * {step} + 1, "
            f"{chunk_tokens}), ' '))"
        ).alias("chunk_hash"),
    )


def _stop_count_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"size(filter(__toks, x -> array_contains(array({words}), x)))"


def _gopher_staged_cols() -> list[Column]:
    """Stage-2 intermediate columns for the Gopher gates, over a frame
    holding ``__t``/``__toks`` — shared by ``gopher_quality`` and
    ``text_signals`` so the gate definition exists exactly once."""
    return [
        F.expr("size(__toks)").cast("bigint").alias("n_tokens"),
        F.expr(
            "aggregate(__toks, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))"
        ).alias("__sum_len"),
        F.expr("size(filter(__toks, x -> x rlike '[a-zA-Z]'))")
        .cast("bigint")
        .alias("__n_alpha"),
        F.expr(_stop_count_sql("en")).cast("bigint").alias("n_stopwords"),
    ]


def _gopher_final_cols() -> dict[str, Column]:
    """The Gopher metrics + combined verdict over the staged columns.
    THE single definition of the gate thresholds (mean word length in
    [3, 10], symbol ratio < 0.1, ≥ 80% alphabetic words, ≥ 2 English
    stopwords) — both query surfaces read this dict."""
    n = F.col("n_tokens")
    mean_len = F.col("__sum_len").cast("double") / n.cast("double")
    frac_alpha = F.col("__n_alpha").cast("double") / n.cast("double")
    n_sym = (
        F.size(F.expr(r"regexp_extract_all(__t, '#', 0)"))
        + F.size(F.expr(r"regexp_extract_all(__t, '\\.\\.\\.', 0)"))
    ).cast("bigint")
    sym_ratio = n_sym.cast("double") / n.cast("double")
    return {
        "mean_word_len": mean_len,
        "frac_alpha_words": frac_alpha,
        "symbol_word_ratio": sym_ratio,
        "passes_gopher": (
            (mean_len >= 3.0)
            & (mean_len <= 10.0)
            & (sym_ratio < 0.1)
            & (frac_alpha >= 0.8)
            & (F.col("n_stopwords") >= 2)
        ),
    }


def text_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """EVERY per-document quality signal in ONE staged narrow map —
    the shape an actual 100 TB curation pass uses: the token array is
    materialized once and all signals (Gopher gates, repetition
    metrics, language ID, content fingerprint) come from the same
    scan, no joins between signal operators, no shuffle at all.

    Emits: n_tokens, mean_word_len, frac_alpha_words,
    symbol_word_ratio, n_stopwords, passes_gopher, max_token_count,
    dup_3gram_frac, predicted_lang, content_hash.
    """
    gram = (
        lambda n: f"array_sort(transform(sequence(0, size(__toks) - {n}), "
        f"i -> array_join(slice(__toks, i + 1, {n}), ' ')))"
    )
    staged = df.select(
        id_col, F.col(text_col).alias("__t"), _tokens(text_col).alias("__toks")
    ).select(
        id_col,
        F.col("__t"),
        *_gopher_staged_cols(),
        F.expr("array_sort(__toks)").alias("__s1"),
        F.expr(f"if(size(__toks) >= 3, {gram(3)}, array())").alias("__s3"),
        F.expr(_stop_count_sql("de")).cast("bigint").alias("__s_de"),
        F.expr(_stop_count_sql("es")).cast("bigint").alias("__s_es"),
    )
    m = _gopher_final_cols()
    predicted = (
        F.when(
            (F.col("n_stopwords") >= F.greatest(F.col("__s_de"), F.col("__s_es")))
            & (F.col("n_stopwords") > 0),
            "en",
        )
        .when((F.col("__s_de") >= F.col("__s_es")) & (F.col("__s_de") > 0), "de")
        .when(F.col("__s_es") > 0, "es")
        .otherwise("unknown")
    )
    return staged.select(
        id_col,
        "n_tokens",
        m["mean_word_len"].alias("mean_word_len"),
        m["frac_alpha_words"].alias("frac_alpha_words"),
        m["symbol_word_ratio"].alias("symbol_word_ratio"),
        "n_stopwords",
        m["passes_gopher"].alias("passes_gopher"),
        F.expr(_runlen_max("__s1")).cast("bigint").alias("max_token_count"),
        F.expr(
            f"if(n_tokens >= 3, 1.0 - {_runlen_distinct('__s3')} / "
            f"CAST(n_tokens - 2 AS DOUBLE), 0.0)"
        )
        .cast("double")
        .alias("dup_3gram_frac"),
        predicted.alias("predicted_lang"),
        F.md5(F.lower(F.trim(F.col("__t")))).alias("content_hash"),
    )


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The remaining Gopher document-quality gates (Rae et al. 2021
    §A1.1) beyond ``repetition_stats``: mean word length, alphabetic-
    word fraction, symbol-to-word ratio, and stopword presence, plus
    the combined boolean filter verdict.  The gate expressions and
    thresholds are defined once (``_gopher_final_cols``) and shared
    with ``text_signals``, so the two surfaces can never drift.

    A pure narrow map over the scan (token array materialized once;
    all counts are single linear passes), so at 100 TB this rides the
    scan like every other text signal.  Every ratio is exact-integer
    derived and each threshold compares identically in any engine, so
    ``passes_gopher`` is oracle-portable too.
    """
    staged = df.select(
        id_col, F.col(text_col).alias("__t"), _tokens(text_col).alias("__toks")
    ).select(id_col, "__t", *_gopher_staged_cols())
    m = _gopher_final_cols()
    return staged.select(
        id_col,
        "n_tokens",
        m["mean_word_len"].alias("mean_word_len"),
        m["frac_alpha_words"].alias("frac_alpha_words"),
        m["symbol_word_ratio"].alias("symbol_word_ratio"),
        "n_stopwords",
        m["passes_gopher"].alias("passes_gopher"),
    )


def _runlen_max(arr: str) -> str:
    """Max run length over a SORTED string array = count of the most
    frequent value, in one O(n) ``aggregate`` pass (no per-distinct
    re-scan)."""
    step = "IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, CAST(1 AS BIGINT))"
    return (
        f"aggregate({arr}, "
        f"named_struct('prev', CAST(NULL AS STRING), "
        f"'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)), "
        f"(acc, x) -> named_struct('prev', x, 'run', {step}, "
        f"'best', greatest(acc.best, {step})), "
        f"acc -> acc.best)"
    )


def _runlen_distinct(arr: str) -> str:
    """Distinct-value count over a SORTED string array in one O(n)
    ``aggregate`` pass (replaces ``size(array_distinct(...))``)."""
    return (
        f"aggregate({arr}, "
        f"named_struct('prev', CAST(NULL AS STRING), 'cnt', CAST(0 AS BIGINT)), "
        f"(acc, x) -> named_struct('prev', x, "
        f"'cnt', acc.cnt + IF(acc.prev IS NULL OR x <> acc.prev, 1, 0)), "
        f"acc -> acc.cnt)"
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style intra-document repetition metrics: the signals a
    pretraining quality filter thresholds on (Rae et al. 2021 §A1.1).

    Every metric is computed with array higher-order functions INSIDE
    the row — a pure narrow map over the scan, no explode, no shuffle,
    no Python; the 100 TB shape is embarrassingly parallel.

    The token/bigram/trigram arrays are materialized into columns in a
    FIRST select (the ``rolling_fingerprints`` pattern above): inlining
    them into the counting lambdas makes Catalyst re-evaluate the whole
    split/slice/array_join chain per lambda element — O(n²) per row
    (measured ~35× slower at 500 docs).  Counts are then a per-row
    ``array_sort`` + ONE O(n) run-length ``aggregate`` pass instead of
    the O(distinct·n) filter-per-distinct-value scan.

    Emitted (all exact-integer-derived → engine-portable):
    - ``n_tokens``
    - ``max_token_count``  — occurrences of the most frequent token
    - ``top_bigram_count`` — occurrences of the most frequent 2-gram
    - ``dup_3gram_frac``   — 1 − distinct/total 3-grams (0 when < 3
      tokens): fraction of trigram positions that repeat an earlier one
    """
    gram = (
        lambda n: f"array_sort(transform(sequence(0, size(__toks) - {n}), "
        f"i -> array_join(slice(__toks, i + 1, {n}), ' ')))"
    )
    staged = df.select(
        id_col, _tokens(text_col).alias("__toks")
    ).select(
        id_col,
        F.expr("size(__toks)").cast("bigint").alias("n_tokens"),
        F.expr("array_sort(__toks)").alias("__s1"),
        F.expr(f"if(size(__toks) >= 2, {gram(2)}, array())").alias("__s2"),
        F.expr(f"if(size(__toks) >= 3, {gram(3)}, array())").alias("__s3"),
    )
    return staged.select(
        id_col,
        F.col("n_tokens"),
        F.expr(_runlen_max("__s1")).cast("bigint").alias("max_token_count"),
        F.expr(f"if(n_tokens >= 2, {_runlen_max('__s2')}, CAST(0 AS BIGINT))")
        .cast("bigint")
        .alias("top_bigram_count"),
        F.expr(
            f"if(n_tokens >= 3, 1.0 - {_runlen_distinct('__s3')} / "
            f"CAST(n_tokens - 2 AS DOUBLE), 0.0)"
        )
        .cast("double")
        .alias("dup_3gram_frac"),
    )


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Hashed-feature linear quality scorer — the fastText-style
    "model-based quality filter" stage of a curation pipeline, run as
    a shuffle-free narrow map.

    The real production pattern: train a linear classifier offline
    over hashed bag-of-words features, broadcast the weight vector,
    and score every document with one pass (the hashing trick makes
    the feature space a fixed ``n_buckets`` regardless of vocabulary).
    The plumbing here is exactly that — token → md5 bucket → weight →
    sum — with one substitution: the weight table is a DETERMINISTIC
    function of the bucket id (``bucket % 1001 - 500``, integers in
    [-500, 500]) instead of learned floats, so the DuckDB oracle can
    replay the identical score bit-for-bit.  Swapping in learned
    weights is a one-line change (map the bucket through a broadcast
    lookup instead of the modular formula).

    All arithmetic before the final division is 64-bit integer
    (exact); the mean is one int/int double division (correctly
    rounded, engine-portable).  Zero shuffles, zero UDFs — the whole
    scorer is a single codegen'd projection.
    """
    bucket = (
        f"pmod(CAST(conv(substr(md5(t), 1, 6), 16, 10) AS BIGINT), {n_buckets})"
    )
    weight_sum = (
        f"aggregate(transform(split({text_col}, ' '),"
        f" t -> {bucket} % 1001 - 500),"
        f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    n_tokens = n_tokens_col(text_col)
    return df.select(
        id_col,
        n_tokens.alias("n_tokens"),
        F.expr(weight_sum).cast("bigint").alias("logit_sum"),
    ).select(
        id_col,
        "n_tokens",
        "logit_sum",
        (F.col("logit_sum").cast("double") / F.col("n_tokens").cast("double"))
        .alias("mean_token_weight"),
        (F.col("logit_sum") > 0).alias("quality_label"),
    )


def quality_classifier_serve(
    df: DataFrame,
    weights: list[int],
    bias: int = 0,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Score documents with a LEARNED weight table — the "swap in
    learned weights" step quality_classifier's docstring promises.

    ``weights[b]`` is the fixed-point BIGINT weight of hash bucket
    ``b`` (produced by training.lr_train); the vector folds into a
    broadcast literal array so the scorer stays a single shuffle-free
    codegen'd projection, identical in shape to the deterministic
    variant above.  ``len(weights)`` must equal ``n_buckets``."""
    if len(weights) != n_buckets:
        raise ValueError(
            f"quality_classifier_serve: got {len(weights)} weights for"
            f" {n_buckets} buckets"
        )
    bucket = (
        f"pmod(CAST(conv(substr(md5(t), 1, 6), 16, 10) AS BIGINT),"
        f" {n_buckets})"
    )
    # weights ride as ONE ArrayType literal column (F.lit) referenced
    # by name — splicing a 1024-element "array(CAST(..),..)" string
    # into the SQL cost ~0.5-1 s of driver-side parse/analysis per
    # call (measured; optimized plan and arithmetic identical).
    z = (
        f"CAST({bias} AS BIGINT) + aggregate(transform(split({text_col},"
        f" ' '), t -> element_at(__w, CAST({bucket} + 1 AS INT))),"
        f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    from .transform import lit_long_array

    return df.withColumn("__w", lit_long_array(weights)).select(
        F.col(id_col).alias("doc_id"),
        F.expr(z).alias("z_scaled"),
    ).withColumn("pred_label", F.col("z_scaled") > 0)


# ---------------------------------------------------------------------------
# BPE merge learning (Sennrich et al. 2016) — the tokenizer-TRAINING
# operator: learn the first k byte-pair merges from the corpus.  The
# industrial shape: the only corpus-sized work is ONE word-histogram
# shuffle (map-side combined); every iteration after that runs on the
# VOCABULARY-sized state (word, count, symbol array) — pair counting
# is a vocab-sized map-side-combined aggregate, the argmax is a
# control-plane row, and the merge application is a narrow map.  At
# 100 TB the corpus is touched once; the k-step loop costs k small
# jobs over millions of vocab rows, not the corpus.
#
# Greedy-left merge semantics (the BPE standard) are implemented two
# ways with the SAME semantics, held bit-exact by the parity gate:
# the Spark side keeps the symbol state as ONE space-joined string
# (symbols can never contain a space — words are space-split) and
# applies each merge with a single codegen'd regexp_replace whose
# trailing symbol boundary is a zero-width lookahead (Java replace-all
# consumes matches left-to-right and resumes AFTER each match, which
# IS greedy-left: "a a a a" merges to "aa aa", never "aa a a"); the
# DuckDB oracle unrolls the explicit gaps-and-islands window form
# (within each run of consecutive candidate positions keep the 0th,
# 2nd, 4th...).  Ties in pair counts break on (count DESC, left,
# right): fully deterministic.
# ---------------------------------------------------------------------------
_BPE_VIEW_SEQ = itertools.count()


def bpe_charsplit_expr(col: str, dialect: str) -> str:
    """Symbol initialization: one single-character symbol per char."""
    if dialect == "spark":
        return f"transform(sequence(1, length({col})), i -> substr({col}, i, 1))"
    return f"list_transform(generate_series(1, length({col})), i -> {col}[i])"


def bpe_pair_count_sql(source_sql: str, dialect: str) -> str:
    """Pair-count + argmax over a (word, cnt, syms) relation — ONE row
    (a, b, c).  slice/generate_series yields an empty position list
    for single-symbol words on both engines (Spark's sequence() would
    run DESCENDING for size 1 — hence the slice form)."""
    if dialect == "spark":
        pos = (
            "LATERAL VIEW explode(slice(sequence(0, size(syms)), 1,"
            " greatest(size(syms) - 1, 0))) t AS j"
        )
        a, b = "syms[j]", "syms[j + 1]"
        src = f"({source_sql}) {pos}"
    else:
        src = (
            f"({source_sql}),"
            " unnest(generate_series(1, len(syms) - 1)) AS t(j)"
        )
        a, b = "syms[j]", "syms[j + 1]"
    return (
        f"SELECT {a} AS a, {b} AS b, CAST(SUM(cnt) AS BIGINT) AS c\n"
        f"FROM {src}\nGROUP BY 1, 2\nORDER BY c DESC, a, b\nLIMIT 1"
    )


def bpe_merge_apply_sql(
    source_sql: str, dialect: str, x_sql: str, y_sql: str
) -> str:
    """Apply ONE merge (x, y) -> xy to a (word, cnt, syms) relation
    with greedy-left overlap resolution — the gaps-and-islands window
    form the DuckDB oracle unrolls (the Spark side applies the same
    merge as a regexp_replace over the string state instead, see
    ``_bpe_merge_regex`` — same semantics, one narrow codegen'd map).
    ``x_sql``/``y_sql`` are scalar-subquery SQL expressions."""
    if dialect != "duckdb":
        raise ValueError(
            "gaps-and-islands merge apply is oracle-only; the Spark"
            " trainer uses _bpe_merge_regex"
        )
    src = (
        f"({source_sql}),"
        " unnest(generate_series(1, len(syms))) AS t(j)"
    )
    last = "len(syms)"
    rebuild = "list(sym ORDER BY j) FILTER (WHERE sym IS NOT NULL)"
    return f"""
WITH __e AS (
  SELECT word, cnt, j, syms[j] AS sj, syms[j + 1] AS sj1,
         CASE WHEN j < {last} AND syms[j] = {x_sql}
                   AND syms[j + 1] = {y_sql} THEN 1 ELSE 0 END AS cand
  FROM {src}),
__i1 AS (
  SELECT *, CASE WHEN cand = 1 THEN j - ROW_NUMBER() OVER
         (PARTITION BY word, cand ORDER BY j) END AS isl
  FROM __e),
__i2 AS (
  SELECT *, CASE WHEN cand = 1 AND (j - MIN(j) OVER
         (PARTITION BY word, isl)) % 2 = 0 THEN 1 ELSE 0 END AS keep
  FROM __i1),
__i3 AS (
  SELECT *, COALESCE(LAG(keep) OVER (PARTITION BY word ORDER BY j), 0)
         AS covered
  FROM __i2),
__m AS (
  SELECT word, cnt, j,
         CASE WHEN keep = 1 THEN sj || sj1
              WHEN covered = 1 THEN NULL ELSE sj END AS sym
  FROM __i3)
SELECT word, cnt, {rebuild} AS syms
FROM __m GROUP BY word, cnt
"""


def bpe_learn(
    df: DataFrame, text_col: str = "text", k: int = 8
) -> DataFrame:
    """Learn the first ``k`` BPE merges from the corpus; returns the
    control-plane merge table (step, left_sym, right_sym, merged,
    pair_count) — k rows, the artifact a tokenizer trainer ships.

    One corpus shuffle (the word histogram), then k vocab-sized
    iterations, each a single codegen'd regexp_replace over the
    space-joined symbol string, persisted SERIALIZED (deserialized
    array caching was measured as GC-pause roulette: 17-55 s swings
    at 50k docs; the flat-string serialized form holds ~4 s steady)
    with the previous step unpersisted.  The per-step argmax is a
    1-row collect — control-plane, exactly like k-means centroids.
    Temp view names are per-invocation unique (parallel DAG levels
    share one session)."""
    _, merges = _bpe_train(df, text_col, k)
    return df.sparkSession.createDataFrame(
        merges,
        "step bigint, left_sym string, right_sym string,"
        " merged string, pair_count bigint",
    )


def _regex_quote(s: str) -> str:
    """java.util.regex.Pattern.quote: \\Q...\\E literal quoting with
    the embedded-\\E escape (works for ANY symbol content)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _regex_replacement_escape(s: str) -> str:
    """Escape Java regex replacement-string metacharacters ($, \\)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def _bpe_merge_regex(x: str, y: str) -> tuple[str, str]:
    """(pattern, replacement) applying merge (x, y) -> xy to the
    bounded symbol string '' || ' ' || s1 || ' ' || ... || sn || ' '.

    Java replace-all scans left-to-right and resumes AFTER each match
    — exactly greedy-left.  The leading boundary space is consumed by
    the match (and re-emitted by the replacement); the TRAILING
    boundary is a zero-width lookahead ``(?= )`` so it is NOT consumed
    and remains available as the leading boundary of an immediately
    following candidate: ' a a a a ' -> ' aa aa ' (never ' aa a a ').
    Symbols cannot contain the space separator (words are space-split
    and non-empty), so boundary matches are exact-symbol matches."""
    pattern = f" {_regex_quote(x)} {_regex_quote(y)}(?= )"
    return pattern, f" {_regex_replacement_escape(x + y)}"


# split the bounded ' s1 s2 ... sn ' string state back to the symbol
# array (drop the sentinel boundary spaces, then split)
_BPE_SYMS_FROM_STR = "split(substr(symstr, 2, length(symstr) - 2), ' ')"


# Distinct-word count below which the k merge steps run driver-local
# on the one-time collected histogram (~30 bytes/word — broadcast-
# sized, the same discipline as lr_train's _LR_DRIVER_MAX).  At
# fixture scale each distributed step cost ~0.2-0.4 s of planning/
# scheduling for sub-millisecond data; above the bound the per-step
# persisted regexp_replace + pair-count plan (scales to any corpus)
# is unchanged.  Both paths produce identical merges/segmentations
# (pinned by tests/test_curation_ops.py::test_bpe_driver_path).
_BPE_DRIVER_MAX = 100_000


def _bpe_merge_list(syms: list, x: str, y: str) -> list:
    """Greedy-left merge (x, y) -> xy over a symbol list — the exact
    semantics of the Java regexp_replace in ``_bpe_merge_regex``
    (left-to-right scan, resume AFTER each match, so a merged symbol
    never becomes the LEFT of another match in the same pass)."""
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == x and syms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_train_local(rows: list, k: int) -> tuple[list, list]:
    """Driver-local twin of the k-step trainer over collected
    (word, cnt) rows: same pair counting (every adjacent position,
    corpus-weighted), same argmax order (c DESC, a, b — Python's
    code-point string order equals the engines' UTF-8 binary order),
    same greedy-left merge.  Returns (seg rows, merges)."""
    state = [(w, c, [ch for ch in w]) for w, c in rows]
    merges: list[tuple] = []
    for step in range(k):
        pairs: dict = {}
        for _w, c, syms in state:
            for j in range(len(syms) - 1):
                key = (syms[j], syms[j + 1])
                pairs[key] = pairs.get(key, 0) + c
        if not pairs:
            break
        (x, y), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((step, x, y, x + y, int(c)))
        state = [
            (w, cc, _bpe_merge_list(syms, x, y))
            for w, cc, syms in state
        ]
    return state, merges


# NOTE (optimization round 15, measured negative result): counting
# the per-step pairs as mapInArrow dict partials LOSES to the
# codegen'd split+explode+partial-aggregate at corpus scale — at 1.5M
# distinct words the Arrow transfer + Python dict loop read 0.92-0.99
# s/step warm vs 0.61-0.76 s for the SQL plan (identical argmax row).
# The distributed step therefore stays on bpe_pair_count_sql.


def _bpe_train(
    df: DataFrame, text_col: str, k: int,
    words: DataFrame | None = None,
) -> tuple[DataFrame, list[tuple]]:
    """Shared trainer core: returns (final word→syms segmentation —
    the vocab-sized tokenizer cache — and the learned merge list).

    ``words`` optionally injects a pre-built (word, cnt) corpus
    histogram (optimization round 14): callers that train SEVERAL
    tokenizer families on one corpus (text_tokenizer_compare) build
    the histogram once instead of re-tokenizing the corpus per
    family.  Must equal the default derivation (split on ' ',
    non-empty words, count per distinct word) — values are unchanged
    either way."""
    from pyspark import StorageLevel

    spark = df.sparkSession

    own_words = words is None
    if own_words:
        words = (
            df.select(
                F.explode(F.split(F.col(text_col), " ")).alias("word")
            )
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        words = words.persist(StorageLevel.MEMORY_AND_DISK)
    n_words = words.count()
    if n_words < _BPE_DRIVER_MAX:
        # size-adaptive driver-local loop (round 15): the histogram
        # is broadcast-sized, so the k pair-count jobs (~0.2-0.4 s of
        # planning each at fixture scale) collapse to one collect
        rows = [(r["word"], int(r["cnt"]))
                for r in words.select("word", "cnt").collect()]
        if own_words:
            words.unpersist()
        state, merges = _bpe_train_local(rows, k)
        cur = spark.createDataFrame(
            [(w, c, syms) for w, c, syms in state],
            "word string, cnt bigint, syms array<string>",
        ).persist(StorageLevel.MEMORY_AND_DISK)
        cur.count()
        return cur, merges
    # charsplit via the SHARED oracle-twin expression, then join into
    # the bounded string state the merge regex operates on
    cur = words.select(
        "word",
        "cnt",
        F.concat(
            F.lit(" "),
            F.array_join(
                F.expr(bpe_charsplit_expr("word", "spark")), " "
            ),
            F.lit(" "),
        ).alias("symstr"),
    )
    view = f"__bpe_cur_{next(_BPE_VIEW_SEQ)}"
    merges: list[tuple] = []
    prev: DataFrame | None = None
    try:
        for step in range(k):
            cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
            cur.selectExpr(
                "word", "cnt", f"{_BPE_SYMS_FROM_STR} AS syms"
            ).createOrReplaceTempView(view)
            best = spark.sql(
                bpe_pair_count_sql(f"SELECT * FROM {view}", "spark")
            ).collect()
            if prev is not None:
                prev.unpersist()
            if not best or best[0]["c"] is None:
                prev = cur  # dropped after the final split materializes
                break
            x, y, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
            merges.append((step, x, y, x + y, c))
            pattern, replacement = _bpe_merge_regex(x, y)
            prev = cur
            cur = cur.select(
                "word",
                "cnt",
                F.regexp_replace("symstr", pattern, replacement).alias(
                    "symstr"
                ),
            )
        cur = cur.selectExpr(
            "word", "cnt", f"{_BPE_SYMS_FROM_STR} AS syms"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        cur.count()  # materialize before dropping the previous step
        if prev is not None:
            prev.unpersist()
    finally:
        spark.catalog.dropTempView(view)
        if own_words:
            words.unpersist()
    return cur, merges


def _bpe_oracle_ctes(
    k: int, src: str = "documents", lead: str = "WITH "
) -> list[str]:
    """The unrolled learn pipeline as CTE parts — s0 → (pair count,
    argmax, merge apply) × k — shared by the learn and tokenize
    oracles.  ``src`` is the corpus relation (a table or an earlier
    CTE name when splicing into a larger oracle); ``lead=","``
    splices the chain into an already-open WITH (the funnel's BPE
    tokenizer branch does this over its ``decon`` CTE)."""
    parts = [
        lead + "w0 AS (SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS cnt"
        f" FROM {src}, unnest(string_split(text, ' ')) AS u(t)"
        " WHERE t <> '' GROUP BY 1),",
        "s0 AS (SELECT word, cnt, "
        + bpe_charsplit_expr("word", "duckdb")
        + " AS syms FROM w0)",
    ]
    for i in range(k):
        pair = bpe_pair_count_sql(f"SELECT * FROM s{i}", "duckdb")
        # MATERIALIZED is load-bearing: each b{i} is referenced three
        # times and each s{i} twice — default CTE inlining would grow
        # the plan ~4^k (measured: k=8 never finishes)
        parts.append(
            f",b{i} AS MATERIALIZED ({pair})"
        )
        merge = bpe_merge_apply_sql(
            f"SELECT * FROM s{i}",
            "duckdb",
            f"(SELECT a FROM b{i})",
            f"(SELECT b FROM b{i})",
        ).strip()
        # the stage body is itself a WITH query nested inside the CTE
        parts.append(f",s{i + 1} AS MATERIALIZED ({merge})")
    return parts


def bpe_learn_oracle_sql(k: int = 8) -> str:
    """The DuckDB twin: the SAME stage SQL (other dialect) unrolled
    into one query, with each step's argmax surfaced through scalar
    subqueries and the merge table assembled by UNION ALL."""
    parts = _bpe_oracle_ctes(k)
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, a AS left_sym, b AS right_sym,"
        f" a || b AS merged, c AS pair_count FROM b{i}"
        for i in range(k)
    )
    return "\n".join(parts) + "\n" + union + "\nORDER BY step"


# -- BPE as Spark-SQL MODEL text (the funnel's config-driven tokenizer
# -- switch, round 14): the trainer and the serve as single SQL
# -- statements a framework model can materialize, generated here so
# -- the checked-in example_pipeline files are PINNED to the operator
# -- machinery (tests/test_pipeline_project.py), exactly like the
# -- unigram models pin to _ulm_dp_expr.


def _sql_regex_quote(col: str) -> str:
    """Spark-SQL expression quoting a symbol column for literal use
    inside a regex pattern — the SQL twin of ``_regex_quote``
    (\\Q..\\E with the embedded-\\E escape).  The doubled backslashes
    are Spark string-literal escapes: '\\\\Q' parses to \\Q."""
    return (
        "concat('\\\\Q', replace(" + col
        + ", '\\\\E', '\\\\E\\\\\\\\E\\\\Q'), '\\\\E')"
    )


def _sql_regex_replacement(col: str) -> str:
    """SQL twin of ``_regex_replacement_escape``: escape Java regex
    replacement metacharacters ($ and backslash) in a symbol column."""
    return (
        "replace(replace(" + col
        + ", '\\\\', '\\\\\\\\'), '$', '\\\\$')"
    )


_SQL_CHARSPLIT_SYMSTR = (
    "concat(' ', array_join(transform(sequence(1, length(word)),"
    " i -> substr(word, i, 1)), ' '), ' ')"
)


def bpe_vocab_model_sql(
    k: int = 8, words_rel: str = "{{ ref('silver_words') }}"
) -> str:
    """The whole BPE trainer as ONE Spark SQL statement returning the
    merge table (step, left_sym, right_sym, merged, pair_count) — the
    silver_vocab model body under ``tokenizer: bpe``.

    Chain shape matters: a naive unroll references each state CTE
    twice (argmax + merge apply), and Spark inlines deterministic
    CTEs, so the logical plan — and the executed work — doubles per
    step (measured 18 s at sf0.001 for k=8).  Instead each step
    computes its own argmax IN-LINE via two windows (per-pair count,
    then a global MIN over the (−count, a, b) struct — the ORDER BY c
    DESC, a, b tie-break as struct ordering) and carries the chosen
    merge on every row, so every CTE is referenced exactly once and
    the unrolled plan stays linear in k.  The single-partition global
    window runs over the DISTINCT-WORD state (vocab-sized, bounded by
    the language, not the corpus), the same control-plane budget as
    the operator path's 1-row argmax collect (``bpe_learn``).

    Output shape (optimization round 15 continuation): the merge
    table is read from the FINAL state CTE only — each step appends
    its chosen merge to a ``merges`` array carried on every row (the
    append is global-constant per step, so every row holds the same
    array), and one posexplode of one row emits the k output rows.
    The former k per-step ``LIMIT 1`` output arms each re-referenced
    s{i} and therefore re-instantiated the whole chain up to step i
    under CTE inlining (measured: 144 Window nodes / 64 Exchanges /
    16 scans in the k=8 plan, none reused); the single-reader form
    keeps the executed plan at the chain's own 16 windows.  A NULL
    best (pairs exhausted) is not appended and every later step is
    then also NULL (merging nothing changes nothing), so the
    posexplode positions equal the former arms' step numbers
    exactly."""
    qa, qb = _sql_regex_quote("best.a"), _sql_regex_quote("best.b")
    rep = _sql_regex_replacement("concat(best.a, best.b)")
    # the word histogram comes from the MATERIALIZED silver_words
    # model (optimization round 14) — one shared corpus pass instead
    # of a per-branch re-tokenization.
    parts = [
        "WITH w AS (SELECT word, cnt FROM " + words_rel + "),",
        "s0 AS (SELECT word, cnt, " + _SQL_CHARSPLIT_SYMSTR + " AS symstr,"
        " CAST(array() AS array<struct<negc: bigint, a: string,"
        " b: string>>) AS merges FROM w)",
    ]
    for i in range(k):
        parts.append(
            f",e{i} AS (SELECT word, cnt, symstr, merges, syms[j] AS a,"
            f" syms[j + 1] AS b FROM (SELECT word, cnt, symstr, merges,"
            f" {_BPE_SYMS_FROM_STR} AS syms FROM s{i})"
            " LATERAL VIEW OUTER explode(slice(sequence(0, size(syms)),"
            " 1, greatest(size(syms) - 1, 0))) t AS j)"
        )
        parts.append(
            f",p{i} AS (SELECT word, cnt, symstr, merges, a, b,"
            " CAST(SUM(CASE WHEN a IS NOT NULL THEN cnt END)"
            f" OVER (PARTITION BY a, b) AS BIGINT) AS pc FROM e{i})"
        )
        # regroup to ONE candidate row per word BEFORE the global
        # argmax window (optimization round 15): MIN over a struct is
        # partially aggregable, so the hash aggregate combines
        # map-side and the single-partition MIN() OVER () sees only
        # the vocab-sized per-word candidates instead of every
        # exploded adjacent position.  MIN ignores NULLs and is
        # associative, so min-per-word then min-over-words equals the
        # former min-over-all-positions exactly.  ``merges`` is
        # global-constant (every row carries the same array), so
        # adding it to the group key changes no grouping.
        parts.append(
            f",m{i} AS (SELECT word, cnt, symstr, merges,"
            " MIN(CASE WHEN a IS NOT NULL THEN"
            " struct(-pc AS negc, a, b) END) AS cand"
            f" FROM p{i} GROUP BY word, cnt, symstr, merges)"
        )
        parts.append(
            f",g{i} AS (SELECT word, cnt, symstr, merges,"
            f" MIN(cand) OVER () AS best FROM m{i})"
        )
        parts.append(
            f",s{i + 1} AS (SELECT word, cnt, CASE WHEN best IS NULL"
            " THEN symstr ELSE regexp_replace(symstr,"
            f" concat(' ', {qa}, ' ', {qb}, '(?= )'),"
            f" concat(' ', {rep})) END AS symstr, CASE WHEN best IS NULL"
            " THEN merges ELSE array_append(merges, best) END AS merges"
            f" FROM g{i})"
        )
    tail = (
        "SELECT CAST(p AS BIGINT) AS step, m.a AS left_sym,"
        " m.b AS right_sym, concat(m.a, m.b) AS merged,"
        " -m.negc AS pair_count\n"
        f"FROM (SELECT merges FROM s{k} LIMIT 1)\n"
        "LATERAL VIEW posexplode(merges) t AS p, m\n"
        "ORDER BY step"
    )
    return "\n".join(parts) + "\n" + tail


def bpe_serve_model_sql(
    k: int = 8,
    vocab_rel: str = "{{ ref('silver_vocab') }}",
    src_rel: str = "{{ ref('silver_decontam') }}",
    words_rel: str = "{{ ref('silver_words') }}",
) -> str:
    """BPE SERVING as one Spark SQL statement — the silver_tokenized
    model body under ``tokenizer: bpe``: charsplit the corpus's
    distinct words, apply the k trained merges in step order (each a
    narrow regexp_replace over the bounded symbol string, the merge
    row LEFT-JOINed ON true from the MATERIALIZED vocab table so a
    shorter-than-k merge list passes steps through unchanged), then
    one word-key join back onto documents for per-doc piece counts.
    Every decontam survivor appears exactly once (doc-level LEFT
    JOIN); n_unsegmented counts doc words with no segmentation row —
    structurally 0 here because the vocab was trained on this same
    corpus, which the tokenized_in_domain DQ test asserts."""
    qa, qb = _sql_regex_quote("m.left_sym"), _sql_regex_quote("m.right_sym")
    rep = _sql_regex_replacement("concat(m.left_sym, m.right_sym)")
    parts = [
        "WITH mt AS (SELECT step, left_sym, right_sym FROM "
        + vocab_rel + "),",
        "dw AS (SELECT doc_id, word FROM (SELECT doc_id,"
        " explode(split(text, ' ')) AS word FROM " + src_rel + ")"
        " WHERE word <> ''),",
        # distinct words come from the MATERIALIZED silver_words
        # histogram (round 14) — same set as DISTINCT word FROM dw,
        # without re-deduplicating the corpus' doc-word pairs.
        "t0 AS (SELECT word, " + _SQL_CHARSPLIT_SYMSTR + " AS symstr"
        " FROM (SELECT word FROM " + words_rel + "))",
    ]
    for i in range(k):
        parts.append(
            f",t{i + 1} AS (SELECT word, CASE WHEN m.left_sym IS NULL"
            " THEN symstr ELSE regexp_replace(symstr,"
            f" concat(' ', {qa}, ' ', {qb}, '(?= )'),"
            f" concat(' ', {rep})) END AS symstr FROM t{i}"
            " LEFT JOIN (SELECT left_sym, right_sym FROM mt"
            f" WHERE step = {i}) m ON true)"
        )
    parts.append(
        ",seg AS (SELECT word,"
        f" CAST(size({_BPE_SYMS_FROM_STR}) AS BIGINT) AS n_syms"
        f" FROM t{k})"
    )
    parts.append(
        ",pc AS (SELECT dw.doc_id,"
        " CAST(SUM(seg.n_syms) AS BIGINT) AS n_pieces,"
        " CAST(SUM(CASE WHEN seg.word IS NULL THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_unseg"
        " FROM dw LEFT JOIN seg ON dw.word = seg.word"
        " GROUP BY dw.doc_id)"
    )
    parts.append(
        "SELECT d.doc_id, d.lang, d.source, d.n_chars, d.n_tokens,\n"
        "       d.predicted_lang,\n"
        "       CAST(COALESCE(pc.n_pieces, 0) AS BIGINT) AS n_pieces,\n"
        "       CAST(COALESCE(pc.n_unseg, 0) AS BIGINT) AS n_unsegmented\n"
        "FROM " + src_rel + " d\n"
        "LEFT JOIN pc ON d.doc_id = pc.doc_id"
    )
    return "\n".join(parts)


def lm_backoff_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Count-based bigram language-model scoring with stupid backoff
    (Brants et al. 2007, "Large Language Models in Machine
    Translation") — the CCNet-style quality signal: documents whose
    tokens are predictable under a corpus-trained LM score high,
    gibberish and boilerplate-free noise score low.

    Per token: P(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1}) when the
    bigram was seen, else 0.4 * c(w_i) / N (backoff to the unigram,
    alpha = 2/5 exact).  The first token scores c(w_1) / N.  Every
    probability is quantized to ``floor(scale * num / den)`` computed
    with BIGINT ``DIV`` — no floats anywhere, so the DuckDB oracle
    replays the scores bit-exactly.  (Bound: ``scale * count`` must
    fit int64 — with scale 1e6 that is ~9e12 occurrences of one
    token/bigram; raise to DECIMAL math past that.)

    Scale posture: ONE position explode feeds everything — the unigram
    table, the bigram table, and the scoring rows all derive from the
    same materialized (doc, i, prev, cur) frame, so the corpus text is
    shingled exactly once.  Counting is two map-side-combined
    groupBys; scoring is three equi-joins on token keys (the canonical
    distributed-LM shape) that AQE converts to broadcasts when the
    vocab / bigram tables fit, and the final per-document rollup is
    one groupBy on doc_id.

    Returns (doc_id, n_tokens, sum_prob_q, avg_prob_q, n_backoff):
    all BIGINT; sum/avg are in scale-quantized probability units.
    """
    from .transform import materialize

    toks = df.select(
        id_col,
        F.expr(f"filter(split({text_col}, ' '), x -> x <> '')").alias("__t"),
    ).filter(F.size("__t") >= 1)
    pos_expr = (
        "transform(sequence(1, size(__t)), i -> struct("
        "i AS i, element_at(__t, i) AS cur,"
        " CASE WHEN i > 1 THEN element_at(__t, i - 1) END AS prev))"
    )
    pos = materialize(
        toks.select(id_col, F.explode(F.expr(pos_expr)).alias("__s")).select(
            id_col,
            F.col("__s.i").alias("i"),
            F.col("__s.cur").alias("cur"),
            F.col("__s.prev").alias("prev"),
        )
    )
    uni = pos.groupBy("cur").agg(F.count(F.lit(1)).alias("c_uni"))
    total = uni.agg(F.sum("c_uni").alias("n_total"))
    bi = (
        pos.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c_bi"))
    )
    scored = (
        pos.join(uni, "cur")
        .join(
            uni.select(
                F.col("cur").alias("prev"), F.col("c_uni").alias("c_prev")
            ),
            "prev",
            "left",
        )
        .join(bi, ["prev", "cur"], "left")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "q",
            F.expr(
                f"CASE WHEN prev IS NULL THEN ({scale} * c_uni) DIV n_total"
                f" WHEN c_bi IS NOT NULL THEN ({scale} * c_bi) DIV c_prev"
                f" ELSE (2 * {scale} * c_uni) DIV (5 * n_total) END"
            ),
        )
        .withColumn(
            "is_backoff",
            (F.col("prev").isNotNull() & F.col("c_bi").isNull()).cast("int"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("q").cast("bigint").alias("sum_prob_q"),
        F.expr("SUM(q) DIV COUNT(1)").cast("bigint").alias("avg_prob_q"),
        F.sum("is_backoff").cast("bigint").alias("n_backoff"),
    )


def lm_backoff_oracle_sql(scale: int = 1_000_000) -> str:
    """DuckDB twin of ``lm_backoff_score``: identical integer
    quantization (``//`` is BIGINT floor-div on positives, matching
    Spark ``DIV``)."""
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, s.i AS i, s.cur AS cur, s.prev AS prev
  FROM (SELECT doc_id,
        unnest(list_transform(range(1, len(t) + 1),
               i -> {{'i': i, 'cur': t[i],
                     'prev': CASE WHEN i > 1 THEN t[i-1] END}})) AS s
        FROM toks WHERE len(t) >= 1)),
uni AS (
  SELECT cur, CAST(COUNT(*) AS BIGINT) AS c_uni FROM pos GROUP BY 1),
total AS (SELECT CAST(SUM(c_uni) AS BIGINT) AS n_total FROM uni),
bi AS (
  SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS c_bi
  FROM pos WHERE prev IS NOT NULL GROUP BY 1, 2),
scored AS (
  SELECT p.doc_id,
         CASE WHEN p.prev IS NULL THEN ({scale} * u.c_uni) // t.n_total
              WHEN b.c_bi IS NOT NULL THEN ({scale} * b.c_bi) // up.c_uni
              ELSE (2 * {scale} * u.c_uni) // (5 * t.n_total) END AS q,
         CASE WHEN p.prev IS NOT NULL AND b.c_bi IS NULL
              THEN 1 ELSE 0 END AS is_backoff
  FROM pos p
  JOIN uni u ON p.cur = u.cur
  LEFT JOIN uni up ON p.prev = up.cur
  LEFT JOIN bi b ON p.prev = b.prev AND p.cur = b.cur
  CROSS JOIN total t)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(q) AS BIGINT) AS sum_prob_q,
       CAST(SUM(q) // COUNT(*) AS BIGINT) AS avg_prob_q,
       CAST(SUM(is_backoff) AS BIGINT) AS n_backoff
FROM scored GROUP BY doc_id
"""


def bpe_tokenize_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    words: DataFrame | None = None,
) -> DataFrame:
    """Train ``k`` BPE merges on the corpus, then tokenize every
    document under the learned vocabulary — the full tokenizer
    train→apply composition, via the distinct-WORD cache: merges are
    applied to the vocab-sized (word, syms) table only, and documents
    get their piece counts through one equi-join on the word.  This
    is how production tokenizers run at corpus scale (a 100 TB corpus
    has a bounded distinct-word set; re-segmenting every occurrence
    would redo identical work billions of times).

    Returns (doc_id, n_words, n_pieces): pieces are exact counts
    under the greedy-left merge semantics of ``bpe_learn``, so the
    result replays bit-exactly in the unrolled SQL oracle.
    """
    seg, _ = _bpe_train(df, text_col, k, words=words)
    word_pieces = seg.select(
        "word", F.size("syms").cast("bigint").alias("__np")
    )
    docwords = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        docwords.join(word_pieces, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("__np").cast("bigint").alias("n_pieces"),
        )
    )


def bpe_tokenize_oracle_sql(k: int = 4) -> str:
    """DuckDB twin of ``bpe_tokenize_stats``: the unrolled learn
    stages, then the per-document piece-count join against the final
    segmentation s{k}."""
    parts = _bpe_oracle_ctes(k)
    return (
        "\n".join(parts)
        + f"""
,docwords AS (
  SELECT doc_id, t AS word
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
  WHERE t <> '')
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(s.syms)) AS BIGINT) AS n_pieces
FROM docwords d JOIN s{k} s ON d.word = s.word
GROUP BY d.doc_id
"""
    )


def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 20,
) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: bucket the corpus into
    ``n_buckets`` ingest slices by document id and report, per slice,
    how many NEW token types first appear there alongside cumulative
    types and cumulative token volume — the dataset-card diagnostic
    for "is the corpus still contributing new vocabulary or just
    repeating itself" (type growth flattening ⇒ diminishing returns
    per added shard).

    Plan: one explode feeds (a) per-token MIN(doc_id) — first sight,
    map-side-combined groupBy on the token — and (b) per-bucket token
    volume; bucket id = (doc_id · n) DIV (max_id + 1) in BIGINT so
    the slicing replays exactly; cumulative sums are windows over
    ≤ ``n_buckets`` rows.  Returns (bucket, new_types, cum_types,
    n_tokens, cum_tokens) — all BIGINT.
    """
    from .transform import materialize

    toks = materialize(
        df.select(
            F.col(id_col).alias("__d"),
            F.explode(
                F.expr(f"filter(split({text_col}, ' '), x -> x <> '')")
            ).alias("token"),
        )
    )
    mx = toks.agg(F.max("__d").alias("__mx"))
    bucket = f"CAST((__d * {n_buckets}) DIV (__mx + 1) AS BIGINT)"
    first = (
        toks.groupBy("token")
        .agg(F.min("__d").alias("__d"))
        .crossJoin(F.broadcast(mx))
        .select(F.expr(bucket).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_types"))
    )
    volume = (
        toks.crossJoin(F.broadcast(mx))
        .select(F.expr(bucket).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    )
    joined = volume.join(first, "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("new_types"), F.lit(0)).cast("bigint").alias(
            "new_types"
        ),
        "n_tokens",
    )
    wsql = "(ORDER BY bucket ROWS UNBOUNDED PRECEDING)"
    return joined.select(
        "bucket",
        "new_types",
        F.expr(f"CAST(SUM(new_types) OVER {wsql} AS BIGINT)").alias(
            "cum_types"
        ),
        "n_tokens",
        F.expr(f"CAST(SUM(n_tokens) OVER {wsql} AS BIGINT)").alias(
            "cum_tokens"
        ),
    )


# -- unigram-LM tokenizer training (SentencePiece-family) -------------------
#
# Kudo 2018 ("Subword Regularization") trains a unigram language
# model over subword pieces by EM + vocabulary pruning.  This is the
# deterministic-integer Viterbi-EM ("hard EM", the decode-time
# objective SentencePiece itself optimizes at inference) variant:
#
# - seed inventory: every substring of length 1..4 of the distinct-
#   word cache, counted by corpus occurrence; ALL single characters
#   (never pruned — coverage guarantee) + the top-``seed_multi``
#   multi-char pieces by (count, piece) order;
# - piece scores: integer-quantized base-2 negative log-likelihoods,
#   L(x) = 256*(nlb(x)-1) + (256*x DIV 2^(nlb(x)-1)) - 256 with
#   nlb(x) = length(bin(x)) — exact BIGINT arithmetic both engines
#   reproduce bit-for-bit (no floating log anywhere);
#   neg_q(p) = L(total + V) - L(cnt(p) + 1)  (+1 smoothing);
# - E-step: per distinct word, the VITERBI segmentation under the
#   additive quantized scores.  Uniqueness trick: piece (j, i)
#   costs neg_q*2^13 + 2^i, so a segmentation's total encodes its
#   cut-set as a bitmask in the low 13 bits — every segmentation of
#   a word has a DISTINCT total, the optimum is unique, and a piece
#   lies on THE optimal path iff dp[j] + w(j,i) + sp[i] == dp[n]
#   (prefix DP + suffix DP, no backpointers).  Expected counts =
#   corpus-weighted occurrences on optimal paths;
# - M-step: re-quantize scores from the Viterbi counts;
# - prune: keep all chars + the top-``keep_multi`` multi-char pieces
#   by (count DESC, piece) — the pruning trajectory the oracle pins;
# - one more EM round under the pruned vocabulary, then emit the
#   final vocab (piece, piece_len, cnt, neg_logprob_q).
#
# Scale posture: the corpus is touched ONCE (the word histogram —
# one map-side-combined shuffle); every E-step is a single narrow
# projection over the distinct-word cache with the vocabulary
# BROADCAST as a map literal (vocab is control-plane: ≤ seed_multi +
# alphabet entries here, ≤ a few hundred thousand for a production
# 32k..1M-piece tokenizer — still broadcastable), followed by one
# vocab-sized groupBy.  Driver-side state is vocab-sized only, like
# k-means centroids / BPE merges.  No reference counterpart
# (extension surface, SURVEY §2.12 X5 family).

_ULM_BIG = 1 << 40


def _ulm_lq(x: int) -> int:
    """Integer-quantized log2 (Python twin of the SQL formula —
    identical BIGINT arithmetic)."""
    nlb = int(x).bit_length()
    return 256 * (nlb - 1) + (256 * x) // (1 << (nlb - 1)) - 256


def ulm_lq_sql(x: str, dialect: str) -> str:
    """The L(x) quantized-log2 expression in either dialect.  ``x``
    must be a non-negative BIGINT expression (callers pass cnt+1 /
    tot+V, both >= 1)."""
    nlb = f"length(bin({x}))"
    if dialect == "spark":
        pw = f"shiftleft(CAST(1 AS BIGINT), {nlb} - 1)"
        return f"(256 * ({nlb} - 1) + (256 * ({x})) DIV {pw} - 256)"
    pw = f"(CAST(1 AS BIGINT) << ({nlb} - 1))"
    return f"(256 * ({nlb} - 1) + (256 * ({x})) // {pw} - 256)"


def _ulm_dp_expr(scale: int, max_piece: int, forward: bool,
                 word: str = "word", n: str = "n",
                 vmap: str = "vmap") -> str:
    """The per-word Viterbi DP as ONE Spark higher-order-function
    expression over (``word``, ``n``, ``vmap``) — column names by
    default, arbitrary sub-expressions for callers that inline the DP
    per token of a streamed document (the serving twin): an
    aggregate() over the positions, state = the dp array (index p+1 =
    position p).  Forward: dp[0]=0, dp[i] = min over L of dp[i-L] +
    w(j=i-L, i).  Backward (suffix): sp[n]=0, sp[i] = min over L of
    w(i, i+L) + sp[i+L].  Pieces outside the vocab cost BIG (chars
    are always in the vocab, so every position stays reachable)."""
    B = _ULM_BIG
    # Both DPs BUILD the array in fill order — forward left-to-right,
    # suffix right-to-left then reversed — so each step is ONE native
    # array_append instead of a transform() rebuilding all n+1 slots
    # (optimization round 14, guide §1.2 step 2: the rebuild cost
    # O(n²) interpreted lambda calls per word per DP; values are
    # bit-identical by induction — same LEAST terms, same indices).
    if forward:
        init = "array(CAST(0 AS BIGINT))"
        terms = ", ".join(
            f"IF(i >= {L}, element_at(acc, i - {L} + 1) + "
            f"COALESCE(try_element_at({vmap}, substr({word}, i - {L} + 1, {L}))"
            f" * {scale} + shiftleft(1, i), CAST({B} AS BIGINT)),"
            f" CAST({B} AS BIGINT))"
            for L in range(1, max_piece + 1)
        )
        step = f"(acc, i) -> array_append(acc, LEAST({terms}))"
        return f"aggregate(sequence(1, {n}), {init}, {step})"
    # suffix DP, reversed build: acc[m] = sp[n - m + 1]; the original
    # element_at(acc, n - s + L + 1) becomes element_at(acc, s - L + 1)
    # and the n - s + L <= n guard is the same L <= s condition
    init = "array(CAST(0 AS BIGINT))"
    terms = ", ".join(
        f"IF({L} <= s, "
        f"COALESCE(try_element_at({vmap}, substr({word}, {n} - s + 1, {L}))"
        f" * {scale} + shiftleft(1, {n} - s + {L}), CAST({B} AS BIGINT))"
        f" + element_at(acc, s - {L} + 1), CAST({B} AS BIGINT))"
        for L in range(1, max_piece + 1)
    )
    step = f"(acc, s) -> array_append(acc, LEAST({terms}))"
    return f"reverse(aggregate(sequence(1, {n}), {init}, {step}))"


def _ulm_word_pieces_expr(scale: int, max_piece: int,
                          w: str = "w") -> str:
    """The on-path piece LIST of one word as a single row-local
    expression (the streaming serve path): both DPs computed once and
    let-bound through a one-element transform(array(struct(...)))
    (Spark has no LET), then every (j, L) candidate filtered by the
    dp[j] + w'(j, j+L) + sp[j+L] == dp[n] on-path test.  The unique-
    optimum bitmask encoding guarantees exactly one segmentation
    survives.

    OUT-OF-VOCAB guard (r12 advice): a word containing a character
    absent from the trained vocab has no in-vocab path — dp[n] >=
    BIG — and the on-path filter would otherwise silently emit an
    EMPTY piece list (try_element_at returns NULL for every
    candidate, every path costs BIG).  Such a word now yields NULL
    (not []), so callers can count and surface unsegmentable words
    instead of silently undercounting pieces — the serving twin of
    the batch path's fail-loud DP assertion in ``_ulm_estep``."""
    nn = f"(length({w}))"
    dp = _ulm_dp_expr(scale, max_piece, True, word=w, n=nn)
    sp = _ulm_dp_expr(scale, max_piece, False, word=w, n=nn)
    onpath = (
        f"j + L <= {nn}"
        f" AND try_element_at(vmap, substr({w}, j + 1, L)) IS NOT NULL"
        f" AND element_at(t.d, j + 1)"
        f" + try_element_at(vmap, substr({w}, j + 1, L)) * {scale}"
        f" + shiftleft(1, j + L) + element_at(t.s, j + L + 1)"
        f" = element_at(t.d, {nn} + 1)"
    )
    return (
        f"element_at(transform(array(named_struct('d', {dp}, 's', {sp})),"
        f" t -> IF(element_at(t.d, {nn} + 1) >= {_ULM_BIG}, "
        f"CAST(NULL AS ARRAY<STRING>), "
        f"flatten(transform(sequence(0, {nn} - 1), j -> "
        f"filter(transform(sequence(1, {max_piece}), L -> "
        f"IF({onpath}, substr({w}, j + 1, L), "
        f"CAST(NULL AS STRING))), x -> x IS NOT NULL))))), 1)"
    )


def unigram_tokenize_serve(
    df: DataFrame,
    vocab: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word: int = 12,
    max_piece: int = 4,
) -> DataFrame:
    """Serve a TRAINED unigram-LM vocabulary over (possibly streamed)
    documents with ZERO shuffles and zero state: the vocab→neg_q
    table folds into the plan as a broadcast map literal and every
    document segments its own tokens row-locally (per word: both
    Viterbi DPs + the on-path piece extraction inside one projection
    — streaming-legal, append mode).  Returns (doc_id, n_words,
    n_pieces, n_distinct_pieces, n_unsegmented); on in-vocab input
    the first four are bit-identical to the batch
    ``unigram_tokenize`` join path (same unique-optimum arithmetic)
    and n_unsegmented is 0.

    Out-of-vocab words (a character absent from the trained vocab —
    possible on streams the trainer never saw) are COUNTED in
    n_unsegmented and n_words but contribute no pieces: visible,
    never silently dropped (r12 advice — the batch path fails loudly
    on the analogous inconsistency)."""
    scale = 1 << 13
    pairs: list = []
    for p_, neg in sorted(vocab.items()):
        pairs.extend([F.lit(p_), F.lit(int(neg)).cast("long")])
    toks = (
        f"filter(split({text_col}, ' '),"
        f" x -> x <> '' AND length(x) <= {max_word})"
    )
    # Stage the per-word segmentation list and the flattened pieces
    # as COLUMNS so the double-DP expression runs ONCE per document:
    # Catalyst's CollapseProject keeps non-cheap multi-use aliases
    # (HOF aggregates) staged instead of inlining them into every
    # consumer — without this the segs expression evaluated 3x per
    # row (n_pieces, n_distinct_pieces, n_unsegmented), which read
    # ~1.9x on the r13 stream-serve bench entry.
    segs = (
        f"transform({toks}, w -> "
        + _ulm_word_pieces_expr(scale, max_piece, "w")
        + ")"
    )
    return (
        df.withColumn("vmap", F.create_map(*pairs))
        .filter(F.expr(f"size({toks}) > 0"))
        .withColumn("segs", F.expr(segs))
        .withColumn(
            "pieces", F.expr("flatten(filter(segs, a -> a IS NOT NULL))")
        )
        .select(
            id_col,
            F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_words"),
            F.expr("CAST(size(pieces) AS BIGINT)").alias("n_pieces"),
            F.expr(
                "CAST(size(array_distinct(pieces)) AS BIGINT)"
            ).alias("n_distinct_pieces"),
            F.expr(
                "CAST(size(filter(segs, a -> a IS NULL)) AS BIGINT)"
            ).alias("n_unsegmented"),
        )
    )


def _ulm_vocab_tables(vocab: dict, max_piece: int, max_word: int):
    """Driver-side numpy lookup tables for the vectorized E-step
    (optimization round 15).  Pieces are encoded per length L as one
    uint64 key of L byte-sized alphabet ids (the alphabet = the code
    points appearing in the vocab, sorted); a word position whose
    code point is outside the alphabet gets sentinel id 255, which
    can never match a vocab key because real ids stop at 254.

    Returns None when the encoding cannot represent the vocab
    (alphabet > 254 distinct code points, pieces longer than 8, or
    words wider than the uint64 packing supports) — callers then use
    the bit-identical SQL-expression path."""
    import numpy as np

    # max_word 12 is the designed regime (the 2^i cut-set bitmask
    # lives in the low scale=2^13 bits); wider words would also hit
    # JVM shiftleft int-wrap semantics the numpy twin does not mimic
    if max_piece > 8 or max_word > 12:
        return None
    pieces = sorted(vocab)
    chars = sorted({c for p in pieces for c in p})
    if len(chars) > 254 or any(len(p) > max_piece for p in pieces):
        return None
    cvals = np.array([ord(c) for c in chars], dtype=np.uint32)
    cid_of = {c: i for i, c in enumerate(chars)}
    by_len: dict[int, tuple] = {}
    for L in range(1, max_piece + 1):
        group = [
            (p, i) for i, p in enumerate(pieces) if len(p) == L
        ]
        if not group:
            by_len[L] = (
                np.empty(0, np.uint64),
                np.empty(0, np.int64),
                np.empty(0, np.int64),
            )
            continue
        keys = np.array(
            [
                sum(cid_of[ch] << (8 * (L - 1 - t))
                    for t, ch in enumerate(p))
                for p, _ in group
            ],
            dtype=np.uint64,
        )
        order = np.argsort(keys)
        keys = keys[order]
        negs = np.array(
            [int(vocab[group[o][0]]) for o in order], dtype=np.int64
        )
        gidx = np.array([group[o][1] for o in order], dtype=np.int64)
        by_len[L] = (keys, negs, gidx)
    return pieces, cvals, by_len


def _ulm_np_batch(words_u32, n_arr, tables, scale, max_piece, B):
    """Vectorized twin of the per-word double-Viterbi for ONE numpy
    batch: ``words_u32`` is the (N, max_word) UTF-32 code-point
    matrix, ``n_arr`` the per-word lengths.  Returns (bad_mask,
    triples) where ``triples`` is (row, j, global_piece_idx) of every
    on-path candidate, sorted by (row, j) — exactly the order the SQL
    flatten(transform(j, transform(L, ...))) emits (the unique-
    optimum bitmask guarantees at most one L per j).  All arithmetic
    is int64, identical to the aggregate()-expression DP."""
    import numpy as np

    pieces, cvals, by_len = tables
    N, max_word = words_u32.shape
    # alphabet ids (255 = not in alphabet -> never matches a key)
    idx = np.searchsorted(cvals, words_u32)
    np.minimum(idx, len(cvals) - 1, out=idx)
    cid = np.where(
        cvals[idx] == words_u32, idx, 255
    ).astype(np.uint64)
    # per (j, L): quantized score * scale (int64) + validity + piece id
    sc = np.full((max_word, max_piece + 1, N), 0, dtype=np.int64)
    ok = np.zeros((max_word, max_piece + 1, N), dtype=bool)
    gid = np.zeros((max_word, max_piece + 1, N), dtype=np.int64)
    for L in range(1, max_piece + 1):
        keys_L, negs_L, gidx_L = by_len[L]
        for j in range(0, max_word - L + 1):
            key = cid[:, j].copy()
            for t in range(1, L):
                key <<= np.uint64(8)
                key |= cid[:, j + t]
            if len(keys_L):
                pos = np.searchsorted(keys_L, key)
                np.minimum(pos, len(keys_L) - 1, out=pos)
                hit = keys_L[pos] == key
                sc[j, L] = np.where(hit, negs_L[pos] * scale, 0)
                ok[j, L] = hit
                gid[j, L] = gidx_L[pos]
    bad = np.zeros(N, dtype=bool)
    out_rows: list = []
    out_js: list = []
    out_gid: list = []
    for n in np.unique(n_arr):
        n = int(n)
        g = np.flatnonzero(n_arr == n)
        # forward DP: dp[i] = min_L dp[i-L] + (sc + 2^i | B)
        dp = np.empty((len(g), n + 1), dtype=np.int64)
        dp[:, 0] = 0
        for i in range(1, n + 1):
            best = None
            for L in range(1, min(max_piece, i) + 1):
                j = i - L
                w = np.where(ok[j, L][g], sc[j, L][g] + (1 << i), B)
                t = dp[:, j] + w
                best = t if best is None else np.minimum(best, t)
            dp[:, i] = best
        # suffix DP: sp[p] = min_L (sc + 2^(p+L) | B) + sp[p+L]
        sp = np.empty((len(g), n + 1), dtype=np.int64)
        sp[:, n] = 0
        for p in range(n - 1, -1, -1):
            best = None
            for L in range(1, min(max_piece, n - p) + 1):
                w = np.where(
                    ok[p, L][g], sc[p, L][g] + (1 << (p + L)), B
                )
                t = w + sp[:, p + L]
                best = t if best is None else np.minimum(best, t)
            sp[:, p] = best
        dpn = dp[:, n]
        bad_g = dpn != sp[:, 0]
        bad[g[bad_g]] = True
        goodm = ~bad_g
        for j in range(n):
            for L in range(1, min(max_piece, n - j) + 1):
                on = (
                    goodm
                    & ok[j, L][g]
                    & (
                        dp[:, j]
                        + sc[j, L][g]
                        + (1 << (j + L))
                        + sp[:, j + L]
                        == dpn
                    )
                )
                hit = g[on]
                if len(hit):
                    out_rows.append(hit)
                    out_js.append(np.full(len(hit), j, dtype=np.int64))
                    out_gid.append(gid[j, L][hit])
    if out_rows:
        r = np.concatenate(out_rows)
        j = np.concatenate(out_js)
        gi = np.concatenate(out_gid)
        order = np.lexsort((j, r))
        r, gi = r[order], gi[order]
    else:
        r = np.empty(0, dtype=np.int64)
        gi = np.empty(0, dtype=np.int64)
    return bad, r, gi


def _ulm_estep_np(words: DataFrame, vocab: dict, scale: int,
                  max_piece: int, return_frame: bool, tables,
                  max_word: int):
    """mapInArrow twin of the SQL-expression E-step (optimization
    round 15, guide §4.2): the per-word double-Viterbi is ~200
    interpreted HOF-expression evaluations per word on the JVM path
    (HOF lambdas never reach whole-stage codegen); here each Arrow
    batch is one set of vectorized int64 numpy passes — identical
    arithmetic (same quantized scores, same 2^i cut-set bitmask, same
    LEAST tie behavior since every segmentation total is distinct),
    verified bit-exact by the oracle parity gates and
    tests/test_curation_ops.py::test_ulm_estep_np_matches_sql."""
    import numpy as np

    B = _ULM_BIG
    udtype = f"U{max_word}"

    if return_frame:
        def fn(batches):
            import numpy as np
            import pyarrow as pa

            pieces_np = np.array(
                tables[0] + [None], dtype=object
            )
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                ws = np.asarray(
                    batch.column(0).to_pylist(), dtype=udtype
                )
                n_arr = np.asarray(
                    batch.column(1).to_numpy(zero_copy_only=False),
                    dtype=np.int64,
                )
                N = len(ws)
                u = np.ascontiguousarray(ws).view(np.uint32)
                u = u.reshape(N, max_word)
                bad, r, gi = _ulm_np_batch(
                    u, n_arr, tables, scale, max_piece, B
                )
                # splice the [NULL] sentinel for DP-inconsistent rows
                counts = np.bincount(r, minlength=N)
                counts[bad] = 1
                offs = np.zeros(N + 1, dtype=np.int64)
                np.cumsum(counts, out=offs[1:])
                gfull = np.empty(int(offs[-1]), dtype=np.int64)
                if len(r):
                    # r is sorted by (row, j): per-row placements are
                    # consecutive from the row's offset
                    starts = np.flatnonzero(
                        np.r_[True, r[1:] != r[:-1]]
                    )
                    run_id = np.cumsum(
                        np.r_[0, (r[1:] != r[:-1]).astype(np.int64)]
                    )
                    place = np.arange(len(r)) - starts[run_id] + offs[r]
                    gfull[place] = gi
                gfull[offs[:-1][bad]] = len(pieces_np) - 1  # -> None
                values = pa.array(pieces_np[gfull], type=pa.string())
                la = pa.ListArray.from_arrays(
                    pa.array(offs, type=pa.int32()), values
                )
                yield pa.record_batch(
                    [batch.column(0), la], names=["word", "pieces"]
                )

        return (
            words.select("word", "n")
            .mapInArrow(fn, "word string, pieces array<string>")
        )

    n_pieces = len(tables[0])

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        acc = np.zeros(n_pieces + 1, dtype=np.int64)  # [-1] = sentinel
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ws = np.asarray(
                batch.column(0).to_pylist(), dtype=udtype
            )
            n_arr = np.asarray(
                batch.column(2).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            cnt = np.asarray(
                batch.column(1).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            N = len(ws)
            u = np.ascontiguousarray(ws).view(np.uint32)
            u = u.reshape(N, max_word)
            bad, r, gi = _ulm_np_batch(
                u, n_arr, tables, scale, max_piece, B
            )
            np.add.at(acc, gi, cnt[r])
            acc[-1] += int(cnt[bad].sum())
        ix = np.flatnonzero(acc)
        ps = np.array(tables[0] + [None], dtype=object)
        # explicit types: an all-sentinel partition would otherwise
        # infer a null-typed piece column and fail schema validation
        yield pa.record_batch(
            [pa.array(ps[ix], type=pa.string()),
             pa.array(acc[ix], type=pa.int64())],
            names=["piece", "c"],
        )

    return (
        words.select("word", "cnt", "n")
        .mapInArrow(fn, "piece string, c bigint")
        .groupBy("piece")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def _ulm_seed_occ_np(words: DataFrame, max_piece: int,
                     max_word: int) -> DataFrame:
    """Vectorized twin of the seed-inventory pass (optimization round
    15, guide §4.2): corpus-weighted occurrence counts of EVERY
    substring of length 1..max_piece of the distinct-word cache.  The
    JVM path explodes ~42 HOF-generated substrings per word (~67M
    rows at 50k docs) into a hash aggregate; here each task packs
    substrings into uint64 keys (4 x 16-bit code points) and merges
    per-task np.unique partials, emitting (piece, c) rows for the
    same downstream groupBy.  Values are identical — both paths count
    the same substrings with the same weights; non-BMP code points
    (>= 2^16, unpackable) fall back to an exact per-batch Python dict
    for that batch only."""
    udtype = f"U{max_word}"

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        run: dict[int, tuple] = {}   # L -> (keys uint64, counts i64)
        slow: dict = {}
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ws = np.asarray(batch.column(0).to_pylist(), dtype=udtype)
            cnt = np.asarray(
                batch.column(1).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            n_arr = np.asarray(
                batch.column(2).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            N = len(ws)
            u = np.ascontiguousarray(ws).view(np.uint32)
            u = u.reshape(N, max_word).astype(np.uint64)
            if (u >= 65536).any():
                for w, c in zip(ws, cnt):
                    w = str(w)
                    for j in range(len(w)):
                        for L in range(1, min(max_piece,
                                              len(w) - j) + 1):
                            p = w[j:j + L]
                            slow[p] = slow.get(p, 0) + int(c)
                continue
            for L in range(1, max_piece + 1):
                ks, cs = [], []
                for j in range(0, max_word - L + 1):
                    valid = n_arr >= j + L
                    if not valid.any():
                        continue
                    key = u[valid, j].copy()
                    for t in range(1, L):
                        key <<= np.uint64(16)
                        key |= u[valid, j + t]
                    ks.append(key)
                    cs.append(cnt[valid])
                if not ks:
                    continue
                bk = np.concatenate(ks)
                bc = np.concatenate(cs)
                if L in run:
                    bk = np.concatenate([run[L][0], bk])
                    bc = np.concatenate([run[L][1], bc])
                uk, inv = np.unique(bk, return_inverse=True)
                uc = np.zeros(len(uk), dtype=np.int64)
                np.add.at(uc, inv, bc)
                run[L] = (uk, uc)
        out_p: list = []
        out_c: list = []
        for L, (uk, uc) in run.items():
            if not len(uk):
                continue
            mat = np.empty((len(uk), L), dtype=np.uint32)
            for t in range(L):
                mat[:, t] = (uk >> np.uint64(16 * (L - 1 - t))) \
                    & np.uint64(0xFFFF)
            strs = np.ascontiguousarray(mat).view(f"U{L}").ravel()
            out_p.append(strs.astype(object))
            out_c.append(uc)
        if slow:
            out_p.append(np.array(list(slow.keys()), dtype=object))
            out_c.append(np.array(list(slow.values()), dtype=np.int64))
        if out_p:
            yield pa.record_batch(
                [pa.array(np.concatenate(out_p), type=pa.string()),
                 pa.array(np.concatenate(out_c))],
                names=["piece", "c"],
            )

    return (
        words.select("word", "cnt", "n")
        .mapInArrow(fn, "piece string, c bigint")
        .groupBy("piece")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def _ulm_estep(words: DataFrame, vocab: dict, scale: int,
               max_piece: int, return_frame: bool = False,
               max_word: int = 12):
    """One Viterbi E-step: segment every distinct word under the
    broadcast vocab->neg_q map, return {piece: corpus-weighted count
    on optimal paths} — or, ``return_frame``, the vocab-sized
    (word, pieces ARRAY) segmentation table the SERVING path joins
    documents against (one row per distinct word, not per piece
    occurrence — optimization round 14: the exploded form checkpointed
    and joined ~6x more rows for the same information; consumers
    aggregate sizes/distincts from the array).

    ONE fused pass (optimization round 14, guide §1.2 step 1 "don't
    compute things you throw away" / §5 "caching is only worth it
    when recomputing beats the memory pressure"): the on-path piece
    extraction and the fail-loud prefix/suffix consistency check run
    inside one projection + one vocab-sized groupBy.  The previous
    shape persisted a fat DP frame (word, both 13-long DP arrays AND
    the constant vocab map materialized PER ROW by the columnar
    cache) just so a consistency ``count()`` and the counts
    aggregation could share it — the cache write dominated the
    E-step.  Now a DP-inconsistent word emits one NULL-piece sentinel
    row through the same explode (pieces are substrings, never NULL,
    so the sentinel cannot collide) and the check is a dict lookup
    after the one aggregation; no persist, one corpus-of-words pass
    instead of two plus a cache materialization.

    Round 15: the DP runs VECTORIZED in numpy behind mapInArrow
    whenever the vocab is byte-id encodable (guide §4.2 — the HOF
    aggregate() lambdas are interpreted, never codegen'd, ~200
    expression evaluations per word; the numpy twin is the same int64
    arithmetic over whole Arrow batches).  The SQL-expression path
    below remains the fallback for vocabularies the packing cannot
    represent (alphabet > 254 code points / pieces > 8 chars) and is
    pinned equal to the numpy path by unit test."""
    tables = _ulm_vocab_tables(vocab, max_piece, max_word)
    if tables is not None and "n" in words.columns:
        if return_frame:
            frame = _ulm_estep_np(
                words, vocab, scale, max_piece, True, tables, max_word
            ).localCheckpoint(eager=True)
            bad = frame.filter(
                F.expr("exists(pieces, x -> x IS NULL)")
            ).count()
            if bad:
                raise AssertionError(
                    f"unigram-LM E-step: {bad} words where"
                    " prefix/suffix DP totals disagree"
                )
            return frame
        counts = _ulm_estep_np(
            words, vocab, scale, max_piece, False, tables, max_word
        )
        out = {r["piece"]: int(r["c"]) for r in counts.collect()}
        if None in out:
            raise AssertionError(
                "unigram-LM E-step: words where prefix/suffix DP"
                " totals disagree (corpus-weighted sentinel count"
                f" {out[None]})"
            )
        return out
    pairs: list = []
    for p, neg in sorted(vocab.items()):
        pairs.extend([F.lit(p), F.lit(int(neg)).cast("long")])
    onpath = (
        f"element_at(dp, j + 1)"
        f" + try_element_at(vmap, substr(word, j + 1, L)) * {scale}"
        f" + shiftleft(1, j + L) + element_at(sp, j + L + 1)"
        f" = element_at(dp, n + 1)"
    )
    cands = (
        "CASE WHEN element_at(dp, n + 1) <> element_at(sp, 1)"
        " THEN array(CAST(NULL AS STRING))"
        " ELSE filter(flatten(transform(sequence(0, n - 1), j ->"
        f" transform(sequence(1, least({max_piece}, n - j)), L ->"
        f" IF({onpath}, substr(word, j + 1, L),"
        " CAST(NULL AS STRING))))), x -> x IS NOT NULL) END"
    )
    base = (
        words.withColumn("vmap", F.create_map(*pairs))
        .withColumn("dp", F.expr(_ulm_dp_expr(scale, max_piece, True)))
        .withColumn("sp", F.expr(_ulm_dp_expr(scale, max_piece, False)))
    )
    # NOTE: both consumers keep the candidate expression in the SAME
    # projection as the other output columns.  Splitting it into its
    # own select() and exploding in a second one made the optimizer
    # inline the alias into the Generate and RE-DERIVE the dp/sp
    # aggregates six times (plan: 2 -> 12 aggregate() sites, measured
    # 10.6 s -> 67 s at 50k docs) — the same duplicated-evaluation
    # trap guide §4.4 describes for UDFs, in HOF-expression form.
    if return_frame:
        frame = base.select(
            "word", F.expr(cands).alias("pieces")
        ).localCheckpoint(eager=True)
        bad = frame.filter(
            F.expr("exists(pieces, x -> x IS NULL)")
        ).count()
        if bad:
            raise AssertionError(
                f"unigram-LM E-step: {bad} words where prefix/suffix"
                " DP totals disagree"
            )
        return frame
    chosen = base.select(
        "cnt", F.explode(F.expr(cands)).alias("piece")
    )
    counts = (
        chosen.groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )
    out = {r["piece"]: int(r["c"]) for r in counts.collect()}
    if None in out:
        raise AssertionError(
            "unigram-LM E-step: words where prefix/suffix DP totals"
            " disagree (corpus-weighted sentinel count"
            f" {out[None]})"
        )
    return out


def unigram_lm_train(
    df: DataFrame,
    text_col: str = "text",
    max_word: int = 12,
    max_piece: int = 4,
    seed_multi: int = 48,
    keep_multi: int = 24,
) -> DataFrame:
    """Train the unigram-LM tokenizer (module docstring above):
    seed -> E -> M -> prune -> E -> M, returning the final vocabulary
    (piece, piece_len, cnt, neg_logprob_q) ordered by piece."""
    spark = df.sparkSession
    words, c2, neg2 = _ulm_fit(
        df, text_col, max_word, max_piece, seed_multi, keep_multi
    )
    words.unpersist()
    rows = [
        (p, len(p), c2[p], neg2[p]) for p in sorted(c2)
    ]
    return spark.createDataFrame(
        rows, "piece string, piece_len bigint, cnt bigint,"
        " neg_logprob_q bigint"
    )


def _ulm_scores(cnts: dict) -> dict:
    """M-step: +1-smoothed quantized neg-log scores from counts."""
    tot = sum(cnts.values()) + len(cnts)
    return {p: _ulm_lq(tot) - _ulm_lq(c + 1) for p, c in cnts.items()}


def _ulm_fit(
    df: DataFrame,
    text_col: str,
    max_word: int,
    max_piece: int,
    seed_multi: int,
    keep_multi: int,
    words_hist: DataFrame | None = None,
):
    """Shared trainer core: returns (the PERSISTED distinct-word
    cache — caller unpersists, the final vocab counts c2, and the
    final quantized scores neg2).

    ``words_hist`` optionally injects a pre-built unfiltered
    (word, cnt) corpus histogram (optimization round 14, shared with
    the BPE trainer by text_tokenizer_compare); the max_word filter
    is applied here, so the derived cache is identical to the
    self-built one."""
    from pyspark import StorageLevel

    scale = 1 << 13  # low 13 bits hold the cut-set bitmask (n <= 12)
    if words_hist is not None:
        words = (
            words_hist.filter(F.length("word") <= max_word)
            .withColumn("n", F.length("word").cast("int"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    else:
        # scale-adaptive parallelism (optimization round 14, guide
        # §2/§6): a small fixture corpus arrives as ONE scan split,
        # serializing the corpus-wide tokenize+count on one core;
        # repartition only when the scan has fewer splits than cores
        # (no-op at production scale, where splits >= cores already).
        try:
            spark = df.sparkSession
            target = spark.sparkContext.defaultParallelism
            if df.rdd.getNumPartitions() < target:
                df = df.repartition(target)
        except Exception:
            pass
        words = (
            df.select(
                F.explode(F.split(F.col(text_col), " ")).alias("word")
            )
            .filter(
                (F.col("word") != "") & (F.length("word") <= max_word)
            )
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .withColumn("n", F.length("word").cast("int"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    # seed inventory: substring occurrence counts, corpus-weighted.
    # chars + top-multi come back in ONE job (rank multi pieces in a
    # window instead of a second collect) — same rows either way,
    # and the fixture-scale cost here is Spark jobs, not data.
    # Round 15: the substring generation+count runs vectorized in
    # numpy behind mapInArrow when packable (guide §4.2); the HOF
    # explode fallback below is value-identical.
    if max_piece <= 4 and max_word <= 12:
        occ = _ulm_seed_occ_np(words, max_piece, max_word)
    else:
        occ = (
            words.select(
                "cnt",
                F.explode(
                    F.expr(
                        "flatten(transform(sequence(1, n), j -> "
                        f"transform(sequence(1, least({max_piece},"
                        " n - j + 1)),"
                        " L -> substr(word, j, L))))"
                    )
                ).alias("piece"),
            )
            .groupBy("piece")
            .agg(F.sum("cnt").cast("bigint").alias("c"))
        )
    seed_rows = (
        occ.withColumn(
            "rk",
            F.expr(
                "CASE WHEN length(piece) > 1 THEN ROW_NUMBER() OVER"
                " (PARTITION BY (length(piece) = 1)"
                "  ORDER BY c DESC, piece) ELSE 0 END"
            ),
        )
        .filter(f"length(piece) = 1 OR rk <= {seed_multi}")
        .collect()
    )
    counts = {r["piece"]: int(r["c"]) for r in seed_rows}
    # round 1: E under seed scores, M, prune
    c1 = _ulm_estep(words, _ulm_scores(counts), scale, max_piece,
                    max_word=max_word)
    c1 = {p: c1.get(p, 0) for p in counts}
    kept_multi = sorted(
        (p for p in c1 if len(p) > 1),
        key=lambda p: (-c1[p], p),
    )[:keep_multi]
    v1 = {p: c1[p] for p in c1 if len(p) == 1 or p in set(kept_multi)}
    # round 2: E under re-estimated scores over the pruned vocab
    c2 = _ulm_estep(words, _ulm_scores(v1), scale, max_piece,
                    max_word=max_word)
    c2 = {p: c2.get(p, 0) for p in v1}
    return words, c2, _ulm_scores(c2)


def unigram_tokenize(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word: int = 12,
    max_piece: int = 4,
    seed_multi: int = 48,
    keep_multi: int = 24,
    words_hist: DataFrame | None = None,
) -> DataFrame:
    """The unigram-LM SERVING path (round 12 — the train→tokenize
    composition, the counterpart of bpe_tokenize_counts): train the
    vocabulary, then segment the corpus under the FINAL scores (a
    third Viterbi pass over the distinct-word cache) and join the
    per-word segmentation back onto the documents — per document the
    piece totals a training pipeline feeds its packer/budgeter.

    Scale posture: training as unigram_lm_train; serving adds ONE
    more narrow E-step projection over the distinct-word cache and
    one word-key join from documents onto the vocab-segmented cache
    (AQE broadcasts the cache when it fits), then a doc-key groupBy.
    Returns (doc_id, n_words, n_pieces, n_distinct_pieces) — BIGINT,
    bit-exact against the extended unrolled oracle.

    ``words_hist`` MUST be the FULL corpus histogram of ``df``'s own
    words (split on ' ', non-empty, unfiltered) — the same invariant
    _ulm_fit documents.  n_words is count(1) AFTER the inner join
    with the segmentation table, which equals the true word count
    only because every qualifying doc word has a histogram row; a
    pre-filtered or foreign-corpus histogram would silently
    undercount n_words and drop words from n_pieces (r14 ADVICE).
    The only in-repo caller (text_tokenizer_compare) passes the
    whole-corpus histogram."""
    scale = 1 << 13
    words, _c2, neg2 = _ulm_fit(
        df, text_col, max_word, max_piece, seed_multi, keep_multi,
        words_hist=words_hist,
    )
    try:
        seg = _ulm_estep(words, neg2, scale, max_piece,
                         return_frame=True, max_word=max_word)
        doc_words = (
            df.select(
                id_col,
                F.explode(F.split(F.col(text_col), " ")).alias("word"),
            )
            .filter(
                (F.col("word") != "")
                & (F.length("word") <= max_word)
            )
        )
        # ONE doc-key aggregation over the word-occurrence join
        # (optimization round 14): every doc word (non-empty, length
        # <= max_word) has exactly one row in the vocab-sized seg
        # table — the word histogram and this filter are the same —
        # so count(1) AFTER the inner join IS n_words and the
        # separate nw aggregate + second doc-key shuffle join
        # disappear; n_pieces/n_distinct_pieces fold from the pieces
        # ARRAYS (sum of sizes / distinct of the flattened
        # collect_list — order-insensitive, so collect_list's
        # nondeterministic ordering cannot leak into the value).
        out = (
            doc_words.join(seg, "word")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_words"),
                F.expr(
                    "CAST(sum(size(pieces)) AS BIGINT)"
                ).alias("n_pieces"),
                F.expr(
                    "CAST(size(array_distinct(flatten("
                    "collect_list(pieces)))) AS BIGINT)"
                ).alias("n_distinct_pieces"),
            )
            .select(id_col, "n_words", "n_pieces", "n_distinct_pieces")
        )
        # materialize before unpersisting the word cache under it
        return out.localCheckpoint(eager=True)
    finally:
        words.unpersist()


def unigram_lm_oracle_sql(
    max_word: int = 12,
    max_piece: int = 4,
    seed_multi: int = 48,
    keep_multi: int = 24,
    serve: bool = False,
    unsegmented: bool = False,
    src: str = "documents",
    parts_only: bool = False,
) -> str:
    """The DuckDB twin of ``unigram_lm_train``: the whole trajectory
    — seed, quantized scores, two Viterbi E-steps (prefix + suffix
    DPs unrolled position-by-position, MATERIALIZED so the ~70-CTE
    chain stays linear), the prune, and the final re-estimation —
    unrolled into one query.  All-BIGINT arithmetic, so the match is
    bit-exact.

    ``src`` names the corpus CTE/table (doc_id, text) the trainer and
    the serve join read; ``parts_only`` (serve mode) returns ONLY the
    CTE chain — starting with "," so it splices after a caller's own
    WITH chain, ending at ``pc`` (doc_id, n_pieces,
    n_distinct_pieces) — for embedding into a larger oracle (the
    curation funnel's tokenize-then-pack stage)."""
    scale = 1 << 13

    def lq(x: str) -> str:
        return ulm_lq_sql(x, "duckdb")

    def vocab_ctes(r: int, src_counts: str) -> list[str]:
        """v{r} = pieces + quantized neg scores from counts CTE."""
        return [
            f",t{r} AS (SELECT CAST(SUM(c) + COUNT(*) AS BIGINT) AS tt"
            f" FROM {src_counts})",
            f",v{r} AS MATERIALIZED (SELECT piece, "
            + lq("tt") + " - " + lq("c + 1")
            + f" AS neg FROM {src_counts}, t{r})",
        ]

    def estep_ctes(r: int) -> list[str]:
        """cand{r} + unrolled prefix/suffix DPs + chosen + counts
        over vocabulary v{r-1}."""
        parts = [
            f",cand{r} AS MATERIALIZED ("
            f"SELECT c.word, c.cnt, c.n, c.j, c.j + c.L AS i,"
            f" v.neg * {scale} + (CAST(1 AS BIGINT) << (c.j + c.L)) AS wq"
            f" FROM cpl c JOIN v{r - 1} v"
            f" ON v.piece = substr(c.word, c.j + 1, c.L))",
            f",dp{r}_0 AS (SELECT word, 0 AS i, CAST(0 AS BIGINT) AS val"
            f" FROM w)",
            f",sp{r}_0 AS (SELECT word, n AS i, CAST(0 AS BIGINT) AS val"
            f" FROM w)",
        ]
        for i in range(1, max_word + 1):
            prev = " UNION ALL ".join(
                f"SELECT * FROM dp{r}_{k}"
                for k in range(max(0, i - max_piece), i)
            )
            parts.append(
                f",dp{r}_{i} AS MATERIALIZED ("
                f"SELECT c.word, {i} AS i, MIN(p.val + c.wq) AS val"
                f" FROM cand{r} c JOIN ({prev}) p"
                f" ON p.word = c.word AND p.i = c.j"
                f" WHERE c.i = {i} GROUP BY 1)"
            )
        for s in range(1, max_word + 1):
            prev = " UNION ALL ".join(
                f"SELECT * FROM sp{r}_{k}"
                for k in range(max(0, s - max_piece), s)
            )
            parts.append(
                f",sp{r}_{s} AS MATERIALIZED ("
                f"SELECT c.word, c.j AS i, MIN(c.wq + p.val) AS val"
                f" FROM cand{r} c JOIN ({prev}) p"
                f" ON p.word = c.word AND p.i = c.i"
                f" WHERE c.n - c.j = {s} GROUP BY 1, 2)"
            )
        dpall = " UNION ALL ".join(
            f"SELECT * FROM dp{r}_{i}" for i in range(max_word + 1)
        )
        spall = " UNION ALL ".join(
            f"SELECT * FROM sp{r}_{s}" for s in range(max_word + 1)
        )
        parts += [
            f",dpall{r} AS MATERIALIZED ({dpall})",
            f",spall{r} AS MATERIALIZED ({spall})",
            f",tot{r} AS (SELECT word, val FROM spall{r} WHERE i = 0)",
            f",ch{r} AS MATERIALIZED ("
            f"SELECT c.word, c.cnt, substr(c.word, c.j + 1, c.i - c.j) AS piece"
            f" FROM cand{r} c"
            f" JOIN dpall{r} d ON d.word = c.word AND d.i = c.j"
            f" JOIN spall{r} s ON s.word = c.word AND s.i = c.i"
            f" JOIN tot{r} t ON t.word = c.word"
            f" WHERE d.val + c.wq + s.val = t.val)",
            f",c{r}r AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS c"
            f" FROM ch{r} GROUP BY 1)",
            f",c{r} AS MATERIALIZED (SELECT v.piece, "
            f"CAST(COALESCE(r.c, 0) AS BIGINT) AS c"
            f" FROM v{r - 1} v LEFT JOIN c{r}r r USING (piece))",
        ]
        return parts

    parts = [
        (", " if parts_only else "WITH ") + "w AS MATERIALIZED ("
        "SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS cnt,"
        " CAST(length(t) AS INT) AS n"
        f" FROM {src}, unnest(string_split(text, ' ')) AS u(t)"
        f" WHERE t <> '' AND length(t) <= {max_word} GROUP BY 1)",
        ",posj AS (SELECT word, cnt, n,"
        " unnest(generate_series(1, n)) AS j FROM w)",
        ",posl AS (SELECT word, cnt, j, unnest(generate_series(1,"
        f" least({max_piece}, n - j + 1))) AS L FROM posj)",
        ",occ AS MATERIALIZED (SELECT substr(word, j, L) AS piece,"
        " CAST(SUM(cnt) AS BIGINT) AS c FROM posl GROUP BY 1)",
        ",v0c AS MATERIALIZED ("
        "SELECT piece, c FROM occ WHERE length(piece) = 1"
        " UNION ALL SELECT piece, c FROM ("
        "SELECT piece, c FROM occ WHERE length(piece) > 1"
        f" ORDER BY c DESC, piece LIMIT {seed_multi}) q)",
        # shared candidate scaffolding (positions x lengths per word)
        ",cp0 AS (SELECT word, cnt, n,"
        " unnest(generate_series(0, n - 1)) AS j FROM w)",
        ",cpl AS (SELECT word, cnt, n, j, unnest(generate_series(1,"
        f" least({max_piece}, n - j))) AS L FROM cp0)",
    ]
    parts += vocab_ctes(0, "v0c")
    parts += estep_ctes(1)
    parts += [
        ",v1c AS MATERIALIZED ("
        "SELECT piece, c FROM c1 WHERE length(piece) = 1"
        " UNION ALL SELECT piece, c FROM ("
        "SELECT piece, c FROM c1 WHERE length(piece) > 1"
        f" ORDER BY c DESC, piece LIMIT {keep_multi}) q)",
    ]
    parts += vocab_ctes(1, "v1c")
    parts += estep_ctes(2)
    if serve:
        # the serving twin: score the final vocab (v2), run a THIRD
        # Viterbi pass, and join the per-word segmentation onto the
        # documents — mirroring unigram_tokenize exactly
        parts += vocab_ctes(2, "c2")
        parts += estep_ctes(3)
        parts += [
            ",dw AS (SELECT doc_id, t AS word"
            f" FROM {src}, unnest(string_split(text, ' ')) AS u(t)"
            f" WHERE t <> '' AND length(t) <= {max_word})",
            ",nw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words"
            " FROM dw GROUP BY 1)",
            ",seg AS (SELECT word, piece FROM ch3)",
            ",pc AS (SELECT doc_id,"
            " CAST(COUNT(*) AS BIGINT) AS n_pieces,"
            " CAST(COUNT(DISTINCT piece) AS BIGINT)"
            " AS n_distinct_pieces"
            " FROM dw JOIN seg USING (word) GROUP BY 1)",
        ]
        if parts_only:
            return "\n".join(parts)
        if unsegmented:
            # a word is unsegmentable iff the third-pass suffix DP
            # never reached position 0 (no in-vocab path — the
            # DuckDB unroll has no BIG sentinel: unreachable = no
            # tot3 row), mirroring the Spark serve path's
            # dp[n] >= BIG word-level NULL
            parts += [
                ",un AS (SELECT doc_id,"
                " CAST(COUNT(*) AS BIGINT) AS n_unsegmented"
                " FROM dw LEFT JOIN (SELECT DISTINCT word FROM tot3) s"
                " USING (word) WHERE s.word IS NULL GROUP BY 1)",
                # LEFT JOIN pc: a doc whose every word is OOV has no
                # pc row but must still appear (n_pieces 0), exactly
                # like the Spark serve path
                "SELECT doc_id, n_words,"
                " CAST(COALESCE(pc.n_pieces, 0) AS BIGINT) AS n_pieces,"
                " CAST(COALESCE(pc.n_distinct_pieces, 0) AS BIGINT)"
                " AS n_distinct_pieces,"
                " CAST(COALESCE(un.n_unsegmented, 0) AS BIGINT)"
                " AS n_unsegmented"
                " FROM nw LEFT JOIN pc USING (doc_id)"
                " LEFT JOIN un USING (doc_id) ORDER BY doc_id",
            ]
            return "\n".join(parts)
        parts += [
            "SELECT doc_id, n_words,"
            " CAST(COALESCE(pc.n_pieces, 0) AS BIGINT) AS n_pieces,"
            " CAST(COALESCE(pc.n_distinct_pieces, 0) AS BIGINT)"
            " AS n_distinct_pieces"
            " FROM nw LEFT JOIN pc USING (doc_id) ORDER BY doc_id",
        ]
        return "\n".join(parts)
    parts += [
        ",tf AS (SELECT CAST(SUM(c) + COUNT(*) AS BIGINT) AS tt FROM c2)",
        "SELECT piece, CAST(length(piece) AS BIGINT) AS piece_len,"
        " c AS cnt, " + lq("tt") + " - " + lq("c + 1")
        + " AS neg_logprob_q FROM c2, tf ORDER BY piece",
    ]
    return "\n".join(parts)


def unigram_tokenize_oracle_sql(
    max_word: int = 12,
    max_piece: int = 4,
    seed_multi: int = 48,
    keep_multi: int = 24,
    unsegmented: bool = False,
) -> str:
    """The DuckDB twin of ``unigram_tokenize``: the full trainer
    chain plus a third unrolled Viterbi pass under the final scores
    and the document join.  ``unsegmented`` adds the n_unsegmented
    column the STREAMING serve path emits (the batch join path keeps
    the four-column shape)."""
    return unigram_lm_oracle_sql(
        max_word, max_piece, seed_multi, keep_multi, serve=True,
        unsegmented=unsegmented,
    )
