"""Semantic unit tests for the curation operators (sampling, packing,
PII scrub, decontamination) — the properties the e2e oracle parity
cannot distinguish from luck: sampling rates track their cutoffs,
reservoirs are exactly-k and partition-independent, pack offsets
reconstruct the token stream, scrubbed text contains no residual PII,
and contamination is empty for disjoint corpora.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_transformation_python_spark.operators import sampling as sp
from data_transformation_python_spark.operators.dedup import contamination_hits
from data_transformation_python_spark.operators.text import pii_scrub
from data_transformation_python_spark.queries import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF, "documents")


# --------------------------------------------------------------------------
# stratified hash sampling
# --------------------------------------------------------------------------
def test_stratified_rates_track_cutoffs(spark, docs):
    out = sp.stratified_hash_sample(
        docs, "doc_id", "lang", {"en": "4000", "de": "8000"}
    )
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # md5 is uniform: en ~25%, de ~50%, others exactly 100%
    assert abs(kept["en"] / base["en"] - 0.25) < 0.12
    assert abs(kept["de"] / base["de"] - 0.50) < 0.15
    for lang in base:
        if lang not in ("en", "de"):
            assert kept.get(lang) == base[lang], lang


def test_stratified_is_partitioning_independent(spark, docs):
    a = sp.stratified_hash_sample(docs, "doc_id", "lang", {"en": "4000"})
    b = sp.stratified_hash_sample(
        docs.repartition(13, "source"), "doc_id", "lang", {"en": "4000"}
    )
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


# --------------------------------------------------------------------------
# deterministic reservoir
# --------------------------------------------------------------------------
def test_reservoir_exactly_k_per_group(spark, docs):
    out = sp.reservoir_per_group(docs, "doc_id", "lang", k=7)
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in base.items():
        assert sizes[lang] == min(7, n), lang


def test_reservoir_small_group_returns_whole_group(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "grp"]
    )
    out = sp.reservoir_per_group(df, "doc_id", "grp", k=10)
    assert out.count() == 3  # k larger than any group: keep all


# --------------------------------------------------------------------------
# sequence packing
# --------------------------------------------------------------------------
def test_pack_offsets_reconstruct_the_token_stream(spark, docs):
    out = sp.pack_sequences(docs, "doc_id", "lang", "text", budget=512).collect()
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["lang"], []).append(r)
    for lang, rows in by_group.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["pack_id"] == f"{lang}/{cum // 512}", (lang, r)
            assert r["pack_offset"] == cum % 512, (lang, r)
            cum += r["n_tokens"]


def test_pack_handles_docs_longer_than_budget(spark):
    df = spark.createDataFrame(
        [(1, "g", " ".join(["w"] * 25)), (2, "g", "a b"), (3, "g", "x")],
        ["doc_id", "grp", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in sp.pack_sequences(df, "doc_id", "grp", "text", budget=10).collect()
    }
    # doc 1 (25 tokens) spans packs 0-2; doc 2 starts at offset 25%10
    assert rows[1]["pack_id"] == "g/0" and rows[1]["pack_offset"] == 0
    assert rows[2]["pack_id"] == "g/2" and rows[2]["pack_offset"] == 5
    assert rows[3]["pack_id"] == "g/2" and rows[3]["pack_offset"] == 7


# --------------------------------------------------------------------------
# PII scrub
# --------------------------------------------------------------------------
def test_pii_scrub_counts_and_removes_all_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.io and c@y.org, call +1-555-0199"),
            (2, "no pii here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 1
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0
    # scrub witness equals md5 of the fully-redacted text
    expected = spark.sql(
        "SELECT md5('mail <EMAIL> and <EMAIL>, call <PHONE>') AS h"
    ).first()["h"]
    assert out[1]["scrub_hash"] == expected


# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------
def test_contamination_disjoint_corpora_is_empty(spark):
    train = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(20)))], ["doc_id", "text"]
    )
    bench = spark.createDataFrame(
        [(9, " ".join(f"b{i}" for i in range(20)))], ["doc_id", "text"]
    )
    assert contamination_hits(train, bench, n=8).count() == 0


def test_contamination_counts_distinct_shared_ngrams(spark):
    shared = " ".join(f"s{i}" for i in range(9))  # 9 tokens → two 8-grams
    train = spark.createDataFrame(
        [(1, shared + " zz unique tail of words here now ok"), (2, "all different words " * 5)],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(9, shared)], ["doc_id", "text"])
    rows = {r["doc_id"]: r["n_shared_ngrams"] for r in contamination_hits(train, bench, n=8).collect()}
    assert rows == {1: 2}  # both 8-grams of the shared window, doc 2 clean


def test_gopher_symbol_ratio_counts_hash_and_ellipsis(spark):
    """The fixture corpus contains no '#' or '...' so oracle parity
    can't see a broken symbol regex (this exact bug shipped once:
    over-escaped '\\.\\.\\.' matched nothing and the gate was
    silently '#-only').  Pin the counts on symbol-bearing text, for
    both the standalone gate and the fused text_signals."""
    from data_transformation_python_spark.operators import text as tx

    df = spark.createDataFrame(
        [
            (1, "the cat sat on a mat and it is # fine ... truly"),
            (2, "### ... ... #"),
        ],
        "doc_id long, text string",
    )
    for fn in (tx.gopher_quality, tx.text_signals):
        rows = {r["doc_id"]: r for r in fn(df).collect()}
        # doc 1: one '#' + one '...' over 13 words
        assert rows[1]["symbol_word_ratio"] == 2 / 13
        # doc 2: '###' → 3 + lone '#' → 1, plus two '...' = 6 over 4
        assert rows[2]["symbol_word_ratio"] == 6 / 4


def test_language_id_branches_and_ties(spark):
    """The fixture corpus is English-ish, so the de/es branches and
    the tie-priority rule (en > de > es) are invisible to oracle
    parity — pin them directly."""
    from data_transformation_python_spark.operators import text as tx

    texts = {
        1: ("der und das ist ein gut", "de"),
        2: ("el la los y es un bien", "es"),
        3: ("the der el a die la", "en"),  # 2-2-2 tie → en priority
        4: ("xyz qrs", "unknown"),
    }
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["predicted_lang"] for r in tx.language_id(df).collect()}
    assert got == {i: lang for i, (_, lang) in texts.items()}


def test_repeated_spans_detects_duplicated_block(spark):
    from pyspark.sql import functions as F

    from data_transformation_python_spark.operators.dedup import repeated_spans

    block = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, block + " aaa bbb"),
            (2, "ccc " + block),
            (3, "unrelated text entirely different tokens " + " ".join(
                f"u{i}" for i in range(8))),
            (4, block + " " + block),  # intra-doc repeat
        ],
        ["doc_id", "text"],
    )
    out = repeated_spans(docs, n=8, min_docs=2).collect()
    import hashlib

    h = hashlib.md5(block.encode()).hexdigest()
    row = next(r for r in out if r.span_hash == h)
    # docs 1, 2, 4 carry the block; doc 4 twice
    assert row.n_docs == 3
    assert row.n_occurrences >= 4
    assert row.first_doc_id == 1
    # doc 3's spans are unique -> never emitted
    assert all(r.n_docs >= 2 for r in out)


def test_quality_classifier_matches_python_reference(spark):
    import hashlib

    from data_transformation_python_spark.operators.text import quality_classifier

    rows = [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "alpha alpha")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in quality_classifier(docs).collect()}
    for doc_id, text in rows:
        toks = text.split(" ")
        s = sum(
            int(hashlib.md5(t.encode()).hexdigest()[:6], 16) % 4096 % 1001 - 500
            for t in toks
        )
        assert out[doc_id].logit_sum == s
        assert out[doc_id].n_tokens == len(toks)
        assert out[doc_id].mean_token_weight == s / len(toks)
        assert out[doc_id].quality_label == (s > 0)


def test_funnel_counts_are_monotone(spark):
    from data_transformation_python_spark.queries import all_queries

    row = all_queries()["q_event_funnel"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_viewed >= row.n_clicked_after >= row.n_purchased_after >= 0


def test_retention_offset_zero_covers_every_user(spark):
    from pyspark.sql import functions as F

    from data_transformation_python_spark.queries import all_queries, load

    out = all_queries()["q_retention_cohorts"](spark, "/root/testdata/sf0.001")
    ev = load(spark, "/root/testdata/sf0.001", "events")
    n_users = ev.select("user_id").distinct().count()
    at_zero = (
        out.filter(F.col("week_offset") == 0)
        .agg(F.sum("n_active_users"))
        .collect()[0][0]
    )
    # every user is active in their own cohort week
    assert at_zero == n_users
    # offsets never negative
    assert out.filter(F.col("week_offset") < 0).count() == 0


def test_incremental_dedup_flags_exact_copy_not_novel(spark):
    from data_transformation_python_spark.operators.dedup import incremental_dedup

    base = " ".join(f"tok{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(1, base), (2, "totally different corpus content " + " ".join(
            f"c{i}" for i in range(20)))],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (100, base),  # exact copy of corpus doc 1
            (101, " ".join(f"novel{i}" for i in range(25))),  # novel
        ],
        ["doc_id", "text"],
    )
    out = incremental_dedup(new, corpus, threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.new_doc_id, r.corpus_doc_id) == (100, 1)
    assert r.jaccard == 1.0
    assert r.n_intersect == r.n_union == 28  # 30 tokens -> 28 3-gram shingles


def test_incremental_dedup_never_pairs_within_sides(spark):
    # two identical docs inside the SAME side must not be reported
    from data_transformation_python_spark.operators.dedup import incremental_dedup

    text = " ".join(f"x{i}" for i in range(20))
    corpus = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(100, " ".join(f"y{i}" for i in range(20)))], ["doc_id", "text"]
    )
    assert incremental_dedup(new, corpus).count() == 0


def test_rowlocal_band_keys_equal_aggregated_band_keys(spark):
    # the streaming-legal (no-aggregation) banding must produce the
    # exact key set of the batch groupBy path — min over the shingle
    # array == min over the distinct shingle set
    from data_transformation_python_spark.operators.dedup import (
        band_keys,
        rowlocal_band_keys,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = set(map(tuple, band_keys(docs).collect()))
    b = set(map(tuple, rowlocal_band_keys(docs).collect()))
    assert a == b and len(a) > 0


def test_new_text_ops_tolerate_null_and_empty_text(spark):
    # nulls must flow through as nulls (no crash, no fabricated rows);
    # empty text is one empty token
    from data_transformation_python_spark.operators.dedup import repeated_spans
    from data_transformation_python_spark.operators.text import quality_classifier

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d e f g h i j")],
        "doc_id bigint, text string",
    )
    qc = {r.doc_id: r for r in quality_classifier(docs).collect()}
    assert qc[1].logit_sum is None and qc[1].quality_label is None
    assert qc[2].n_tokens == 1  # split('') -> ['']
    assert qc[3].n_tokens == 10
    # spans: null text and short docs drop out; no pair rows expected
    assert repeated_spans(docs, n=8).count() == 0


def test_editdist_verify_boundary_and_broadcast_shape(spark):
    """The integer relative-distance filter keeps a pair AT the
    threshold (d*100 == pct*max_len) and drops one just above; the
    physical plan must broadcast the candidate side, never the
    corpus."""
    from data_transformation_python_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaaaa"),          # len 10
            (2, "aaaaaaaabb"),          # d=2 vs doc 1 -> 20% of 10: AT threshold
            (3, "aaaaaaabbb"),          # d=3 vs doc 1 -> 30%: above
            (4, "aaaaaaaaaa"),          # identical to 1 -> d=0
        ],
        "doc_id bigint, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_id_1 bigint, doc_id_2 bigint"
    )
    out = dd.editdist_verify(docs, cand, max_rel_dist_pct=20)
    rows = {(r.doc_id_1, r.doc_id_2): r.edit_distance for r in out.collect()}
    assert rows == {(1, 2): 2, (1, 4): 0}, rows
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both joins broadcast the candidate-derived side (BuildRight for
    # the bare pairs, BuildLeft for the pair+text intermediate); the
    # corpus never shuffles or broadcasts (no sort-merge fallback)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
    assert "BuildLeft" in plan and "BuildRight" in plan, plan


def test_bpe_learn_semantics_greedy_left_ties_and_exhaustion(spark):
    """BPE merge learning: (1) counts weighted by word frequency pick
    the right first merge; (2) greedy-left overlap resolution inside
    runs ('aaa' yields one 'aa' pair occurrence, not two); (3) learned
    merges compose into multi-character symbols; (4) ties break on
    (count DESC, left, right); (5) the loop stops early when no pairs
    remain."""
    from data_transformation_python_spark.operators.text import bpe_learn

    # corpus: 'abab' x3, 'aaa' x2, 'cd' x2  (space-tokenized words)
    docs = spark.createDataFrame(
        [("abab abab abab aaa aaa cd cd",)], "text string"
    )
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_learn(docs, k=10).collect()
    ]
    # pair COUNTING follows the BPE standard (subword-nmt get_stats):
    # overlapping occurrences both count — 'aaa' yields (a,a) twice.
    # step 0: (a,b)=6 from abab x3; (a,a)=2x2=4; (b,a)=3; (c,d)=2
    assert got[0] == (0, "a", "b", "ab", 6), got
    # step 1: abab->[ab,ab] x3 gives (ab,ab)=3; (a,a)=4 wins
    assert got[1] == (1, "a", "a", "aa", 4), got
    # step 2: merge APPLICATION was greedy-left: aaa -> [aa, a] (one
    # occurrence, never [a, aa] or double-merge) -> (aa,a)=2;
    # (ab,ab)=3 wins
    assert got[2] == (2, "ab", "ab", "abab", 3), got
    # step 3: tie (aa,a)=2 vs (c,d)=2 -> lexicographic: 'aa' < 'c'
    assert got[3] == (3, "aa", "a", "aaa", 2), got
    assert got[4] == (4, "c", "d", "cd", 2), got
    # all words are single symbols now: loop must stop early
    assert len(got) == 5, got


def test_exact_substring_trim_cuts_planted_span(spark):
    """The trim step removes exactly the maximal duplicated span from
    every carrier and witnesses the reconstruction: kept counts and
    md5 of the trimmed text match a hand computation."""
    import hashlib

    from data_transformation_python_spark.operators.dedup import (
        exact_substring_trim,
    )

    block = " ".join(f"w{i}" for i in range(8))  # one exact 8-gram
    docs = spark.createDataFrame(
        [
            (1, block + " aaa bbb"),
            (2, "ccc " + block),
            (3, "unique tokens only here nothing repeats at all ever"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in exact_substring_trim(docs, n=8).collect()}
    # doc 1: 10 tokens, positions 0-7 cut -> "aaa bbb"
    assert (out[1].n_tokens, out[1].n_kept, out[1].n_cut) == (10, 2, 8)
    assert out[1].trimmed_md5 == hashlib.md5(b"aaa bbb").hexdigest()
    # doc 2: 9 tokens, positions 1-8 cut -> "ccc"
    assert (out[2].n_kept, out[2].n_cut) == (1, 8)
    assert out[2].trimmed_md5 == hashlib.md5(b"ccc").hexdigest()
    # doc 3: untouched, witness equals md5 of the original text
    assert out[3].n_cut == 0
    assert out[3].trimmed_md5 == hashlib.md5(
        b"unique tokens only here nothing repeats at all ever"
    ).hexdigest()


def test_exact_substring_trim_fully_boilerplate_doc(spark):
    """A document that is nothing but the duplicated span trims to the
    empty string (md5('') witness, n_kept 0)."""
    import hashlib

    from data_transformation_python_spark.operators.dedup import (
        exact_substring_trim,
    )

    block = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, block), (2, block), (3, "short doc")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in exact_substring_trim(docs, n=8).collect()}
    for d in (1, 2):
        assert (out[d].n_kept, out[d].n_cut) == (0, 8)
        assert out[d].trimmed_md5 == hashlib.md5(b"").hexdigest()
    # below n tokens: no spans, never cut
    assert (out[3].n_kept, out[3].n_cut) == (2, 0)


def test_bm25_topk_matches_python_reference(spark):
    """bm25_topk vs an independent pure-Python computation of the
    quantized log-free BM25 contract (k1=6/5, b=3/4, rational idf,
    scale-10^6 floor division): scores, ranking, tie order, and the
    zero-score/no-match exclusions all agree; the plan scans the
    corpus once with no shuffle before the global-stats aggregate."""
    from data_transformation_python_spark.operators.text import bm25_topk

    rows = [
        (1, "spark spark spark join"),
        (2, "spark join join"),
        (3, "join"),
        (4, "row scan filter"),          # no query term: excluded
        (5, "spark " + "pad " * 40),     # long doc: length-normalized
        (6, ""),                         # empty doc
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = [
        (r.doc_id, r.score_q, r.rank)
        for r in bm25_topk(df, ["spark", "join"], k=4).collect()
    ]

    # independent reference
    docs = {i: [t for t in s.split(" ") if t] for i, s in rows}
    n = len(docs)
    av = sum(len(t) for t in docs.values())
    scale = 1_000_000

    def score(doc):
        total = 0
        for term in ("spark", "join"):
            tf = docs[doc].count(term)
            if tf == 0:
                continue
            dfc = sum(1 for t in docs.values() if term in t)
            dl = len(docs[doc])
            num = scale * (2 * (n - dfc) + 1) * 22 * tf * av
            den = (2 * dfc + 1) * (10 * av * tf + 3 * av + 9 * dl * n)
            total += num // den
        return total

    exp = sorted(
        ((i, score(i)) for i in docs if score(i) > 0),
        key=lambda p: (-p[1], p[0]),
    )[:4]
    assert out == [(i, s, r + 1) for r, (i, s) in enumerate(exp)], out
    # doc 4 and the empty doc never appear
    assert all(i not in (4, 6) for i, _, _ in out)

    # plan: corpus side reaches the stats aggregate with no exchange
    # below the scan→project, the global stats come back broadcast,
    # and the top-k is TakeOrderedAndProject, not a global sort
    plan = (
        bm25_topk(df, ["spark", "join"], k=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_bm25_serving_path_matches_scan_path(spark):
    """bm25_query_topk over the prebuilt inverted index returns the
    IDENTICAL rows as the one-shot bm25_topk scan — two physically
    different plans (broadcast posting probe vs row-local counting),
    one quantized scoring contract; and the serving plan probes with
    broadcasts rather than shuffling the corpus."""
    from data_transformation_python_spark.operators.text import (
        bm25_index,
        bm25_query_topk,
        bm25_topk,
    )

    rows = [
        (i, " ".join(
            (["spark"] * (i % 4)) + (["join"] * (i % 3))
            + [f"w{i}{j}" for j in range(i % 5 + 1)]
        ))
        for i in range(1, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    q = ["spark", "join", "absent_term"]
    scan = [tuple(r) for r in bm25_topk(df, q, k=7).collect()]
    postings, ts, gs = bm25_index(df)
    serve_df = bm25_query_topk(df, postings, ts, gs, q, k=7)
    serve = [tuple(r) for r in serve_df.collect()]
    assert scan == serve and len(scan) == 7, (scan, serve)
    plan = serve_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_phrase_search_overlaps_edges_and_ties(spark):
    """phrase_search counts overlapping occurrences, handles 1-token
    and empty docs, respects (tf DESC, doc_id) tie order, and drops
    non-matching docs; the plan is scan + TakeOrderedAndProject with
    no exchange before the top-k."""
    from data_transformation_python_spark.operators.text import phrase_search

    rows = [
        (1, "x x x x"),       # "x x" overlaps: 3
        (2, "x x a x x"),     # 2
        (3, "a x x b"),       # 1
        (4, "x a x"),         # 0: not adjacent
        (5, "x"),             # single token
        (6, ""),              # empty
        (7, "b x x c"),       # 1: ties with doc 3 -> doc 3 first
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [tuple(r) for r in phrase_search(df, ["x", "x"], k=10).collect()]
    assert got == [(1, 3, 1), (2, 2, 2), (3, 1, 3), (7, 1, 4)], got
    # 3-term phrase: only doc 1 matches, overlaps still count
    got3 = [tuple(r) for r in phrase_search(df, ["x", "x", "x"], k=5).collect()]
    assert got3 == [(1, 2, 1)], got3
    plan = (
        phrase_search(df, ["x", "x"], k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_phrase_indexed_matches_scan_path(spark):
    """phrase_search_indexed over the positional index returns rows
    identical to the row-local phrase_search scan — including
    overlapping occurrences and the same-term phrase edge case — and
    its plan prunes each join side to one term's postings (pushed
    term filters) rather than shuffling the corpus."""
    from data_transformation_python_spark.operators.text import (
        phrase_search,
        phrase_search_indexed,
        positional_index,
    )

    rows = [
        (1, "x x x x"),
        (2, "a x x b x x"),
        (3, "x a x"),
        (4, "b c d"),
        (5, "x x"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    idx = positional_index(df)
    for phrase in (["x", "x"], ["x", "x", "x"], ["b", "c"], ["zz", "x"]):
        scan = [tuple(r) for r in phrase_search(df, phrase, k=10).collect()]
        serve = [
            tuple(r)
            for r in phrase_search_indexed(idx, phrase, k=10).collect()
        ]
        assert scan == serve, (phrase, scan, serve)
    plan = (
        phrase_search_indexed(idx, ["x", "x"], k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan or "Filter" in plan, plan


class TestDsirImportanceSample:
    """DSIR-style importance resampling (operators/sampling.py
    dsir_importance_sample): integer-quantized enrichment-ratio
    weights over hashed unigram+bigram buckets, deterministic top-k."""

    def test_target_like_docs_win(self, spark):
        from pyspark.sql import functions as F

        from data_transformation_python_spark.operators.sampling import (
            dsir_importance_sample,
        )

        # target speaks "aa bb", decoys speak "zz yy"; two raw docs
        # mimic the target vocabulary and must out-score the decoys
        target = spark.createDataFrame(
            [(100 + i, "aa bb aa bb cc") for i in range(6)],
            "doc_id long, text string",
        )
        raw = spark.createDataFrame(
            [(0, "aa bb aa cc"), (1, "bb aa bb"),
             (2, "zz yy zz yy"), (3, "yy zz ww"), (4, "ww vv uu")],
            "doc_id long, text string",
        )
        out = dsir_importance_sample(raw, target, k=2).collect()
        assert [r["doc_id"] for r in out] == [0, 1] or [
            r["doc_id"] for r in out
        ] == [1, 0]
        assert all(r["dsir_score"] > 0 for r in out)
        assert [r["rank"] for r in out] == [1, 2]

    def test_deterministic_and_rank_contract(self, spark):
        from data_transformation_python_spark.operators.sampling import (
            dsir_importance_sample,
        )

        target = spark.createDataFrame(
            [(9, "tt uu tt uu")], "doc_id long, text string"
        )
        raw = spark.createDataFrame(
            [(i, "tt uu vv") for i in range(5)],
            "doc_id long, text string",
        )
        a = dsir_importance_sample(raw, target, k=3).collect()
        b = dsir_importance_sample(raw, target, k=3).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        # identical texts -> identical scores -> ties break on doc_id
        assert [r["doc_id"] for r in a] == [0, 1, 2]

    def test_denominator_overflow_raises(self, spark):
        """The BIGINT guard must fire on DENOMINATOR wrap too, not
        just the numerator: (r_b+1)*(T+B) overflows first when the
        raw pool dwarfs the target.  num_buckets=2^61 inflates T+B to
        >= 2^61 while scale=1 keeps the numerator in range (t_b <= 2
        here so numerator <= 3*(R+B) < 2^63); a raw doc repeating one
        token drives r_b to 3 -> (3+1)*(T+2^61) >= 2^63 -> overflow,
        which must surface as the loud raise_error, never a silent
        wrap into wrong weights."""
        import pytest

        from data_transformation_python_spark.operators.sampling import (
            dsir_importance_sample,
        )

        target = spark.createDataFrame(
            [(9, "tt uu")], "doc_id long, text string"
        )
        raw = spark.createDataFrame(
            [(0, "zz zz zz zz"), (1, "tt uu vv")],
            "doc_id long, text string",
        )
        with pytest.raises(Exception, match="overflows BIGINT"):
            dsir_importance_sample(
                raw, target, k=2, num_buckets=2**61, scale=1
            ).collect()


def test_unigram_lm_train_semantics(spark):
    """Unigram-LM Viterbi-EM on a hand-checkable corpus: (1) the seed
    keeps all chars + top multi-char substrings; (2) the Viterbi
    E-step segments under quantized scores and counts pieces on THE
    unique optimal path (cut-set bitmask tie-break); (3) frequent
    multi-char pieces win counts over their constituent chars;
    (4) pruning keeps chars unconditionally; (5) the output is
    deterministic across invocations."""
    from data_transformation_python_spark.operators.text import (
        unigram_lm_train,
    )

    # 'abab' dominates: the piece 'ab' (and 'abab') should absorb the
    # segmentation mass; 'xy' is rare, 'z' appears only alone
    docs = spark.createDataFrame(
        [("abab abab abab abab xy z",), ("abab abab xy q",)],
        "text string",
    )
    out = unigram_lm_train(docs, seed_multi=6, keep_multi=3)
    rows = {r.piece: r for r in out.collect()}
    # chars survive pruning even with zero final usage
    for ch in "abxyzq":
        assert ch in rows, (ch, sorted(rows))
    # multi-char vocabulary is bounded by keep_multi
    multi = [p for p in rows if len(p) > 1]
    assert len(multi) <= 3, multi
    # 'abab' words segment through multi-char pieces, not chars:
    # the best multi piece carries the corpus mass
    assert any(rows[p].cnt > 0 for p in multi), {
        p: rows[p].cnt for p in multi
    }
    # 'z' occurs once as a full word -> its char is on the path
    assert rows["z"].cnt == 1, rows["z"]
    # counts with higher mass quantize to lower neg_logprob
    used = sorted((r.cnt, -r.neg_logprob_q) for r in rows.values())
    assert used == sorted(used)  # monotone: cnt up => neg down
    # determinism: a second run reproduces the table bit-for-bit
    again = {r.piece: r for r in
             unigram_lm_train(docs, seed_multi=6, keep_multi=3).collect()}
    assert {p: (r.cnt, r.neg_logprob_q) for p, r in rows.items()} == {
        p: (r.cnt, r.neg_logprob_q) for p, r in again.items()
    }


def test_unigram_lm_quantized_log_is_exact_and_monotone():
    """The L(x) integer log2: exact at powers of two, strictly
    monotone over BIGINT-range inputs, and the Python twin equals the
    SQL formula in BOTH dialects (DuckDB-executed check)."""
    import duckdb

    from data_transformation_python_spark.operators.text import (
        _ulm_lq,
        ulm_lq_sql,
    )

    assert _ulm_lq(1) == 0 and _ulm_lq(2) == 256 and _ulm_lq(4) == 512
    xs = [1, 2, 3, 5, 7, 8, 100, 1023, 1024, 10**6, 10**9]
    vals = [_ulm_lq(x) for x in xs]
    assert vals == sorted(vals) and len(set(vals)) == len(vals)
    con = duckdb.connect()
    for x in xs:
        # cast: bare literals are INT32 in DuckDB and 256*x overflows
        # (gate callers always pass BIGINT count expressions)
        got = con.execute(
            f"SELECT {ulm_lq_sql(f'CAST({x} AS BIGINT)', 'duckdb')}"
        ).fetchone()[0]
        assert got == _ulm_lq(x), (x, got, _ulm_lq(x))


def test_unigram_lm_optimal_path_is_unique(spark):
    """The cut-set bitmask encoding: every segmentation of a word has
    a distinct total cost, so the prefix/suffix on-path test extracts
    exactly one segmentation — even when piece scores tie.  'aaaa'
    with equal-scored pieces {a, aa} has 5 segmentations; the counts
    must reflect exactly one (the smallest-bitmask one), never a
    blend (which would overcount occurrences)."""
    from data_transformation_python_spark.operators.text import _ulm_estep

    words = spark.createDataFrame(
        [("aaaa", 1, 4)], "word string, cnt bigint, n int"
    )
    counts = _ulm_estep(words, {"a": 100, "aa": 100}, 1 << 13, 4)
    # equal per-piece cost => fewer pieces is cheaper => 'aa'+'aa';
    # a blended extraction would also report 'a' occurrences
    assert counts == {"aa": 2}, counts


def test_unigram_serve_path_equals_batch_join_path(spark):
    """The row-local streaming serve expression and the batch
    distinct-word-cache join must produce bit-identical per-document
    piece totals (same unique-optimum Viterbi arithmetic, two
    different plans)."""
    from data_transformation_python_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "abab abab xy z"), (2, "abab q xy xy"), (3, "z abab")],
        ["doc_id", "text"],
    )
    batch = {
        r.doc_id: (r.n_words, r.n_pieces, r.n_distinct_pieces)
        for r in tx.unigram_tokenize(docs, seed_multi=6,
                                     keep_multi=3).collect()
    }
    words, _c2, neg2 = tx._ulm_fit(docs, "text", 12, 4, 6, 3)
    words.unpersist()
    serve = {
        r.doc_id: (r.n_words, r.n_pieces, r.n_distinct_pieces)
        for r in tx.unigram_tokenize_serve(docs, neg2).collect()
    }
    assert batch == serve, (batch, serve)


def test_unigram_serve_surfaces_out_of_vocab_words(spark):
    """r12 advice (medium): a served word containing a character the
    trained vocab never saw has NO in-vocab segmentation (every path
    costs BIG) — it must be counted in n_unsegmented, not silently
    emit an empty piece list while n_words still counts it."""
    from data_transformation_python_spark.operators import text as tx

    train = spark.createDataFrame(
        [(1, "abab abab xy z"), (2, "abab q xy xy")],
        ["doc_id", "text"],
    )
    words, _c2, neg2 = tx._ulm_fit(train, "text", 12, 4, 6, 3)
    words.unpersist()
    # 'c' never appears in the training corpus -> "cc" is OOV;
    # every other word segments normally
    served = spark.createDataFrame(
        [(9, "abab cc xy"), (10, "abab xy")], ["doc_id", "text"]
    )
    rows = {
        r.doc_id: r
        for r in tx.unigram_tokenize_serve(served, neg2).collect()
    }
    assert rows[9].n_words == 3
    assert rows[9].n_unsegmented == 1
    assert rows[10].n_unsegmented == 0
    # the OOV word contributes no pieces: doc 9's pieces are exactly
    # doc 10's (same in-vocab words)
    assert rows[9].n_pieces == rows[10].n_pieces
    assert rows[9].n_distinct_pieces == rows[10].n_distinct_pieces


def test_ulm_estep_np_matches_sql_fallback(spark, monkeypatch):
    """Round 15: the vectorized numpy E-step (mapInArrow) must be
    bit-identical to the SQL-expression fallback on an adversarial
    corpus — multi-byte and non-BMP characters (UTF-32 code-point
    semantics must match Spark's substr/length), max-length words,
    tie-heavy counts — for BOTH the counts dict and the segmentation
    frame.  The fallback is forced by disabling the vocab-table
    encoding, exactly the path a >254-char alphabet takes."""
    from data_transformation_python_spark.operators import text as tx

    words = spark.createDataFrame(
        [
            ("aaaa", 7, 4),
            ("abab", 3, 4),
            ("ééx", 5, 3),          # Latin-1 supplement
            ("世界世界", 2, 4),  # CJK
            ("a\U0001F600b", 1, 3),           # non-BMP (astral)
            ("abcabcabcabc", 4, 12),          # max_word-length
            ("q", 9, 1),
        ],
        "word string, cnt bigint, n int",
    )
    pieces = sorted(
        {"a", "b", "c", "q", "x", "é", "世", "界",
         "\U0001F600", "aa", "ab", "abc", "éé",
         "世界", "bc"}
    )
    vocab = {p: 100 + 7 * i for i, p in enumerate(pieces)}
    scale = 1 << 13

    got_c = tx._ulm_estep(words, vocab, scale, 4, max_word=12)
    got_f = {
        r["word"]: r["pieces"]
        for r in tx._ulm_estep(
            words, vocab, scale, 4, return_frame=True, max_word=12
        ).collect()
    }
    # sanity: the dispatch above actually took the numpy path
    assert tx._ulm_vocab_tables(vocab, 4, 12) is not None

    monkeypatch.setattr(
        tx, "_ulm_vocab_tables", lambda *a, **k: None
    )
    want_c = tx._ulm_estep(words, vocab, scale, 4, max_word=12)
    want_f = {
        r["word"]: r["pieces"]
        for r in tx._ulm_estep(
            words, vocab, scale, 4, return_frame=True, max_word=12
        ).collect()
    }
    assert got_c == want_c, (got_c, want_c)
    assert got_f == want_f


def test_ulm_seed_occ_np_matches_sql(spark):
    """Round 15: the vectorized seed-inventory pass must count the
    same substrings with the same corpus weights as the HOF explode,
    including the per-batch exact fallback for non-BMP code points
    (>= 2^16, outside the 16-bit key packing)."""
    from pyspark.sql import functions as F

    from data_transformation_python_spark.operators import text as tx

    words = spark.createDataFrame(
        [
            ("abcd", 3, 4),
            ("éxéx", 2, 4),
            ("a\U0001F600\U0001F600b", 5, 4),  # forces the slow path
            ("zzzzzzzzzzzz", 1, 12),
        ],
        "word string, cnt bigint, n int",
    )
    got = {
        r["piece"]: int(r["c"])
        for r in tx._ulm_seed_occ_np(words, 4, 12).collect()
    }
    want = {
        r["piece"]: int(r["c"])
        for r in words.select(
            "cnt",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, n), j -> "
                    "transform(sequence(1, least(4, n - j + 1)),"
                    " L -> substr(word, j, L))))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
        .collect()
    }
    assert got == want


def test_bpe_driver_path_matches_distributed(spark, monkeypatch):
    """Round 15: the size-gated driver-local BPE loop must produce
    the same merge table AND the same final segmentation as the
    distributed per-step regexp_replace + pair-count plan — including
    greedy-left overlap runs ('a a a a' -> 'aa aa', never 'aa a a'),
    count ties broken by (a, b) string order, and multi-byte
    symbols."""
    from data_transformation_python_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "aaaa aaa ab ab ba"),
            (2, "éé ééé xyxy xyxy"),
            (3, "aaaa bb bb aaab"),
            (4, "z"),
        ],
        ["doc_id", "text"],
    )
    got_m = [tuple(r) for r in tx.bpe_learn(docs, k=6).collect()]
    got_s = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in tx.bpe_tokenize_stats(docs, k=6).collect()
    }

    monkeypatch.setattr(tx, "_BPE_DRIVER_MAX", 0)
    want_m = [tuple(r) for r in tx.bpe_learn(docs, k=6).collect()]
    want_s = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in tx.bpe_tokenize_stats(docs, k=6).collect()
    }
    assert got_m == want_m, (got_m, want_m)
    assert got_s == want_s
