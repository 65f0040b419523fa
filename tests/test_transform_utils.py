"""Tests for the P5/A3/S11 utility operators."""

from __future__ import annotations

import uuid

import pytest

from data_transformation_python_spark.operators.transform import (
    apply_aliases,
    apply_filters,
    clone_schema,
    grouped_aggregate,
)


def test_grouped_aggregate_aliases(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 3.0, 2), ("b", 5.0, 2)], "g string, v double, u int"
    )
    out = grouped_aggregate(df, ["g"], {"v": ["sum", "mean"], "u": "n_unique"})
    rows = {r.g: r for r in out.collect()}
    assert rows["a"].v_sum == 4.0
    assert rows["a"].v_mean == 2.0
    assert rows["a"].u_n_unique == 2
    assert rows["b"].u_n_unique == 1
    with pytest.raises(ValueError):
        grouped_aggregate(df, ["g"], {"v": "median_of_medians"})


def test_apply_filters_and_aliases(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id int, v int")
    out = apply_filters(df, ["v > 10", "id < 3"])
    assert [r.id for r in out.collect()] == [2]
    renamed = apply_aliases(df, {"v": "value"})
    assert "value" in renamed.columns and "v" not in renamed.columns


def test_clone_schema(spark):
    db = f"clone_{uuid.uuid4().hex[:6]}"
    spark.sql(f"CREATE DATABASE {db}")
    try:
        spark.createDataFrame([(1, "x")], "id bigint, v string").write.saveAsTable(
            f"{db}.src"
        )
        clone_schema(spark, f"{db}.src", f"{db}.dst")
        dst = spark.table(f"{db}.dst")
        assert dst.count() == 0
        assert dst.schema == spark.table(f"{db}.src").schema
    finally:
        spark.sql(f"DROP DATABASE {db} CASCADE")


def test_profile_columns_counts_nulls_and_distincts(spark):
    from data_transformation_python_spark.operators.transform import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "id bigint, v string",
    )
    out = {r.col_name: r for r in profile_columns(df, ["id", "v"]).collect()}
    assert out["id"].n_rows == 4
    assert out["id"].n_nulls == 1
    assert out["id"].n_distinct == 3
    assert (out["id"].min_value, out["id"].max_value) == ("1", "3")
    assert out["v"].n_nulls == 1
    assert out["v"].n_distinct == 2
    assert (out["v"].min_value, out["v"].max_value) == ("a", "b")


def test_profile_columns_approx_mode_single_aggregate(spark):
    from data_transformation_python_spark.operators.transform import profile_columns

    df = spark.range(1000).selectExpr("id", "CAST(id % 7 AS STRING) AS v")
    out = {r.col_name: r for r in profile_columns(df, ["id", "v"], approx=True).collect()}
    # HLL is approximate on the wide column, tight on the small one
    assert out["v"].n_distinct == 7
    assert abs(out["id"].n_distinct - 1000) < 60
    # approx profile must not contain the exact-distinct Expand plan
    plan = profile_columns(df, ["id", "v"], approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_zorder_column_handles_nulls_and_constant_dims(spark):
    from data_transformation_python_spark.operators.transform import zorder_column

    df = spark.createDataFrame(
        [(1, None, 5), (2, 10, 5), (3, 20, 5), (4, 30, 5)],
        "id bigint, x bigint, c bigint",
    )
    out, key = zorder_column(df, ["x", "c"])
    rows = {r.id: r[key] for r in out.collect()}
    assert len(rows) == 4
    # constant dim contributes bucket 0 everywhere; null lands at the
    # min bucket (keys still well-defined and deterministic)
    assert rows[1] == rows[2]  # null -> lo -> same bucket as min value
    assert rows[2] < rows[3] < rows[4]
    # key column name returned and present
    assert key in out.columns and key not in df.columns


def test_countmin_sketch_merge_and_upper_bound(spark):
    """CMS invariants: (a) cell-wise sum of two half-corpus sketches
    equals the full-corpus sketch (mergeability — the property that
    makes the build a plain partial aggregation), (b) every point
    estimate upper-bounds the true count."""
    import pyspark.sql.functions as F

    from data_transformation_python_spark.operators import sketch as sk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = sk.countmin_build(docs, depth=4, width=256)
    h1 = sk.countmin_build(docs.filter("doc_id % 2 = 0"), depth=4, width=256)
    h2 = sk.countmin_build(docs.filter("doc_id % 2 = 1"), depth=4, width=256)
    merged = (
        h1.unionByName(h2)
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("token")).filter(
        "token != ''"
    )
    exact = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    ).limit(50)
    est = sk.countmin_estimate(full, exact.select("token"), depth=4, width=256)
    joined = exact.join(est, "token").collect()
    assert joined and all(r["cms_estimate"] >= r["exact_count"] for r in joined)


def test_countmin_estimate_unseen_token_is_zero_not_dropped(spark):
    """A probe token with an empty cell must estimate as 0 (missing
    sketch cells count as zero), never be dropped from the output or
    min'd over only its nonzero cells."""
    from data_transformation_python_spark.operators import sketch as sk

    corpus = spark.createDataFrame([("alpha",), ("alpha",), ("beta",)], "token string")
    # Wide sketch so a synthetic probe token almost surely misses every
    # cell; correctness of the assertion only needs estimate <= upper
    # bound and presence in the output.
    sketch = sk.countmin_build_tokens(corpus, depth=4, width=65536)
    probes = spark.createDataFrame(
        [("alpha",), ("never-seen-token-xyzzy",)], "token string"
    )
    rows = {
        r["token"]: r["cms_estimate"]
        for r in sk.countmin_estimate(sketch, probes, depth=4, width=65536).collect()
    }
    assert rows["alpha"] == 2
    assert "never-seen-token-xyzzy" in rows  # not dropped by inner join
    assert rows["never-seen-token-xyzzy"] == 0


def test_bloom_filter_merge_no_false_negatives_and_probe_zero(spark):
    """Bloom invariants: (a) BIT_OR merge of two half-corpus filters
    equals the full-corpus filter (mergeability — the build IS the
    partial aggregation), (b) every inserted token probes present (no
    false negatives), (c) a probe over an EMPTY filter is
    definitively absent, not dropped (missing-chunk handling)."""
    import pyspark.sql.functions as F

    from data_transformation_python_spark.operators import sketch as sk

    toks = spark.createDataFrame(
        [(f"tok{i}",) for i in range(200)], "token string"
    )
    full = sk.bloom_build_tokens(toks, m_bits=4096, k=4)
    h1 = sk.bloom_build_tokens(toks.filter("token < 'tok3'"), m_bits=4096, k=4)
    h2 = sk.bloom_build_tokens(toks.filter("token >= 'tok3'"), m_bits=4096, k=4)
    merged = (
        h1.unionByName(h2)
        .groupBy("chunk")
        .agg(F.expr("bit_or(bits)").cast("bigint").alias("bits"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    probed = sk.bloom_probe(full, toks, m_bits=4096, k=4).collect()
    assert len(probed) == 200 and all(r["maybe_present"] for r in probed)
    empty = sk.bloom_build_tokens(toks.limit(0), m_bits=4096, k=4)
    rows = sk.bloom_probe(empty, toks.limit(5), m_bits=4096, k=4).collect()
    assert len(rows) == 5 and not any(r["maybe_present"] for r in rows)


def test_bloom_filter_false_positive_rate_in_expected_band(spark):
    """4k inserted tokens into m=32768, k=4 → theoretical FP rate
    (1-e^(-kn/m))^4 ≈ 2.4%; 2k never-inserted probes must land well
    inside an order-of-magnitude band (a broken hash or mask path
    yields ~0% or ~100%)."""
    from data_transformation_python_spark.operators import sketch as sk

    ins = spark.range(4000).selectExpr("concat('in', id) AS token")
    out = spark.range(2000).selectExpr("concat('out', id) AS token")
    bloom = sk.bloom_build_tokens(ins, m_bits=32768, k=4)
    rows = sk.bloom_probe(bloom, out, m_bits=32768, k=4).collect()
    fp = sum(1 for r in rows if r["maybe_present"]) / len(rows)
    assert 0.001 < fp < 0.15, fp


def test_hll_merge_equals_full_build_and_insensitive_to_dups(spark):
    """HLL invariants: (a) per-bucket MAX merge of two half-corpus
    register sets equals the full-corpus registers (mergeability —
    the build IS the partial aggregation), (b) registers are
    duplicate-insensitive (MAX is idempotent), so a corpus with every
    value repeated 3x builds the identical sketch."""
    import pyspark.sql.functions as F

    from data_transformation_python_spark.operators import sketch as sk

    vals = spark.range(3000).selectExpr("concat('v', id) AS token")
    full = sk.hll_build(vals, "token", (), p=8)
    h1 = sk.hll_build(vals.filter("id % 2 = 0"), "token", (), p=8)
    h2 = sk.hll_build(vals.filter("id % 2 = 1"), "token", (), p=8)
    merged = (
        h1.unionByName(h2).groupBy("bucket").agg(F.max("rho").alias("rho"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    tripled = vals.unionByName(vals).unionByName(vals)
    assert sorted(map(tuple, sk.hll_build(tripled, "token", (), p=8).collect())) == sorted(
        map(tuple, full.collect())
    )


def test_hll_estimate_accuracy_both_branches(spark):
    """Estimate accuracy across the two estimator branches: linear
    counting (n << m: 100 distinct into m=1024) and the raw harmonic
    estimator (n >> m: 30k distinct into m=256, std err 1.04/sqrt(m)
    = 6.5% — assert within 4 sigma).  Also: the empty sketch
    estimates 0."""
    from data_transformation_python_spark.operators import sketch as sk

    small = spark.range(100).selectExpr("concat('s', id) AS token")
    est = sk.hll_estimate(sk.hll_build(small, "token", (), p=10), (), p=10)
    r = est.collect()[0]
    assert abs(r["hll_estimate"] - 100) <= 10, r
    big = spark.range(30000).selectExpr("concat('b', id) AS token")
    est = sk.hll_estimate(sk.hll_build(big, "token", (), p=8), (), p=8)
    r = est.collect()[0]
    assert abs(r["hll_estimate"] - 30000) <= 0.26 * 30000, r
    empty = sk.hll_build(small.limit(0), "token", (), p=10)
    # the ungrouped aggregate always emits one row; an empty sketch
    # must estimate exactly 0 through the linear-counting branch
    r = sk.hll_estimate(empty, (), p=10).collect()[0]
    assert r["v_zero"] == 1024 and r["hll_estimate"] == 0, r


def test_kmv_merge_identity_and_exact_small_sets(spark):
    """KMV invariants: (a) the bottom-k of two sketches' union equals
    the sketch of the underlying sets' union (the EXACT merge
    identity bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B))),
    (b) duplicate-insensitivity, (c) sets smaller than k estimate
    their union and intersection EXACTLY through the m<k branch."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from data_transformation_python_spark.operators import sketch as sk

    a = spark.range(2000).selectExpr("concat('x', id) AS token")
    b = spark.range(1000, 3000).selectExpr("concat('x', id) AS token")
    ka, kb = sk.kmv_build(a, k=64), sk.kmv_build(b, k=64)
    direct = sk.kmv_build(a.unionByName(b), k=64)
    merged = (
        ka.unionByName(kb)
        .distinct()
        .withColumn("__rn", F.row_number().over(Window.orderBy("h")))
        .filter("__rn <= 64")
        .drop("__rn")
    )
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in direct.collect()
    )
    dup = a.unionByName(a).unionByName(a)
    assert sorted(r["h"] for r in sk.kmv_build(dup, k=64).collect()) == sorted(
        r["h"] for r in sk.kmv_build(a, k=64).collect()
    )
    sa = spark.range(40).selectExpr("concat('s', id) AS token")
    sb = spark.range(20, 60).selectExpr("concat('s', id) AS token")
    est = sk.kmv_overlap_estimate(
        sk.kmv_build(sa, k=256), sk.kmv_build(sb, k=256), k=256
    ).collect()[0]
    assert est["union_est"] == 60 and est["intersect_est"] == 20, est


def test_mg_summary_bounds_merge_and_exact_branch(spark):
    """Misra-Gries invariants: (1) exact branch — ≤ k distinct items
    gives θ=0 and exact counts; (2) lossy branch — θ = (k+1)-th
    largest count, summary ≤ k rows, every stored weight satisfies
    w ≤ true ≤ w + θ; (3) merge — weights add, θs add, bounds still
    contain the combined exact counts, and every item with
    true > θ_total survives the merge."""
    import pyspark.sql.functions as F

    from data_transformation_python_spark.operators import sketch as sk

    # skewed multiset: item 'h0' x 100, 'h1' x 50, then 40 singletons
    rows = [("h0",)] * 100 + [("h1",)] * 50 + [(f"t{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "item string")

    # (1) exact branch
    small = spark.createDataFrame(rows[:150], "item string")  # 2 items
    s = {r["item"]: (r["w"], r["theta"]) for r in sk.mg_build(small, k=8).collect()}
    assert s == {"h0": (100, 0), "h1": (50, 0)}, s

    # (2) lossy branch: 42 distinct items, k=8 -> θ = 9th largest = 1
    summ = sk.mg_build(df, k=8).collect()
    assert len(summ) <= 8
    theta = summ[0]["theta"]
    assert theta == 1, summ
    exact = {"h0": 100, "h1": 50}
    for r in summ:
        true = exact.get(r["item"], 1)
        assert r["w"] <= true <= r["w"] + theta, (r, true)

    # (3) merge of two skewed halves
    half_a = spark.createDataFrame(
        [("h0",)] * 60 + [(f"a{i}",) for i in range(30)], "item string"
    )
    half_b = spark.createDataFrame(
        [("h0",)] * 40 + [("h1",)] * 50 + [(f"b{i}",) for i in range(30)],
        "item string",
    )
    merged = sk.mg_merge(sk.mg_build(half_a, k=8), sk.mg_build(half_b, k=8), k=8)
    got = {r["item"]: (r["w"], r["theta"]) for r in merged.collect()}
    assert len(got) <= 8
    combined_exact = {"h0": 100, "h1": 50}
    theta_m = next(iter(got.values()))[1]
    for item, true in combined_exact.items():
        # both are far above θ_total, so they MUST be present in-bound
        assert item in got, (item, got)
        w = got[item][0]
        assert w <= true <= w + theta_m, (item, w, theta_m, true)


def test_hdr_quantile_bounds_and_merge(spark):
    """HDR histogram invariants: (a) cell-wise sum of two half-corpus
    histograms equals the full-corpus histogram (mergeability); (b)
    every served [est_lo, est_hi] bucket contains the exact
    ceil(pct*N/100)-ranked value, and the bucket width respects the
    (m+1)/m relative-error bound."""
    import numpy as np
    from data_transformation_python_spark.operators import sketch as sk

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.integers(1, 50, 400),
            rng.integers(1000, 90_000, 500),
            rng.integers(10_000_000, 20_000_000, 100),
        ]
    ).astype("int64")
    df = spark.createDataFrame([(int(v),) for v in vals], "v bigint")

    full = sk.hdr_build(df, "v").toPandas().set_index("bucket_id")["cnt"]
    h1 = sk.hdr_build(df.filter("v % 2 = 0"), "v").toPandas()
    h2 = sk.hdr_build(df.filter("v % 2 = 1"), "v").toPandas()
    merged = (
        h1.set_index("bucket_id")["cnt"]
        .add(h2.set_index("bucket_id")["cnt"], fill_value=0)
        .astype("int64")
    )
    assert merged.sort_index().equals(full.sort_index())

    pcts = (10, 50, 90, 99)
    served = (
        sk.hdr_quantiles(sk.hdr_build(df, "v"), pcts)
        .toPandas()
        .set_index("quantile_pct")
    )
    svals = np.sort(vals)
    n = len(svals)
    for p in pcts:
        rank = -(-p * n // 100)  # ceil
        exact = int(svals[rank - 1])
        lo, hi = int(served.loc[p, "est_lo"]), int(served.loc[p, "est_hi"])
        assert lo <= exact <= hi, (p, lo, exact, hi)
        assert (hi + 1) * 64 <= lo * 65 + 64, (p, lo, hi)


def test_bloom_prune_join_identical_and_prunes(spark):
    """bloom_prune_join: (a) result identical to the plain join (no
    false negatives); (b) the prefilter is a row-local Filter on the
    big side BEFORE any exchange (shuffle-volume cut, not a join);
    (c) the pruned row count is near the true match count (FP rate
    small at m=32768, k=4)."""
    from data_transformation_python_spark.operators import sketch as sk

    big = spark.range(0, 20_000).selectExpr("id AS k", "id * 3 AS payload")
    small = spark.range(0, 20_000).filter("id % 100 = 0").selectExpr(
        "id AS k", "id % 7 AS tag"
    )
    joined = sk.bloom_prune_join(big, small, "k")
    plain = big.join(small, "k")
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "element_at" in plan  # the literal-array probe is in the plan
    # the prefilter alone (before the join) keeps ~matches + FP only
    cond_df = sk.bloom_prune_join(
        big, small, "k", how="left_semi"
    )
    n = cond_df.count()
    true_matches = 200
    assert true_matches <= n <= true_matches + 0.01 * 20_000, n


def test_cusum_closed_form_matches_recursion(spark):
    """The window closed form (P_i - min(0, min P_j)) must equal the
    textbook clamped recursion s_i = max(0, s_{i-1} + y_i) on a
    series with a planted level shift, alarms included."""
    import datetime

    from data_transformation_python_spark.operators.selection import (
        cusum_changepoint,
    )

    counts = [3, 2, 3, 3, 2, 3, 9, 9, 8, 9, 9, 2, 3]  # shift at idx 6
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append(("feed", base + datetime.timedelta(hours=i, minutes=j)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = cusum_changepoint(df, h_x100=600).collect()[0].asDict()

    n = len(counts)
    mu = (100 * sum(counts)) // n
    s = mx = al = 0
    for c in counts:
        s = max(0, s + 100 * c - mu - 50)
        mx = max(mx, s)
        if s > 600:
            al += 1
    assert got == {
        "event_type": "feed",
        "n_hours": n,
        "mu_x100": mu,
        "max_cusum": mx,
        "n_alarm_hours": al,
    }, (got, mx, al)
    assert al > 0  # the planted shift actually alarms
