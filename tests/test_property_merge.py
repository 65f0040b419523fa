"""Property-based tests: the distributed merge/retirement operators
must agree with a naive single-threaded Python model on arbitrary
generated change batches (hypothesis drives the batch shapes)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_transformation_python_spark.operators.cdc_retirement import (
    apply_cdc_retirement,
)
from data_transformation_python_spark.operators.merge import (
    apply_cdc_merge,
    dedup_keep_latest,
    merge_upsert,
)

KEYS = st.integers(min_value=1, max_value=8)
VALS = st.integers(min_value=0, max_value=100)
OPS = st.sampled_from(["I", "U", "D", "E", None])

base_strategy = st.dictionaries(KEYS, VALS, max_size=6)
batch_strategy = st.lists(
    st.tuples(KEYS, VALS, OPS), max_size=10
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _to_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@given(base=base_strategy, src=st.dictionaries(KEYS, VALS, max_size=6))
@_SETTINGS
def test_merge_upsert_model(spark, base, src):
    """merge_upsert == dict.update."""
    target = _to_df(
        spark, [(k, v) for k, v in base.items()] or [(0, 0)], "k bigint, v bigint"
    )
    if not base:
        target = target.filter("k < 0")
    source = _to_df(
        spark, [(k, v) for k, v in src.items()] or [(0, 0)], "k bigint, v bigint"
    )
    if not src:
        source = source.filter("k < 0")
    out = {r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()}
    expected = dict(base)
    expected.update(src)
    assert out == expected


@given(base=base_strategy, batch=batch_strategy)
@_SETTINGS
def test_cdc_merge_model(spark, base, batch):
    """apply_cdc_merge == sequential I/U/D application with keep-last
    intra-batch dedup and COALESCE(op,'U')."""
    # keep-last per key (ts = position in batch)
    last: dict = {}
    for i, (k, v, op) in enumerate(batch):
        last[k] = (i, v, op or "U")
    expected = dict(base)
    for k, (_, v, op) in last.items():
        if op == "D":
            expected.pop(k, None)
        elif op in ("U", "I") or k not in expected:
            # matched U/I update; any non-D op inserts when unmatched;
            # a matched op outside (U, I, D) — e.g. 'E' — keeps the
            # target row untouched (reference MERGE clause list)
            expected[k] = v

    target = _to_df(
        spark, [(k, v) for k, v in base.items()] or [(0, 0)], "k bigint, v bigint"
    )
    if not base:
        target = target.filter("k < 0")
    ts0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, v, op, ts0 + dt.timedelta(seconds=i))
        for i, (k, v, op) in enumerate(batch)
    ]
    schema = "k bigint, v bigint, __CDC_OPERATION string, __CDC_TIMESTAMP timestamp_ntz"
    source = _to_df(spark, rows or [(0, 0, "U", ts0)], schema)
    if not batch:
        source = source.filter("k < 0")
    out = {r.k: r.v for r in apply_cdc_merge(target, source, ["k"]).collect()}
    assert out == expected


@given(batch=batch_strategy)
@_SETTINGS
def test_retirement_invariants(spark, batch):
    """After applying any batch to an initial load: at most one active
    row per key; history is append-only (row count never decreases);
    every D/E key's active row is retired."""
    initial_keys = {1, 2, 3}
    ts0 = dt.datetime(2024, 1, 1)
    initial = _to_df(
        spark,
        [(k, 0, "I", ts0, None) for k in initial_keys],
        "k bigint, v bigint, __CDC_OPERATION string, "
        "__CDC_TIMESTAMP timestamp_ntz, obsolete_date timestamp_ntz",
    )
    rows = [
        (k, v, op, ts0 + dt.timedelta(seconds=i + 1))
        for i, (k, v, op) in enumerate(batch)
    ]
    schema = "k bigint, v bigint, __CDC_OPERATION string, __CDC_TIMESTAMP timestamp_ntz"
    bdf = _to_df(spark, rows or [(0, 0, "U", ts0)], schema)
    if not batch:
        bdf = bdf.filter("k < 0")
    out = apply_cdc_retirement(
        initial, bdf, ["k"], as_of="2024-06-01 00:00:00"
    ).collect()

    assert len(out) >= len(initial_keys)  # history preserved
    active = [r for r in out if r.obsolete_date is None]
    per_key: dict = {}
    for r in active:
        per_key[r.k] = per_key.get(r.k, 0) + 1
    # keep-last per key decides the final op
    last: dict = {}
    for i, (k, v, op) in enumerate(batch):
        last[k] = op or "U"
    for k, n in per_key.items():
        # 'I' on an already-active key creates a second active version
        # (reference semantics: inserts don't retire); other keys: 1
        if last.get(k) == "I" and k in initial_keys:
            assert n <= 2
        else:
            assert n == 1, (k, n, last.get(k))
    # D/E keys with an initial row must have no surviving active row
    # unless the winning change reinstated them
    for k, op in last.items():
        if op in ("D", "E") and k in initial_keys:
            assert per_key.get(k, 0) == 0


@given(
    rows=st.lists(
        st.tuples(KEYS, st.integers(min_value=0, max_value=1000)), max_size=12
    )
)
@_SETTINGS
def test_dedup_keep_latest_model(spark, rows):
    df = _to_df(spark, rows or [(0, 0)], "k bigint, ord bigint")
    if not rows:
        df = df.filter("k < 0")
    out = {
        r.k: r.ord
        for r in dedup_keep_latest(df, ["k"], ["ord"]).collect()
    }
    expected: dict = {}
    for k, o in rows:
        expected[k] = max(expected.get(k, -1), o)
    assert out == expected
