"""Connected-components equivalence: the frontier min-label algorithm
and the large-star/small-star two-phase algorithm must agree with a
pure-Python union-find on arbitrary graphs — including the long-chain
shape where O(diameter) propagation is at its worst and O(log n)
two-phase is the scale answer."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_transformation_python_spark.operators.graph import (
    connected_components,
    connected_components_two_phase,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: every node -> min id in its component
    comps = {}
    for n in list(parent):
        comps.setdefault(find(n), set()).add(n)
    out = {}
    for root, members in comps.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run(spark, fn, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = fn(df, "src", "dst", shuffle_partitions=4)
    return {r["node"]: r["component"] for r in got.collect()}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=25,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_cc_algorithms_agree_on_random_graphs(spark, edges):
    edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
    want = _union_find(edges)
    # default hits the size-probed driver fast path on graphs this small
    assert _run(spark, connected_components, edges) == want
    # force the distributed frontier iteration — must agree exactly
    assert (
        _run(
            spark,
            lambda df, s, d, **kw: connected_components(
                df, s, d, max_driver_edges=0, **kw
            ),
            edges,
        )
        == want
    )
    assert _run(spark, connected_components_two_phase, edges) == want


def test_two_phase_handles_long_chain(spark):
    """A 64-node chain: diameter 63 — min-label would need >20 default
    rounds; two-phase collapses it within its O(log n) budget."""
    chain = [(i, i + 1) for i in range(63)]
    got = _run(spark, connected_components_two_phase, chain)
    assert got == {i: 0 for i in range(64)}


def test_two_phase_star_and_isolated_shapes(spark):
    edges = [(5, 1), (5, 9), (5, 7), (2, 3)]
    got = _run(spark, connected_components_two_phase, edges)
    assert got == {1: 1, 5: 1, 7: 1, 9: 1, 2: 2, 3: 2}


def test_pagerank_matches_python_reference(spark):
    """Integer PageRank vs an independent pure-Python fixed-point on a
    small weighted digraph (including a dangling node and a sink)."""
    from data_transformation_python_spark.operators.graph import (
        pagerank_fixed,
    )

    edges = [
        (1, 2, 3),
        (1, 3, 1),
        (2, 3, 2),
        (3, 1, 1),
        (4, 1, 5),  # 4 has out-edges; 5 is reachable-only (dangling)
        (2, 5, 1),
    ]
    SCALE, D, K = 1_000_000, 85, 3
    wout: dict[int, int] = {}
    for s, _, w in edges:
        wout[s] = wout.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    r = {n: SCALE for n in nodes}
    for _ in range(K):
        c = {n: 0 for n in nodes}
        for s, d, w in edges:
            c[d] += (r[s] * w) // wout[s]
        r = {n: ((100 - D) * SCALE + D * c[n]) // 100 for n in nodes}
    df = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
    got = {
        row["node"]: row["rank_q"]
        for row in pagerank_fixed(df, iterations=K).collect()
    }
    assert got == r
