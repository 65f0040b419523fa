"""Iterative graph operators: connected components over an edge list.

Used by the dedup pipeline to turn verified near-duplicate *pairs*
into duplicate *groups* (transitive closure) — pair-level keep-smallest
misses chains A~B, B~C where (A,C) was never compared.

Algorithm: minimum-label propagation with a *frontier* (delta
iteration).  Each node starts labeled with itself; each round only the
nodes whose label changed last round offer their label to neighbors
(a label acquired in round k is offered in round k+1, so the fixpoint
is the same as full propagation while the per-round shuffle shrinks
with the frontier — the pattern GraphX/Flink delta iterations use).
Rounds = graph diameter (near-dup clusters are tiny: 2-4 rounds).

Control plane: one materialization job per round (eager checkpoint of
the new labels); the convergence probe and the next frontier both read
the already-materialized partitions instead of re-running the round's
shuffle, and lineage is cut so the plan does not grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_union_find(edge_rows) -> list[tuple]:
    """Exact min-label components for a control-plane-sized edge list:
    union-find with path compression, then label every member with the
    component's minimum node id — identical results to the distributed
    iteration."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_rows:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        # a NULL endpoint registers its node but never unions — the
        # distributed iteration's join semantics (NULL matches nothing)
        if a is None or b is None:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        if n is not None and (
            r not in comp_min or comp_min[r] is None or n < comp_min[r]
        ):
            comp_min[r] = n
        comp_min.setdefault(r, n)
    return [(n, comp_min[find(n)]) for n in parent]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    shuffle_partitions: int | None = None,
    reliable_checkpoint: bool | None = None,
    max_driver_edges: int = 200_000,
) -> DataFrame:
    """Return (node, component) where component = min node id in the
    connected component.  Nodes = every id appearing in the edge list.

    **Size-probed fast path**: the near-dup pair graph is usually
    orders of magnitude smaller than the corpus; when the materialized
    edge count is ≤ ``max_driver_edges`` (a broadcast-build-sized
    budget, like the neardup BLAS probe) the components are solved in
    one driver-side union-find pass instead of paying
    O(diameter) distributed rounds of fixed job latency.  Identical
    results by construction; set ``max_driver_edges=0`` to force the
    distributed iteration.

    ``shuffle_partitions`` temporarily overrides the session shuffle
    width for the iterative rounds: near-dup pair graphs are usually
    tiny relative to the corpus, and paying the full session shuffle
    width per round is pure scheduling overhead.  Size it to the edge
    count at scale (None keeps the session setting).

    ``reliable_checkpoint=True`` uses ``DataFrame.checkpoint()``
    (requires ``spark.sparkContext.setCheckpointDir``) instead of
    ``localCheckpoint``: local checkpoints live in executor block
    storage and die with an executor, which on a real cluster kills a
    long-running iteration; reliable checkpoints survive executor
    loss.  The default (None) defers to the session-wide policy in
    ``operators.transform.materialize`` — setting a checkpoint dir
    flips every iteration to the reliable path.
    """
    from .transform import materialize

    spark = edges.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))

    def _materialize(df: DataFrame) -> DataFrame:
        if reliable_checkpoint is None:
            return materialize(df)
        if reliable_checkpoint:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    try:
        # Materialize the (possibly expensive) upstream edge plan ONCE,
        # then build the symmetric closure from the cached frame — a
        # union of plan + swapped plan would recompute the whole edge
        # subtree twice.
        ed = _materialize(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
        if max_driver_edges and ed.count() <= max_driver_edges:
            pairs = _driver_union_find(
                [(r["a"], r["b"]) for r in ed.collect()]
            )
            node_type = ed.schema["a"].dataType.simpleString()
            return spark.createDataFrame(
                pairs or [(None, None)],
                f"node {node_type}, component {node_type}",
            ).filter("node IS NOT NULL")
        both = _materialize(
            ed.union(ed.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
        )
        labels = (
            both.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
        )
        # Round 1: every node is in the frontier.
        frontier = labels
        for _ in range(max_iterations):
            offers = (
                both.join(frontier, both.b == frontier.node)
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("component").alias("offer"))
            )
            new_labels = _materialize(
                labels.join(offers, "node", "left").select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("offer"), F.col("component")),
                    ).alias("component"),
                    (F.col("offer") < F.col("component")).alias("__changed"),
                )
            )
            # Both the convergence probe and the next frontier scan the
            # materialized partitions — no extra shuffle, no re-run.
            frontier = new_labels.filter("__changed").select("node", "component")
            labels = new_labels.select("node", "component")
            any_changed = new_labels.agg(
                F.max(F.coalesce(F.col("__changed"), F.lit(False)))
            ).first()[0]
            if not any_changed:
                break
        return labels
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def connected_components_two_phase(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
    shuffle_partitions: int | None = None,
    reliable_checkpoint: bool | None = None,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — the web-scale
    path: converges in O(log n) alternating rounds on ANY graph shape,
    where min-label propagation needs O(diameter) rounds (a 10M-node
    chain would need 10M rounds; this needs ~24).

    - **large-star(u)**: connect every neighbor v > u to the minimum
      of Γ⁺(u) = neighbors ∪ {u}.
    - **small-star(u)**: connect every neighbor v ≤ u (and u itself)
      to that minimum.

    Both are one groupBy(u) + re-emit per round; each round strictly
    reduces total edge weight until the graph is a forest of stars,
    whose centers are the component minima.  Same return contract as
    ``connected_components``: (node, component=min id in component).
    """
    from .transform import materialize

    spark = edges.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))

    def _materialize(df: DataFrame) -> DataFrame:
        if reliable_checkpoint is None:
            return materialize(df)
        if reliable_checkpoint:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    def _neighborhood_min(e: DataFrame) -> DataFrame:
        # min of Γ⁺(u): neighbors plus u itself
        return (
            e.select("u", "v")
            .union(e.select(F.col("u"), F.col("u").alias("v")))
            .groupBy("u")
            .agg(F.min("v").alias("m"))
        )

    try:
        ed = _materialize(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
        nodes = _materialize(
            ed.select(F.col("u").alias("node"))
            .union(ed.select(F.col("v").alias("node")))
            .distinct()
        )
        # symmetric, self-loop-free working edge set
        e = _materialize(
            ed.union(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        for _ in range(max_iterations):
            # -- large-star: (v, m) for v in Γ(u), v > u --------------
            mins = _neighborhood_min(e)
            ls = (
                e.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            e1 = _materialize(
                ls.union(ls.select(F.col("v").alias("u"), F.col("u").alias("v")))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )
            # -- small-star: (v, m) for v in Γ(u) with v ≤ u, + (u, m)
            mins1 = _neighborhood_min(e1)
            ss = (
                e1.join(mins1, "u")
                .filter(F.col("v") <= F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .union(
                    mins1.select(F.col("u"), F.col("m").alias("v"))
                )
            )
            e2 = _materialize(
                ss.union(ss.select(F.col("v").alias("u"), F.col("u").alias("v")))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )
            # converged when the round was a no-op (star forest):
            # compare materialized edge sets (both tiny scans of
            # cached partitions)
            if (
                e2.count() == e.count()
                and e2.exceptAll(e).limit(1).count() == 0
            ):
                e = e2
                break
            e = e2
        # star forest: every node's component = min neighbor (the
        # center), centers and isolated nodes label themselves
        comp = (
            e.groupBy("u")
            .agg(F.min("v").alias("c"))
            .select(F.col("u").alias("node"), F.least("c", "u").alias("component"))
        )
        return (
            nodes.join(comp, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("component"), F.col("node")).alias("component"),
            )
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def pagerank_fixed(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    iterations: int = 3,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Weighted PageRank by a FIXED number of synchronous iterations
    in integer arithmetic: r_{t+1}(v) = ((100-d)·scale + d·Σ_{u→v}
    (r_t(u)·w(u,v)) DIV W_out(u)) DIV 100 — every step is BIGINT
    multiply/DIV, so the trajectory (not just the limit) replays
    bit-exactly in an unrolled SQL oracle.  Dangling mass is dropped
    (the standard simplification; deterministic on both engines).

    Scale posture: the classic iterative-join shape — each iteration
    is one shuffle join of the rank vector against the edge list on
    src plus one groupBy on dst, with the rank vector persisted
    serialized per step (rolling unpersist) and a lineage cut every
    few iterations so deep runs keep a bounded plan.  Nodes-sized
    state, edges-sized work per iteration, O(iterations) rounds —
    Pregel's PageRank as DataFrame plans.

    Returns (node, rank_q) with rank_q in scale-quantized units.
    """
    from pyspark import StorageLevel

    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("bigint").alias("w"),
    )
    wout = e.groupBy("src").agg(F.sum("w").alias("w_out"))
    # The edge table is reused every iteration but never re-derived
    # from an iterated plan, so it needs CACHING, not a lineage cut:
    # persist(MEMORY_AND_DISK) spills edge blocks past executor memory
    # (a localCheckpoint here pinned the whole edge table in block
    # storage and OOM'd the 500k-doc sweep point; at cluster scale the
    # edge list is a table, not driver-adjacent memory).  Both reused
    # sides are cached PRE-PARTITIONED on their join key —
    # InMemoryTableScan preserves outputPartitioning, so each
    # iteration's edge⋈ranks join shuffles ONLY the nodes-sized rank
    # vector (the edge side, the big one, never moves again), and the
    # nodes⋈contrib left join is shuffle-free on both sides (contrib
    # exits its groupBy already hash-partitioned on node).  This is
    # the DataFrame analogue of Pregel's static graph partitioning.
    # partition count matches spark.sql.shuffle.partitions so the
    # cached layout aligns with every groupBy/join exchange
    npart = int(
        e.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # Caches are persisted partitioned AND sorted on their join key,
    # and every per-iteration join carries a MERGE hint (optimization
    # round 14): the rank vector sits under the session's 64 MB
    # autoBroadcastJoinThreshold at bench scale, so AQE picked
    # BroadcastHashJoin and the driver COLLECTED + re-broadcast the
    # full nodes-sized vector every iteration (measured ~5 s/iter at
    # 1.5M nodes; 0.6 s with the hinted plan).  With both sides
    # cached partitioned+sorted, the SMJ needs zero exchange and zero
    # sort on the cached side — each iteration shuffles only the
    # freshly aggregated contrib vector, which is the Pregel minimum.
    e = (
        e.join(wout, "src")
        .repartition(npart, "src")
        .sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(npart, "node")
        .sortWithinPartitions("node")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranks = nodes.select("node", F.lit(scale).cast("bigint").alias("rank_q"))
    base = (100 - damping_pct) * scale
    # Per-iteration rank vectors persist SERIALIZED with the previous
    # step dropped once the next is materialized — an eager
    # localCheckpoint here stored the vector as deserialized JVM
    # objects and stacked every iteration's blocks, the same
    # GC-pause roulette the BPE trainer hit (17-55 s swings); the
    # serialized persist + rolling unpersist holds steady.
    prev = None
    for it in range(iterations):
        contrib = (
            e.join(
                ranks.withColumnRenamed("node", "src").hint("merge"),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank_q * w) DIV w_out").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c_sum"))
        )
        ranks = nodes.join(contrib.hint("merge"), "node", "left").select(
            "node",
            F.expr(
                f"CAST(({base} + {damping_pct} * coalesce(c_sum, 0))"
                " DIV 100 AS BIGINT)"
            ).alias("rank_q"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        ranks.count()
        if prev is not None:
            prev.unpersist()
        prev = ranks
        if (it + 1) % 8 == 0:
            # bounded analyzed-plan depth for deep runs: the persisted
            # vector caps RE-COMPUTE, but Catalyst still walks the full
            # nested tree each iteration — cut it periodically
            from .transform import materialize

            ranks = materialize(ranks)
            prev.unpersist()
            prev = None
    e.unpersist()
    nodes.unpersist()
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 3,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin: the same synchronous updates unrolled as CTE
    stages r0 → r{k} over an ``edges_sql`` relation producing
    (src, dst, w)."""
    base = (100 - damping_pct) * scale
    parts = [
        f"WITH e0 AS ({edges_sql})",
        ",wout AS (SELECT src, CAST(SUM(w) AS BIGINT) AS w_out"
        " FROM e0 GROUP BY src)",
        ",e AS (SELECT e0.src, e0.dst, CAST(e0.w AS BIGINT) AS w, wout.w_out"
        " FROM e0 JOIN wout USING (src))",
        ",nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e"
        " UNION SELECT dst AS node FROM e))",
        f",r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank_q FROM nodes)",
    ]
    for i in range(iterations):
        parts.append(
            f",c{i} AS MATERIALIZED (SELECT e.dst AS node,"
            f" SUM((r.rank_q * e.w) // e.w_out) AS c_sum"
            f" FROM e JOIN r{i} r ON e.src = r.node GROUP BY e.dst)"
        )
        parts.append(
            f",r{i + 1} AS MATERIALIZED (SELECT nodes.node,"
            f" CAST(({base} + {damping_pct} * COALESCE(c{i}.c_sum, 0)) // 100"
            f" AS BIGINT) AS rank_q"
            f" FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node)"
        )
    return "\n".join(parts) + f"\nSELECT node, rank_q FROM r{iterations}"
