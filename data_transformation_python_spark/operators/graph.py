"""Iterative graph operators: connected components over an edge list.

Used by the dedup pipeline to turn verified near-duplicate *pairs*
into duplicate *groups* (transitive closure) — pair-level keep-smallest
misses chains A~B, B~C where (A,C) was never compared.

Algorithm: minimum-label propagation. Each node starts labeled with
itself; every round each node takes the min label in its neighborhood;
stop when no label changes.  Rounds = graph diameter (near-dup
clusters are tiny, so 2-4 rounds in practice).  Each round is one
shuffle on node id; lineage is cut with localCheckpoint so the plan
does not grow unboundedly — the standard pattern for iterative
DataFrame algorithms (GraphX/GraphFrames use the same big-star idea).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Return (node, component) where component = min node id in the
    connected component.  Nodes = every id appearing in the edge list.

    ``shuffle_partitions`` temporarily overrides the session shuffle
    width for the iterative rounds: near-dup pair graphs are usually
    tiny relative to the corpus, and paying the full session shuffle
    width per round is pure scheduling overhead.  Size it to the edge
    count at scale (None keeps the session setting).
    """
    spark = edges.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        both = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        labels = (
            both.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
        )
        for _ in range(max_iterations):
            neighbor_min = (
                both.join(labels, both.b == labels.node)
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("component").alias("nbr_component"))
            )
            new_labels = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_component"), F.col("component")),
                    ).alias("component"),
                )
            )
            # convergence check + lineage cut (one small job per round)
            new_labels = new_labels.localCheckpoint(eager=True)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        return labels
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
