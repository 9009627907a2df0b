"""Distributed connected components over an edge DataFrame.

The operator that turns near-duplicate PAIRS into duplicate CLUSTERS — the
step every large-scale training-data dedup pipeline needs between candidate
generation (MinHash-LSH / shingle Jaccard) and "keep one doc per cluster".
The reference has no graph surface at all (▲ north-star).

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round every node takes the min of its own label and its
neighbors' labels; fixpoint = components labeled by their minimum node id.
Rounds needed = graph diameter — near-dup graphs are dense clumps with tiny
diameters (2-4), so this converges in a handful of rounds. For adversarial
long-chain graphs, the large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond") halves the diameter per
round; the propagation loop below is the right default for dedup workloads.

Scale posture per round:
- ONE shuffle join (edges ⋈ labels on node key) + ONE aggregation, both
  hash-partitioned on the node key, so successive rounds reuse partitioning.
- labels are (long, long) pairs — the shuffle payload is 16 bytes/row no
  matter how wide the documents are.
- ``localCheckpoint`` truncates lineage each round; without it the plan
  doubles every iteration and the driver OOMs planning round ~15.
- convergence is detected from ``sum(label)``: labels only ever decrease,
  so an unchanged sum IS the fixpoint — one cheap scalar agg per round
  instead of a join-and-compare of consecutive label sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Return (node, component_id) for every node appearing in ``edges``,
    where component_id is the minimum node id in the component.

    ``edges`` is treated as undirected; self-loops and duplicates are fine.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iterations`` — partial labels are silently WRONG component ids
    (a long-chain graph whose diameter exceeds the budget would split one
    component into many), so exhaustion must never return. Near-dup graphs
    converge in a handful of rounds; a raise here means the input is not a
    dedup-shaped graph — raise the budget or switch to a diameter-halving
    scheme (large-star/small-star, Kiveris et al.).
    """
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        bidir.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    converged = False
    for _ in range(max_iterations):
        nbr_min = (
            bidir.join(labels, bidir.v == labels.node)
            .groupBy(F.col("u").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations (graph diameter exceeds the propagation budget); "
            "partial labels would be wrong — raise max_iterations or use a "
            "diameter-halving variant"
        )
    return labels.select("node", F.col("label").alias("component_id"))
