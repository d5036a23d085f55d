"""Distributed connected components (min-label propagation).

The Pregel shape expressed in DataFrames: labels start as the node
id and each round takes the min over the node's neighborhood until a
round changes nothing. Rounds = graph diameter — near-dup components
are stars/short chains, so convergence is 2-3 rounds in practice.
Each round is one shuffle keyed on node id; the graph never moves to
the driver.

Shared by x17_dedup_clusters (text near-dup components) and
x26_semdedup (embedding near-dup components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Components of an undirected graph given as directed (src, dst)
    edge rows (pass both directions for undirected semantics).

    Returns (node, component) for every node appearing in ``edges``,
    where component is the minimum node id reachable from the node.
    ``edges`` is persisted internally (it feeds every iteration).
    """
    edges = edges.select("src", "dst").persist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        nbr = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
