"""Distributed connected components — the cluster-formation step of
near-duplicate deduplication (pair graph → canonical-survivor groups).

The reference's dedup design stops at a pairwise metadata check
(`/root/reference/docs/Pipeline Architecture.mermaid:33`); at corpus
scale, near-dup pairs must be transitively closed so each duplicate
cluster keeps exactly one survivor. This is iterative min-label
propagation (the "hash-to-min" scheme): every node repeatedly adopts
the smallest label among itself and its neighbors until fixpoint —
O(diameter) rounds, each one shuffle on the node key.

Scale notes:
- Labels and edges are plain DataFrames; each round is a shuffle join
  co-partitioned on the node column, so AQE sizes/coalesces it.
- `localCheckpoint(eager=True)` truncates the lineage every round —
  without it, 10 rounds of self-referencing joins build an exponential
  plan that kills the driver long before the executors sweat.
- Duplicate clusters from near-dup detection are overwhelmingly tiny
  (pairs/triples), so the loop converges in 2-4 rounds regardless of
  corpus size; the worst case (one giant chain) is bounded by
  `max_iterations`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``nodes``: one column ``node_col`` (singletons allowed).
    ``edges``: undirected pairs ``src_col``/``dst_col``.
    """
    # Undirected adjacency: each edge probes in both directions.
    # PERSISTED for the loop — adj joins into EVERY round, and without
    # a cache each iteration would re-execute the caller's entire
    # edge-generation lineage (for entity resolution that is the whole
    # blocking + levenshtein pipeline: measured 5 min PER ROUND at the
    # 300k-name ladder before this cache, seconds after).
    adj = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .persist()
    )
    try:
        labels = nodes.select(
            F.col(node_col).alias("node"), F.col(node_col).alias("component")
        )
        for _ in range(max_iterations):
            # Smallest label among each node's neighbors this round.
            neighbor_min = (
                labels.join(adj, labels["node"] == adj["a"])
                .groupBy(F.col("b").alias("node"))
                .agg(F.min("component").alias("nbr_component"))
            )
            updated = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        "component", F.coalesce("nbr_component", "component")
                    ).alias("component"),
                    (
                        F.coalesce("nbr_component", "component") < F.col("component")
                    ).alias("changed"),
                )
            ).localCheckpoint(eager=True)
            n_changed = updated.filter("changed").limit(1).count()
            labels = updated.drop("changed")
            if n_changed == 0:
                return labels
    finally:
        adj.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds "
        "(component diameter exceeds the iteration budget); raising instead "
        "of returning partially-propagated labels. Increase max_iterations."
    )
