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
            # ONE aggregation per round (round 15, guide §2.3/§2.4):
            # the r14 loop shuffled label-sized data three times per
            # round — labels into the adjacency join, the neighbor-min
            # groupBy, then a LEFT JOIN of labels against neighbor_min
            # to apply the update and derive `changed`. Folding the
            # node's OWN label into the same aggregation as its
            # neighbors' (union + min, with an is_self marker) removes
            # the left join and its exchange outright: new label =
            # min(self, neighbors), changed = min < self-label. Edge
            # endpoints absent from `nodes` have no self row and are
            # dropped (has_self), exactly like the old left join's
            # labels-preserving side.
            contrib = (
                labels.join(adj, labels["node"] == adj["a"])
                .select(
                    F.col("b").alias("node"),
                    "component",
                    F.lit(False).alias("is_self"),
                )
                .unionByName(
                    labels.select("node", "component", F.lit(True).alias("is_self"))
                )
            )
            # LAZY checkpoint + one full-scan aggregate (round 15): the
            # r14 shape ran an EAGER checkpoint job and then a separate
            # limit(1).count() convergence probe — 2-3 scheduler jobs
            # per round of which the probe was pure overhead. A lazy
            # localCheckpoint materializes during the FIRST action, and
            # a global max("changed") is an action that computes every
            # partition (partial aggs leave no partition unscanned), so
            # one job both truncates the lineage (all blocks cached —
            # no fill-in job) and returns the convergence flag.
            updated = (
                contrib.groupBy("node")
                .agg(
                    F.min("component").alias("component"),
                    (
                        F.min("component")
                        < F.min(F.when(F.col("is_self"), F.col("component")))
                    ).alias("changed"),
                    F.max("is_self").alias("has_self"),
                )
                .filter("has_self")
                .select("node", "component", "changed")
            ).localCheckpoint(eager=False)
            any_changed = updated.agg(F.max("changed")).first()[0]
            labels = updated.drop("changed")
            if not any_changed:
                return labels
    finally:
        adj.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds "
        "(component diameter exceeds the iteration budget); raising instead "
        "of returning partially-propagated labels. Increase max_iterations."
    )
