"""Interleaved A/B for the round-15 connected_components change:
eager-checkpoint + limit(1).count() convergence probe (r14 shape, 2-3
scheduler jobs per closure round) vs lazy-checkpoint + single max()
aggregate (1 job per round). Old and new alternate in ONE session so
host-speed drift cancels (the r14 methodology); per-variant Spark JOB
COUNTS are captured via job groups, since the closure's checkpoint
truncation means the change is invisible in the final plan.

Usage: python tools/ab_graph_probe.py [reps] [query ...]
       (default 7 reps; queries default to jh8_employer_resolution)
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jobhouse_spark.queries import all_queries
from jobhouse_spark.session import get_spark


def old_connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """The round-14 loop body, verbatim (eager checkpoint + probe)."""
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
    raise RuntimeError("old_connected_components did not converge")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    names = sys.argv[2:] or ["jh8_employer_resolution"]
    spark = get_spark("ab_graph_probe")
    sc = spark.sparkContext
    qs = all_queries()

    import jobhouse_spark.operators.entity as entity_mod
    import jobhouse_spark.operators.graph as graph_mod

    new_cc = graph_mod.connected_components

    def set_cc(fn):
        # entity.py binds the symbol at import; patch every consumer
        entity_mod.connected_components = fn
        graph_mod.connected_components = fn

    tracker = sc._jsc.sc().statusTracker()

    for name in names:
        q = qs[name]
        walls = {"old": [], "new": []}
        jobs = {"old": [], "new": []}
        for rep in range(reps):
            for tag, fn in (("old", old_connected_components), ("new", new_cc)):
                set_cc(fn)
                group = f"ab_{name}_{tag}_{rep}"
                sc.setJobGroup(group, group)
                t0 = time.perf_counter()
                df = q.fn(spark, "/root/testdata/sf0.1")
                df.write.format("noop").mode("overwrite").save()
                walls[tag].append(time.perf_counter() - t0)
                jobs[tag].append(len(tracker.getJobIdsForGroup(group)))
                sc.setJobGroup("", "")
                spark.catalog.clearCache()
        set_cc(new_cc)
        for tag in ("old", "new"):
            warm = walls[tag][1:] if reps >= 3 else walls[tag]
            print(
                f"{name} {tag}: warm-median {statistics.median(warm):.3f}s "
                f"(all: {[round(w, 3) for w in walls[tag]]}) "
                f"jobs/run median {statistics.median(jobs[tag])}"
            )
        om = statistics.median(walls["old"][1:] if reps >= 3 else walls["old"])
        nm = statistics.median(walls["new"][1:] if reps >= 3 else walls["new"])
        print(f"{name}: old/new = {om / nm:.3f}x")


if __name__ == "__main__":
    main()
