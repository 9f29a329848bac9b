"""Isolated interleaved micro-A/B of the connected_components loop:
old (eager checkpoint + limit-probe) vs new (lazy checkpoint + max-agg)
on a synthetic star-cluster graph shaped like entity-resolution output
(many 2-3 node clusters). Fast reps so host waves are visible as
outliers instead of swamping the medians.

Usage: python tools/ab_cc_micro.py [reps] [n_clusters]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from jobhouse_spark.operators.graph import connected_components as new_cc
from jobhouse_spark.session import get_spark
from tools.ab_graph_probe import old_connected_components as old_cc


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    spark = get_spark("ab_cc_micro")
    sc = spark.sparkContext

    # star clusters of size 3: node 3k is the hub of {3k, 3k+1, 3k+2}
    nodes = spark.range(3 * n).select(F.col("id").alias("node"))
    edges = (
        spark.range(n)
        .select((F.col("id") * 3).alias("src"), (F.col("id") * 3 + 1).alias("dst"))
        .unionAll(
            spark.range(n).select(
                (F.col("id") * 3).alias("src"), (F.col("id") * 3 + 2).alias("dst")
            )
        )
    )
    nodes.count(), edges.count()  # warm inputs

    tracker = sc._jsc.sc().statusTracker()
    walls = {"old": [], "new": []}
    jobs = {"old": [], "new": []}
    for rep in range(reps):
        for tag, fn in (("old", old_cc), ("new", new_cc)):
            group = f"cc_{tag}_{rep}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            out = fn(nodes, edges, node_col="node")
            out.write.format("noop").mode("overwrite").save()
            walls[tag].append(time.perf_counter() - t0)
            jobs[tag].append(len(tracker.getJobIdsForGroup(group)))
            sc.setJobGroup("", "")
    for tag in ("old", "new"):
        warm = walls[tag][1:]
        print(
            f"{tag}: warm-median {statistics.median(warm):.3f}s "
            f"min {min(warm):.3f}s jobs/run {statistics.median(jobs[tag])} "
            f"(all: {[round(w, 2) for w in walls[tag]]})"
        )
    print(
        f"old/new median: "
        f"{statistics.median(walls['old'][1:]) / statistics.median(walls['new'][1:]):.3f}x   "
        f"old/new min: {min(walls['old'][1:]) / min(walls['new'][1:]):.3f}x"
    )


if __name__ == "__main__":
    main()
