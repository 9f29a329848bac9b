"""Dump the physical plan of ONE connected_components round, old (r14)
vs new (r15) shape, so the removed label-sized exchange is visible as a
plan diff (the closure's checkpoint truncation hides it from the final
query plans). Writes plans/r15/cc_round_{old,new}.txt and prints the
per-round Exchange counts.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from jobhouse_spark.session import get_spark


def main() -> None:
    spark = get_spark("cc_round_plans")
    n = 10_000
    nodes = spark.range(3 * n).select(F.col("id").alias("node"))
    edges = spark.range(n).select(
        (F.col("id") * 3).alias("src"), (F.col("id") * 3 + 1).alias("dst")
    )
    adj = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    labels = nodes.select(F.col("node"), F.col("node").alias("component"))

    # r14 round body: join -> neighbor-min groupBy -> LEFT JOIN update
    neighbor_min = (
        labels.join(adj, labels["node"] == adj["a"])
        .groupBy(F.col("b").alias("node"))
        .agg(F.min("component").alias("nbr_component"))
    )
    old_round = labels.join(neighbor_min, "node", "left").select(
        "node",
        F.least("component", F.coalesce("nbr_component", "component")).alias(
            "component"
        ),
        (F.coalesce("nbr_component", "component") < F.col("component")).alias(
            "changed"
        ),
    )

    # r15 round body: self rows folded into ONE aggregation, no join-back
    contrib = (
        labels.join(adj, labels["node"] == adj["a"])
        .select(F.col("b").alias("node"), "component", F.lit(False).alias("is_self"))
        .unionByName(labels.select("node", "component", F.lit(True).alias("is_self")))
    )
    new_round = (
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
    )

    for tag, df in (("old", old_round), ("new", new_round)):
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = f"/root/repo/plans/r15/cc_round_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(p)
        n_ex = len(re.findall(r"^\(\d+\) Exchange", p, re.M))
        print(f"{tag}: {n_ex} exchanges -> {path}")


if __name__ == "__main__":
    main()
