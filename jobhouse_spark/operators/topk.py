"""Top-k per group (SURVEY W4, Gold-mart pattern A18)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, group: str, order: list[Column], k: int) -> DataFrame:
    """row_number ≤ k per group; callers pass a total order (ties broken).

    Physical shape: one shuffle on ``group``; Spark runs a partial
    window sort per partition. For small k over huge groups a
    `groupBy().agg(slice(sort_array(collect_list(...))))` variant can
    avoid the full sort, but row_number keeps whole-stage codegen and
    benchmarked faster on wide payloads.
    """
    w = Window.partitionBy(group).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rn")
    )
