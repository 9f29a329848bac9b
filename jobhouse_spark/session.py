"""SparkSession factory tuned for the engine's determinism + scale contract.

Determinism (SURVEY.md §2.C): UTC session timezone so timestamps hash
identically against the DuckDB oracle; ANSI mode for standard SQL
semantics.

Scale: AQE on (runtime shuffle coalescing, skew-join splitting, dynamic
broadcast), Arrow for every Python<->JVM batch transfer. On a real
cluster only ``master``/memory change — everything else here is
cluster-safe: shuffle partitions are a starting hint that AQE re-coalesces
at runtime, so the same code runs on local[32] and on 1000 executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "jobhouse_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so tests and bench
    share one code path; pass an explicit cluster master in production.

    Multi-tenant sessions: pass
    ``extra_conf={"spark.scheduler.mode": "FAIR"}`` and have each query
    thread call ``sc.setLocalProperty("spark.scheduler.pool", <tenant>)``.
    Measured at 30x (SCALE.md, tools/concurrency_bench.py): under the
    default FIFO a 1.2 s query stuck behind big scans ran 5.3 s (4.3x
    interference); FAIR pools cap interference at ~1.4x on substantive
    queries and raise aggregate throughput (3.1x vs serial on 6
    concurrent queries). Scheduler mode is fixed at context start — it
    cannot be flipped on a live session.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # -- determinism contract (§2.C) --
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        # -- adaptive execution: the 100TB story. AQE re-plans at runtime:
        #    coalesces small shuffle partitions, splits skewed ones, and
        #    converts sort-merge joins to broadcast when a side turns out
        #    small. This is what makes one logical plan survive 1000x SF.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # starting hint only — AQE owns the real number at runtime
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        # -- Python boundary is always Arrow-batched, never per-row pickle
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode: the driver is the only JVM; give it the machine
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
