"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(jobhouse_spark.queries.registry): every SURVEY.md §2 operator is a
(Spark fn, DuckDB oracle SQL) pair registered there; this module just
exposes the registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jobhouse_spark.queries import all_queries  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary, SURVEY §2.B G1) at sf0.001."""
    return all_queries()["g1_groupby_agg"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for declared-but-not-
    hash-checkable ops (approx/streaming-timing/model-specific, §2.C.6)."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
