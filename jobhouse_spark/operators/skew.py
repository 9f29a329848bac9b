"""Skew mitigation: salted aggregation and salted join (SCALE.md).

AQE's skew-join splitting handles most cases at runtime; salting is the
explicit fallback when one key dominates so heavily that even split
partitions bottleneck (e.g. the null-key or a celebrity entity in a
100 TB join). Semantics are proven equal to the unsalted ops in
tests/test_operators_scale.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe count: group on (key, salt) first — the hot
    key spreads over n_salts partitions — then combine partials."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").cast("bigint").alias("n"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    fact_cols: list[str] | None = None,
) -> DataFrame:
    """Replicated-dim salted equi join.

    The fact side gets a random salt in [0, n_salts); the dim side is
    replicated n_salts times with every salt value. The join key becomes
    (key, salt), so a hot fact key spreads across n_salts reducers while
    each dim row still meets every fact row exactly once.
    """
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    dim_s = dim.withColumn("__salt", F.explode(salts))
    joined = fact_s.join(dim_s, on=[key, "__salt"], how="inner").drop("__salt")
    return joined.select(fact_cols) if fact_cols else joined


def null_safe_join_key(col: Column, sentinel_salts: int = 64) -> Column:
    """Nulls are the classic mega-skew key in outer joins: map NULL to
    one of N sentinel values so null rows spread, then post-filter.
    (Inner joins should just drop nulls pre-join.)"""
    return F.when(
        col.isNull(),
        F.concat(F.lit("__null_"), (F.rand(seed=42) * sentinel_salts).cast("int").cast("string")),
    ).otherwise(col.cast("string"))
