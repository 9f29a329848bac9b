"""Skew mitigation: salted aggregation and salted join (SCALE.md).

AQE's skew-join splitting handles most cases at runtime; salting is the
explicit fallback when one key dominates so heavily that even split
partitions bottleneck (e.g. the null-key or a celebrity entity in a
100 TB join). Semantics are proven equal to the unsalted ops in
tests/test_operators_scale.py.

Salts are DETERMINISTIC functions of row content — never
monotonically_increasing_id() or rand(). Those change value when a
failed task re-executes (Spark recomputes the partition, ids/draws come
out different), and a shuffle key that changes across attempts can
silently drop or duplicate rows during stage retry — a correctness
hazard that only manifests at scale with failures, so local tests pass
either way. Hashing the row's own columns gives the same salt on every
recompute.

``spread_identical_rows=True`` additionally mixes
``spark_partition_id()`` into the hash so literally-duplicate hot rows
(every column equal) spread over salts instead of collapsing onto one.
That is a TRADE: spark_partition_id() is marked non-deterministic, so
if the *upstream* distribution is itself non-deterministic (round-robin
``repartition()``, shuffle ordering races), a recomputed row can land
in a different partition and get a different salt across attempts —
reintroducing the retry hazard content salts exist to prevent. It is
therefore opt-in, OFF by default, and never applied when the caller
supplies explicit high-cardinality ``salt_cols`` (which already spread
without it). Enable it only for idempotent-input pipelines (stable
scans, no upstream repartition) where whole-row duplicates dominate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hashable(dt: T.DataType) -> bool:
    """xxhash64 rejects MapType (maps have no canonical element order),
    at any nesting depth; every other type hashes fine."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def _row_salt(
    df: DataFrame,
    n_salts: int,
    salt_cols: Sequence[str] | None,
    spread_identical_rows: bool = False,
) -> Column:
    if salt_cols:
        cols = list(salt_cols)
        mix_partition_id = False  # explicit salt cols already spread
    else:
        cols = [f.name for f in df.schema.fields if _hashable(f.dataType)]
        mix_partition_id = spread_identical_rows
    inputs: list[Column] = [F.col(c) for c in cols]
    if mix_partition_id:
        inputs = [F.spark_partition_id(), *inputs]
    if not inputs:
        # xxhash64() with zero inputs fails at analysis with an opaque
        # error; surface the real cause (e.g. every column map-typed
        # with partition-id mixing off) to the caller instead.
        raise ValueError(
            "no hashable columns to derive a salt from (all columns are "
            "map-typed?); pass salt_cols or enable spread_identical_rows"
        )
    return F.pmod(F.xxhash64(*inputs), F.lit(n_salts))


def salted_group_count(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_cols: Sequence[str] | None = None,
    spread_identical_rows: bool = False,
) -> DataFrame:
    """Two-phase skew-safe count: group on (key, salt) first — the hot
    key spreads over n_salts partitions — then combine partials."""
    salted = df.withColumn(
        "__salt", _row_salt(df, n_salts, salt_cols, spread_identical_rows)
    )
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").cast("bigint").alias("n"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    fact_cols: list[str] | None = None,
    salt_cols: Sequence[str] | None = None,
    spread_identical_rows: bool = False,
) -> DataFrame:
    """Replicated-dim salted equi join.

    The fact side gets a content-derived salt in [0, n_salts); the dim
    side is replicated n_salts times with every salt value. The join key
    becomes (key, salt), so a hot fact key spreads across n_salts
    reducers while each dim row still meets every fact row exactly once.
    """
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    fact_s = fact.withColumn(
        "__salt", _row_salt(fact, n_salts, salt_cols, spread_identical_rows)
    )
    dim_s = dim.withColumn("__salt", F.explode(salts))
    joined = fact_s.join(dim_s, on=[key, "__salt"], how="inner").drop("__salt")
    return joined.select(fact_cols) if fact_cols else joined


def null_safe_join_key(col: Column, spread_cols: Sequence[Column], sentinel_salts: int = 64) -> Column:
    """Nulls are the classic mega-skew key in outer joins: map NULL to
    one of N sentinel values so null rows spread, then post-filter.
    (Inner joins should just drop nulls pre-join.)

    The sentinel index is a hash of ``spread_cols`` (other columns of
    the same row) — deterministic under task retry, unlike rand().
    """
    idx = F.pmod(F.xxhash64(*spread_cols), F.lit(sentinel_salts))
    return F.when(
        col.isNull(),
        F.concat(F.lit("__null_"), idx.cast("string")),
    ).otherwise(col.cast("string"))
