"""O-family (sort/limit/top-k) and U-family (set ops) — SURVEY §2.B.

O3's global top-k compiles to TakeOrderedAndProject: each partition
keeps a k-row heap, the driver merges k×partitions rows — no global
sort of 100 TB ever happens. O1 (true global sort) is range-partitioned
by sampled boundaries, so it scales linearly too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobhouse_spark.queries.registry import fin, fin_sql, register
from jobhouse_spark.tables import Tables


@register(
    "o1_global_sort",
    oracle=(
        "SELECT o_orderkey, o_custkey, "
        f"{fin_sql('o_totalprice')} AS o_totalprice, o_orderpriority "
        "FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
    ),
    tags=("sort", "headline"),
)
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O3: multi-key global sort + limit → TakeOrderedAndProject."""
    o = Tables(spark, sf_dir).orders
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            fin(F.col("o_totalprice")).alias("o_totalprice"),
            "o_orderpriority",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "o2_limit_offset",
    oracle=(
        "SELECT o_orderkey, o_orderdate FROM orders "
        "ORDER BY o_orderkey LIMIT 20 OFFSET 10"
    ),
    tags=("sort",),
)
def o2_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: limit+offset over a total order."""
    o = Tables(spark, sf_dir).orders
    return o.select("o_orderkey", "o_orderdate").orderBy("o_orderkey").offset(10).limit(20)


@register(
    "o3_sort_nulls",
    oracle=(
        "SELECT n_nationkey, CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END AS rk "
        "FROM nation ORDER BY rk DESC NULLS LAST, n_nationkey"
    ),
    tags=("sort",),
)
def o3_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: explicit NULLS FIRST/LAST ordering semantics."""
    n = Tables(spark, sf_dir).nation
    return (
        n.select(
            "n_nationkey",
            F.when(F.col("n_regionkey") == 0, F.lit(None)).otherwise(F.col("n_regionkey")).alias("rk"),
        )
        .orderBy(F.col("rk").desc_nulls_last(), F.col("n_nationkey").asc())
    )


@register(
    "u1_union",
    oracle=(
        "SELECT c_nationkey AS nk FROM customer UNION "
        "SELECT s_nationkey AS nk FROM supplier ORDER BY nk"
    ),
    tags=("setop",),
)
def u1_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: UNION (distinct) via union + distinct."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nk"))
        .union(t.supplier.select(F.col("s_nationkey").alias("nk")))
        .distinct()
        .orderBy("nk")
    )


@register(
    "u1b_union_all_count",
    oracle=(
        "SELECT COUNT(*) AS n FROM "
        "(SELECT c_nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier)"
    ),
    tags=("setop",),
)
def u1b_union_all_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1b: UNION ALL preserves duplicates."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nk"))
        .unionAll(t.supplier.select(F.col("s_nationkey").alias("nk")))
        .agg(F.count("*").alias("n"))
    )


@register(
    "u2_intersect",
    oracle=(
        "SELECT c_nationkey AS nk FROM customer INTERSECT "
        "SELECT s_nationkey AS nk FROM supplier ORDER BY nk"
    ),
    tags=("setop",),
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: INTERSECT distinct."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nk"))
        .intersect(t.supplier.select(F.col("s_nationkey").alias("nk")))
        .orderBy("nk")
    )


@register(
    "u3_except",
    oracle=(
        "SELECT c_custkey AS ck FROM customer WHERE c_custkey < 100 EXCEPT "
        "SELECT o_custkey AS ck FROM orders WHERE o_custkey >= 50 ORDER BY ck"
    ),
    tags=("setop",),
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: EXCEPT distinct (filters keep the result non-trivially non-empty)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.filter(F.col("c_custkey") < 100)
        .select(F.col("c_custkey").alias("ck"))
        .subtract(
            t.orders.filter(F.col("o_custkey") >= 50).select(
                F.col("o_custkey").alias("ck")
            )
        )
        .orderBy("ck")
    )
