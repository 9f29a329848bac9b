"""P-family: projections, filters, predicates, nested access (SURVEY §2.B).

All predicates here are plain column expressions, so Catalyst pushes them
into the parquet scan (`PushedFilters` in the physical plan) and prunes
unread columns — the properties that matter most at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobhouse_spark.queries.registry import dec, dec_sql, fin, fin_sql, register
from jobhouse_spark.tables import Tables


@register(
    "p1_projection",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        f"{fin_sql(dec_sql('l_extendedprice') + ' * ' + dec_sql('1 - l_discount'))} AS rev "
        "FROM lineitem WHERE l_orderkey < 1000 ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("projection",),
)
def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: arithmetic projection; only 4 of 11 columns read from parquet."""
    l = Tables(spark, sf_dir).lineitem
    return (
        l.filter(F.col("l_orderkey") < 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            fin(dec(F.col("l_extendedprice")) * dec(F.lit(1) - F.col("l_discount"))).alias(
                "rev"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "p2_filter",
    oracle=(
        "SELECT COUNT(*) AS n FROM lineitem "
        "WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.06"
    ),
    tags=("filter", "headline"),
)
def p2_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: conjunctive comparison predicates, pushed to the scan."""
    l = Tables(spark, sf_dir).lineitem
    return l.filter(
        (F.col("l_quantity") > 30) & F.col("l_discount").between(0.02, 0.06)
    ).agg(F.count("*").alias("n"))


@register(
    "p3_null_predicates",
    oracle=(
        "SELECT COUNT(*) AS n_notnull, "
        "COUNT(CASE WHEN NULLIF(o_orderstatus,'F') IS NULL THEN 1 END) AS n_f, "
        + fin_sql("SUM(" + dec_sql("COALESCE(o_totalprice, 0)") + ")")
        + " AS total FROM orders WHERE o_totalprice IS NOT NULL"
    ),
    tags=("filter",),
)
def p3_null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: isNotNull / coalesce / nullif."""
    o = Tables(spark, sf_dir).orders
    return o.filter(F.col("o_totalprice").isNotNull()).agg(
        F.count("*").alias("n_notnull"),
        F.count(
            F.when(F.nullif(F.col("o_orderstatus"), F.lit("F")).isNull(), 1)
        ).alias("n_f"),
        fin(F.sum(dec(F.coalesce(F.col("o_totalprice"), F.lit(0))))).alias("total"),
    )


@register(
    "p4_in_like_case",
    oracle=(
        "SELECT o_orderpriority, "
        "CASE WHEN o_totalprice > 100000 THEN 'hi' ELSE 'lo' END AS cat, "
        "COUNT(*) AS n FROM orders "
        "WHERE o_orderstatus IN ('F','O') AND o_orderpriority LIKE '%URGENT%' "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("filter",),
)
def p4_in_like_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: IN-list + LIKE + CASE WHEN."""
    o = Tables(spark, sf_dir).orders
    return (
        o.filter(
            F.col("o_orderstatus").isin("F", "O")
            & F.col("o_orderpriority").like("%URGENT%")
        )
        .withColumn(
            "cat", F.when(F.col("o_totalprice") > 100000, "hi").otherwise("lo")
        )
        .groupBy("o_orderpriority", "cat")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority", "cat")
    )


@register(
    "p5_nested_access",
    oracle=(
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val "
        "FROM events WHERE event_id < 500 ORDER BY event_id"
    ),
    tags=("filter", "json"),
)
def p5_nested_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: nested-field access after from_json (reference A12 transform shape)."""
    e = Tables(spark, sf_dir).events
    return (
        e.filter(F.col("event_id") < 500)
        .select(
            "event_id",
            F.from_json(F.col("props"), "struct<k:int>").getField("k").alias("k_val"),
        )
        .orderBy("event_id")
    )
