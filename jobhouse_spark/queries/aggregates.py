"""G-family: aggregations (SURVEY §2.B).

Every floating aggregate follows the §2.C discipline: cast to
DECIMAL(18,4) *before* accumulation (exact decimal addition in any
order, so Spark's partial+final two-phase agg and DuckDB's sequential
sum produce identical results), and final outputs re-cast to a fixed
decimal type so schemas agree.

Scale: all of these are map-side-partial + shuffle + final (G9) — the
shuffle carries one row per (group × partition), not per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobhouse_spark.queries.registry import dec, dec_sql, fin, fin_sql, register
from jobhouse_spark.tables import Tables


def _sum4(expr: str) -> str:
    return fin_sql(f"SUM({dec_sql(expr)})")


@register(
    "g1_groupby_agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_sum4('l_quantity')} AS sum_qty,
       {_sum4('l_extendedprice')} AS sum_base_price,
       {fin_sql('SUM(' + dec_sql('l_extendedprice') + ' * ' + dec_sql('1 - l_discount') + ')')} AS sum_disc_price,
       {fin_sql('AVG(' + dec_sql('l_quantity') + ')')} AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("agg", "headline", "flagship"),
)
def g1_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: TPC-H Q1 shape — the flagship pricing-summary aggregate."""
    l = Tables(spark, sf_dir).lineitem
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fin(F.sum(dec(F.col("l_quantity")))).alias("sum_qty"),
            fin(F.sum(dec(F.col("l_extendedprice")))).alias("sum_base_price"),
            fin(
                F.sum(dec(F.col("l_extendedprice")) * dec(F.lit(1) - F.col("l_discount")))
            ).alias("sum_disc_price"),
            fin(F.avg(dec(F.col("l_quantity")))).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "g2_count_distinct",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n FROM orders",
    tags=("agg",),
)
def g2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: exact distinct — expands to a two-phase agg under the hood."""
    o = Tables(spark, sf_dir).orders
    return o.agg(
        F.countDistinct("o_custkey").alias("n_cust"), F.count("*").alias("n")
    )


@register("g3_approx_count_distinct", oracle=None, tags=("agg", "approx"))
def g3_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: HLL++ approximate distinct — tolerance-checked in unit tests
    (§2.C rule 6), not hash-checked."""
    o = Tables(spark, sf_dir).orders
    return o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_n_cust")
    )


@register(
    "g4_rollup",
    oracle=(
        "SELECT n_name, c_mktsegment, COUNT(*) AS n FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY ROLLUP(n_name, c_mktsegment) "
        "ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST"
    ),
    tags=("agg",),
)
def g4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: rollup with NULL super-aggregate rows."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.nation, t.customer.c_nationkey == t.nation.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("n_name").asc_nulls_first(), F.col("c_mktsegment").asc_nulls_first()
        )
    )


@register(
    "g5_conditional_agg",
    oracle=(
        "SELECT CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned, "
        "CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted, "
        + fin_sql("SUM(" + dec_sql("l_extendedprice") + ") FILTER (WHERE l_returnflag = 'R')")
        + " AS returned_value FROM lineitem"
    ),
    tags=("agg",),
)
def g5_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: filtered/conditional aggregation."""
    l = Tables(spark, sf_dir).lineitem
    return l.agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("n_returned"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        fin(
            F.sum(F.when(F.col("l_returnflag") == "R", dec(F.col("l_extendedprice"))))
        ).alias("returned_value"),
    )


@register(
    "g6_percentiles",
    oracle=(
        f"SELECT {fin_sql('median(o_totalprice)')} AS med_price, "
        f"{fin_sql('quantile_cont(o_totalprice, 0.9)')} AS p90_price "
        "FROM orders"
    ),
    tags=("agg",),
)
def g6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: exact median / continuous percentile."""
    o = Tables(spark, sf_dir).orders
    return o.agg(
        fin(F.median("o_totalprice")).alias("med_price"),
        fin(F.percentile("o_totalprice", 0.9)).alias("p90_price"),
    )


@register(
    "g7_collect_set",
    oracle=(
        "SELECT c_nationkey, "
        "array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segs "
        "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"
    ),
    tags=("agg",),
)
def g7_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: collect_set normalized by array_sort (serialized to a string so
    the hash is list-representation agnostic)."""
    c = Tables(spark, sf_dir).customer
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias("segs")
        )
        .orderBy("c_nationkey")
    )


@register(
    "g8_stats",
    oracle=(
        f"SELECT {fin_sql('stddev_samp(l_quantity)')} AS sd_qty, "
        f"{fin_sql('var_samp(l_quantity)')} AS var_qty, "
        f"{fin_sql('corr(l_extendedprice, l_quantity)')} AS corr_pq "
        "FROM lineitem"
    ),
    tags=("agg",),
)
def g8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G8: sample stddev/variance/correlation (double math, dec-rounded)."""
    l = Tables(spark, sf_dir).lineitem
    return l.agg(
        fin(F.stddev_samp("l_quantity")).alias("sd_qty"),
        fin(F.var_samp("l_quantity")).alias("var_qty"),
        fin(F.corr("l_extendedprice", "l_quantity")).alias("corr_pq"),
    )


@register(
    "g9_partial_final",
    oracle=(
        f"SELECT l_suppkey, COUNT(*) AS n, {_sum4('l_extendedprice')} AS sum_price "
        "FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey"
    ),
    tags=("agg",),
)
def g9_partial_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9: high-cardinality group-by — exercises map-side partial agg;
    the shuffle carries (suppkey, partial) rows only. Semantically plain
    G1, physically HashAggregate(partial) → Exchange → HashAggregate(final)."""
    l = Tables(spark, sf_dir).lineitem
    return (
        l.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n"),
            fin(F.sum(dec(F.col("l_extendedprice")))).alias("sum_price"),
        )
        .orderBy("l_suppkey")
    )


@register(
    "g10_min_max_by",
    oracle="""
SELECT o_custkey, o_orderkey AS best_order, {p} AS best_price FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
  FROM orders) t
WHERE rn = 1 ORDER BY o_custkey
""".format(p=fin_sql("o_totalprice")),
    tags=("agg",),
)
def g10_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10: max_by with a composite (value, key) argument so ties are
    deterministic; oracle spells the same semantics as a window."""
    o = Tables(spark, sf_dir).orders
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias(
                "best_order"
            ),
            fin(F.max(F.struct("o_totalprice", "o_orderkey")).getField("o_totalprice")).alias(
                "best_price"
            ),
        )
        .orderBy("o_custkey")
    )


@register(
    "g16_bit_aggs",
    oracle="""
SELECT event_type,
       CAST(bit_and(CAST(event_id % 256 AS BIGINT)) AS BIGINT) AS band,
       CAST(bit_or(CAST(event_id % 256 AS BIGINT)) AS BIGINT) AS bor,
       CAST(bit_xor(CAST(event_id % 256 AS BIGINT)) AS BIGINT) AS bxor
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("agg", "bitwise"),
)
def g16_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G16: bitwise aggregates — commutative/associative, so partial
    aggregation is exact under any partitioning (bitmask rollups,
    permission-flag folds)."""
    e = Tables(spark, sf_dir).events
    b = (F.col("event_id") % 256).cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.bit_and(b).alias("band"),
            F.bit_or(b).alias("bor"),
            F.bit_xor(b).alias("bxor"),
        )
        .orderBy("event_type")
    )
