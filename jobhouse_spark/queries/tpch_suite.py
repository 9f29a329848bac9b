"""Full TPC-H-shape suite (Q2–Q22, adapted to the driver schema).

The driver's tables are a TPC-H subset (TESTDATA.md): there is no
``partsupp`` table and ``lineitem`` lacks commit/receipt dates and ship
mode/instruct; ``customer`` lacks phone/address. Each query below keeps
the *plan shape* of its TPC-H namesake — the join topology, subquery
form, and aggregation pattern that exercise the optimizer — with
predicates re-parameterized onto available columns. Adaptations are
noted per query. Q1/Q3/Q5/Q10 live in aggregates.py / analytics_shapes.py.

These are the Gold-layer mart shapes the reference's declared
architecture (docs/Pipeline Architecture.mermaid:26-31) would run.

Scale notes: every query keeps dims (nation/region/supplier/part at
their TPC-H proportions) broadcastable, facts shuffle at most once per
join key, and all floating aggregates follow the §2.C decimal
discipline so AQE / partial-agg reordering cannot change results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jobhouse_spark.queries.registry import dec, dec_sql, fin, fin_sql, register
from jobhouse_spark.tables import Tables

_REV = dec_sql("l_extendedprice") + " * " + dec_sql("1 - l_discount")


def _rev_col() -> F.Column:
    return dec(F.col("l_extendedprice")) * dec(F.lit(1) - F.col("l_discount"))


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part (adapted: supplier-part links come from
# lineitem instead of partsupp; "cost" is s_acctbal)
# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
WITH sp AS (
  SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem
)
SELECT p_partkey, p_brand, s_suppkey, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM (
  SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                            ORDER BY s.s_acctbal, s.s_suppkey) AS rn
  FROM part p
  JOIN sp ON sp.partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = sp.suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
) t
WHERE rn = 1
ORDER BY s_acctbal, p_partkey
LIMIT 100
""",
    tags=("tpch", "analytics"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part argmin over a 5-way join (the correlated
    min subquery, decorrelated as a ranking window). partsupp is absent
    from the driver schema, so supplier-part links are the distinct
    (l_partkey, l_suppkey) pairs and cost is s_acctbal."""
    t = Tables(spark, sf_dir)
    sp = t.lineitem.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    p = t.part.filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    joined = (
        p.join(sp, sp.partkey == p.p_partkey)
        .join(t.supplier, F.col("s_suppkey") == F.col("suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "p_brand", "s_suppkey",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
        .orderBy("s_acctbal", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 — order-priority checking (adapted: the EXISTS predicate is a
# returned-line check instead of commitdate < receiptdate)
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("tpch", "analytics"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join into a priority rollup. Spark
    plans the left-semi join shuffle-free on the already-partitioned
    orderkey at scale; no commitdate column exists so the existence
    predicate is 'has a returned line'."""
    t = Tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    returned = t.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (exact TPC-H shape; all columns exist)
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {fin_sql(f"SUM({dec_sql('l_extendedprice')} * {dec_sql('l_discount')})")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("tpch", "analytics", "headline"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the pushdown showcase.
    All predicates reach the parquet reader (min/max row-group skipping
    on l_shipdate); no shuffle beyond the single-row final agg."""
    l = Tables(spark, sf_dir).lineitem
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(fin(F.sum(dec(F.col("l_extendedprice")) * dec(F.col("l_discount")))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, {fin_sql('SUM(volume)')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year, {_REV} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                       AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    tags=("tpch", "analytics"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume — double nation join with a
    disjunctive cross-nation predicate, then a year rollup. Both nation
    joins broadcast; the three fact joins reuse the orderkey shuffle."""
    t = Tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    df = (
        t.supplier.join(
            t.lineitem.filter(
                F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31 00:00:00"))
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate"))
        .withColumn("volume", _rev_col())
    )
    return (
        df.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(fin(F.sum("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle=f"""
SELECT o_year,
       {fin_sql("CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0.0000 AS DECIMAL(18,4)) END) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE)", 6)} AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year, {_REV} AS volume, n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
    tags=("tpch", "analytics"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: 8-way join + conditional-share aggregate. The share is
    (decimal sum of one nation) / (decimal sum of all) computed in
    double after exact accumulation — identical in both engines. The
    zero branch of the CASE is decimal(18,4) so DuckDB's CASE unifies
    to decimal (not double) and sums stay exact."""
    t = Tables(spark, sf_dir)
    n1 = t.nation.select(F.col("n_nationkey").alias("n1_key"), "n_regionkey")
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    df = (
        t.part.filter(F.col("p_type") == "ECONOMY")
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            t.orders.filter(
                F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31 00:00:00"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("volume", _rev_col())
    )
    zero = dec(F.lit(0.0))
    return (
        df.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero))
                .cast("double")
                / F.sum("volume").cast("double")
            ).alias("share_raw")
        )
        .select("o_year", fin(F.col("share_raw"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (adapted: no ps_supplycost; profit = revenue)
# ---------------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle=f"""
SELECT nation, o_year, {fin_sql('SUM(amount)')} AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year, {_REV} AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    tags=("tpch", "analytics"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: part-name LIKE scan into a 5-way join, profit by
    supplier nation and order year. ps_supplycost does not exist in the
    driver schema, so amount is the revenue term only."""
    t = Tables(spark, sf_dir)
    return (
        t.part.filter(F.col("p_name").like("%red%"))
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _rev_col().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(fin(F.sum("amount")).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 — important stock (adapted: value = shipped qty × price per
# supplier-part from lineitem instead of partsupp)
# ---------------------------------------------------------------------------
@register(
    "q11_important_stock",
    oracle=f"""
WITH value_by_part AS (
  SELECT l_partkey AS partkey,
         SUM({dec_sql('l_extendedprice')} * {dec_sql('l_quantity')}) AS value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey
)
SELECT partkey, CAST(value AS DOUBLE) AS value
FROM value_by_part
WHERE value > (SELECT SUM(value) * 0.001 FROM value_by_part)
ORDER BY value DESC, partkey
""",
    tags=("tpch", "analytics"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped value with a HAVING threshold drawn from
    an uncorrelated scalar subquery over the same aggregate. The
    fraction multiply stays in decimal (exact) on both engines; the
    final projection is double."""
    t = Tables(spark, sf_dir)
    value_by_part = (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t.nation.filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(dec(F.col("l_extendedprice")) * dec(F.col("l_quantity"))).alias("value"))
    )
    value_by_part.createOrReplaceTempView("jh_q11_value_by_part")
    return Tables(spark, sf_dir).spark.sql(
        """
        SELECT partkey, CAST(value AS DOUBLE) AS value
        FROM jh_q11_value_by_part
        WHERE value > (SELECT SUM(value) * 0.001 FROM jh_q11_value_by_part)
        ORDER BY value DESC, partkey
        """
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-mode priority split (adapted: l_linestatus stands in for
# the missing l_shipmode)
# ---------------------------------------------------------------------------
@register(
    "q12_priority_split",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    tags=("tpch", "analytics"),
)
def q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join with a conditional priority
    split. l_shipmode is absent, so the grouping dimension is
    l_linestatus."""
    t = Tables(spark, sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.join(
            t.lineitem.filter(
                (F.col("l_shipdate") >= _ts("1996-01-01"))
                & (F.col("l_shipdate") < _ts("1997-01-01"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("tpch", "analytics"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: outer join with an extra join predicate, then a
    distribution-of-counts double aggregate (the o_comment NOT LIKE
    filter becomes a priority exclusion)."""
    t = Tables(spark, sf_dir)
    c_orders = (
        t.customer.join(
            t.orders.filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT {fin_sql("100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN " + _REV + " ELSE CAST(0.0000 AS DECIMAL(18,4)) END) AS DOUBLE) / CAST(SUM(" + _REV + ") AS DOUBLE)", 6)} AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
""",
    tags=("tpch", "analytics"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo share of one month's revenue — conditional
    decimal sums ratioed in double (exact numerators, deterministic
    division)."""
    t = Tables(spark, sf_dir)
    zero = dec(F.lit(0.0))
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= _ts("1996-09-01"))
            & (F.col("l_shipdate") < _ts("1996-10-01"))
        )
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _rev_col()).otherwise(zero)
                ).cast("double")
                / F.sum(_rev_col()).cast("double")
            ).alias("raw")
        )
        .select(fin(F.col("raw"), 6).alias("promo_revenue"))
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier by 3-month revenue
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    tags=("tpch", "analytics"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: view + scalar-subquery max. The revenue CTE sums exact
    decimals, so the equality against MAX is exact on both engines."""
    t = Tables(spark, sf_dir)
    revenue = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_col()).alias("total_revenue"))
    )
    revenue.createOrReplaceTempView("jh_q15_revenue")
    t.supplier.createOrReplaceTempView("jh_q15_supplier")
    return t.spark.sql(
        """
        SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM jh_q15_supplier JOIN jh_q15_revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM jh_q15_revenue)
        ORDER BY s_suppkey
        """
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count per part attribute (adapted: supplier-part links
# from lineitem; the excluded-supplier NOT IN uses acctbal < 0)
# ---------------------------------------------------------------------------
@register(
    "q16_part_supplier_counts",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    tags=("tpch", "analytics"),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT-IN anti-join + distinct-count by part
    attributes (complaint-comment exclusion becomes negative acctbal)."""
    t = Tables(spark, sf_dir)
    bad = t.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t.part.filter(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").like("PROMO%"))
            & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        )
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue
# ---------------------------------------------------------------------------
@register(
    "q17_small_qty_revenue",
    oracle=f"""
SELECT {fin_sql(f"SUM({dec_sql('l_extendedprice')})")} AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS agg_partkey,
         SUM({dec_sql('l_quantity')}) AS sum_qty, COUNT(*) AS cnt_qty
  FROM lineitem GROUP BY l_partkey
) pa ON agg_partkey = p_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND {dec_sql('l_quantity')} * 5 * cnt_qty < sum_qty
""",
    tags=("tpch", "analytics"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated average-quantity subquery, decorrelated to
    a pre-aggregate + join. The `qty < 0.2 * avg(qty)` predicate is
    algebraically rearranged to `5 * qty * count < sum` so both engines
    compare exact decimals/integers — no fp division at the threshold.
    (The /7.0 yearly scaling is dropped with the decimal discipline.)"""
    t = Tables(spark, sf_dir)
    part_avg = t.lineitem.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(dec(F.col("l_quantity"))).alias("sum_qty"),
        F.count("*").alias("cnt_qty"),
    )
    return (
        t.lineitem.join(
            F.broadcast(
                t.part.filter(
                    (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(part_avg, F.col("agg_partkey") == F.col("p_partkey"))
        .filter(dec(F.col("l_quantity")) * 5 * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(fin(F.sum(dec(F.col("l_extendedprice")))).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers
# ---------------------------------------------------------------------------
@register(
    "q18_large_volume_customer",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       {fin_sql(f"SUM({dec_sql('l_quantity')})")} AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM({dec_sql('l_quantity')}) > 250
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("tpch", "analytics", "headline"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN-subquery with HAVING over an exact decimal sum —
    the threshold predicate cannot drift across engines. The semi-join
    and the outer join reuse the same orderkey shuffle."""
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec(F.col("l_quantity"))).alias("sq"))
        .filter(F.col("sq") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(fin(F.sum(dec(F.col("l_quantity")))).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive predicate join (adapted: p_container/l_shipmode →
# p_size bands)
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT {fin_sql(f'SUM({_REV})')} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 1 AND l_quantity <= 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
       AND l_quantity >= 10 AND l_quantity <= 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
       AND l_quantity >= 20 AND l_quantity <= 35)
""",
    tags=("tpch", "analytics"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs residual on an equi join — Catalyst keeps
    the equi key for the join and evaluates the disjunction as a
    post-join filter (container/shipmode bands become size bands)."""
    t = Tables(spark, sf_dir)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
         & (q >= 1) & (q <= 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(11, 25)
           & (q >= 10) & (q <= 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(26, 50)
           & (q >= 20) & (q <= 35))
    )
    return (
        t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(fin(F.sum(_rev_col())).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (adapted: availability from shipped qty)
# ---------------------------------------------------------------------------
@register(
    "q20_potential_promotion",
    oracle=f"""
SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING SUM({dec_sql('l_quantity')}) > 100
  )
ORDER BY s_name
""",
    tags=("tpch", "analytics"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — suppliers in one nation
    who shipped > 100 units of 'small%' parts in 1996. partsupp
    availability becomes shipped-quantity from lineitem; the HAVING
    threshold compares an exact decimal sum."""
    t = Tables(spark, sf_dir)
    qualifying = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .join(
            F.broadcast(t.part.filter(F.col("p_name").like("small%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum(dec(F.col("l_quantity"))).alias("sq"))
        .filter(F.col("sq") > 100)
        .select("l_suppkey")
    )
    return (
        t.supplier.join(
            F.broadcast(t.nation.filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted: returnflag marks the
# "late" condition instead of receipt/commit dates)
# ---------------------------------------------------------------------------
@register(
    "q21_waiting_supplier",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_4'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    tags=("tpch", "analytics"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: the EXISTS + NOT-EXISTS double self-join — suppliers
    solely responsible for the returned line in multi-supplier finished
    orders. Both existence probes reuse the l_orderkey shuffle as
    semi/anti joins."""
    t = Tables(spark, sf_dir)
    t.register_views(("supplier", "lineitem", "orders", "nation"))
    return t.spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND n_name = 'NATION_4'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (adapted: nationkey bands replace phone
# country codes)
# ---------------------------------------------------------------------------
@register(
    "q22_global_sales_opportunity",
    oracle=f"""
SELECT cntrycode, COUNT(*) AS numcust, {fin_sql(f"SUM({dec_sql('c_acctbal')})")} AS totacctbal
FROM (
  SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_nationkey % 10 IN (1, 3, 5, 7)
    AND {dec_sql('c_acctbal')} > (
      SELECT {dec_sql('AVG(' + dec_sql('c_acctbal') + ')')} FROM customer
      WHERE c_acctbal > 0 AND c_nationkey % 10 IN (1, 3, 5, 7))
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
""",
    tags=("tpch", "analytics"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: above-average idle customers by country band — scalar
    subquery threshold + NOT EXISTS anti-join ("has never placed an
    urgent order" — every driver customer has some order). Phone
    country codes don't exist, so cntrycode = c_nationkey % 10. The avg threshold is
    computed on exact decimals and re-cast to decimal(18,4) so the
    comparison is identical in both engines. The threshold stays IN the
    plan (broadcast 1-row aggregate joined to the customer side) — no
    driver collect, the whole query is one Catalyst plan."""
    t = Tables(spark, sf_dir)
    band = F.col("c_nationkey") % 10
    eligible = t.customer.filter(band.isin(1, 3, 5, 7))
    avg_bal = (
        eligible.filter(F.col("c_acctbal") > 0)
        .agg(dec(F.avg(dec(F.col("c_acctbal")))).alias("__avg_bal"))
    )
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .filter(dec(F.col("c_acctbal")) > F.col("__avg_bal"))
        .join(t.orders.filter(F.col("o_orderpriority") == "1-URGENT"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select(band.cast("int").alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            fin(F.sum(dec(F.col("c_acctbal")))).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
