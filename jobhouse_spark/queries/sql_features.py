"""Spark 4 SQL-surface features: recursive CTEs, lateral joins,
ordered-set string aggregation, and the VARIANT semi-structured type.

These widen the analytical contract (SURVEY §2.B) with shapes a
warehouse user of the reference would expect from a modern engine:

- ``sq4`` gap-filled date spine via ``WITH RECURSIVE`` — the standard
  mart pattern for "every day, even empty ones" (the reference's daily
  batch cadence, dags/extract_raw_jobs.py:53-55, makes day-complete
  marts the natural grain).
- ``sq5`` correlated ``LATERAL`` top-k — Catalyst decorrelates the
  per-row limit into a ranked window, so it scales like w4, not like a
  nested loop.
- ``g15`` ``listagg(...) WITHIN GROUP`` ordered string aggregation.
- ``f9`` ``parse_json`` → ``VARIANT`` → ``variant_get`` over the real
  JSON ``events.props`` column — the typed fast path for
  semi-structured data (vs. f6's per-access string re-parse with
  ``get_json_object``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobhouse_spark.queries.registry import dec, dec_sql, fin_sql, register
from jobhouse_spark.tables import Tables


@register(
    "sq4_recursive_spine",
    oracle="""
WITH RECURSIVE spine(d) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT d + 1 FROM spine WHERE d < DATE '1995-03-31'
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         COUNT(*) AS n,
         SUM({dec}) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
  GROUP BY 1
)
SELECT CAST(spine.d AS VARCHAR) AS day,
       COALESCE(daily.n, 0) AS n_orders,
       {rev} AS revenue
FROM spine LEFT JOIN daily ON spine.d = daily.d
ORDER BY day
""".format(
        dec=dec_sql("o_totalprice"),
        rev=fin_sql("COALESCE(daily.rev, 0)"),
    ),
    tags=("subquery", "recursive", "spine"),
)
def sq4_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ4: gap-filled daily order mart over a WITH RECURSIVE date spine
    (Spark 4 recursive CTE). Scale note: the spine is O(days) rows on a
    single partition — trivially small — while `daily` pre-aggregates
    the fact table *before* the spine join, so the join input is one row
    per day, never per order."""
    Tables(spark, sf_dir).orders.createOrReplaceTempView("jh_sqf_orders")
    return spark.sql(
        """
WITH RECURSIVE spine(d) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT date_add(d, 1) FROM spine WHERE d < DATE '1995-03-31'
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         COUNT(*) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM jh_sqf_orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
  GROUP BY 1
)
SELECT CAST(spine.d AS STRING) AS day,
       COALESCE(daily.n, 0) AS n_orders,
       CAST(CAST(COALESCE(daily.rev, 0) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM spine LEFT JOIN daily ON spine.d = daily.d
ORDER BY day
"""
    )


@register(
    "sq5_lateral_topk",
    oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
""",
    tags=("subquery", "lateral", "topk"),
)
def sq5_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ5: correlated LATERAL subquery — top-2 customers by balance per
    nation. Catalyst decorrelates the lateral limit into a partitioned
    rank (same physical shape as w4_topk_per_group), so this is one
    shuffle by nationkey at scale, not a per-nation re-scan."""
    t = Tables(spark, sf_dir)
    t.nation.createOrReplaceTempView("jh_sqf_nation")
    t.customer.createOrReplaceTempView("jh_sqf_customer")
    return spark.sql(
        """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM jh_sqf_nation n,
LATERAL (SELECT c_name, c_acctbal FROM jh_sqf_customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
"""
    )


@register(
    "g15_listagg",
    oracle="""
SELECT r.r_name,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
       COUNT(*) AS n
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name ORDER BY r.r_name
""",
    tags=("agg", "string"),
)
def g15_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G15: ordered-set string aggregation — listagg WITHIN GROUP
    (Spark 4). The WITHIN GROUP ordering makes the concatenation
    deterministic across any partitioning, which is what makes this
    safe on a cluster (an unordered collect_list+concat_ws is not)."""
    t = Tables(spark, sf_dir)
    return (
        t.nation.join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name")
        .agg(
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias(
                "nations"
            ),
            F.count("*").alias("n"),
        )
        .orderBy("r_name")
    )


@register(
    "f9_variant",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
       COUNT(*) AS n
FROM events
GROUP BY event_type ORDER BY event_type
""",
    tags=("function", "json", "variant"),
)
def f9_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: VARIANT semi-structured access — parse_json once into the
    binary VARIANT encoding, then typed variant_get extraction. At scale
    this beats f6's get_json_object (which re-parses the JSON string per
    access): VARIANT parses once per row and field reads are offset
    lookups."""
    e = Tables(spark, sf_dir).events
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "g17_group_by_all",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       {rev} AS revenue
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
""".format(rev=fin_sql("SUM(" + dec_sql("o_totalprice") + ")")),
    tags=("aggregation", "sql4"),
)
def g17_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G17: GROUP BY ALL — the modern-SQL ergonomic form (every
    non-aggregate select item becomes a grouping key). Resolves to the
    identical hash-aggregate plan as an explicit GROUP BY; the oracle
    spells the keys out to prove the equivalence."""
    Tables(spark, sf_dir).orders.createOrReplaceTempView("jh_sqf_orders")
    return spark.sql(
        """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4))
            AS DOUBLE) AS revenue
FROM jh_sqf_orders
GROUP BY ALL
ORDER BY o_orderstatus, o_orderpriority
"""
    )


@register(
    "sq6_pipe_syntax",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {rev} AS revenue
FROM orders
WHERE o_orderstatus IN ('F', 'O')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""".format(rev=fin_sql("SUM(" + dec_sql("o_totalprice") + ")")),
    tags=("sql4", "pipe"),
)
def sq6_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ6: SQL pipe syntax (Spark 4 `|>` operators) — the linear
    filter → aggregate → project → order form. Purely surface syntax:
    Catalyst lowers it to the same logical plan as the oracle's classic
    formulation, so pushdown/pruning/partial-agg all apply unchanged."""
    Tables(spark, sf_dir).orders.createOrReplaceTempView("jh_sqf_orders")
    return spark.sql(
        """
FROM jh_sqf_orders
|> WHERE o_orderstatus IN ('F', 'O')
|> EXTEND CAST(o_totalprice AS DECIMAL(18,4)) AS p
|> AGGREGATE COUNT(*) AS n_orders,
             CAST(CAST(SUM(p) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
   GROUP BY o_orderpriority
|> SELECT o_orderpriority, n_orders, revenue
|> ORDER BY o_orderpriority
"""
    )


# keep the import visible to linters — dec is the documented accumulation
# discipline even though this module inlines its one decimal cast in SQL
_ = dec
