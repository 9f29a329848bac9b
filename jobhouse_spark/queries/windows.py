"""W-family: window functions (SURVEY §2.B).

Every window carries a total order (ts/date + unique key tiebreak) per
§2.C. Physical shape: one shuffle on the partition key, then an
in-partition sort — the window itself never re-shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jobhouse_spark.operators.dedup import latest_per_key
from jobhouse_spark.operators.topk import top_k_per_group
from jobhouse_spark.queries.registry import dec, dec_sql, fin, fin_sql, register
from jobhouse_spark.tables import Tables

_ORDER_W = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"


@register(
    "w1_row_number",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        f"ROW_NUMBER() OVER ({_ORDER_W}) AS rn, "
        f"RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rk, "
        f"NTILE(4) OVER ({_ORDER_W}) AS quartile "
        "FROM orders WHERE o_custkey < 100 ORDER BY o_custkey, rn"
    ),
    tags=("window",),
)
def w1_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: ranking family over a totally-ordered window."""
    o = Tables(spark, sf_dir).orders.filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_rank = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w_rank).alias("rk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_custkey", "rn")
    )


@register(
    "w2_lag_lead",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        f"{fin_sql(f'LAG(o_totalprice) OVER ({_ORDER_W})')} AS prev_price, "
        f"{fin_sql(f'LEAD(o_totalprice) OVER ({_ORDER_W})')} AS next_price "
        "FROM orders WHERE o_custkey < 100 ORDER BY o_custkey, o_orderkey"
    ),
    tags=("window",),
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: analytic lag/lead."""
    o = Tables(spark, sf_dir).orders.filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            fin(F.lag("o_totalprice").over(w)).alias("prev_price"),
            fin(F.lead("o_totalprice").over(w)).alias("next_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "w3_running_sum",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        + fin_sql(
            "SUM(" + dec_sql("o_totalprice") + f") OVER ({_ORDER_W} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        + " AS running_total "
        "FROM orders WHERE o_custkey < 100 ORDER BY o_custkey, o_orderkey"
    ),
    tags=("window",),
)
def w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: explicit ROWS frame — running total per customer."""
    o = Tables(spark, sf_dir).orders.filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            fin(F.sum(dec(F.col("o_totalprice"))).over(w)).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "w4_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, {p} AS o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3 ORDER BY o_custkey, rn
""".format(p=fin_sql("o_totalprice")),
    tags=("window", "headline"),
)
def w4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: top-3 orders per customer by price (Gold-mart pattern A18)."""
    o = Tables(spark, sf_dir).orders
    top = top_k_per_group(
        o, "o_custkey", [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 3
    )
    return top.select(
        "o_custkey", "o_orderkey", fin(F.col("o_totalprice")).alias("o_totalprice"), "rn"
    ).orderBy("o_custkey", "rn")


@register(
    "w5_latest_per_key",
    oracle="""
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 ORDER BY user_id
""",
    tags=("window", "cdc"),
)
def w5_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: CDC latest-per-key snapshot (reference A16 change detection)."""
    e = Tables(spark, sf_dir).events
    latest = latest_per_key(e, "user_id", "ts", "event_id")
    return latest.select("user_id", "event_id", "event_type").orderBy("user_id")


@register(
    "w6_value_windows",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        f"DENSE_RANK() OVER ({_ORDER_W}) AS drk, "
        f"PERCENT_RANK() OVER ({_ORDER_W}) AS prk, "
        f"CUME_DIST() OVER ({_ORDER_W}) AS cd, "
        f"FIRST_VALUE(o_orderkey) OVER ({_ORDER_W} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_key, "
        f"LAST_VALUE(o_orderkey) OVER ({_ORDER_W} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key, "
        f"NTH_VALUE(o_orderkey, 2) OVER ({_ORDER_W} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key "
        "FROM orders WHERE o_custkey < 100 ORDER BY o_custkey, o_orderkey"
    ),
    tags=("window",),
)
def w6_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: distribution (dense_rank/percent_rank/cume_dist) and value
    (first/last/nth_value) window functions. percent_rank and cume_dist
    are exact rational arithmetic in IEEE double — identical across
    engines. The value functions use an explicit unbounded ROWS frame
    (the default frame stops at CURRENT ROW, a classic silent-wrong)."""
    o = Tables(spark, sf_dir).orders.filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.dense_rank().over(w).alias("drk"),
            F.percent_rank().over(w).alias("prk"),
            F.cume_dist().over(w).alias("cd"),
            F.first("o_orderkey").over(wf).alias("first_key"),
            F.last("o_orderkey").over(wf).alias("last_key"),
            F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "w7_ignore_nulls_locf",
    oracle="""
WITH v AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 3 = 0 THEN NULL ELSE CAST(event_id % 1000 AS BIGINT) END AS v
  FROM events WHERE event_id < 2000)
SELECT event_id,
       last_value(v IGNORE NULLS) OVER
         (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
       lag(v IGNORE NULLS) OVER
         (PARTITION BY user_id ORDER BY ts, event_id) AS prev_obs
FROM v ORDER BY event_id
""",
    tags=("window", "nulls"),
)
def w7_ignore_nulls_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: IGNORE NULLS windows — last-observation-carried-forward
    gap-fill (the sensor/time-series staple) and previous-non-null
    lookback. One shuffle on user_id, evaluated in-sort like every W
    query."""
    e = Tables(spark, sf_dir).events.filter(F.col("event_id") < 2000)
    v = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 3 == 0, None)
        .otherwise((F.col("event_id") % 1000).cast("long"))
        .alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return v.select(
        "event_id",
        F.last("v", ignorenulls=True).over(wf).alias("locf"),
        F.expr(
            "lag(v) IGNORE NULLS OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("prev_obs"),
    ).orderBy("event_id")
