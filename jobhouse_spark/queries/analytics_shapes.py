"""Composite analytical query shapes (TPC-H-style multi-join plans) and
subquery forms — the "whole engine at once" queries that exercise join
ordering, broadcast selection, partial aggregation, and top-k together.
These are the plans the reference's Gold layer would ultimately run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobhouse_spark.queries.registry import dec, dec_sql, fin, fin_sql, register
from jobhouse_spark.tables import Tables

_REV = dec_sql("l_extendedprice") + " * " + dec_sql("1 - l_discount")


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey, {fin_sql(f'SUM({_REV})')} AS revenue, o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    tags=("analytics", "headline"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered on both fact sides, top-10
    unshipped orders by revenue."""
    t = Tables(spark, sf_dir)
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        t.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders.filter(F.col("o_orderdate") < cutoff),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem.filter(F.col("l_shipdate") > cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            fin(
                F.sum(dec(F.col("l_extendedprice")) * dec(F.lit(1) - F.col("l_discount")))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name, {fin_sql(f'SUM({_REV})')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name ORDER BY revenue DESC, n_name
""",
    tags=("analytics", "headline"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a same-nation residual — dims
    broadcast, facts shuffle once on their join keys."""
    t = Tables(spark, sf_dir)
    return (
        t.customer
        .join(t.orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))),
            F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.supplier,
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            fin(
                F.sum(dec(F.col("l_extendedprice")) * dec(F.lit(1) - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, {fin_sql(f'SUM({_REV})')} AS revenue, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
    tags=("analytics",),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue."""
    t = Tables(spark, sf_dir)
    return (
        t.customer
        .join(t.orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))),
            F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem.filter(F.col("l_returnflag") == "R"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            fin(
                F.sum(dec(F.col("l_extendedprice")) * dec(F.lit(1) - F.col("l_discount")))
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "sq1_scalar_subquery",
    oracle=(
        "SELECT COUNT(*) AS n FROM orders "
        "WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)"
    ),
    tags=("subquery",),
)
def sq1_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ1: uncorrelated scalar subquery (above-average filter).
    Count comparison against a double avg is threshold-safe: no order
    value sits within fp noise of the mean."""
    Tables(spark, sf_dir).orders.createOrReplaceTempView("jh_sq_orders")
    return spark.sql(
        "SELECT COUNT(*) AS n FROM jh_sq_orders "
        "WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM jh_sq_orders)"
    )


@register(
    "sq2_correlated_exists",
    oracle="""
SELECT COUNT(*) AS n FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
    tags=("subquery",),
)
def sq2_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ2: correlated EXISTS — Catalyst decorrelates to a left-semi join."""
    Tables(spark, sf_dir).orders.createOrReplaceTempView("jh_sq2_orders")
    Tables(spark, sf_dir).customer.createOrReplaceTempView("jh_sq2_customer")
    return spark.sql(
        "SELECT COUNT(*) AS n FROM jh_sq2_customer c "
        "WHERE EXISTS (SELECT 1 FROM jh_sq2_orders o "
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)"
    )


@register(
    "sq3_correlated_scalar",
    oracle="""
SELECT c_custkey, n_orders FROM (
  SELECT c_custkey,
         (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
  FROM customer c) t
WHERE c_custkey < 100 ORDER BY c_custkey
""",
    tags=("subquery",),
)
def sq3_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ3: correlated scalar subquery per outer row — decorrelated into
    an aggregate + left outer join."""
    Tables(spark, sf_dir).orders.createOrReplaceTempView("jh_sq3_orders")
    Tables(spark, sf_dir).customer.createOrReplaceTempView("jh_sq3_customer")
    return spark.sql(
        "SELECT c_custkey, "
        "(SELECT COUNT(*) FROM jh_sq3_orders o WHERE o.o_custkey = c.c_custkey) AS n_orders "
        "FROM jh_sq3_customer c WHERE c_custkey < 100 ORDER BY c_custkey"
    )


@register(
    "e1_funnel_conversion",
    oracle="""
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id)
SELECT COUNT(*) AS n_users,
       COUNT(t_click) AS n_click,
       COUNT(CASE WHEN t_view >= t_click THEN 1 END) AS n_click_view,
       COUNT(CASE WHEN t_view >= t_click AND t_purchase >= t_view THEN 1 END)
         AS n_full_funnel
FROM stages
""",
    tags=("analytics", "events", "funnel"),
)
def e1_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: ordered funnel conversion over the event log — users whose
    first view is no earlier than their first click, and first purchase
    no earlier than that view (the min-timestamp funnel definition:
    deterministic, one aggregation pass — no per-user sequence scan).
    Scale shape: a single groupBy(user_id) with conditional MIN partial
    aggregation, then one global roll-up — two narrow shuffles, no
    window, no self-join (the naive per-stage self-join triples the
    shuffle volume)."""
    e = Tables(spark, sf_dir).events
    t = lambda typ: F.min(F.when(F.col("event_type") == typ, F.col("ts")))  # noqa: E731
    stages = e.groupBy("user_id").agg(
        t("click").alias("t_click"),
        t("view").alias("t_view"),
        t("purchase").alias("t_purchase"),
    )
    return stages.agg(
        F.count("*").alias("n_users"),
        F.count("t_click").alias("n_click"),
        F.count(F.when(F.col("t_view") >= F.col("t_click"), 1)).alias("n_click_view"),
        F.count(
            F.when(
                (F.col("t_view") >= F.col("t_click"))
                & (F.col("t_purchase") >= F.col("t_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "e2_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort,
         CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) / 7 AS INT)
           AS week_offset
  FROM events e JOIN firsts f USING (user_id))
SELECT cohort, week_offset, COUNT(*) AS n_users
FROM activity GROUP BY 1, 2 ORDER BY 1, 2
""",
    tags=("analytics", "events", "retention"),
)
def e2_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: weekly cohort retention — cohort = ISO week of each user's
    first event; one row per (cohort, week_offset) with the count of
    users still active that week. Week offsets divide exact day
    multiples of 7 (both engines truncate to Monday), so the matrix is
    engine-exact. Scale shape: the firsts aggregate reuses the
    user_id partitioning of the activity join (one shuffle each), and
    the final cohort matrix is tiny."""
    e = Tables(spark, sf_dir).events
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort", "week_offset")
    )


@register(
    "e3_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events)
SELECT prev, event_type AS next, COUNT(*) AS n
FROM seq WHERE prev IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
""",
    tags=("analytics", "events", "sequence"),
)
def e3_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: event-to-event transition counts (the Markov matrix behind
    path analysis / next-action models). The lag window orders by
    (ts, event_id) — a total order, so duplicate timestamps cannot make
    the matrix nondeterministic (the t4 tie-ordering lesson). Scale
    shape: one shuffle on user_id for the window, then a tiny
    (|types|^2) aggregate."""
    from pyspark.sql import Window  # noqa: PLC0415

    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    return (
        seq.groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count("*").alias("n"))
        .orderBy("prev", "next")
    )


@register(
    "e4_daily_anomalies",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(n) AS BIGINT) AS sum_n,
         CAST(SUM(n * n) AS BIGINT) AS sum_n2
  FROM daily)
SELECT day, n,
       {fin_sql(
           "(CAST(n AS DOUBLE) - CAST(sum_n AS DOUBLE) / n_days) / "
           "sqrt((CAST(sum_n2 AS DOUBLE) - CAST(sum_n AS DOUBLE) * sum_n / n_days)"
           " / NULLIF(n_days - 1, 0))", 6)} AS z
FROM daily, stats ORDER BY day
""",
    tags=("analytics", "events", "anomaly"),
)
def e4_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: daily volume z-scores (the monitoring/anomaly primitive).
    Mean and variance come from EXACT integer sums (count, sum, sum of
    squares) so the partial-aggregation order can't perturb them —
    stddev_samp's float accumulation would differ between engines; this
    formulation is bit-identical, rounded once through DECIMAL(18,6).
    Scale shape: one date-truncated aggregate plus a 1-row broadcast
    stats join."""
    e = Tables(spark, sf_dir).events
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    stats = daily.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_n2"),
    )
    # NULLIF guards the single-day corpus: (n_days - 1) == 0 would give
    # NaN/Inf here but a different divide-by-zero result in the DuckDB
    # oracle; NULL z in BOTH engines is the well-defined degenerate answer
    z = (
        F.col("n").cast("double") - F.col("sum_n").cast("double") / F.col("n_days")
    ) / F.sqrt(
        (
            F.col("sum_n2").cast("double")
            - F.col("sum_n").cast("double") * F.col("sum_n") / F.col("n_days")
        )
        / F.nullif(F.col("n_days") - 1, F.lit(0))
    )
    return (
        daily.crossJoin(F.broadcast(stats))
        .select("day", "n", fin(z, 6).alias("z"))
        .orderBy("day")
    )


@register(
    "e5_dau_wau_stickiness",
    oracle=f"""
WITH days AS (
  SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
dau AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM events GROUP BY 1),
wau AS (
  SELECT d.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS wau
  FROM days d JOIN events e
    ON date_trunc('day', e.ts) BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day)
SELECT day, dau, wau,
       {fin_sql("CAST(dau AS DOUBLE) / wau", 6)} AS stickiness
FROM dau JOIN wau USING (day) ORDER BY day
""",
    tags=("analytics", "events", "engagement"),
)
def e5_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: DAU / trailing-7-day WAU stickiness per day — the engagement
    ratio every product dashboard runs. Rolling DISTINCT doesn't compose
    as a window aggregate; the r13 shape was the textbook range join of
    the day spine against the event log, which scanned the corpus THREE
    times (spine, DAU, WAU) and shuffled ~9x the event rows.

    Round-14 shape (guide §2.3/§8 — decide on a lightweight proxy,
    touch the heavy input once): dedup the log to DISTINCT (day, user)
    pairs first — one corpus scan, one narrow shuffle — then explode
    each pair into the 7 trailing days it contributes to and aggregate
    once: WAU(d) = distinct users among pairs landing on d; DAU(d) = a
    count of NON-NULL-user pairs whose own day IS d (already distinct
    by construction, no second count-distinct); days outside the spine
    drop out because no pair's OWN day is there (a spine day always
    has >= 1 pair, user NULL or not). One scan + 7x PAIR rows shuffled
    instead of three scans + 8x EVENT rows — equal to the unchanged
    range-join oracle, INCLUDING on NULL user_ids (ADVICE r14): the
    oracle's COUNT(DISTINCT user_id) skips NULLs, so dau must not
    count the (day, NULL) pair, while spine membership rides a
    separate any-pair count so an all-NULL day still emits dau = 0.
    At 100 TB the same query swaps COUNT(DISTINCT) for an HLL sketch
    union."""
    e = Tables(spark, sf_dir).events
    day = F.date_trunc("day", F.col("ts"))
    pairs = e.select(day.alias("eday"), "user_id").distinct()
    contrib = pairs.select(
        "eday",
        "user_id",
        F.explode(
            F.expr("sequence(eday, eday + interval 6 days, interval 1 day)")
        ).alias("day"),
    )
    own_day = F.col("eday") == F.col("day")
    return (
        contrib.groupBy("day")
        .agg(
            F.count(F.when(own_day & F.col("user_id").isNotNull(), True))
            .cast("long")
            .alias("dau"),
            F.countDistinct("user_id").cast("long").alias("wau"),
            F.count(F.when(own_day, True)).alias("_own_pairs"),
        )
        .filter(F.col("_own_pairs") > 0)
        .select(
            "day", "dau", "wau",
            fin(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "w8_sequence_pattern",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts,
         lag(ts, 2) OVER w AS t2,
         lag(event_type, 1) OVER w AS e1,
         lag(event_type, 2) OVER w AS e2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_triples
FROM seq
WHERE e1 = event_type AND e2 = event_type
  AND ts - t2 <= INTERVAL 4 HOUR
GROUP BY user_id ORDER BY user_id
""",
    tags=("analytics", "events", "sequence", "window"),
)
def w8_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: sequential pattern detection — per user, count runs of three
    consecutive same-type events within four hours (the MATCH_RECOGNIZE
    shape expressed as lag compositions, since Spark has no native
    row-pattern clause). One shuffle on user_id; the lag chain rides a
    single total-ordered (ts, event_id) window, so duplicate timestamps
    can't flip matches."""
    from pyspark.sql import Window  # noqa: PLC0415

    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        F.lag("ts", 2).over(w).alias("t2"),
        F.lag("event_type", 1).over(w).alias("e1"),
        F.lag("event_type", 2).over(w).alias("e2"),
    )
    hits = seq.filter(
        (F.col("e1") == F.col("event_type"))
        & (F.col("e2") == F.col("event_type"))
        & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 4 HOURS"))
    )
    return (
        hits.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_triples"))
        .orderBy("user_id")
    )
