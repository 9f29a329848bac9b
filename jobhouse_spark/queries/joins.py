"""J-family: joins (SURVEY §2.B).

Strategy notes for 100 TB:
- J1/J2: fact⋈dim equi-joins — Catalyst picks SMJ/shuffle-hash; AQE
  converts to broadcast at runtime when the built side is small.
- J3: explicit `broadcast()` of dimension tables — nation/region/part
  style dims stay broadcastable at any fact-side scale.
- J6/J7: non-equi conditions keep an equi prefix (partkey / user_id) so
  the plan is a hash/merge join with a range residual, NOT a
  broadcast-nested-loop over the cross product.
- J8: as-of via union+window (operators/asof.py) — linear, single
  shuffle; never a pair explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobhouse_spark.operators.asof import asof_join
from jobhouse_spark.queries.registry import register
from jobhouse_spark.tables import Tables


@register(
    "j1_inner_equi",
    oracle=(
        "SELECT n_name, COUNT(*) AS n_cust FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name ORDER BY n_name"
    ),
    tags=("join", "headline"),
)
def j1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi join; Catalyst picks the physical strategy."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.nation, t.customer.c_nationkey == t.nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"))
        .orderBy("n_name")
    )


@register(
    "j2_left_outer",
    oracle=(
        "SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer "
        "LEFT JOIN orders ON c_custkey = o_custkey "
        "GROUP BY c_custkey ORDER BY c_custkey"
    ),
    tags=("join",),
)
def j2_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer join preserving customers without orders."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "j3_broadcast",
    oracle=(
        "SELECT r_name, COUNT(*) AS n_cust FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name ORDER BY r_name"
    ),
    tags=("join", "headline"),
)
def j3_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: explicit broadcast of the dim side — zero shuffle of the fact table.

    nation (25 rows) and region (5 rows) ship to every executor; the
    customer scan never shuffles for the join, only for the final agg.
    Same hash as J1's family — broadcast is a physical choice only.
    """
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count("*").alias("n_cust"))
        .orderBy("r_name")
    )


@register(
    "j4_left_semi",
    oracle=(
        "SELECT COUNT(*) AS n FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
    ),
    tags=("join",),
)
def j4_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: EXISTS — customers with at least one order."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey, "left_semi")
        .agg(F.count("*").alias("n"))
    )


@register(
    "j5_left_anti",
    oracle=(
        "SELECT COUNT(*) AS n FROM customer "
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)"
    ),
    tags=("join",),
)
def j5_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: NOT EXISTS — the reference's dedup-check shape (A15)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey, "left_anti")
        .agg(F.count("*").alias("n"))
    )


@register(
    "j6_theta_range",
    oracle=(
        "SELECT COUNT(*) AS n FROM part JOIN lineitem "
        "ON p_partkey = l_partkey AND l_quantity < p_size"
    ),
    tags=("join",),
)
def j6_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: equi prefix + range residual — hash join with post-filter, not BNLJ."""
    t = Tables(spark, sf_dir)
    return (
        t.part.join(
            t.lineitem,
            (t.part.p_partkey == t.lineitem.l_partkey)
            & (t.lineitem.l_quantity < t.part.p_size),
        ).agg(F.count("*").alias("n"))
    )


@register(
    "j7_band_self_join",
    oracle=(
        "SELECT COUNT(*) AS n FROM events a JOIN events b "
        "ON a.user_id = b.user_id "
        "AND b.ts BETWEEN a.ts AND a.ts + INTERVAL 1 HOUR "
        "AND a.event_id <> b.event_id"
    ),
    tags=("join",),
)
def j7_band_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/J10: interval band self-join — pairs of events within one hour."""
    e = Tables(spark, sf_dir).events
    a = e.alias("a")
    b = e.alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & F.col("b.ts").between(
            F.col("a.ts"), F.col("a.ts") + F.expr("INTERVAL 1 HOUR")
        )
        & (F.col("a.event_id") != F.col("b.event_id")),
    ).agg(F.count("*").alias("n"))


@register(
    "j8_asof_join",
    oracle="""
WITH clicks1 AS (
  SELECT user_id, ts, event_id,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click'
),
tagged AS (
  SELECT user_id, ts, 0 AS side, event_id AS click_id, NULL::BIGINT AS purchase_id
  FROM clicks1 WHERE rn = 1
  UNION ALL
  SELECT user_id, ts, 1 AS side, NULL::BIGINT AS click_id, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
),
matched AS (
  SELECT purchase_id, user_id,
         last_value(click_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, side, purchase_id NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
  FROM tagged
)
SELECT purchase_id, user_id, last_click_id
FROM matched WHERE purchase_id IS NOT NULL
ORDER BY purchase_id
""",
    tags=("join", "asof"),
)
def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: as-of join — for each purchase, the latest click at ts <= purchase ts.

    Engine side uses the blessed union+window operator
    (jobhouse_spark.operators.asof); the oracle is the identical
    rewrite spelled in ANSI SQL so tie semantics provably agree.
    """
    e = Tables(spark, sf_dir).events
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_id"],
        tiebreak="click_id",
        prefix="last_",
    )
    return joined.select(
        "purchase_id", "user_id", F.col("last_click_id")
    ).orderBy("purchase_id")


@register(
    "j9_cross",
    oracle="SELECT COUNT(*) AS n FROM region CROSS JOIN nation",
    tags=("join",),
)
def j9_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: cartesian product (dims only — never cross-join facts at scale)."""
    t = Tables(spark, sf_dir)
    return t.region.crossJoin(t.nation).agg(F.count("*").alias("n"))


@register(
    "j10_self_join",
    oracle=(
        "SELECT COUNT(*) AS n FROM orders a JOIN orders b "
        "ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey"
    ),
    tags=("join",),
)
def j10_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: self equi join — unordered order pairs per customer."""
    o = Tables(spark, sf_dir).orders
    a = o.alias("a")
    b = o.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
    ).agg(F.count("*").alias("n"))


@register(
    "j12_full_outer",
    oracle="""
WITH a AS (SELECT o_custkey AS k, COUNT(*) AS n_1995 FROM orders
           WHERE year(o_orderdate) = 1995 GROUP BY 1),
     b AS (SELECT o_custkey AS k, COUNT(*) AS n_1996 FROM orders
           WHERE year(o_orderdate) = 1996 GROUP BY 1)
SELECT COALESCE(a.k, b.k) AS custkey,
       COALESCE(a.n_1995, 0) AS n_1995,
       COALESCE(b.n_1996, 0) AS n_1996
FROM a FULL OUTER JOIN b ON a.k = b.k
ORDER BY custkey
""",
    tags=("join", "outer"),
)
def j12_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: full outer join — year-over-year customer activity where
    either side may be absent. Scale note: both inputs are pre-aggregated
    to one row per customer BEFORE the join, so the full outer join
    shuffles the reduced keyspace, not the fact table."""
    o = Tables(spark, sf_dir).orders
    a = (
        o.filter(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_custkey").alias("ka"))
        .agg(F.count("*").alias("n_1995"))
    )
    b = (
        o.filter(F.year("o_orderdate") == 1996)
        .groupBy(F.col("o_custkey").alias("kb"))
        .agg(F.count("*").alias("n_1996"))
    )
    return (
        a.join(b, a.ka == b.kb, "full_outer")
        .select(
            F.coalesce("ka", "kb").alias("custkey"),
            F.coalesce("n_1995", F.lit(0)).alias("n_1995"),
            F.coalesce("n_1996", F.lit(0)).alias("n_1996"),
        )
        .orderBy("custkey")
    )


@register(
    "j13_null_safe_join",
    oracle="""
WITH k AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey % 50 END AS k
  FROM orders WHERE o_orderkey < 2000)
SELECT COALESCE(CAST(a.k AS VARCHAR), 'NULL') AS key_str, COUNT(*) AS n_pairs
FROM k a JOIN k b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY 1 ORDER BY 1
""",
    tags=("join", "nullsafe"),
)
def j13_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13: null-safe equality join (<=>) — NULL keys match each other,
    unlike plain '=' which silently drops them. Catalyst still plans
    <=> as a hash join (the key is hashable with NULL as a value), so
    this scales like j1, not like a nested loop."""
    o = Tables(spark, sf_dir).orders.filter(F.col("o_orderkey") < 2000)
    k = o.select(
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_custkey") % 50)
        .alias("k")
    )
    a, b = k.alias("a"), k.alias("b")
    return (
        a.join(b, F.col("a.k").eqNullSafe(F.col("b.k")))
        .groupBy(
            F.coalesce(F.col("a.k").cast("string"), F.lit("NULL")).alias("key_str")
        )
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("key_str")
    )


@register(
    "j14_fuzzy_join",
    oracle=r"""
WITH probes AS (
  SELECT p_partkey AS probe_id,
         concat(substr(p_name, 1, 2), 'x', substr(p_name, 4)) AS probe_name
  FROM part WHERE p_partkey <= 20),
cand AS (SELECT p_partkey AS cand_id, p_name AS cand_name FROM part),
pg AS (
  SELECT probe_id, probe_name, unnest(list_distinct(list_transform(
           range(1, length(probe_name) - 2), i -> substr(probe_name, i, 4)))) AS gram
  FROM probes),
cg AS (
  SELECT cand_id, cand_name, unnest(list_distinct(list_transform(
           range(1, length(cand_name) - 2), i -> substr(cand_name, i, 4)))) AS gram
  FROM cand),
df AS (SELECT gram, COUNT(*) AS n FROM cg GROUP BY 1),
keep AS (SELECT gram FROM df WHERE n <= 100),
pairs AS (
  SELECT DISTINCT probe_id, probe_name, cand_id, cand_name
  FROM pg JOIN keep USING (gram) JOIN cg USING (gram)
  WHERE abs(length(probe_name) - length(cand_name)) <= 2)
SELECT probe_id, cand_id, CAST(levenshtein(probe_name, cand_name) AS BIGINT) AS dist
FROM pairs WHERE levenshtein(probe_name, cand_name) <= 2
ORDER BY probe_id, cand_id
""",
    tags=("join", "fuzzy", "llm"),
)
def j14_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14: fuzzy (edit-distance) join — entity resolution for dirty
    keys, the record-linkage step of corpus curation. Probes are part
    names with one character mutated; matches are candidates within
    Levenshtein distance 2.

    100 TB shape — never a cross product: (1) q-gram INVERTED INDEX
    join generates candidates only for pairs sharing a 4-gram; (2)
    STOP-GRAM pruning drops grams occurring in >100 candidate names
    (they carry no selectivity and would quadratically inflate the
    gram join — the textbook df-cutoff); (3) a LENGTH prefilter
    (|len a - len b| <= 2, a Levenshtein lower bound) cuts survivors
    before (4) the exact levenshtein() verify, which runs only on the
    bounded candidate set. Both engines implement unit-cost
    Levenshtein identically, so the result hash-checks."""
    p = Tables(spark, sf_dir).part
    probes = p.filter(F.col("p_partkey") <= 20).select(
        F.col("p_partkey").alias("probe_id"),
        F.concat(
            F.substring("p_name", 1, 2), F.lit("x"), F.expr("substring(p_name, 4)")
        ).alias("probe_name"),
    )
    cand = p.select(
        F.col("p_partkey").alias("cand_id"), F.col("p_name").alias("cand_name")
    )

    # sequence(1, L-3) == DuckDB range(1, L-2): the last 4-gram starts
    # at L-3. Guarded: Spark's sequence DESCENDS when start > stop, so
    # short names must yield an empty array, not a reversed range.
    def gram_col(name_col: str):
        return F.when(
            F.length(name_col) >= 4,
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length({name_col}) - 3), "
                    f"i -> substring({name_col}, i, 4))"
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    pg = probes.select(
        "probe_id", "probe_name", F.explode(gram_col("probe_name")).alias("gram")
    )
    cg = cand.select(
        "cand_id", "cand_name", F.explode(gram_col("cand_name")).alias("gram")
    )
    keep = cg.groupBy("gram").agg(F.count("*").alias("n")).filter(F.col("n") <= 100)
    pairs = (
        pg.join(keep.select("gram"), "gram")
        .join(cg, "gram")
        .filter(
            F.abs(F.length("probe_name") - F.length("cand_name")) <= 2
        )
        .select("probe_id", "probe_name", "cand_id", "cand_name")
        .distinct()
    )
    return (
        pairs.withColumn("dist", F.levenshtein("probe_name", "cand_name").cast("long"))
        .filter(F.col("dist") <= 2)
        .select("probe_id", "cand_id", "dist")
        .orderBy("probe_id", "cand_id")
    )
