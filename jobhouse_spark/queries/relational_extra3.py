"""Third long-tail batch: explode/lateral, approximate percentiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobhouse_spark.queries.registry import register
from jobhouse_spark.tables import Tables


@register(
    "f4c_explode",
    oracle="""
SELECT vec_id, CAST(pos AS INT) AS pos, CAST(sign(val) AS INT) AS val_sign
FROM (
  SELECT vec_id, unnest(embedding) AS val,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings WHERE vec_id < 10)
WHERE pos <= 5 ORDER BY vec_id, pos
""",
    tags=("function", "array"),
)
def f4c_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4c: posexplode (lateral view) — array rows to (pos, value) rows.
    Only the element's sign is emitted (exact int) to stay fp-safe."""
    emb = Tables(spark, sf_dir).embeddings
    return (
        emb.filter(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode("embedding").alias("pos0", "val"))
        .withColumn("pos", F.col("pos0") + 1)
        .filter(F.col("pos") <= 5)
        .select(
            "vec_id",
            "pos",
            F.signum(F.col("val")).cast("int").alias("val_sign"),
        )
        .orderBy("vec_id", "pos")
    )


@register("g14_approx_percentile", oracle=None, tags=("agg", "approx"))
def g14_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G14: approximate percentile sketch (declared-not-hash-checked,
    §2.C rule 6; error bound vs exact asserted in
    tests/test_similarity.py::test_approx_percentile_tolerance)."""
    o = Tables(spark, sf_dir).orders
    return o.agg(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx_median"),
        F.percentile_approx("o_totalprice", 0.9, 1000).alias("approx_p90"),
    )


@register(
    "g14b_exact_percentile",
    oracle="""
SELECT quantile_cont(o_custkey, 0.25) AS p25,
       quantile_cont(o_custkey, 0.5) AS p50,
       quantile_cont(o_custkey, 0.75) AS p75
FROM orders
""",
    tags=("agg",),
)
def g14b_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G14b: EXACT interpolated percentile — the hash-checked twin of
    the g14 sketch, per the l2->l2c twin discipline: the approximate op
    stays rows-only by contract, the exact mechanism is differentially
    verified. Bit-equality across engines is guaranteed by construction,
    not luck: the input is an integer key and the quantile fractions are
    dyadic (0.25/0.5/0.75), so position = (n-1)*p, its fractional part,
    and the interpolation lo + (hi-lo)*frac are all exactly
    representable doubles — any algebraic arrangement either engine
    uses yields the identical bit pattern (a non-dyadic p like 0.9, or
    a 2-decimal price column, would NOT have this property; see
    tests/oracle.py exact-repr float canon)."""
    o = Tables(spark, sf_dir).orders
    return o.select(
        F.expr("percentile(o_custkey, 0.25D)").alias("p25"),
        F.expr("percentile(o_custkey, 0.5D)").alias("p50"),
        F.expr("percentile(o_custkey, 0.75D)").alias("p75"),
    )


@register(
    "g18_table_profile",
    oracle="""
SELECT 'o_custkey' AS col, COUNT(*) AS n,
       COUNT(*) - COUNT(o_custkey) AS n_null,
       COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_v,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_v
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate),
       CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR),
       CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR)
FROM orders
ORDER BY col
""",
    tags=("aggregation", "profiling", "quality"),
)
def g18_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G18: data-profiling operator — per-column row/null/distinct
    counts and min/max, the first thing a data-quality gate computes
    over a new 100 TB drop. One pass per column family; Catalyst merges
    the three single-pass aggregates into scans that each read exactly
    one column (min/max serialized as strings so one schema fits every
    column type; doubles excluded to stay §2.C-deterministic)."""
    o = Tables(spark, sf_dir).orders

    def profile(col: str, min_max_cast: str = "string"):
        return o.agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n"),
            (F.count("*") - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast(min_max_cast).cast("string").alias("min_v"),
            F.max(col).cast(min_max_cast).cast("string").alias("max_v"),
        )

    return (
        profile("o_custkey")
        .unionAll(profile("o_orderstatus"))
        .unionAll(profile("o_orderdate", "date"))
        .orderBy("col")
    )


@register(
    "g19_histogram",
    oracle="""
SELECT CAST(least(floor(o_totalprice / 50000.0), 11.0) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)
         AS sum_price
FROM orders WHERE o_totalprice IS NOT NULL
GROUP BY bucket ORDER BY bucket
""",
    tags=("aggregation", "profiling", "histogram"),
)
def g19_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G19: fixed-width histogram (50k-wide bins, top bin open) — the
    distribution sketch of a profiling pass and the binning primitive
    for skew detection. Literal bin edges keep bucket ids
    engine-identical (one double division + floor, same value both
    sides); one hash aggregate over 12 keys, map-side combined."""
    o = Tables(spark, sf_dir).orders.filter(F.col("o_totalprice").isNotNull())
    from jobhouse_spark.queries.registry import dec, fin  # noqa: PLC0415

    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(50000.0)), F.lit(11)
    ).cast("long")
    return (
        o.select(bucket.alias("bucket"), dec(F.col("o_totalprice")).alias("p"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), fin(F.sum("p")).alias("sum_price"))
        .orderBy("bucket")
    )


@register(
    "g20_psi_drift",
    oracle="""
WITH binned AS (
  SELECT event_type,
         CASE WHEN event_id < 5000 THEN 'base' ELSE 'cur' END AS cohort,
         least(greatest(CAST(floor(value / 10.0) AS INT), 0), 9) AS bin
  FROM events),
counts AS (
  SELECT event_type, cohort, bin, COUNT(*) AS n
  FROM binned GROUP BY 1, 2, 3),
tot AS (SELECT event_type, cohort, SUM(n) AS t FROM counts GROUP BY 1, 2),
grid AS (
  SELECT et.event_type, b.bin FROM (SELECT DISTINCT event_type FROM binned) et
  CROSS JOIN (SELECT unnest(range(10)) AS bin) b),
p AS (
  SELECT g.event_type, g.bin,
         -- totals joined LEFT with 0 fallback: a category present in
         -- only one cohort (the max-drift case) must keep its rows
         (COALESCE(cb.n, 0) + 1.0) / (COALESCE(tb.t, 0) + 10.0) AS p_base,
         (COALESCE(cc.n, 0) + 1.0) / (COALESCE(tc.t, 0) + 10.0) AS p_cur
  FROM grid g
  LEFT JOIN counts cb ON cb.event_type = g.event_type AND cb.bin = g.bin AND cb.cohort = 'base'
  LEFT JOIN counts cc ON cc.event_type = g.event_type AND cc.bin = g.bin AND cc.cohort = 'cur'
  LEFT JOIN tot tb ON tb.event_type = g.event_type AND tb.cohort = 'base'
  LEFT JOIN tot tc ON tc.event_type = g.event_type AND tc.cohort = 'cur')
SELECT event_type,
       CAST(CAST(SUM((p_cur - p_base) * ln(p_cur / p_base)) AS DECIMAL(18,6)) AS DOUBLE) AS psi
FROM p GROUP BY 1 ORDER BY 1
""",
    tags=("aggregation", "profiling", "drift"),
)
def g20_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G20: population-stability-index drift between two cohorts of the
    events stream (baseline event_id < 5000 vs current) — the
    data-quality gate a training pipeline runs before ingesting a new
    crawl/batch: PSI > 0.2 on a feature distribution means the new data
    is materially different. Fixed-width bins (G19's primitive),
    Laplace-smoothed so empty bins don't produce ln(0), one aggregate
    per cohort plus a broadcast-sized (event_type x bin) grid join —
    map-side combined everywhere; the corpus is scanned ONCE.

    Determinism: counts are exact integers; the bin id is one double
    division + floor (engine-identical); psi sums 10 doubles per group
    and rounds through DECIMAL(18,6), absorbing sub-ulp ln()
    differences between engines."""
    from jobhouse_spark.operators.drift import psi_drift  # noqa: PLC0415

    e = Tables(spark, sf_dir).events
    binned = e.select(
        "event_type",
        F.when(F.col("event_id") < 5000, "base").otherwise("cur").alias("cohort"),
        F.least(
            F.greatest(F.floor(F.col("value") / F.lit(10.0)).cast("int"), F.lit(0)),
            F.lit(9),
        ).alias("bin"),
    )
    return psi_drift(binned, n_bins=10).orderBy("event_type")
