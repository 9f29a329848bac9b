"""Distribution-drift measurement between two cohorts (G20).

PSI (population stability index) per category over fixed-width value
bins — the pre-ingest gate a training pipeline runs on a new
crawl/batch: PSI > 0.2 on a feature distribution means the new data
is materially different from the baseline.

Scale shape: ONE scan of the input; per-(category, cohort, bin) counts
are map-side combined; the grid/totals joins run over
O(categories x bins) rows — broadcast-sized at any input scale.

Correctness details that matter:
- Laplace smoothing (+1 per bin over +n_bins per total) keeps ln()
  finite on empty bins.
- A category present in only ONE cohort is the strongest drift signal
  there is (a brand-new or vanished category); the totals are joined
  LEFT with a 0 fallback so such categories get a near-max PSI row
  instead of being silently inner-joined away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_drift(
    binned: DataFrame,
    n_bins: int,
    category_col: str = "event_type",
    cohort_col: str = "cohort",
    bin_col: str = "bin",
    base_label: str = "base",
    cur_label: str = "cur",
) -> DataFrame:
    """PSI per category from a pre-binned frame
    (category_col, cohort_col, bin_col). Returns (category, psi-double).
    Deterministic cross-engine: counts are exact ints, probabilities
    int-over-int double divisions, and the ln-sum rounds through
    DECIMAL(18,6) (absorbing sub-ulp ln differences).

    PRE-BINNED CONTRACT: ``bin_col`` must be a non-null int in
    [0, n_bins). Violations FAIL the job (assert_true below) instead of
    silently deflating PSI — an out-of-range/NULL bin would never match
    the grid left-join and its counts would vanish from both cohorts."""
    from jobhouse_spark.queries.registry import fin  # noqa: PLC0415

    spark = binned.sparkSession
    # the guard is routed THROUGH the bin column (not a dropped side
    # column, which column pruning would silently eliminate): every
    # downstream use reads the checked value, so violations always fire
    checked_bin = F.when(
        F.col(bin_col).between(0, n_bins - 1), F.col(bin_col)
    ).otherwise(
        F.raise_error(
            F.lit(f"psi_drift: {bin_col} outside pre-binned contract [0, {n_bins})")
        )
    )
    counts = (
        binned.withColumn(bin_col, checked_bin)
        .groupBy(category_col, cohort_col, bin_col)
        .agg(F.count("*").alias("n"))
    )
    tot = counts.groupBy(category_col, cohort_col).agg(F.sum("n").alias("t"))
    # grid from the COUNTS aggregate, not the raw input: every input
    # category has >= 1 count row, and this keeps the operator at ONE
    # scan of binned (a distinct over raw binned would be a second one)
    grid = (
        counts.select(category_col)
        .distinct()
        .crossJoin(spark.range(n_bins).select(F.col("id").cast("int").alias(bin_col)))
    )
    cb = counts.filter(F.col(cohort_col) == base_label).select(
        F.col(category_col).alias("cat_b"), F.col(bin_col).alias("bin_b"),
        F.col("n").alias("nb"),
    )
    cc = counts.filter(F.col(cohort_col) == cur_label).select(
        F.col(category_col).alias("cat_c"), F.col(bin_col).alias("bin_c"),
        F.col("n").alias("nc"),
    )
    tb = tot.filter(F.col(cohort_col) == base_label).select(
        F.col(category_col).alias("cat_tb"), F.col("t").alias("tb")
    )
    tc = tot.filter(F.col(cohort_col) == cur_label).select(
        F.col(category_col).alias("cat_tc"), F.col("t").alias("tc")
    )
    # NULL-SAFE category joins throughout: a NULL category (unclassified
    # rows — often a brand-new max-drift bucket) must attach its real
    # counts; plain equi-joins never match NULL=NULL and would silently
    # report psi=0 for exactly the category that drifted most
    cat = F.col(category_col)
    p = (
        grid.join(
            cb, cat.eqNullSafe(F.col("cat_b")) & (F.col(bin_col) == F.col("bin_b")), "left"
        )
        .join(
            cc, cat.eqNullSafe(F.col("cat_c")) & (F.col(bin_col) == F.col("bin_c")), "left"
        )
        # LEFT + 0 fallback: a category absent from one cohort keeps its
        # rows (uniform smoothed distribution for the absent side) — the
        # max-drift case an inner join would silently drop
        .join(tb, cat.eqNullSafe(F.col("cat_tb")), "left")
        .join(tc, cat.eqNullSafe(F.col("cat_tc")), "left")
        .select(
            category_col,
            (
                (F.coalesce(F.col("nb"), F.lit(0)) + 1.0)
                / (F.coalesce(F.col("tb"), F.lit(0)) + float(n_bins))
            ).alias("p_base"),
            (
                (F.coalesce(F.col("nc"), F.lit(0)) + 1.0)
                / (F.coalesce(F.col("tc"), F.lit(0)) + float(n_bins))
            ).alias("p_cur"),
        )
    )
    psi = F.sum(
        (F.col("p_cur") - F.col("p_base")) * F.log(F.col("p_cur") / F.col("p_base"))
    )
    return p.groupBy(category_col).agg(fin(psi, 6).alias("psi"))
