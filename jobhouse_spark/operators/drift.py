"""Distribution-drift measurement between two cohorts (G20).

PSI (population stability index) per category over fixed-width value
bins — the pre-ingest gate a training pipeline runs on a new
crawl/batch: PSI > 0.2 on a feature distribution means the new data
is materially different from the baseline.

Scale shape: ONE scan of the input (verified in the physical plan —
round 14); per-(category, bin) counts are map-side combined with both
cohorts as columns, the per-category rollup and in-row grid evaluation
shuffle O(categories x bins) rows, and there are no joins at all.

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
    # ROUND-14 SHAPE (optimization guide §2.3/§2.4). The r13 formulation
    # referenced its counts aggregate three times (cb/cc/grid) and the
    # totals twice — and an uncached DataFrame re-executes its whole
    # lineage per reference, so "ONE scan of binned" was five corpus
    # scans in the physical plan. Now: per-(category, bin) counts for
    # BOTH cohorts as columns in a single aggregation (one corpus scan),
    # then one per-category rollup into bin->count maps + totals, and
    # the Laplace-smoothed PSI over the full 0..n_bins-1 grid evaluated
    # IN-ROW with a higher-order aggregate — no grid cross join, no
    # count/total self-joins, no second reference to anything. Plan:
    # scan -> partial agg -> exchange(cat,bin) -> agg -> exchange(cat)
    # -> agg -> project. 5 scans + 4 joins -> 1 scan + 0 joins; the two
    # surviving exchanges carry O(categories x bins) rows.
    # Equivalence notes vs the r13 join formulation, all pinned by the
    # unchanged oracle + tests: NULL categories stay one group (groupBy
    # keys NULL like the old eqNullSafe joins); a category present in
    # one cohort keeps its rows (absent side smooths to the uniform
    # 1/(0+n_bins)); a cohort label outside {base, cur} contributes to
    # neither count but keeps its (category, bin) group alive — exactly
    # the old grid-from-counts behavior. The contract guard routes
    # through the GROUP KEY, so out-of-range bins still fail the job.
    counts = (
        binned.withColumn(bin_col, checked_bin)
        .groupBy(category_col, bin_col)
        .agg(
            F.count(F.when(F.col(cohort_col) == base_label, True)).alias("nb"),
            F.count(F.when(F.col(cohort_col) == cur_label, True)).alias("nc"),
        )
    )
    percat = counts.groupBy(category_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(bin_col).cast("int"), F.col("nb")))
        ).alias("_mb"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col(bin_col).cast("int"), F.col("nc")))
        ).alias("_mc"),
        F.sum("nb").alias("_tb"),
        F.sum("nc").alias("_tc"),
    )
    # (p_cur - p_base) * ln(p_cur / p_base) summed over every bin of the
    # grid, missing bins coalesced to 0 — double arithmetic identical to
    # the r13 per-row formula, rounded through DECIMAL(18,6) at the end
    psi = F.expr(
        f"""aggregate(
              sequence(0, {n_bins - 1}),
              cast(0.0 as double),
              (acc, i) -> acc +
                (((coalesce(try_element_at(_mc, i), 0L) + 1.0) / (_tc + {float(n_bins)}))
                 - ((coalesce(try_element_at(_mb, i), 0L) + 1.0) / (_tb + {float(n_bins)})))
                * ln(((coalesce(try_element_at(_mc, i), 0L) + 1.0) / (_tc + {float(n_bins)}))
                     / ((coalesce(try_element_at(_mb, i), 0L) + 1.0) / (_tb + {float(n_bins)})))
            )"""
    )
    return percat.select(category_col, fin(psi, 6).alias("psi"))
