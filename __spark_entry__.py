"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(jobhouse_spark.queries.registry): every SURVEY.md §2 operator is a
(Spark fn, DuckDB oracle SQL) pair registered there; this module just
exposes the registry in the driver's shape.

The driver's CORRECTNESS pass verifies the FIRST 50 entries of
``queries()`` in iteration order, so ``_HEAD`` pins a curated 50 that
spans every SURVEY §2 family (S/P/J/G/W/O/U/F/T/X/L/A + TPC-H +
subqueries) — all oracle-backed, so each family gets a hash-checked
driver row. The remaining ~100 registry entries follow in registration
order and are verified by the identical oracle in tools/driver_sim.py
and tests/. Guarded by tests/test_entry_contract.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jobhouse_spark.queries import all_queries  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"

# One hash-checkable representative per SURVEY §2 family, 50 exactly.
#
# ROUND-8 ROTATION: 42 slots go to FIRST-TIME entries (never had a
# driver-green row in CORRECTNESS_r01–r07) — the 16 remaining TPC-H
# queries (q3/q4/q7/q8/q10-q17/q19-q22), G-family extras
# (g4b/g4c/g12/g13/g15/g17), the extended scalar surface
# (f1b/f4b/f5b/f10/f11), subqueries sq1/sq3/sq6, event analytics
# e2/e3/e5, w8, t13, x3, the checked twins g14b/l4b2, l6b, the
# previously slice-bound l23_semantic_dedup, and the NEW
# registry-honest l23b (k derived from N) + its replica-collapsing
# twin l23c. The other 8 slots are per-family anchors. Every
# rotated-OUT entry remains verified by the identical oracle in
# tools/driver_sim.py (full registry) and tests/.
# ROUND-9 BACKLOG (exactly 27 never-driver-checked entries, computed
# as registry minus the union of CORRECTNESS_r01–r07 keys minus this
# head; several are rows-only by contract): f4c g14 g18 g19 l2 l3b
# l3c l4b l4c l5 l5b l6c l9 l10 l10b l12 l17 l19 l20 s16 t7, plus the
# round-8 additions that didn't fit the 50 (family-coverage guard in
# tests/test_entry_contract.py): l24b_token_budget_mixture,
# l25_curriculum_bins, l26_kmeans_refine_checked,
# t7b_stateful_count_checked, l27_pq_codes, l27c_ivfpq_rerank.
# l27b and l24 took the g1/t2 anchor slots (their families stay
# covered by g4b/g4c/g12… and t13).
_HEAD = (
    # anchors — one per family not otherwise covered below (g and t are
    # covered by g4b/g4c/g12… and t13, so their anchor slots went to
    # two round-8 additions: the IVF-PQ pipeline and the domain-mixture
    # resampler — both first-time entries)
    "s1_parquet_scan",
    "p1_projection",
    "j1_inner_equi",
    "l27b_ivfpq_topk",
    "u1b_union_all_count",
    "l24_domain_mixture",
    "o1_global_sort",
    "a8_bronze_roundtrip",
    # TPC-H — all 16 never-driver-checked queries
    "q3_shipping_priority",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_split",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    # G — grouping extensions and profiling extras
    "g4b_cube",
    "g4c_grouping_sets",
    "g12_unpivot",
    "g13_boolean_aggs",
    "g15_listagg",
    "g17_group_by_all",
    # F — extended scalar-function surface
    "f1b_string_extended",
    "f4b_array_extended",
    "f5b_map_extended",
    "f10_try_arithmetic",
    "f11_url_functions",
    # SQ — subquery shapes
    "sq1_scalar_subquery",
    "sq3_correlated_scalar",
    "sq6_pipe_syntax",
    # E — event analytics
    "e2_retention_cohorts",
    "e3_transition_matrix",
    "e5_dau_wau_stickiness",
    # W / T / X — sequence pattern, dynamic session window, grouped UDAF
    "w8_sequence_pattern",
    "t13_dynamic_session_window",
    "x3_grouped_agg_udaf",
    # L — checked simhash twin, quality scores, SemDeDup (sliced l23 +
    # the new registry-honest k-from-N l23b)
    "g14b_exact_percentile",
    "l4b2_simhash_checked",
    "l6b_quality_scores",
    "l23_semantic_dedup",
    "l23b_semantic_dedup_scaled",
    "l23c_semantic_dedup_collapsed",
)


def _ordered():
    qs = all_queries()
    missing = [n for n in _HEAD if n not in qs]
    if missing:
        raise RuntimeError(f"_HEAD names not in registry: {missing}")
    ordered = {n: qs[n] for n in _HEAD}
    for n, q in qs.items():
        if n not in ordered:
            ordered[n] = q
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary, SURVEY §2.B G1) at sf0.001."""
    return all_queries()["g1_groupby_agg"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for declared-but-not-
    hash-checkable ops (approx/streaming-timing/model-specific, §2.C.6)."""
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
