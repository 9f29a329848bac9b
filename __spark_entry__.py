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
# ROUND-14 ROTATION (VERDICT r13 task 7: keep the head-rotation
# cadence). IN — seven of the stalest pass* entries (driver-green
# only in r01 per the CORRECTNESS union: s5 parquet sink, s8 VALUES,
# j5 left anti, j7 band self-join, g5 filtered agg, g9 partial+final,
# w2 lag/lead). OUT — the seven freshly re-greened r13 rotations
# s2/s3/p4/j2/j4/j6 (green r01+r13) and g4c (multi-round green);
# family coverage after the swap: S keeps s1/s5/s8/s17-s20, P keeps
# p1, J keeps j1/j5/j7, G keeps g1/g5/g9/g14, W keeps w1/w2. The
# seven rows-only-by-contract entries (SURVEY §2.C rule 6: g14, l2,
# l3b, l3c, l4b, l10, t7) stay pinned with their hash-checked twins
# green (g14b, l2c/l2d, l3b2, l3c2, l4b2, l10b, t7b) — guard:
# tests/test_entry_contract.py.
_HEAD = (
    # family anchors — all driver-green in r01–r08
    "s1_parquet_scan",
    "p1_projection",
    "j1_inner_equi",
    "g1_groupby_agg",
    "w1_row_number",
    "o1_global_sort",
    "u1b_union_all_count",
    "f1_string",
    "t13_dynamic_session_window",
    "x3_grouped_agg_udaf",
    "a8_bronze_roundtrip",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    "sq1_scalar_subquery",
    "jh1_gold_daily_mart",
    "l1_exact_dedup",
    "l6b_quality_scores",
    "l23b_semantic_dedup_scaled",
    "l24_domain_mixture",
    "l27b_ivfpq_topk",
    # ---- r01-stale anchors rotated back in (round 14) ----
    "s5_parquet_sink_roundtrip",
    "s8_values_literal",
    "j5_left_anti",
    "j7_band_self_join",
    "g5_conditional_agg",
    "g9_partial_final",
    "w2_lag_lead",
    # G — profiling
    "g14_approx_percentile",  # rows-only (HLL); twin g14b green r08
    # L — near-dup / ANN production paths (recall-graded; checked twins green)
    "l2_minhash_neardup",  # rows-only; twins l2c/l2d green
    "l3b_lsh_topk",  # rows-only; twin l3b2 green
    "l3c_ivf_topk",  # rows-only; twin l3c2 green
    "l4b_simhash_fingerprint",  # rows-only; twin l4b2 green r08
    "l10_stratified_sample",  # rows-only (sampleBy); twin l10b below
    "l10b_deterministic_sample",
    # T — stateful streaming (t7 rows-only by emission timing; t7b twin)
    "t7_stateful_count",
    "t7b_stateful_count_checked",
    # round-8 additions that didn't fit the round-8 head
    "l27_pq_codes",
    "l27c_ivfpq_rerank",
    # ---- round-10 additions ----
    "t13b_dynamic_session_streaming",
    "l27d_ivfpq_stored_index",
    "l27e_ivfpq_index_append",
    # ---- round-11 additions ----
    "jh8_employer_resolution",
    "s17_compaction_invariance",
    # ---- round-12 rotation: the r11 post-pin backlog ----
    "s18_zorder_invariance",
    "s19_manifest_pruned_scan",
    "s20_retention_vacuum",
    "jh9_repost_audit",
    "jh10_dq_scorecard",
    # ---- round-13 addition ----
    "jh11_incremental_resolution",
    # ---- round-14 addition: stored-blocking-index incremental apply;
    # same oracle as jh11, so its hash row certifies indexed == plain
    # == full re-resolve. l20_corpus_ngram_counts (driver-green r09+r13)
    # rotated out to make room.
    "jh12_indexed_incremental_resolution",
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
