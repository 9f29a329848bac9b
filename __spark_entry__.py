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
# ROUND-7 ROTATION: the driver had only ever hash-checked the same ~50
# entries; this head swaps 35 slots to FIRST-TIME entries (s9/s15, j11,
# g11/g20, w3b, u1b, f3/f7/f9, t1/t3/t11/t12, x1/x5/x7, e1/e4,
# l1b/l2b2/l2c/l2d/l8/l10c/l16/l21/l22, jh2/jh3/jh4, q2/q5/q9, sq4) so
# the adversarial check covers never-driver-green rows. Every rotated-
# OUT entry remains verified by the identical oracle in
# tools/driver_sim.py (full registry) and tests/.
_HEAD = (
    # S — sources/sinks (s1 anchor; ORC + schema evolution first-timers)
    "s1_parquet_scan",
    "s9_orc_roundtrip",
    "s15_schema_evolution",
    # P — projection/filter
    "p1_projection",
    "p2_filter",
    # J — joins (j1 anchor; expression-key join first-timer)
    "j1_inner_equi",
    "j11_join_with_expr_key",
    # G — aggregates (g1 anchor/flagship; pivot + PSI drift first-timers)
    "g1_groupby_agg",
    "g11_pivot",
    "g20_psi_drift",
    # W — windows (w1 anchor; RANGE frame first-timer)
    "w1_row_number",
    "w3b_range_frame",
    # O — ordering
    "o1_global_sort",
    # U — set ops (UNION ALL counting first-timer)
    "u1b_union_all_count",
    # F — scalar function surface (math/hash/VARIANT first-timers)
    "f3_math",
    "f7_hash",
    "f9_variant",
    # T — structured streaming (t2 anchor; source, sliding window,
    # stream-stream join, Python stream source first-timers)
    "t2_tumbling_window",
    "t1_stream_source",
    "t3_sliding_window",
    "t11_stream_stream_join",
    "t12_python_stream_source",
    # X — Python execution surface (scalar UDF, mapInPandas, mapInArrow
    # first-timers; x2/x4 verified in driver_sim/tests)
    "x1_scalar_udf",
    "x5_map_in_pandas",
    "x7_map_in_arrow",
    # E — event analytics (funnel + anomaly first-timers)
    "e1_funnel_conversion",
    "e4_daily_anomalies",
    # L — LLM data-pipeline operators (l1/l3 anchors; checked-twin and
    # lifecycle first-timers)
    "l1_exact_dedup",
    "l1b_dedup_survivors",
    "l2b2_ngram_jaccard_capped",
    "l2c_minhash_checked",
    "l2d_dedup_then_minhash",
    "l3_cosine_topk",
    "l8_language_id",
    "l10c_hash_split",
    "l16_embedding_centroids",
    "l21_duplicated_spans",
    "l22_chunk_embed_ann",
    # JH — the reference's gold marts (replay fixture -> bronze ->
    # silver -> gold, hash-checked against a fixture-rebuilding oracle)
    "jh1_gold_daily_mart",
    "jh2_salary_by_experience",
    "jh3_datasource_v2",
    "jh4_gold_employer_features",
    # A — ingestion/bronze (a8 anchor; incremental CDC merge)
    "a8_bronze_roundtrip",
    "a16b_incremental_merge",
    # TPC-H analytics (q18 anchor; q2/q5/q9 first-timers)
    "q2_min_cost_supplier",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_volume_customer",
    # subqueries (sq2 anchor; recursive CTE first-timer)
    "sq2_correlated_exists",
    "sq4_recursive_spine",
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
