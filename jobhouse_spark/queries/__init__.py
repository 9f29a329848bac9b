"""Query registry package. Import `all_queries` to get the full contract."""

from __future__ import annotations

import importlib

from jobhouse_spark.queries.registry import Query, all_queries, by_tag, register  # noqa: F401

_MODULES = (
    "scans",
    "projections",
    "joins",
    "aggregates",
    "windows",
    "sorts_sets",
    "scalar_functions",
    "llm_ops",
    "streaming_queries",
    "udf_surface",
    "ingestion_queries",
    "llm_ops_extra",
    "relational_extra",
    "jobhouse_domain",
    "relational_extra2",
    "analytics_shapes",
    "relational_extra3",
    "tpch_suite",
    "sql_features",
    "llm_ops_pipeline",
    "llm_ops_cleaning",
    "jobhouse_gold",
)

_loaded = False


def _load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        try:
            importlib.import_module(f"jobhouse_spark.queries.{mod}")
        except ModuleNotFoundError as e:
            # allow partial builds while modules land incrementally
            if f"queries.{mod}" not in str(e):
                raise
    _loaded = True
