"""Composed operators Spark lacks natively (SURVEY §4.3)."""

from jobhouse_spark.operators.asof import asof_join  # noqa: F401
from jobhouse_spark.operators.dedup import (  # noqa: F401
    dedup_anti_join,
    exact_dedup_by_content,
    latest_per_key,
)
from jobhouse_spark.operators.topk import top_k_per_group  # noqa: F401
