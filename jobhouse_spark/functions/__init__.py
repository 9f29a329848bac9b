"""Column-expression libraries (JVM-side, codegen-friendly)."""

from jobhouse_spark.functions.text import (  # noqa: F401
    punct_ratio,
    quality_score,
    simhash16,
    stopword_ratio,
    token_count,
    tokens,
)
from jobhouse_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    exact_dot_decimal,
    l2_norm,
)
