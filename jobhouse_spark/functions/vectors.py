"""Vector math over ArrayType(Float/Double) columns — pure column
expressions (SURVEY §2.B L3, F4).

Everything here is `zip_with`/`aggregate`/`transform` HOFs: evaluated
in the JVM per row, no Python boundary, no UDF. At 100 TB this is the
difference between a scan-rate operator and a serialization bottleneck.

``exact_dot_decimal`` exists for oracle-checkable determinism: decimal
products/sums are exact, so Spark and any other engine agree bit-for-bit
(double dot products differ across engines in summation order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_product(a: Column, b: Column) -> Column:
    """Double-precision dot product (fast path; engine-internal ranking)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def exact_dot_decimal(a: Column, b: Column, scale: int = 6) -> Column:
    """Exact decimal dot product: each element rounded to DECIMAL(18,s)
    (via double — see scalar_functions.f4_array for why), products and
    sum exact. Deterministic across engines and partition orders."""
    # element precision is deliberately small (|x| < 1e6): products are
    # DECIMAL(25,2s) and the fold accumulator DECIMAL(26,2s), so decimal
    # addition never hits Spark's 38-digit cap — at the cap Spark *rounds
    # the scale down each step* (38,12)+( ... )→(38,11), which silently
    # breaks exactness. The merge re-cast is scale-preserving (exact).
    elem = T.DecimalType(12, scale)
    acc_t = T.DecimalType(26, 2 * scale)
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: x.cast("double").cast(elem) * y.cast("double").cast(elem),
        ),
        F.lit(0).cast(acc_t),
        lambda acc, v: (acc + v).cast(acc_t),
    )


def micro_vec(a: Column, scale: int = 6) -> Column:
    """Vector quantized to exact integer micro-units: each element
    rounded to DECIMAL(18,s) (via double, same rounding as
    ``exact_dot_decimal``) then scaled to BIGINT by 10^s. Integer dot
    products over these are 10^2s times the exact decimal dot — same
    information, ~10x cheaper (long multiply-adds in whole-stage codegen
    vs BigDecimal ops)."""
    elem = T.DecimalType(12, scale)
    factor = F.lit(10**scale).cast(T.DecimalType(scale + 1, 0))
    return F.transform(a, lambda x: (x.cast("double").cast(elem) * factor).cast("long"))


def dot_micro(a_micro: Column, b_micro: Column) -> Column:
    """Exact integer dot product of two micro-unit vectors (BIGINT).

    Range: 64-dim unit-ish vectors give |dot| <= ~6.4e13 — far inside
    int64. Squaring for cosine-threshold tests must go through
    DECIMAL(38,0) (see l7), not int64.

    Cost note (measured, local[4], dim 64, 2M rows): this interpreted
    HOF evaluates in ~2.3 us. The "obvious" codegen-friendly rewrite —
    unrolling to a flat a[0]*b[0] + ... + a[63]*b[63] GetArrayItem
    chain — measures ~6.4 us despite living inside WholeStageCodegen:
    the generated method is so large the JIT gives up on it. Don't
    "optimize" this into an unrolled chain; per-pair hot paths should
    attack pair COUNT and task balance (see semantic_dedup's triangle
    sub-sharding), not this expression."""
    return F.aggregate(
        F.zip_with(a_micro, b_micro, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
