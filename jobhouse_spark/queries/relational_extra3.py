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
