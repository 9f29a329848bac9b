"""X-family: UDF/UDAF/UDTF surface (SURVEY §2.B X1-X6).

Policy (SURVEY steering): UDFs are the slow path. Every X query has a
pure-SQL oracle — the point is proving the Python boundary produces
*identical* results to the JVM expressions, so users can trust a Pandas
UDF where built-ins genuinely can't express the logic. All Python
boundaries are Arrow-batched (pandas_udf / applyInPandas / mapInPandas);
X1 is the sole row-at-a-time example and marked as such.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jobhouse_spark.queries.registry import register
from jobhouse_spark.tables import Tables


@register(
    "x1_scalar_udf",
    oracle=(
        "SELECT doc_id, upper(lang) AS lang_up FROM documents "
        "WHERE doc_id < 50 ORDER BY doc_id"
    ),
    tags=("udf",),
)
def x1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: row-at-a-time Python UDF (deliberately trivial — never use
    this shape in a hot path; see X2 for the vectorized form)."""
    up = F.udf(lambda s: s.upper() if s is not None else None, T.StringType())
    d = Tables(spark, sf_dir).documents
    return (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id", up("lang").alias("lang_up"))
        .orderBy("doc_id")
    )


@register(
    "x2_pandas_udf",
    oracle=(
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len "
        "FROM documents WHERE doc_id < 200 ORDER BY doc_id"
    ),
    tags=("udf",),
)
def x2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: vectorized Series→Series Pandas UDF (Arrow batches)."""

    @F.pandas_udf(T.LongType())
    def text_len(s: pd.Series) -> pd.Series:
        return s.str.len().astype("int64")

    d = Tables(spark, sf_dir).documents
    return (
        d.filter(F.col("doc_id") < 200)
        .select("doc_id", text_len("text").alias("text_len"))
        .orderBy("doc_id")
    )


@register(
    "x3_grouped_agg_udaf",
    oracle=(
        "SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total_chars "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    tags=("udf",),
)
def x3_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: grouped-aggregate Pandas UDF (UDAF) — integer sum so the
    result is exactly comparable (float UDAF sums would need the
    decimal discipline, which pandas can't express)."""

    @F.pandas_udf(T.LongType())
    def total_chars(s: pd.Series) -> int:
        return int(s.sum())

    d = Tables(spark, sf_dir).documents
    return (
        d.groupBy("lang")
        .agg(total_chars("n_chars").alias("total_chars"))
        .orderBy("lang")
    )


@register(
    "x4_apply_in_pandas",
    oracle="""
SELECT lang, doc_id, CAST(rnk AS INT) AS rnk FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents) t
WHERE rnk <= 3 ORDER BY lang, rnk
""",
    tags=("udf",),
)
def x4_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: grouped-map applyInPandas — per-language top-3 longest docs,
    checked against the window formulation (W4)."""

    def top3(pdf: pd.DataFrame) -> pd.DataFrame:
        ordered = pdf.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).head(3)
        ordered = ordered.assign(rnk=range(1, len(ordered) + 1))
        return ordered[["lang", "doc_id", "rnk"]]

    d = Tables(spark, sf_dir).documents.select("lang", "doc_id", "n_chars")
    return (
        d.groupBy("lang")
        .applyInPandas(top3, "lang string, doc_id long, rnk int")
        .orderBy("lang", "rnk")
    )


@register(
    "x5_map_in_pandas",
    oracle=(
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k2 "
        "FROM events WHERE event_id < 400 ORDER BY event_id"
    ),
    tags=("udf",),
)
def x5_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: mapInPandas — batch-iterator transform (row-count preserving),
    the shape used for custom scans/codecs (cf. sources/multimodal.py)."""
    import json  # noqa: PLC0415

    def double_k(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["props"].map(lambda p: json.loads(p).get("k"))
            yield pd.DataFrame(
                {"event_id": pdf["event_id"], "k2": (k * 2).astype("int32")}
            )

    e = Tables(spark, sf_dir).events.filter(F.col("event_id") < 400)
    return e.mapInPandas(double_k, "event_id long, k2 int").orderBy("event_id")


@register(
    "x6_python_udtf",
    oracle="""
SELECT doc_id, CAST(pos AS INT) AS pos, token FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents WHERE doc_id < 10)
ORDER BY doc_id, pos
""",
    tags=("udf",),
)
def x6_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: Python UDTF — tokenizes a document into (pos, token) rows,
    equivalent to posexplode(split(...)), checked against unnest."""
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i + 1, tok

    spark.udtf.register("jh_tokenize", Tokenize)
    d = Tables(spark, sf_dir).documents
    d.filter(F.col("doc_id") < 10).createOrReplaceTempView("jh_x6_docs")
    return spark.sql(
        "SELECT doc_id, t.pos, t.token "
        "FROM jh_x6_docs, LATERAL jh_tokenize(text) t "
        "ORDER BY doc_id, t.pos"
    )


@register(
    "x7_map_in_arrow",
    oracle=(
        "SELECT event_id, value * 2.0 AS v2 "
        "FROM events WHERE event_id < 400 ORDER BY event_id"
    ),
    tags=("udf", "arrow"),
)
def x7_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: mapInArrow — zero-copy Arrow RecordBatch transform, the
    fastest Python extension point (no pandas materialization at all).
    Per-row IEEE multiply is bit-identical across engines, so the
    doubles hash-match."""
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.compute as pc  # noqa: PLC0415

    def double_value(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [batch.column("event_id"), pc.multiply(batch.column("value"), 2.0)],
                names=["event_id", "v2"],
            )

    e = Tables(spark, sf_dir).events.filter(F.col("event_id") < 400)
    return e.mapInArrow(double_value, "event_id long, v2 double").orderBy("event_id")
