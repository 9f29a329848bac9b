"""Silver layer: standardize bronze HH postings into a typed table
(reference's designed cleaning/standardization stage,
docs/Pipeline Architecture.mermaid:16-24, and the commented-out
transform dags/extract_raw_jobs.py:149-202).

Schema-on-read happens exactly once, here: `raw_content` (raw JSON
string) is projected through a *versioned* StructType — never inferred
in production paths (SURVEY §7 hard parts: HH payload schema drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Versioned HH vacancy schema v1 (public HH.ru /vacancies shape;
# fields used by the reference transform, extract_raw_jobs.py:172-191)
HH_VACANCY_SCHEMA_V1 = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("published_at", T.StringType()),  # ISO-8601 w/ offset
        T.StructField(
            "area",
            T.StructType(
                [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
            ),
        ),
        T.StructField(
            "salary",
            T.StructType(
                [
                    T.StructField("from", T.LongType()),
                    T.StructField("to", T.LongType()),
                    T.StructField("currency", T.StringType()),
                    T.StructField("gross", T.BooleanType()),
                ]
            ),
        ),
        T.StructField(
            "employer",
            T.StructType(
                [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
            ),
        ),
        T.StructField(
            "snippet",
            T.StructType(
                [
                    T.StructField("requirement", T.StringType()),
                    T.StructField("responsibility", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "schedule",
            T.StructType(
                [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
            ),
        ),
        T.StructField(
            "experience",
            T.StructType(
                [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
            ),
        ),
        T.StructField(
            "employment",
            T.StructType(
                [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
            ),
        ),
        T.StructField("alternate_url", T.StringType()),
    ]
)


def standardize_postings(bronze: DataFrame) -> DataFrame:
    """Bronze envelope → silver typed postings.

    - parse raw_content through the versioned schema,
    - typed timestamp from published_at (offset-aware → UTC),
    - salary normalized to a midpoint RUB-thousanders column,
    - reference A12 date derivations (year/month/day for partitioning).
    """
    v = F.from_json(F.col("raw_content"), HH_VACANCY_SCHEMA_V1)
    published = F.to_timestamp(F.col("published_ts_str"), "yyyy-MM-dd'T'HH:mm:ssZ")
    salary_mid = (
        F.when(
            F.col("salary_from").isNotNull() & F.col("salary_to").isNotNull(),
            (F.col("salary_from") + F.col("salary_to")) / 2,
        )
        .when(F.col("salary_from").isNotNull(), F.col("salary_from"))
        .otherwise(F.col("salary_to"))
    )
    return (
        bronze.select(
            "posting_id",
            "source",
            "extracted_at",
            F.col("metadata").getItem("search_text").alias("search_text"),
            v.alias("v"),
        )
        .select(
            "posting_id",
            "source",
            "extracted_at",
            "search_text",
            F.col("v.name").alias("title"),
            F.col("v.published_at").alias("published_ts_str"),
            F.col("v.area.name").alias("area_name"),
            F.col("v.salary.from").alias("salary_from"),
            F.col("v.salary.to").alias("salary_to"),
            F.col("v.salary.currency").alias("salary_currency"),
            F.col("v.salary.gross").alias("salary_gross"),
            F.col("v.employer.name").alias("employer_name"),
            F.col("v.snippet.requirement").alias("requirement"),
            F.col("v.schedule.id").alias("schedule"),
            F.col("v.experience.id").alias("experience"),
            F.col("v.employment.id").alias("employment"),
        )
        .withColumn("published_at", published)
        .withColumn("salary_mid", salary_mid.cast("double"))
        .withColumn("pub_year", F.year("published_at"))
        .withColumn("pub_month", F.month("published_at"))
        .withColumn("pub_day", F.dayofmonth("published_at"))
        .drop("published_ts_str")
    )


def gold_daily_mart(silver: DataFrame) -> DataFrame:
    """Gold mart (reference's designed data mart, mermaid:27-30):
    postings per source per day with salary stats."""
    from jobhouse_spark.queries.registry import dec, fin  # noqa: PLC0415

    return (
        silver.groupBy("source", "pub_year", "pub_month", "pub_day")
        .agg(
            F.count("*").alias("n_postings"),
            F.count("salary_mid").alias("n_with_salary"),
            fin(F.avg(dec(F.col("salary_mid")))).alias("avg_salary_mid"),
            F.countDistinct("employer_name").alias("n_employers"),
        )
        .orderBy("source", "pub_year", "pub_month", "pub_day")
    )


def gold_salary_by_experience(silver: DataFrame) -> DataFrame:
    """Gold ML-feature-ish mart: salary distribution per experience band."""
    from jobhouse_spark.queries.registry import dec, fin  # noqa: PLC0415

    return (
        silver.filter(F.col("salary_mid").isNotNull())
        .groupBy("experience")
        .agg(
            F.count("*").alias("n"),
            fin(F.avg(dec(F.col("salary_mid")))).alias("avg_salary"),
            fin(F.median("salary_mid")).alias("med_salary"),
        )
        .orderBy("experience")
    )


def gold_employer_features(silver: DataFrame, n_dims: int = 4) -> DataFrame:
    """Gold ML-feature mart (the mermaid's "ML features" box,
    docs/Pipeline Architecture.mermaid:27-30): one feature row per
    employer — salary stats plus text-derived features from posting
    titles via the engine's hashing-trick embedder (the same
    md5-token-hash → signed-weight-per-dim pooling l22 uses for
    chunk embeddings; deterministic, cross-engine exact).

    Scale shape: one narrow map (tokenize + per-dim signed sums are
    JVM HOF expressions, no Python) and ONE groupBy(employer) shuffle
    with map-side partial aggregation — the same plan at 100 TB.
    """
    from jobhouse_spark.functions.hashing import (  # noqa: PLC0415
        hash_embed_term,
        md5_int32,
    )
    from jobhouse_spark.queries.registry import dec, fin  # noqa: PLC0415

    toks = F.split(
        F.lower(F.trim(F.coalesce(F.col("title"), F.lit("")))), r"\s+"
    )
    hs = F.transform(toks, md5_int32)

    def dim_sum(d: int):
        return F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda acc, h: acc + hash_embed_term(h, d),
        )

    base = silver.select(
        "employer_name",
        "salary_mid",
        F.size(toks).alias("title_tokens"),
        *[dim_sum(d).alias(f"emb_{d}") for d in range(n_dims)],
    )
    return (
        base.groupBy("employer_name")
        .agg(
            F.count("*").alias("n_postings"),
            F.count("salary_mid").alias("n_with_salary"),
            fin(F.avg(dec(F.col("salary_mid")))).alias("avg_salary_mid"),
            F.min("salary_mid").alias("min_salary_mid"),
            F.max("salary_mid").alias("max_salary_mid"),
            F.sum("title_tokens").alias("title_tokens"),
            *[F.sum(f"emb_{d}").alias(f"emb_{d}") for d in range(n_dims)],
        )
        .orderBy("employer_name")
    )
