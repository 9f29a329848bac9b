"""Jobhouse-domain registry entries: the reference's intended product —
HH postings through bronze → silver → gold (SURVEY §7 Phase 1 vertical
slice). Inputs come from the checked-in replay fixture (no network).
The gold marts (jh1/jh2) are hash-checked against DuckDB oracles that
rebuild silver straight from the fixture JSON; exact values are also
asserted in tests/test_silver_gold.py.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from jobhouse_spark.queries.registry import register

# ../../tests/fixtures/hh_pages.json relative to this file
FIXTURE = os.path.normpath(
    os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "..", "tests", "fixtures", "hh_pages.json",
    )
)

AT = datetime(2024, 3, 5, 14, 30, 45, tzinfo=timezone.utc)

# Oracle-side silver standardization: the same fixture file read by
# DuckDB's JSON reader, with the HH-payload projections (salary midpoint,
# offset-aware published_at -> UTC parts) expressed in SQL. The pipeline
# is replay-driven and fully deterministic, so the gold marts ARE
# hash-checkable — the oracle rebuilds silver from the raw fixture rather
# than trusting any intermediate.
_SILVER_SQL = f"""
WITH it AS (
  SELECT unnest(items) AS v
  FROM read_json('{FIXTURE}', format='array')
),
silver AS (
  SELECT
    'HH' AS source,
    strptime(v.published_at, '%Y-%m-%dT%H:%M:%S%z') AS published_at,
    v.employer.name AS employer_name,
    v.experience.id AS experience,
    CAST(CASE
      WHEN v.salary."from" IS NOT NULL AND v.salary."to" IS NOT NULL
        THEN (v.salary."from" + v.salary."to") / 2
      WHEN v.salary."from" IS NOT NULL THEN v.salary."from"
      ELSE v.salary."to" END AS DOUBLE) AS salary_mid
  FROM it
)
"""


def _silver(spark: SparkSession) -> DataFrame:
    import json  # noqa: PLC0415

    from jobhouse_spark.silver import standardize_postings  # noqa: PLC0415
    from jobhouse_spark.sources.bronze import (  # noqa: PLC0415
        envelope_projection,
        read_bronze,
        write_bronze_partitioned,
    )
    from jobhouse_spark.sources.rest import (  # noqa: PLC0415
        PaginatedFetcher,
        items_to_dataframe,
        replay_client,
    )

    from jobhouse_spark.queries.ingestion_queries import _session_bronze_root  # noqa: PLC0415

    with open(FIXTURE) as f:
        pages = json.load(f)
    items = PaginatedFetcher(client=replay_client(pages)).fetch_all("python data engineer")
    env = envelope_projection(
        items_to_dataframe(spark, items), "python data engineer", extracted_at=AT
    )
    root = _session_bronze_root(
        "domain", FIXTURE, lambda r: write_bronze_partitioned(env, r)
    )
    return standardize_postings(read_bronze(spark, root))


@register(
    "jh1_gold_daily_mart",
    oracle=_SILVER_SQL
    + """
SELECT source,
       year(published_at)  AS pub_year,
       month(published_at) AS pub_month,
       day(published_at)   AS pub_day,
       COUNT(*) AS n_postings,
       COUNT(salary_mid) AS n_with_salary,
       CAST(CAST(AVG(CAST(salary_mid AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)
         AS avg_salary_mid,
       COUNT(DISTINCT employer_name) AS n_employers
FROM silver
GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4
""",
    tags=("jobhouse", "gold"),
)
def jh1_gold_daily_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JH1: the reference's flagship intended query — postings per source
    per day with salary stats, through the full replay→bronze→silver
    pipeline (exact values also asserted in tests/test_silver_gold.py)."""
    from jobhouse_spark.silver import gold_daily_mart  # noqa: PLC0415

    return gold_daily_mart(_silver(spark))


@register(
    "jh2_salary_by_experience",
    oracle=_SILVER_SQL
    + """
SELECT experience,
       COUNT(*) AS n,
       CAST(CAST(AVG(CAST(salary_mid AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)
         AS avg_salary,
       CAST(CAST(median(salary_mid) AS DECIMAL(18,4)) AS DOUBLE) AS med_salary
FROM silver WHERE salary_mid IS NOT NULL
GROUP BY experience ORDER BY experience
""",
    tags=("jobhouse", "gold"),
)
def jh2_salary_by_experience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JH2: gold salary-by-experience mart (ML-feature shape)."""
    from jobhouse_spark.silver import gold_salary_by_experience  # noqa: PLC0415

    return gold_salary_by_experience(_silver(spark))


_PAGE_AGG_ORACLE = f"""
WITH items AS (
  SELECT page, unnest(items) AS v
  FROM read_json('{FIXTURE}', format='array'))
SELECT CAST(page AS INT) AS page,
       COUNT(*) AS n,
       COUNT(DISTINCT v.employer.name) AS n_employers
FROM items GROUP BY page ORDER BY page
"""


@register("jh3_datasource_v2", oracle=_PAGE_AGG_ORACLE, tags=("jobhouse", "source"))
def jh3_datasource_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JH3: Python DataSource V2 scan of the replay fixture — one input
    partition per API page (S7 as a first-class Spark source); the
    oracle re-derives the per-page aggregates from the fixture JSON, so
    the custom source's row delivery is hash-checked, not just counted."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from jobhouse_spark.sources.hh_datasource import HHReplayDataSource  # noqa: PLC0415

    # re-registration is a silent overwrite in PySpark 4 — no guard
    # needed, and a genuine failure (bad import, API change) propagates
    spark.dataSource.register(HHReplayDataSource)
    df = spark.read.format("hh_replay").option("fixture", FIXTURE).load()
    return (
        df.groupBy("page")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("employer_name").alias("n_employers"),
        )
        .orderBy("page")
    )


@register("t12_python_stream_source", oracle=_PAGE_AGG_ORACLE, tags=("streaming", "source"))
def t12_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12: Python STREAMING DataSource (Spark 4) — the replay fixture
    served as a micro-batch source, one API page per batch with
    replayable {page: N} offsets (incremental ingestion the way the
    reference's daily DAG intended, but with exactly-once offsets).
    Hash-checked against the fixture-derived page aggregates;
    batch-equivalence with the jh3 batch scan is additionally asserted
    in tests/test_streaming.py::test_t12_stream_source_equals_batch."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from jobhouse_spark.sources.hh_datasource import HHReplayDataSource  # noqa: PLC0415
    from jobhouse_spark.streaming.jobs import run_to_memory  # noqa: PLC0415

    spark.dataSource.register(HHReplayDataSource)
    stream = (
        spark.readStream.format("hh_replay").option("fixture", FIXTURE).load()
    )
    sunk = run_to_memory(stream)
    return (
        sunk.groupBy("page")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("employer_name").alias("n_employers"),
        )
        .orderBy("page")
    )


def _jh4_oracle() -> str:
    """DuckDB replica of the employer feature mart: silver rebuilt from
    the raw fixture, then salary stats + the hashing-trick title
    embedding (MD5_INT32_SQL token hash -> dim h%16, signed weight
    (h>>4)%2001-1000, per-dim sums pooled across an employer's
    postings)."""
    from jobhouse_spark.functions.hashing import (  # noqa: PLC0415
        HASH_EMB_TERM_SQL,
        MD5_INT32_SQL,
    )

    hext = MD5_INT32_SQL.format(x="t")
    dims = ",\n         ".join(
        "CAST(list_sum(list_transform(hs, h -> "
        + HASH_EMB_TERM_SQL.format(h="h", d=d)
        + f")) AS BIGINT) AS e{d}"
        for d in range(4)
    )
    embs = ", ".join(f"CAST(SUM(e{d}) AS BIGINT) AS emb_{d}" for d in range(4))
    return rf"""
WITH it AS (
  SELECT unnest(items) AS v
  FROM read_json('{FIXTURE}', format='array')
),
silver AS (
  SELECT v.employer.name AS employer_name,
         CAST(CASE
           WHEN v.salary."from" IS NOT NULL AND v.salary."to" IS NOT NULL
             THEN (v.salary."from" + v.salary."to") / 2
           WHEN v.salary."from" IS NOT NULL THEN v.salary."from"
           ELSE v.salary."to" END AS DOUBLE) AS salary_mid,
         string_split_regex(lower(trim(coalesce(v.name, ''))), '\s+') AS toks
  FROM it
),
feat AS (
  SELECT employer_name, salary_mid,
         len(toks) AS title_tokens,
         list_transform(toks, t -> {hext}) AS hs
  FROM silver
),
dims AS (
  SELECT employer_name, salary_mid, title_tokens,
         {dims}
  FROM feat
)
SELECT employer_name,
       COUNT(*) AS n_postings,
       COUNT(salary_mid) AS n_with_salary,
       CAST(CAST(AVG(CAST(salary_mid AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)
         AS avg_salary_mid,
       MIN(salary_mid) AS min_salary_mid,
       MAX(salary_mid) AS max_salary_mid,
       CAST(SUM(title_tokens) AS BIGINT) AS title_tokens,
       {embs}
FROM dims GROUP BY 1 ORDER BY 1
"""


@register("jh4_gold_employer_features", oracle=_jh4_oracle(), tags=("jobhouse", "gold", "ml"))
def jh4_gold_employer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JH4: Gold ML-feature mart — per-employer salary stats plus
    hashing-trick title-embedding features (silver.gold_employer_features),
    through the full replay→bronze→silver pipeline. The text features
    reuse the l22 embedder discipline (md5 token hash picks dimension +
    signed weight; JVM HOF expressions, zero Python in the hot path),
    so the mart is deterministic and hash-checked end-to-end."""
    from jobhouse_spark.silver import gold_employer_features  # noqa: PLC0415

    return gold_employer_features(_silver(spark))
