"""Jobhouse-domain registry entries: the reference's intended product —
HH postings through bronze → silver → gold (SURVEY §7 Phase 1 vertical
slice). Inputs come from the checked-in replay fixture (no network), so
these register rows-only; exact values are asserted in
tests/test_silver_gold.py.
"""

from __future__ import annotations

import os
import tempfile
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

    with open(FIXTURE) as f:
        pages = json.load(f)
    items = PaginatedFetcher(client=replay_client(pages)).fetch_all("python data engineer")
    env = envelope_projection(
        items_to_dataframe(spark, items), "python data engineer", extracted_at=AT
    )
    root = tempfile.mkdtemp(prefix="jh_domain_")
    write_bronze_partitioned(env, root)
    return standardize_postings(read_bronze(spark, root))


@register("jh1_gold_daily_mart", oracle=None, tags=("jobhouse", "gold"))
def jh1_gold_daily_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JH1: the reference's flagship intended query — postings per source
    per day with salary stats, through the full replay→bronze→silver
    pipeline (exact values asserted in tests/test_silver_gold.py)."""
    from jobhouse_spark.silver import gold_daily_mart  # noqa: PLC0415

    return gold_daily_mart(_silver(spark))


@register("jh2_salary_by_experience", oracle=None, tags=("jobhouse", "gold"))
def jh2_salary_by_experience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JH2: gold salary-by-experience mart (ML-feature shape)."""
    from jobhouse_spark.silver import gold_salary_by_experience  # noqa: PLC0415

    return gold_salary_by_experience(_silver(spark))


@register("jh3_datasource_v2", oracle=None, tags=("jobhouse", "source"))
def jh3_datasource_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JH3: Python DataSource V2 scan of the replay fixture — one input
    partition per API page (S7 as a first-class Spark source)."""
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


@register("t12_python_stream_source", oracle=None, tags=("streaming", "source"))
def t12_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12: Python STREAMING DataSource (Spark 4) — the replay fixture
    served as a micro-batch source, one API page per batch with
    replayable {page: N} offsets (incremental ingestion the way the
    reference's daily DAG intended, but with exactly-once offsets).
    Rows-only: batch-equivalence with the jh3 batch scan is asserted in
    tests/test_streaming.py::test_t12_stream_source_equals_batch."""
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
