"""A-family registry entries: ingestion/bronze semantics as queries
(reference A5/A8/A15/A16 — the parts of the reference that actually run).

The bronze round-trip and dedup/CDC checks are expressed over the
driver's tables so the oracle can verify them; the HH-replay pipeline
(fixture → envelope → bronze → silver) is exercised in tests/test_bronze.py.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobhouse_spark.operators.dedup import dedup_anti_join
from jobhouse_spark.queries.registry import register
from jobhouse_spark.sources.bronze import (
    envelope_projection,
    read_bronze,
    read_bronze_day_slice,
    write_bronze_partitioned,
)
from jobhouse_spark.tables import Tables

# One bronze lake per (query, sf_dir) per session: the partitioned writer
# appends, so re-invoking a query (bench repeats, driver retries) must NOT
# re-write into the same root — build once, reuse the dir, remove at exit
# instead of leaking a fresh mkdtemp per invocation.
_BRONZE_ROOTS: dict[tuple[str, str], str] = {}


def _session_bronze_root(tag: str, sf_dir: str, build: Callable[[str], None]) -> str:
    key = (tag, sf_dir)
    if key not in _BRONZE_ROOTS:
        root = tempfile.mkdtemp(prefix=f"jh_{tag}_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        build(root)
        _BRONZE_ROOTS[key] = root
    return _BRONZE_ROOTS[key]


@register(
    "a8_bronze_roundtrip",
    oracle=(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT posting_id) AS n_ids, "
        "MIN(posting_id) AS min_id, MAX(posting_id) AS max_id FROM ("
        "  SELECT CAST(n_nationkey AS VARCHAR) AS posting_id FROM nation)"
    ),
    tags=("ingestion", "sink"),
)
def a8_bronze_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A5: envelope-project nation rows as postings, write through the
    partitioned bronze sink, re-read with the fixed envelope schema."""
    n = Tables(spark, sf_dir).nation.withColumnRenamed("n_nationkey", "id")
    postings = envelope_projection(
        n, search_text="parity", source="HH",
        extracted_at=datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc),
    )
    root = _session_bronze_root(
        "bronze", sf_dir, lambda r: write_bronze_partitioned(postings, r)
    )
    back = read_bronze(spark, root)
    return back.agg(
        F.count("*").alias("n"),
        F.countDistinct("posting_id").alias("n_ids"),
        F.min("posting_id").alias("min_id"),
        F.max("posting_id").alias("max_id"),
    )


@register(
    "a8b_bronze_hive_pruned",
    oracle=(
        "SELECT COUNT(*) AS n, MIN(n_nationkey) AS min_id, MAX(n_nationkey) AS max_id "
        "FROM nation WHERE n_nationkey % 3 = 1"
    ),
    tags=("ingestion", "scan", "pruning"),
)
def a8b_bronze_hive_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 at scale: write bronze across three hive day-partitions, then
    read back ONE day through a partition-column filter.

    The `day = '02'` predicate is a partition filter (directory-level
    pruning, no data read from the other days) — the 100 TB contract for
    the bronze lake: a one-day slice touches 1/N of the files.
    tools/explain_audit.py asserts the scan's PartitionFilters carry it.
    """
    n = Tables(spark, sf_dir).nation.withColumnRenamed("n_nationkey", "id")
    postings = envelope_projection(
        n, search_text="parity", source="HH",
        extracted_at=datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc),
    )
    # spread rows over day 01..03 by id so each hive partition is non-empty
    day = (F.col("posting_id").cast("int") % 3 + 1).cast("string")
    postings = postings.withColumn(
        "extracted_at",
        F.to_timestamp(F.concat(F.lit("2024-03-0"), day, F.lit(" 12:00:00"))),
    )
    root = _session_bronze_root(
        "bronze_hive", sf_dir, lambda r: write_bronze_partitioned(postings, r)
    )
    sliced = read_bronze_day_slice(spark, root, day="02")
    return sliced.agg(
        F.count("*").alias("n"),
        F.min(F.col("posting_id").cast("int")).alias("min_id"),
        F.max(F.col("posting_id").cast("int")).alias("max_id"),
    )


@register(
    "a15_dedup_check",
    oracle=(
        "SELECT COUNT(*) AS n_new FROM events "
        "WHERE user_id < 50 AND event_id NOT IN ("
        "  SELECT event_id FROM events WHERE user_id < 20)"
    ),
    tags=("ingestion", "dedup"),
)
def a15_dedup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: metadata-store dedup feedback — left-anti join of incoming
    ids against already-ingested ids (Pipeline Architecture.mermaid:33)."""
    e = Tables(spark, sf_dir).events
    incoming = e.filter(F.col("user_id") < 50)
    already_ingested = e.filter(F.col("user_id") < 20).select("event_id")
    new = dedup_anti_join(incoming, already_ingested, "event_id")
    return new.agg(F.count("*").alias("n_new"))


@register(
    "a16_change_detection",
    oracle="""
WITH old AS (
  SELECT event_id, md5(concat_ws('|', event_type, CAST(user_id AS VARCHAR))) AS h
  FROM events WHERE event_id < 6000),
new AS (
  SELECT event_id, md5(concat_ws('|',
           CASE WHEN event_id % 10 = 0 THEN 'mutated' ELSE event_type END,
           CAST(user_id AS VARCHAR))) AS h
  FROM events WHERE event_id >= 2000 AND event_id < 8000)
SELECT
  CASE WHEN o.event_id IS NULL THEN 'inserted'
       WHEN n.event_id IS NULL THEN 'deleted'
       WHEN o.h <> n.h THEN 'changed' ELSE 'unchanged' END AS status,
  COUNT(*) AS n
FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
GROUP BY 1 ORDER BY 1
""",
    tags=("ingestion", "cdc"),
)
def a16_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: CDC between two bronze snapshots — full outer join on the
    key + content-hash compare (Pipeline Architecture.mermaid:17-22).
    The 'new' snapshot mutates every 10th row to exercise 'changed'."""
    e = Tables(spark, sf_dir).events
    old = e.filter(F.col("event_id") < 6000).select(
        "event_id",
        F.md5(F.concat_ws("|", "event_type", F.col("user_id").cast("string"))).alias("h"),
    )
    new = e.filter((F.col("event_id") >= 2000) & (F.col("event_id") < 8000)).select(
        "event_id",
        F.md5(
            F.concat_ws(
                "|",
                F.when(F.col("event_id") % 10 == 0, "mutated").otherwise(
                    F.col("event_type")
                ),
                F.col("user_id").cast("string"),
            )
        ).alias("h"),
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.event_id") == F.col("n.event_id"), "full_outer")
    status = (
        F.when(F.col("o.event_id").isNull(), "inserted")
        .when(F.col("n.event_id").isNull(), "deleted")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .orderBy("status")
    )
