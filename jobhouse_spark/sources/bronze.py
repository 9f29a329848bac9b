"""Bronze raw layer — reference parity for the ingestion path.

Reference semantics reproduced (see /root/reference):
- Key scheme `{source}/{yyyy}/{MM}/{dd}/{HH}/{batch_id}.jsonl.gz`
  (src/storage/raw_layer.py:25-28), gzipped JSONL one document per line
  (raw_layer.py:33-44).
- Envelope `RawJobPosting`: posting_id / raw_content / metadata /
  source / extracted_at (src/common/data.py:6-11, built at
  src/extract/hh_api.py:161-173).
- `StorageMetadata`: source / batch_id / s3_key / created_at / etag
  (src/common/data.py:14-19) — with the reference's metadata['source']
  KeyError bug (SURVEY §3.4) fixed: source comes from posting.source.
- batch_id = "{search}_{yyyyMMdd_HHMMSS}" (dags/extract_raw_jobs.py:129).

Two writers:
- ``write_bronze_batch`` — exact single-object parity: one batch → one
  `.jsonl.gz` under the reference key. Bounded driver-side work (the
  reference holds the same batch in worker RAM), right for the
  ingestion micro-batch path.
- ``write_bronze_partitioned`` — the scale path: Spark-native
  partitionBy(source, year, month, day, hour); the *directory* scheme
  is the compatibility contract (SURVEY §7), and hive-style partition
  columns buy Catalyst partition pruning over a 100 TB bronze lake.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_POSTING_SCHEMA = T.StructType(
    [
        T.StructField("posting_id", T.StringType(), False),
        T.StructField("raw_content", T.StringType(), False),  # raw JSON
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("source", T.StringType(), False),
        T.StructField("extracted_at", T.TimestampType(), False),
    ]
)

STORAGE_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("s3_key", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("etag", T.StringType(), True),
    ]
)


def make_batch_id(search_text: str, at: datetime) -> str:
    """`"{search}_{yyyyMMdd_HHMMSS}"` — dags/extract_raw_jobs.py:129
    (with the reference's missing-parens strftime bug fixed)."""
    return f"{search_text}_{at.strftime('%Y%m%d_%H%M%S')}"


def bronze_key(source: str, batch_id: str, at: datetime) -> str:
    """Reference key layout, raw_layer.py:25-28."""
    return (
        f"{source}/{at.strftime('%Y')}/{at.strftime('%m')}/"
        f"{at.strftime('%d')}/{at.strftime('%H')}/{batch_id}.jsonl.gz"
    )


def envelope_projection(
    items: DataFrame,
    search_text: str,
    source: str = "HH",
    extracted_at: datetime | None = None,
) -> DataFrame:
    """A5: raw API item rows → RawJobPosting envelope, declaratively.

    Mirrors src/extract/hh_api.py:161-173: posting_id = str(item.id),
    raw_content = the full item JSON, metadata = {'search_text': ...}.
    ``extracted_at`` is a parameter (never current_timestamp()) so
    pipelines are replayable and oracle-checkable.
    """
    at = extracted_at or datetime.now(timezone.utc)
    return items.select(
        F.col("id").cast("string").alias("posting_id"),
        F.to_json(F.struct(*[F.col(c) for c in items.columns])).alias("raw_content"),
        F.create_map(F.lit("search_text"), F.lit(search_text)).alias("metadata"),
        F.lit(source).alias("source"),
        F.lit(at.replace(tzinfo=None)).cast("timestamp").alias("extracted_at"),
    )


def write_bronze_batch(
    postings: DataFrame, root: str, batch_id: str, at: datetime
) -> DataFrame:
    """Single-object writer: one batch → one gzip JSONL file at the exact
    reference key; returns the StorageMetadata DataFrame (one row per
    posting, raw_layer.py:55-64).

    The batch is collected to the driver — identical memory contract to
    the reference, which materializes `list[RawJobPosting]` in worker
    RAM. Use the partitioned writer for unbounded data.
    """
    spark = postings.sparkSession
    rows = postings.toJSON().collect()
    sources = [json.loads(r)["source"] for r in rows]
    source = sources[0] if sources else "HH"
    key = bronze_key(source, batch_id, at)
    path = os.path.join(root, key)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = ("\n".join(rows) + "\n").encode() if rows else b""
    with gzip.GzipFile(path, mode="wb", mtime=0) as f:  # mtime=0: stable etag
        f.write(payload)
    etag = hashlib.md5(payload).hexdigest()
    created = at.replace(tzinfo=None)
    meta_rows = [(src, batch_id, key, created, etag) for src in sources]
    return spark.createDataFrame(meta_rows, STORAGE_METADATA_SCHEMA)


def write_bronze_partitioned(postings: DataFrame, root: str) -> None:
    """Scale writer: hive partitions (source, year, month, day, hour)
    derived from extracted_at — same directory semantics, pruned scans."""
    (
        postings.withColumn("year", F.date_format("extracted_at", "yyyy"))
        .withColumn("month", F.date_format("extracted_at", "MM"))
        .withColumn("day", F.date_format("extracted_at", "dd"))
        .withColumn("hour", F.date_format("extracted_at", "HH"))
        .write.mode("append")
        .partitionBy("source", "year", "month", "day", "hour")
        .option("compression", "gzip")
        .json(root)
    )


def read_bronze(spark: SparkSession, root: str, layout: str = "hive") -> DataFrame:
    """Scan the bronze lake with the fixed envelope schema — schema-on-
    read applies only to raw_content.

    layout='hive': partitionBy output (source=… dirs). Partition
    discovery fills the `source` column from directory names — do NOT
    use recursiveFileLookup here, it silently disables discovery and
    returns null partition values.
    layout='flat': the reference's plain key scheme (single-object
    writer); all columns live in the JSON lines themselves.
    """
    reader = spark.read.schema(RAW_POSTING_SCHEMA)
    if layout == "hive":
        out = reader.option("basePath", root).json(root)
        return out.select(*[f.name for f in RAW_POSTING_SCHEMA.fields])
    return reader.option("recursiveFileLookup", "true").json(root)


def read_bronze_day_slice(
    spark: SparkSession,
    root: str,
    *,
    day: str,
    source: str | None = None,
) -> DataFrame:
    """Prunable day-slice read over the hive-partitioned bronze lake.

    The filter targets the *partition columns* (`day`, optionally
    `source`) that partition discovery derives from directory names, so
    Catalyst turns it into PartitionFilters — only that day's
    directories are listed/read. This is the operative difference from
    filtering on `extracted_at` (a data column), which would scan every
    file. At 100 TB of bronze, a one-day slice is the difference
    between reading 1/365th of the lake and reading all of it.
    """
    schema = RAW_POSTING_SCHEMA
    df = spark.read.schema(schema).option("basePath", root).json(root)
    df = df.filter(F.col("day") == day)
    if source is not None:
        df = df.filter(F.col("source") == source)
    return df.select(*[f.name for f in schema.fields])


def quarantine_corrupt(spark: SparkSession, root: str) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE read splitting good rows from corrupt JSON lines
    (SURVEY §1.3 bad-record quarantine)."""
    # build a NEW StructType: StructType.add mutates the receiver, so
    # RAW_POSTING_SCHEMA.add(...) would permanently grow the shared
    # schema on first call (and raise COLUMN_ALREADY_EXISTS on the next)
    schema = T.StructType(
        list(RAW_POSTING_SCHEMA.fields)
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    df = (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(root)
    )
    # Materialization is REQUIRED: _corrupt_record can't be queried off a
    # bare JSON scan (Spark raises AnalysisException on corrupt-column-
    # only plans). localCheckpoint instead of .cache(): the parsed rows
    # land in ContextCleaner-managed blocks freed when the returned
    # frames are garbage-collected, rather than a catalog-cache entry
    # that leaks per call in a long-lived session unless the caller
    # remembers to unpersist. FAULT-TOLERANCE TRADE: the default
    # localCheckpoint is not recomputable after executor loss — and the
    # call is eager; materialize_barrier upgrades to a reliable
    # checkpoint only when the session is configured to clean
    # checkpoint files (else every call would leak disk instead).
    from jobhouse_spark.materialize import materialize_barrier  # noqa: PLC0415

    df = materialize_barrier(df)
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad
