"""Deduplication operators (reference A15 / SURVEY L1, W5).

The reference's metadata-store dedup feedback loop
(docs/Pipeline Architecture.mermaid:33) — "skip postings already
ingested" — maps to a left-anti join against the metadata table. The
content-level variants serve the LLM-pipeline mandate.

Scale notes: all variants are single-shuffle (anti-join or groupBy on
the dedup key). Content hashing uses sha2/md5 computed JVM-side so the
shuffle key is a fixed-width string, not the document body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_anti_join(incoming: DataFrame, existing_keys: DataFrame, key: str) -> DataFrame:
    """A15: drop incoming rows whose key is already in the metadata store."""
    return incoming.join(existing_keys.select(key).distinct(), key, "left_anti")


def exact_dedup_by_content(
    df: DataFrame, content_col: str, order_col: str, hash_fn: str = "md5"
) -> DataFrame:
    """L1: keep exactly one row per distinct content hash.

    Deterministic survivor: the row with the smallest ``order_col`` per
    hash (W5 latest/first-per-key pattern), so reruns always keep the
    same row — required for oracle checking and for idempotent reruns
    of a 100 TB dedup pass.
    """
    hash_col = F.md5(F.col(content_col)) if hash_fn == "md5" else F.sha2(F.col(content_col), 256)
    w = Window.partitionBy("__h").orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__h", hash_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def latest_per_key(df: DataFrame, key: str, ts_col: str, tiebreak: str) -> DataFrame:
    """A16/W5: CDC snapshot — the most recent row per key."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).desc(), F.col(tiebreak).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
