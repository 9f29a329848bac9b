"""Table maintenance: small-file compaction with optional sort-based
clustering.

The reference's bronze layer writes one object per extraction batch
(`/root/reference/src/storage/raw_layer.py:30-53`) — at a daily cadence
per source/search that is exactly the small-file sprawl that kills scan
throughput at 100 TB (every file costs a footer read, a task schedule,
and defeats row-group min/max skipping). Compaction rewrites a
directory into ~target-sized files; `sort_by` additionally clusters
rows so parquet column min/max stats become selective (the poor-man's
Z-order for one key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Recursive data-file byte count via the Hadoop FileSystem API —
    works for any supported scheme (file://, hdfs://, s3a://…), unlike
    os.walk which silently returns 0 for non-local URIs and would make
    compaction coalesce a 100 TB lake into one file."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    total = 0
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not name.startswith(("_", ".")):
            total += status.getLen()
    return total


def plan_compaction(src_bytes: int, target_file_bytes: int) -> int:
    """Number of output files: ceil(size/target), at least 1."""
    return max(1, -(-src_bytes // target_file_bytes))


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    sort_by: str | None = None,
    compression: str = "zstd",
) -> DataFrame:
    """Rewrite ``src`` parquet into ``dst`` as ~``target_file_bytes``
    files; returns the compacted DataFrame (lazy, already written).

    - File count is planned from the *actual* input bytes, so a
      directory of 10k drip-fed bronze files becomes the handful of
      files its data volume warrants.
    - With ``sort_by``: `repartitionByRange` + `sortWithinPartitions`
      gives globally range-clustered files — every file covers a
      disjoint key range, so a point/range predicate prunes to one file
      via parquet min/max stats.
    - Without: `coalesce` avoids a shuffle entirely (pure task merge).
    - zstd: the right codec for cold analytic data (better ratio than
      snappy at comparable scan cost on modern CPUs).
    """
    df = spark.read.parquet(src)
    n_files = plan_compaction(_dir_bytes(spark, src), target_file_bytes)
    if sort_by:
        out = df.repartitionByRange(n_files, sort_by).sortWithinPartitions(sort_by)
    else:
        out = df.coalesce(n_files)
    out.write.mode("overwrite").option("compression", compression).parquet(dst)
    return spark.read.parquet(dst)
