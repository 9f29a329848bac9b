"""Reader-vs-maintenance concurrency semantics (round-12 verdict task 7).

Plain parquet has NO snapshot isolation: a reader resolves its file
listing when the DataFrame is planned, and maintenance (compaction
rewrite, retention vacuum) that removes those files before the read
executes makes the read FAIL — which is the contract we want. The
failure mode to guard against is the silent one: with
``spark.sql.files.ignoreMissingFiles=true`` Spark would skip vanished
files and return a PARTIAL result that looks complete. These tests pin
(a) the engine session leaves that flag false, (b) a planned-then-
starved read raises instead of under-returning, for both maintenance
verbs. SCALE.md ("Reader vs maintenance concurrency") documents the
operational contract and what a table format (Delta/Iceberg snapshot
pinning) would add.
"""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def _day_table(spark, root: str) -> None:
    (
        spark.range(300)
        .withColumn(
            "day",
            F.concat(F.lit("2024-03-0"), (F.col("id") % 3 + 1).cast("string")),
        )
        .withColumn("v", F.col("id") * 2)
        .repartition(4)
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(root)
    )


def test_session_does_not_ignore_missing_files(spark):
    """The silent-partial-result knob must be OFF. If a deploy ever
    flips it, a concurrent vacuum would turn from a loud read failure
    into an undercount — this assertion makes that a test failure."""
    assert (
        spark.conf.get("spark.sql.files.ignoreMissingFiles", "false") == "false"
    )


def test_vacuum_starves_planned_reader_loudly(spark, tmp_path):
    """Reader plans (file listing resolved), vacuum deletes a partition
    it planned, reader executes -> exception, not a partial result."""
    from jobhouse_spark.operators.maintenance import vacuum_partitions

    root = str(tmp_path / "t")
    _day_table(spark, root)

    reader = spark.read.parquet(root).where(F.col("v") >= 0)
    # resolve + snapshot the listing NOW (count plans and runs over all
    # three days; the frame's FileIndex keeps that listing for reuse)
    assert reader.count() == 300

    removed = vacuum_partitions(spark, root, "day", cutoff="2024-03-02")
    assert removed == ["2024-03-01"]

    # a FRESH read sees the post-vacuum table: 2 days, 200 rows
    assert spark.read.parquet(root).count() == 200

    # the stale-planned reader must fail LOUDLY at the file level —
    # execution hits the deleted file and raises. Returning ANY row
    # count silently (300 from a stale cache, 200 from a skip-missing
    # scan) would mean the loud-failure contract is broken.
    with pytest.raises((Py4JJavaError, AnalysisException)) as ei:
        reader.count()
    msg = str(ei.value)
    assert ("FileNotFound" in msg or "does not exist" in msg
            or "FAILED_READ_FILE" in msg), msg


def test_inplace_rewrite_starves_planned_reader_loudly(spark, tmp_path):
    """Same contract for a compaction-style rewrite: an overwrite of
    the directory the reader planned (new file names, old ones gone)
    must fail the stale read, not feed it a mix of old and new files."""
    root = str(tmp_path / "t2")
    _day_table(spark, root)

    reader = spark.read.parquet(root)
    assert reader.count() == 300

    # rewrite in place (what compact_parquet(src==dst) would amount to;
    # the operator API forces src->dst precisely because of this): same
    # rows, different file layout, old files deleted by the overwrite
    snapshot = spark.read.parquet(root).localCheckpoint(eager=True)
    snapshot.coalesce(1).write.partitionBy("day").mode("overwrite").parquet(root)
    assert spark.read.parquet(root).count() == 300  # fresh read is fine

    with pytest.raises((Py4JJavaError, AnalysisException)) as ei:
        reader.count()
    msg = str(ei.value)
    assert ("FileNotFound" in msg or "does not exist" in msg
            or "FAILED_READ_FILE" in msg), msg
