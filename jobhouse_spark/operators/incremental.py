"""Incremental CDC merge into a day-partitioned silver table (A16 at
scale; reference change-detection intent: docs/Pipeline
Architecture.mermaid:17-22, change status per key).

`a16_change_detection` computes the diff; this operator APPLIES it the
way a 100 TB silver layer must: touch only the day partitions the
change feed covers. The full-outer rebuild (read all of silver, join,
rewrite all of it) is correct but reads and rewrites the entire table
for a 1-day batch — at 100 TB that is the difference between merging
1/365th of the lake and rewriting all of it.

Mechanics (no Delta/Iceberg in this container — plain parquet + Spark's
dynamic partition overwrite gives the same partition-level atomicity):

1. Changed-day set = distinct ``day_col`` values in the upsert feed and
   the delete markers (both carry the partition key — CDC feeds carry
   full row images). Small by construction: one driver-side collect of
   a distinct over the batch, never over silver.
2. Read ONLY those partitions of silver (``day IN (...)`` on the
   partition column → directory-level pruning; no data read from
   untouched days — asserted in tests/test_incremental.py by file
   mtimes).
3. Merge: old rows lose to upserted keys, deleted keys drop entirely
   (delete wins over a same-key upsert), upserts minus deletes append.
4. Write back with ``partitionOverwriteMode=dynamic``: only partitions
   present in the merged output are replaced; every other day's files
   are untouched. A changed day whose rows were ALL deleted is absent
   from the output — dynamic overwrite cannot emit an empty partition —
   so those days are cleared explicitly afterward.

The merge is IDEMPOTENT: re-applying the same batch yields the same end
state (upserts replace by key, deletes of absent keys are no-ops), so
task retries or a re-run after a mid-job failure converge.

Assumption (documented contract): a key's ``day_col`` value is stable
across versions. A row whose partition value changes must arrive as a
delete (old day) + insert (new day) pair, as in any partitioned MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def incremental_merge(
    spark: SparkSession,
    silver_root: str,
    upserts: DataFrame,
    deletes: DataFrame,
    key_col: str = "event_id",
    day_col: str = "day",
) -> list[str]:
    """Apply an upsert feed + delete markers to a day-partitioned
    parquet silver table, rewriting ONLY the changed day partitions.

    ``deletes`` needs (key_col, day_col); ``upserts`` carries full rows.
    Returns the sorted list of day partition values that were merged.
    """
    changed_days = sorted(
        str(r[0])
        for r in upserts.select(day_col)
        .union(deletes.select(day_col))
        .distinct()
        .collect()
    )
    if not changed_days:
        return []

    # Bootstrap: a first-ever merge (streaming sink, fresh silver) has
    # no table to read yet — treat silver as empty instead of failing
    # the path lookup. ONLY the path-not-found condition may bootstrap:
    # any other analysis failure on an EXISTING table (unreadable dir,
    # schema conflict) must raise, or the dynamic overwrite below would
    # silently replace the changed days with batch-only rows (data loss).
    try:
        old_slice = spark.read.parquet(silver_root).filter(
            F.col(day_col).isin(changed_days)
        )
    except AnalysisException as e:
        cond = (
            getattr(e, "getCondition", None) and e.getCondition()
        ) or (getattr(e, "getErrorClass", None) and e.getErrorClass()) or ""
        if "PATH_NOT_FOUND" not in str(cond) and "PATH_NOT_FOUND" not in str(e):
            raise
        old_slice = upserts.filter(F.lit(False))
    del_keys = deletes.select(key_col)
    up_keys = upserts.select(key_col)
    surviving_old = old_slice.join(up_keys, key_col, "left_anti").join(
        del_keys, key_col, "left_anti"
    )
    new_rows = upserts.join(del_keys, key_col, "left_anti")
    merged = surviving_old.unionByName(new_rows.select(*surviving_old.columns))

    # Materialize BEFORE the write: the merged plan reads the same
    # partition directories the write is about to replace, and Spark
    # (rightly) refuses to overwrite a path it is still reading from.
    # The barrier is the merge's write barrier — exactly what a MERGE
    # INTO implementation does internally (read side materialized, then
    # commit). Leak/fault trade handled by materialize_barrier; the
    # executor-loss window is the duration of this function, not the
    # lifetime of a returned frame.
    from jobhouse_spark.materialize import materialize_barrier  # noqa: PLC0415

    merged = materialize_barrier(merged)

    # Per-write option (Spark 3.0+), NOT a session-conf flip: a session
    # mutation would leak dynamic semantics into any concurrent
    # partitioned overwrite in the same session during the window, and
    # concurrent merges would race on the restore.
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(day_col)
        .parquet(silver_root)
    )

    # Dynamic overwrite only replaces partitions PRESENT in the output:
    # a day whose rows were ALL deleted contributes zero rows to
    # `merged`, so its old files would silently survive. Clear such
    # days explicitly with a static overwrite of the partition dir
    # (empty write: deletes the old files, leaves an empty partition).
    #
    # NON-ATOMICITY WINDOW (documented contract): each partition write
    # is atomic, but the dynamic overwrite above and this clear are two
    # steps. A crash between them leaves fully-deleted days' stale rows
    # visible until the batch is re-applied; because the merge is
    # idempotent, the re-run converges. Readers between a crash and the
    # re-run may observe resurrected rows for those days only.
    remaining = {str(r[0]) for r in merged.select(day_col).distinct().collect()}
    emptied = [d for d in changed_days if d not in remaining]
    if emptied:
        # the clear targets the partition DIRECTORY by name; partition
        # values Spark would %-escape in the dir name (space, ':', '%',
        # '/', ...) would make the raw path point elsewhere — refuse
        # them loudly instead of clearing the wrong directory
        import re  # noqa: PLC0415

        bad = [d for d in emptied if not re.fullmatch(r"[A-Za-z0-9._-]+", d)]
        if bad:
            raise ValueError(
                f"cannot clear fully-deleted partitions with values needing "
                f"path escaping: {bad!r} (use plain date-like {day_col} values)"
            )
        empty = merged.drop(day_col).filter(F.lit(False))
        for d in emptied:
            empty.write.mode("overwrite").parquet(f"{silver_root}/{day_col}={d}")
    return changed_days
