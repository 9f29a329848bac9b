"""Leak-aware eager materialization barrier (shared by the bronze
quarantine split, minhash's default lifecycle, and the incremental
merge's write barrier).

The trade-space, learned the hard way across review rounds:

- ``persist()`` without a matching unpersist leaks a catalog-cache
  entry per call in long-lived sessions.
- ``localCheckpoint(eager=True)`` is leak-free (ContextCleaner frees
  the blocks when the frame is GC'd) but truncates lineage into
  executor-local blocks: NOT recomputable after executor loss.
- ``checkpoint(eager=True)`` (reliable) survives executor loss but
  writes files under the checkpoint dir that Spark only deletes when
  ``spark.cleaner.referenceTracking.cleanCheckpoints`` (a STATIC conf)
  is true — with the default false, every call leaks disk forever.

So: reliable checkpoint only when the session has BOTH a checkpoint
dir AND checkpoint cleaning enabled; otherwise localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_barrier(df: DataFrame) -> DataFrame:
    sc = df.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None and (
        sc.getConf()
        .get("spark.cleaner.referenceTracking.cleanCheckpoints", "false")
        .lower()
        == "true"
    )
    return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)
