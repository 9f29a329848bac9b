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
    has_dir = sc.getCheckpointDir() is not None
    cleans = (
        sc.getConf()
        .get("spark.cleaner.referenceTracking.cleanCheckpoints", "false")
        .lower()
        == "true"
    )
    if has_dir and not cleans:
        # the user signalled they want reliable checkpoints but the
        # context won't reclaim them — surface the downgrade instead of
        # silently removing executor-loss recoverability
        import warnings  # noqa: PLC0415

        warnings.warn(
            "checkpoint dir is set but "
            "spark.cleaner.referenceTracking.cleanCheckpoints is false: "
            "falling back to localCheckpoint (not recoverable after "
            "executor loss) to avoid unbounded checkpoint-dir growth; "
            "set the cleaner conf at context start for reliable "
            "checkpoints",
            stacklevel=3,
        )
    return (
        df.checkpoint(eager=True)
        if has_dir and cleans
        else df.localCheckpoint(eager=True)
    )
