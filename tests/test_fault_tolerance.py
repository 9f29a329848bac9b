"""Batch task-retry evidence: on a 1000-executor cluster transient task
failures (preemption, disk hiccup, OOM-killed container) are routine —
Spark's unit of recovery is the TASK ATTEMPT (spark.task.maxFailures,
default 4 on a cluster), re-run from the lineage with no job restart.
Streaming crash recovery is covered by test_t9b (checkpoint + epoch
dedup); this covers the batch path the same way a chaos probe would:
inject a deterministic first-attempt failure and require the job to
heal (with retries on) and to fail fast (with retries off — proving
the injection actually fires, so the positive case can't pass
vacuously).

Local mode pins maxFailures via the master string ``local[N, F]``; a
SparkSession's master is fixed per JVM, and the suite's shared session
runs plain local[32] (maxFailures=1), so each case runs in its own
subprocess JVM.
"""

from __future__ import annotations

import pytest
import subprocess
import sys

_PROBE = """
import sys
from pyspark import TaskContext
from pyspark.sql import SparkSession

master = sys.argv[1]
spark = (
    SparkSession.builder.master(master)
    .appName("fault_tolerance_probe")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
sc = spark.sparkContext
sc.setLogLevel("ERROR")

def first_attempt_of_partition_0_fails(it):
    ctx = TaskContext.get()
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        raise RuntimeError("injected transient task failure")
    return it

try:
    total = (
        sc.parallelize(range(1000), 8)
        .mapPartitions(first_attempt_of_partition_0_fails)
        .sum()
    )
    print(f"RESULT total={total}")
except Exception:
    print("JOB_FAILED")
spark.stop()
"""


def _run_probe(master: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", _PROBE, master],
        capture_output=True,
        text=True,
        timeout=300,
    )
    lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith(("RESULT", "JOB_FAILED"))
    ]
    assert lines, f"probe produced no verdict:\n{out.stdout}\n{out.stderr[-2000:]}"
    return lines[-1]


@pytest.mark.campaign  # round-15 verdict task 1: driver verify-window
def test_task_retry_heals_transient_failure():
    """local[4, 3]: the first attempt of partition 0 dies; Spark re-runs
    that task attempt alone and the job completes with the exact answer
    (sum(range(1000)) = 499500) — no job restart, no lost partitions."""
    assert _run_probe("local[4, 3]") == "RESULT total=499500"


def test_same_failure_is_fatal_without_retries():
    """local[4] (maxFailures=1): the identical injection kills the job —
    proof the probe's failure fires, so the retry test can't pass
    vacuously, and a record of WHY maxFailures=1 is a local-mode-only
    default (any real deployment keeps spark.task.maxFailures >= 4)."""
    assert _run_probe("local[4]") == "JOB_FAILED"


def test_merge_crash_window_resurrects_then_converges(spark, tmp_path, monkeypatch):
    """The documented non-atomicity window of incremental_merge
    (operators/incremental.py): the dynamic partition overwrite and the
    explicit clear of fully-deleted days are TWO steps. Inject a crash
    between them and verify the contract exactly as written — (1) the
    emptied day's stale rows are visible after the crash (resurrection,
    the documented failure mode), (2) re-applying the SAME batch
    converges to the correct end state (idempotency is the recovery
    mechanism, no compensation logic needed)."""
    import pytest

    from jobhouse_spark import materialize as mat_mod
    from jobhouse_spark.operators.incremental import incremental_merge

    root = str(tmp_path / "silver")
    schema = "event_id int, day string, payload string"
    base = [
        (1, "2024-01-01", "a"), (2, "2024-01-01", "b"),
        (3, "2024-01-02", "c"),
    ]
    spark.createDataFrame(base, schema).write.partitionBy("day").parquet(root)

    # batch: empty day 01 entirely, update day 02
    ups = spark.createDataFrame([(3, "2024-01-02", "C")], schema)
    dels = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-01")], "event_id int, day string"
    )

    real_barrier = mat_mod.materialize_barrier

    class CrashAfterOverwrite:
        """Delegates to the real merged frame; the first attribute the
        operator touches AFTER the dynamic overwrite is .select (for
        the emptied-day reconciliation) — raise there."""

        def __init__(self, df):
            self._df = df

        def __getattr__(self, name):
            if name == "select":
                raise RuntimeError("injected crash after dynamic overwrite")
            return getattr(self._df, name)

    monkeypatch.setattr(
        mat_mod, "materialize_barrier",
        lambda df: CrashAfterOverwrite(real_barrier(df)),
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_merge(spark, root, ups, dels, "event_id", "day")

    # (1) the window: day-01 stale rows resurrected, day-02 already new
    mid = {(r.event_id, str(r.day), r.payload)
           for r in spark.read.parquet(root).collect()}
    assert (1, "2024-01-01", "a") in mid and (2, "2024-01-01", "b") in mid
    assert (3, "2024-01-02", "C") in mid

    # (2) recovery: re-apply the same batch, un-patched
    monkeypatch.setattr(mat_mod, "materialize_barrier", real_barrier)
    incremental_merge(spark, root, ups, dels, "event_id", "day")
    end = {(r.event_id, str(r.day), r.payload)
           for r in spark.read.parquet(root).collect()}
    assert end == {(3, "2024-01-02", "C")}
