"""Incremental CDC merge (operators/incremental.py): end state equals a
full rebuild, AND untouched day partitions are physically untouched —
the scale property that distinguishes a16b from a16's full-outer
rebuild."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from jobhouse_spark.operators.incremental import incremental_merge
from jobhouse_spark.tables import Tables


def _partition_state(root: str) -> dict[str, list[tuple[str, float, int]]]:
    """day-partition dir -> sorted (file, mtime, size) triples."""
    state: dict[str, list[tuple[str, float, int]]] = {}
    for entry in sorted(os.listdir(root)):
        if not entry.startswith("day="):
            continue
        d = os.path.join(root, entry)
        state[entry] = sorted(
            (f, os.path.getmtime(os.path.join(d, f)), os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d)
            if not f.startswith(("_", "."))
        )
    return state


def test_incremental_merge_equals_rebuild_and_prunes_writes(spark, sf_dir, tmp_path):
    root = str(tmp_path / "silver")
    e = Tables(spark, sf_dir).events
    base = e.select("event_id", F.to_date("ts").alias("day"), "event_type", "user_id")
    old = base.filter(F.col("event_id") < 6000)
    old.write.mode("overwrite").partitionBy("day").parquet(root)

    win = F.col("day").between(F.lit("2024-01-05"), F.lit("2024-01-09"))
    ups = base.filter(win & (F.col("event_id") < 8000)).withColumn(
        "event_type",
        F.when(F.col("event_id") % 10 == 0, "mutated").otherwise(F.col("event_type")),
    )
    dels = old.filter(win & (F.col("event_id") % 17 == 0)).select("event_id", "day")

    before = _partition_state(root)
    changed = incremental_merge(spark, root, ups, dels, "event_id", "day")
    after = _partition_state(root)

    changed_dirs = {f"day={d}" for d in changed}
    assert changed_dirs == {
        f"day=2024-01-0{i}" for i in range(5, 10)
    } & set(before), changed_dirs
    # untouched days: identical file lists, mtimes, and sizes
    for part, files in before.items():
        if part not in changed_dirs:
            assert after[part] == files, f"{part} was rewritten"
    # changed days really were rewritten
    for part in changed_dirs:
        assert after[part] != before.get(part), f"{part} not rewritten"

    # end state == full rebuild semantics (computed independently in-memory)
    up_keys = {r[0] for r in ups.select("event_id").collect()}
    del_keys = {r[0] for r in dels.select("event_id").collect()}
    expected = {
        (r.event_id, str(r.day), r.event_type, r.user_id)
        for r in old.collect()
        if r.event_id not in up_keys and r.event_id not in del_keys
    } | {
        (r.event_id, str(r.day), r.event_type, r.user_id)
        for r in ups.collect()
        if r.event_id not in del_keys
    }
    got = {
        (r.event_id, str(r.day), r.event_type, r.user_id)
        for r in spark.read.parquet(root).collect()
    }
    assert got == expected

    # idempotence: re-applying the same batch changes nothing
    incremental_merge(spark, root, ups, dels, "event_id", "day")
    got2 = {
        (r.event_id, str(r.day), r.event_type, r.user_id)
        for r in spark.read.parquet(root).collect()
    }
    assert got2 == expected


def test_incremental_merge_empty_batch_is_noop(spark, sf_dir, tmp_path):
    root = str(tmp_path / "silver")
    e = Tables(spark, sf_dir).events
    base = e.select("event_id", F.to_date("ts").alias("day"), "event_type", "user_id")
    base.filter(F.col("event_id") < 500).write.mode("overwrite").partitionBy(
        "day"
    ).parquet(root)
    empty = base.filter(F.lit(False))
    before = _partition_state(root)
    assert incremental_merge(
        spark, root, empty, empty.select("event_id", "day"), "event_id", "day"
    ) == []
    assert _partition_state(root) == before
