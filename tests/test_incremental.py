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


def _hist_rows(df):
    return sorted(
        ((r.k, r.v, str(r.valid_from), str(r.valid_to)) for r in df.collect()),
        key=repr,
    )


def test_scd2_versioning_semantics(spark):
    """Change closes + opens, insert opens, delete closes (full-snapshot
    mode), unchanged passes through; NULL→value transitions version
    (null-safe compare); re-applying the same batch is a no-op."""
    from jobhouse_spark.operators.scd import scd2_apply, scd2_open

    snap1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k int, v string"
    )
    hist = scd2_open(snap1, "2024-01-01")
    # k=1 unchanged; k=2 changed; k=3 NULL->value; k=4 inserted; nothing for k=2's old
    batch = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (4, "d")], "k int, v string"
    )
    h2 = scd2_apply(hist, batch, "k", ["v"], "2024-02-01")
    assert _hist_rows(h2) == sorted(
        [
            (1, "a", "2024-01-01", "None"),
            (2, "b", "2024-01-01", "2024-02-01"),
            (2, "B", "2024-02-01", "None"),
            (3, None, "2024-01-01", "2024-02-01"),
            (3, "c", "2024-02-01", "None"),
            (4, "d", "2024-02-01", "None"),
        ],
        key=repr,
    )
    # idempotent re-apply
    h3 = scd2_apply(h2, batch, "k", ["v"], "2024-02-01")
    assert _hist_rows(h3) == _hist_rows(h2)

    # full-snapshot delete: k=4 missing -> closes; incremental feed: stays open
    batch2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "k int, v string")
    h4 = scd2_apply(h2, batch2, "k", ["v"], "2024-03-01")
    assert (4, "d", "2024-02-01", "2024-03-01") in _hist_rows(h4)
    h5 = scd2_apply(h2, batch2, "k", ["v"], "2024-03-01", treat_missing_as_delete=False)
    assert (4, "d", "2024-02-01", "None") in _hist_rows(h5)


def test_incremental_merge_clears_fully_deleted_day(spark, tmp_path):
    """A day whose rows are ALL deleted contributes nothing to the
    merged output, so dynamic partition overwrite alone would leave its
    old files on disk — the merge must clear such days explicitly."""
    root = str(tmp_path / "silver")
    base = spark.createDataFrame(
        [(1, "2024-01-05", "a"), (2, "2024-01-05", "b"), (3, "2024-01-06", "c")],
        "event_id int, day string, payload string",
    )
    base.write.mode("overwrite").partitionBy("day").parquet(root)

    empty_ups = base.filter(F.lit(False))
    dels = spark.createDataFrame(
        [(1, "2024-01-05"), (2, "2024-01-05")], "event_id int, day string"
    )
    changed = incremental_merge(spark, root, empty_ups, dels, "event_id", "day")
    assert changed == ["2024-01-05"]
    left = spark.read.parquet(root).collect()
    assert [(r.event_id, str(r.day), r.payload) for r in left] == [(3, "2024-01-06", "c")]


def test_scd2_null_key_rows_survive(spark):
    """NULL-key rows are dirty-dimension reality: they must version like
    any other key (null-safe key join), never silently vanish."""
    from jobhouse_spark.operators.scd import scd2_apply, scd2_open

    hist = scd2_open(
        spark.createDataFrame([(None, "x"), (1, "a")], "k int, v string"),
        "2024-01-01",
    )
    batch = spark.createDataFrame([(None, "y"), (1, "a")], "k int, v string")
    h2 = scd2_apply(hist, batch, "k", ["v"], "2024-02-01")
    assert _hist_rows(h2) == sorted(
        [
            (None, "x", "2024-01-01", "2024-02-01"),
            (None, "y", "2024-02-01", "None"),
            (1, "a", "2024-01-01", "None"),
        ],
        key=repr,
    )


def test_psi_drift_flags_single_cohort_category(spark):
    """A category present in only one cohort is the max-drift signal —
    it must produce a (large) psi row, not be inner-joined away."""
    from jobhouse_spark.operators.drift import psi_drift

    rows = [("old_kind", "base", i % 10) for i in range(100)] + [
        ("old_kind", "cur", i % 10) for i in range(100)
    ] + [("new_kind", "cur", i % 3) for i in range(60)]
    binned = spark.createDataFrame(rows, "event_type string, cohort string, bin int")
    got = {r.event_type: r.psi for r in psi_drift(binned, n_bins=10).collect()}
    assert set(got) == {"old_kind", "new_kind"}
    assert abs(got["old_kind"]) < 0.01  # identical distributions
    assert got["new_kind"] > 0.5, got  # brand-new category: strong drift


def test_incremental_merge_sequence_matches_reference_model(spark, tmp_path):
    """Three sequential batches (overlapping upserts, deletes,
    re-inserts of deleted keys, all-deleted days) against an in-memory
    dict model — the end state after EVERY step must match."""
    root = str(tmp_path / "silver")
    schema = "event_id int, day string, payload string"

    def df(rows):
        return spark.createDataFrame(rows, schema)

    base = [
        (1, "2024-01-01", "a"), (2, "2024-01-01", "b"),
        (3, "2024-01-02", "c"), (4, "2024-01-02", "d"),
        (5, "2024-01-03", "e"),
    ]
    df(base).write.mode("overwrite").partitionBy("day").parquet(root)
    model = {k: (d, p) for k, d, p in base}

    steps = [
        # (upserts, deletes)
        ([(2, "2024-01-01", "B"), (6, "2024-01-04", "f")], [(3, "2024-01-02")]),
        # delete the rest of day 02 (day fully emptied), re-insert key 3
        ([(3, "2024-01-05", "c2")], [(4, "2024-01-02")]),
        # delete wins over same-key upsert; update key 6
        ([(5, "2024-01-03", "E"), (6, "2024-01-04", "F")], [(5, "2024-01-03")]),
    ]
    for ups, dels in steps:
        incremental_merge(spark, root, df(ups), spark.createDataFrame(
            dels, "event_id int, day string"), "event_id", "day")
        del_keys = {k for k, _ in dels}
        for k, d, p in ups:
            if k not in del_keys:
                model[k] = (d, p)
        for k in del_keys:
            model.pop(k, None)
        got = {
            r.event_id: (str(r.day), r.payload)
            for r in spark.read.parquet(root).collect()
        }
        assert got == model, (got, model)


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


def test_scd2_keys_only_dimension(spark):
    """attr_cols == [] is a valid keys-only dimension: matched keys are
    always 'same' (seeded reduce), so only inserts/deletes version."""
    from jobhouse_spark.operators.scd import scd2_apply, scd2_open

    hist = scd2_open(
        spark.createDataFrame([(1,), (2,)], "k int"), "2024-01-01"
    )
    batch = spark.createDataFrame([(2,), (3,)], "k int")
    h2 = scd2_apply(hist, batch, "k", [], "2024-02-01")
    rows = sorted(
        (r.k, str(r.valid_from), str(r.valid_to)) for r in h2.collect()
    )
    assert rows == [
        (1, "2024-01-01", "2024-02-01"),  # absent from batch: closed
        (2, "2024-01-01", "None"),        # matched, keys-only: untouched
        (3, "2024-02-01", "None"),        # new key: opened
    ]


def test_psi_drift_rejects_out_of_contract_bins(spark):
    """An out-of-range (or NULL) bin violates the pre-binned contract;
    it must FAIL the job, not silently deflate PSI by falling off the
    grid left-join."""
    import pytest

    from jobhouse_spark.operators.drift import psi_drift

    rows = [("k", "base", 3), ("k", "cur", 12)]  # 12 >= n_bins
    binned = spark.createDataFrame(rows, "event_type string, cohort string, bin int")
    with pytest.raises(Exception) as ei:
        psi_drift(binned, n_bins=10).collect()
    assert "pre-binned contract" in str(ei.value)
