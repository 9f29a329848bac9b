"""CI pin of the streaming-fuzz fixed seed block (round-14 verdict
task 2): seeds 0-2 of tools/streaming_fuzz.py run on every pytest, so
the boundary semantics the campaign established can never silently
regress — in particular the boundary-INCLUSIVE session merge (an event
at exactly prev+gap extends the session; the t4/_T13 oracles' original
`>=` was an exact-boundary bug found by seed 0) and the two-watermark
late-drop recurrence (filter uses the PREVIOUS batch's watermark,
eviction the current one, both inclusive).

The full campaign ledger lives in STREAMFUZZ.json (220+ seeds x 6
checks); this test is the always-on subset.
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "streaming_fuzz", "/root/repo/tools/streaming_fuzz.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_streaming_fuzz_pinned_seeds(spark, seed):
    tool = _load_tool()
    duck = duckdb.connect()
    duck.execute("SET TimeZone='UTC'")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        results = tool.run_seed(spark, duck, seed)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    bad = {name: problems for name, problems in results if problems}
    assert not bad, f"seed {seed} diverged: {bad}"
    # every check actually ran
    assert {name for name, _ in results} == set(tool.CHECKS)


def test_session_merge_is_boundary_inclusive(spark):
    """The distilled regression from the fuzz find: two events exactly
    gap apart form ONE session (Spark merges touching session ranges);
    1 us past the boundary forms TWO. Pinned directly against
    session_window so the semantic fact survives even if the fuzz
    harness changes."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2026, 3, 1, 0, 0, 0)

    def n_sessions(offset_us: int) -> int:
        df = spark.createDataFrame(
            [(1, t0), (2, t0 + dt.timedelta(microseconds=offset_us))],
            "event_id long, ts timestamp",
        )
        return df.groupBy(F.session_window("ts", "30 minutes")).count().count()

    gap_us = 30 * 60 * 1_000_000
    assert n_sessions(gap_us) == 1  # exactly at the boundary: merged
    assert n_sessions(gap_us + 1) == 2  # 1 us past: split
