"""Maintenance-lifecycle fuzz regression net (tools/maintenance_fuzz.py;
the 200-trajectory campaign + lessons live in COVERAGE.md/MAINTFUZZ.json).

Two fixed seeds from the green campaign run as CI anchors, plus a
negative control proving the harness CAN fail (a 0-divergence campaign
is only evidence if a divergence would trip it — the cdc_fuzz rule)."""

from __future__ import annotations

import collections

import pytest

from tools import maintenance_fuzz as mf


def _stats():
    return {"ops": collections.Counter(), "checks": 0,
            "rebuild_checks": 0, "skipped_steps": 0}


# one trajectory always-on, the second campaign-gated (round-15
# verdict task 1 — driver verify-window)
@pytest.mark.parametrize(
    "seed",
    [pytest.param(120000, marks=pytest.mark.campaign), 120007],
)
def test_lifecycle_trajectory_green(spark, seed):
    stats = _stats()
    mf.run_trajectory(spark, seed, 6, stats)
    # guard against a vacuous pass: steps actually ran and checked
    assert stats["checks"] >= 5 and stats["rebuild_checks"] >= 1
    assert sum(stats["ops"].values()) >= 5


def test_harness_detects_divergence(spark, monkeypatch):
    """Negative control: stub the DuckDB second derivation to return
    nothing — the foreign-reader agreement check must raise."""
    class _EmptyResult:
        def fetchall(self):
            return []

    class _StubCon:
        def sql(self, _q):
            return _EmptyResult()

    monkeypatch.setattr(mf.duckdb, "connect", lambda: _StubCon())
    stats = _stats()
    with pytest.raises(AssertionError, match="DuckDB content diverged"):
        mf.run_trajectory(spark, 120003, 4, stats)
