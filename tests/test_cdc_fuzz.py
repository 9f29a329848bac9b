"""Seeded CDC/SCD2 trajectory fuzzing (tools/cdc_fuzz.py).

The query-grammar fuzzers vary relational QUERIES; this varies the
STATEFUL MERGE input — random per-key presence/value trajectories
applied through scd2_apply batch-by-batch, checked against a DuckDB
window-SQL oracle that reconstructs the whole version history from
the raw event log (an independent, retrospective algorithm), plus
idempotency and interval-structure invariants. The seed block here is
the fixed regression net; tools/cdc_fuzz.py runs the wide campaigns
(results in COVERAGE.md / SCALE.md).
"""

from __future__ import annotations

import pytest

from tools.cdc_fuzz import gen_log, run_block

# (seed, mode) — one always-on block per mode; the second pair is
# campaign-gated (round-15 verdict task 1 — driver verify-window)
CASES = [
    (95001, "snapshot"),
    (95002, "incremental"),
    pytest.param(95003, "snapshot", marks=pytest.mark.campaign),
    pytest.param(95004, "incremental", marks=pytest.mark.campaign),
]


@pytest.mark.parametrize(("seed", "mode"), CASES)
def test_cdc_trajectories_agree(spark, duck, seed, mode):
    r = run_block(spark, duck, seed, n_keys=25, n_batches=5, mode=mode)
    assert r["versions"] > 0


def test_log_generator_is_deterministic():
    assert gen_log(7, 10, 3) == gen_log(7, 10, 3)


def test_harness_detects_divergence(spark, duck, monkeypatch):
    """Negative control: a 0-mismatch campaign is only evidence if the
    harness CAN fail. Corrupt the operator semantics (ignore the
    delete-on-absence contract in snapshot mode — schema-preserving)
    and assert the differential check trips."""
    import jobhouse_spark.operators.scd as scd_mod
    from tools import cdc_fuzz

    real = scd_mod.scd2_apply

    def broken(history, batch, key, attr_cols, as_of, **kw):
        kw["treat_missing_as_delete"] = False
        return real(history, batch, key, attr_cols, as_of, **kw)

    monkeypatch.setattr(
        "jobhouse_spark.operators.scd.scd2_apply", broken
    )
    with pytest.raises(AssertionError):
        cdc_fuzz.run_block(spark, duck, 95001, 25, 5, "snapshot")


def test_merge_trajectories_match_model(spark, tmp_path):
    from tools.cdc_fuzz import run_merge_block

    r = run_merge_block(
        spark, seed=95100, n_keys=30, n_days=4, n_batches=4,
        root=str(tmp_path / "silver"),
    )
    assert r["batches_checked"] >= 3
