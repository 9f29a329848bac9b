"""Contention auto-retry in bench.py (round-12 verdict task 4).

Three of five driver benches (r08-r12) moved the headline +-15% on
machine load alone; bench.py now retries once after the load decays.
These tests drive main() with _measure/_wait_for_idle monkeypatched so
no Spark work runs — they pin the selection logic (which attempt
becomes the headline JSON) and the single-line output contract.
"""

from __future__ import annotations

import importlib.util
import json
import sys

import pytest


@pytest.fixture(autouse=True)
def _side_file_in_tmp(monkeypatch, tmp_path):
    """Both output paths write the full record to a side file now;
    keep every test's side write out of the repo's real
    BENCH_local.json."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SIDE",
                       str(tmp_path / "BENCH_local.json"))


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(monkeypatch, capsys, attempts, argv_extra=()):
    bench = _load_bench()
    it = iter(attempts)
    monkeypatch.setattr(bench, "_measure", lambda args: dict(next(it)))
    monkeypatch.setattr(bench, "_wait_for_idle", lambda max_wait: 42.0)
    monkeypatch.setattr(sys, "argv", ["bench.py", *argv_extra])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, "bench must print exactly ONE JSON line"
    return json.loads(out[0])


CONTENDED = {"metric": "headline_query_wall_clock_total", "value": 19.0,
             "queries": {"q1": 19.0}, "contended": True,
             "load_avg_before": 8.0, "load_avg_15m": 7.0,
             "wall_spread_median": 1.9}
IDLE = {"metric": "headline_query_wall_clock_total", "value": 15.0,
        "queries": {"q1": 15.0}, "contended": False,
        "load_avg_before": 0.2, "load_avg_15m": 1.0,
        "wall_spread_median": 1.05}


def test_uncontended_first_attempt_is_final(monkeypatch, capsys):
    res = _run(monkeypatch, capsys, [IDLE])
    assert res["value"] == 15.0
    assert "other_attempt" not in res and "retry_waited_sec" not in res


def test_contended_then_idle_retry_wins(monkeypatch, capsys):
    res = _run(monkeypatch, capsys, [CONTENDED, IDLE])
    assert res["value"] == 15.0 and res["contended"] is False
    assert res["retry_waited_sec"] == 42.0
    # the losing attempt is preserved, with its flag, for the record
    assert res["other_attempt"]["value"] == 19.0
    assert res["other_attempt"]["contended"] is True


def test_both_contended_lower_total_wins(monkeypatch, capsys):
    slower = dict(CONTENDED, value=21.0)
    res = _run(monkeypatch, capsys, [CONTENDED, slower])
    assert res["value"] == 19.0  # load only inflates walls -> min is best
    assert res["other_attempt"]["value"] == 21.0


def test_no_contention_retry_flag(monkeypatch, capsys):
    res = _run(monkeypatch, capsys, [CONTENDED],
               argv_extra=["--no-contention-retry"])
    assert res["value"] == 19.0 and "other_attempt" not in res


def test_both_contended_marker(monkeypatch, capsys):
    res = _run(monkeypatch, capsys, [CONTENDED, dict(CONTENDED, value=21.0)])
    assert res.get("both_contended") is True
    res2 = _run(monkeypatch, capsys, [CONTENDED, IDLE])
    assert "both_contended" not in res2


def _realistic(value, contended):
    """A full-sized attempt payload — 19 headline queries + the 5-key
    ops section, shaped like a real _measure() result — so the line-
    budget test exercises the same serialized volume that overflowed
    the driver's tail capture in round 13."""
    qnames = ["g1_groupby_agg", "j1_inner_equi", "j3_broadcast_dim",
              "l14_stopword_ratio", "l15_langid_ngram", "l2_minhash_neardup",
              "l6_quality_filters", "o1_global_sort", "p2_filter_pushdown",
              "q18_large_orders", "q3_shipping_priority", "q5_local_supplier",
              "q6_forecast_revenue", "s1_parquet_scan", "t2_tumbling_window",
              "u1_union_dedup", "w4_topk_per_group", "x2_pandas_udf",
              "sq1_scalar_subquery"]
    ops = ["jh8_employer_resolution", "s17_compaction_invariance",
           "s19_manifest_pruned_scan", "jh11_day0_resolve",
           "jh11_batch_apply", "jh12_bootstrap", "jh12_apply"]
    return {
        "metric": "headline_query_wall_clock_total", "value": value,
        "unit": "sec", "queries": {n: 1.2345 for n in qnames},
        "cpu_sec": {n: 0.0456 for n in qnames}, "repeat": 3, "sf": 0.1,
        "load_avg_before": 6.73, "load_avg_5m": 5.1, "load_avg_15m": 6.73,
        "wall_spread_median": 1.081, "contended": contended,
        "ops_queries": {n: 4.5678 for n in ops},
        "ops_cpu_sec": {n: 0.1234 for n in ops},
        "ops_total": 22.839,
    }


def test_retry_line_fits_driver_tail_capture(monkeypatch, capsys, tmp_path):
    """Round-13 regression: other_attempt embedded the losing attempt's
    full per-query dicts, pushing the final stdout line past the
    driver's 2,000-byte tail capture (BENCH_r13 recorded parsed:null).
    The summary must keep SCALARS ONLY and the printed line must stay
    inside the capture window with headroom, even with full-sized
    attempt payloads on the retry path."""
    side = tmp_path / "BENCH_local.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SIDE", str(side))
    for attempts in ([_realistic(16.10, True), _realistic(14.38, False)],
                     [_realistic(16.10, True), _realistic(17.0, True)]):
        res = _run(monkeypatch, capsys, [dict(a) for a in attempts])
        line = json.dumps(res)
        assert len(line) < 1800, f"printed line {len(line)}B >= 1800B budget"
        # winner's walls stay on stdout (baseline comparison); its CPU
        # dicts move to the side file; loser summarized to scalars
        assert "queries" in res and "ops_queries" in res
        assert "cpu_sec" not in res and "ops_cpu_sec" not in res
        assert res["cpu_in_side_file"] is True
        other = res["other_attempt"]
        assert "queries" not in other and "ops_total" not in other
        assert set(other) <= {"value", "contended", "load_avg_before",
                              "load_avg_15m", "wall_spread_median",
                              "retry_waited_sec"}
    # the full dual-attempt record is preserved in the side file
    rec = json.loads(side.read_text())
    assert "queries" in rec["loser_full"] and "cpu_sec" in rec["loser_full"]
    assert "cpu_sec" in rec["winner"] and "other_attempt" not in rec["winner"]


def test_single_attempt_line_fits_budget_with_jh12_keys(
    monkeypatch, capsys, tmp_path
):
    """Round 14: the jh12 ops keys pushed the real single-attempt line
    to 1,794 B — 6 B under budget — so the ops CPU dict (diagnostics)
    moved to the side file on the single-attempt path too. The printed
    line must stay under budget with full-sized payloads, keep the
    ops WALLS (trend line), and mark where the CPU detail went."""
    side = tmp_path / "BENCH_local.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SIDE", str(side))
    res = _run(monkeypatch, capsys, [_realistic(14.38, False)])
    line = json.dumps(res)
    assert len(line) < 1800, f"printed line {len(line)}B >= 1800B budget"
    assert "queries" in res and "cpu_sec" in res  # r12-comparable core
    assert "ops_queries" in res and "ops_total" in res
    assert "ops_cpu_sec" not in res
    assert res["ops_cpu_in_side_file"] is True
    rec = json.loads(side.read_text())
    assert "ops_cpu_sec" in rec["winner"]
