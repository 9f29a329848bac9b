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
