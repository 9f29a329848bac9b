#!/usr/bin/env bash
# Pre-snapshot verification gate: run EVERY check the driver/judge runs,
# fail fast, honor exit codes. Run this before any end-of-round snapshot
# (and after any change to data contracts or query registrations) —
# round 3 lost a green board to a testdata contract change that a single
# run of this script would have caught.
#
#   ./tools/gate.sh            # full gate (~5-8 min)
#   ./tools/gate.sh --fast     # pytest + sf0.001 driver sim (~2 min)
set -euo pipefail
cd "$(dirname "$0")/.."

FAST=${1:-}

echo "=== gate 1/3: pytest ==="
python -m pytest tests/ -x -q

echo "=== gate 2/3: driver simulation (entry + full registry vs DuckDB oracles) ==="
if [[ "$FAST" == "--fast" ]]; then
  python tools/driver_sim.py /root/testdata/sf0.001
else
  python tools/driver_sim.py
fi

echo "=== gate 3/3: plan-shape audit (pushdown/broadcast/codegen assertions) ==="
python tools/explain_audit.py

echo "GATE PASSED"
