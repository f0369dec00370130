#!/usr/bin/env bash
# Strict definition-of-done sweep: the full ScalaTest suite plus the
# DuckDB oracle cross-check at BOTH sf0.01 (the driver's gate) and sf0.1
# (10x, catches scale-dependent plan/precision drift). check.py is
# dtype-class-strict — int-vs-float and object-vs-float mismatches FAIL
# (the r4 lesson: a coercing comparator let two driver reds pass green
# locally). Exits nonzero on the first failing stage.
#
# Usage: tools/sweep.sh [--skip-sf01]
#   --skip-sf01   skip the sf0.1 sweep (it re-runs the quadratic
#                 ground-truth oracles; ~20+ min)
set -euo pipefail
cd "$(dirname "$0")/.."

SKIP_SF01=0
[[ "${1:-}" == "--skip-sf01" ]] && SKIP_SF01=1

echo "== sbt test =="
sbt -batch test

echo "== verify + oracle check @ sf0.01 =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/sweep_sf001"
python3 tools/check.py /root/testdata/sf0.01 /tmp/sweep_sf001

if [[ "$SKIP_SF01" == "0" ]]; then
  echo "== verify + oracle check @ sf0.1 =="
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/sweep_sf01"
  python3 tools/check.py /root/testdata/sf0.1 /tmp/sweep_sf01
fi

echo "SWEEP OK"
