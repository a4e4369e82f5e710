#!/bin/bash
# Standing round-close verification ritual (run from /root/repo).
#
# Catches scale walls the round they are introduced (the r13 q128 class)
# instead of the round after. Produces the numbers for the per-round
# BENCH_NOTES rows: dual-SF registry green, restatement equivalence,
# x8 + x64 stress-scale sweeps.
#
# Usage: tools/round_gate.sh [skip-dumps]
#   skip-dumps — reuse existing /tmp/verify_* dumps (after an
#   oracle-only change; any engine change needs fresh dumps).
#
# Wall-clock guide (32 cores): dumps ~2/10/60 min for sf0.001/sf0.01/
# x64; sweeps are minutes once the content-addressed builds are cached
# (first x64 build of the round is ~1 h, dominated by the 3 scored-
# pairs prefixes over the 247M-pair superset).
set -euo pipefail
cd "$(dirname "$0")/.."

if [ "${1:-}" != "skip-dumps" ]; then
  sbt -batch compile
  python3 tools/make_stress.py /root/testdata/sf0.1 /tmp/stress_x8 8
  python3 tools/make_stress.py /root/testdata/sf0.1 /tmp/stress_x64 64
  SPARK_DRIVER_MEM=8g  SPARK_GRAFT_CPUS=8  ./run-class.sh graft.Verify /root/testdata/sf0.001 /tmp/verify_001
  SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=16 ./run-class.sh graft.Verify /root/testdata/sf0.01  /tmp/verify_01
  SPARK_DRIVER_MEM=80g SPARK_GRAFT_CPUS=28 ./run-class.sh graft.Verify /tmp/stress_x8         /tmp/verify_x8
  SPARK_DRIVER_MEM=80g SPARK_GRAFT_CPUS=28 ./run-class.sh graft.Verify /tmp/stress_x64        /tmp/verify_x64
fi

echo "=== gate 0: comparator unit tests ==="
python3 tools/test_oracle_tools.py

echo "=== gate 1: full-registry oracle compare, sf0.001 + sf0.01 ==="
python3 tools/oracle_check_scaled.py /tmp/verify_001 /root/testdata/sf0.001 90 --jobs=8
python3 tools/oracle_check_scaled.py /tmp/verify_01  /root/testdata/sf0.01 300 --jobs=8

echo "=== gate 2: stated-vs-restated equivalence (sweep tooling) ==="
python3 tools/restatement_check.py /tmp/verify_001 /root/testdata/sf0.001

# The stress-sweep tails re-run TIME *and* BAD/DIED: since the DIED
# keywords were narrowed (r15), contention-induced DuckDB-internal
# errors under the per-check memory/thread caps surface as BAD in the
# wide pass — the long-leash memoized re-run (full memory, serialized
# builds) is the triage the advisory asked for. A GENUINE mismatch
# stays BAD in the tail too and fails the gate there (no exit-masking
# on the tail lines).
#
# The wide pass may exit nonzero on BADs (the tail re-runs them) but
# it must have COMPLETED: the final JSON summary line proves full
# coverage. 'Exited without a summary' — a Python crash, a missing
# dump — fails the gate instead of silently passing with partial or
# zero TIME/BAD/DIED lines (r15 advisory; the earlier bare `|| true`
# swallowed exactly that).
wide_sweep() {
  local log=$1; shift
  local rc=0
  python3 tools/oracle_check_scaled.py "$@" | tee "$log" || rc=$?
  if ! tail -n 1 "$log" | grep -q '^{"ok":'; then
    echo "GATE FAIL: wide sweep crashed without a summary (rc=$rc)"
    exit 1
  fi
}

echo "=== gate 3: x8 stress sweep (300 s leash, then long-leash tail) ==="
wide_sweep /tmp/x8_sweep.log /tmp/verify_x8 /tmp/stress_x8 300 --jobs=8
# `|| true` INSIDE the substitution: on a fully-clean sweep grep exits
# 1, which under `set -euo pipefail` would abort the whole ritual on
# the success path (r15 advisory)
TAIL8=$(grep -E "^(TIME|BAD|DIED)" /tmp/x8_sweep.log | awk '{print $2}' | paste -sd, - || true)
if [ -n "$TAIL8" ]; then
  echo "--- x8 tail re-run (1200 s leash, whole-oracle memoization): $TAIL8"
  python3 tools/oracle_check_scaled.py /tmp/verify_x8 /tmp/stress_x8 1200 \
    --jobs=2 --memo-tail "--only=$TAIL8"
fi

echo "=== gate 4: x64 stress sweep (90 s leash, then long-leash tail) ==="
wide_sweep /tmp/x64_sweep.log /tmp/verify_x64 /tmp/stress_x64 90 --jobs=8
TAIL=$(grep -E "^(TIME|BAD|DIED)" /tmp/x64_sweep.log | awk '{print $2}' | paste -sd, - || true)
if [ -n "$TAIL" ]; then
  echo "--- tail re-run (2400 s leash, whole-oracle memoization): $TAIL"
  python3 tools/oracle_check_scaled.py /tmp/verify_x64 /tmp/stress_x64 2400 \
    --jobs=4 --memo-tail "--only=$TAIL"
fi
