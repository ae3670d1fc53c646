#!/usr/bin/env bash
# Round-end gate: the registry-wide sweeps that MUST be green after the
# last operator commit and before the round snapshot. Round 4 shipped its
# final-commit operator with a red empty-input sweep because this was a
# mid-round habit, not a gate — this script makes it one command.
#
# Usage:  bash scripts/round_gate.sh [round_label]
# Writes: docs/ROUND_GATE.md (appends a dated green/red record)
set -uo pipefail
cd "$(dirname "$0")/.."

LABEL="${1:-unlabeled}"
LOG="docs/ROUND_GATE.md"
START=$(date -u +"%Y-%m-%dT%H:%M:%SZ")

run() { # name, cmd...
  local name="$1"; shift
  echo "=== $name: $*"
  if "$@"; then RESULTS+=("- $name: GREEN"); else
    RESULTS+=("- $name: **RED**"); FAILED=1; fi
}

RESULTS=()
FAILED=0
run "scalar-guard lint"    python -m pytest tests/test_scalar_guard_lint.py -q
run "entry contract"       python -m pytest tests/test_entry_contract.py -q
run "empty-input sweep"    python -m pytest tests/test_empty_inputs.py -q
run "oracle parity sweep"  python -m pytest tests/test_oracle_parity.py -q
run "partition sweep (5)"  python scripts/partition_sweep.py 5

{
  echo ""
  echo "## Gate run: ${LABEL} — ${START}"
  echo ""
  printf '%s\n' "${RESULTS[@]}"
  if [ "$FAILED" -eq 0 ]; then echo ""; echo "**GATE GREEN**"; else
    echo ""; echo "**GATE RED — do not snapshot**"; fi
} >> "$LOG"

printf '%s\n' "${RESULTS[@]}"
[ "$FAILED" -eq 0 ] && echo "GATE GREEN" || { echo "GATE RED"; exit 1; }
