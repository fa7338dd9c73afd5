#!/usr/bin/env bash
# Full repo gate: lint + fast suite + slow suite, with a committed run record.
#
# The reference ships CI that lints every push (.github/workflows/lint.yml);
# this repo's equivalent runs the whole test pyramid as well and writes
# GATE.md at the repo root so every round carries evidence that the slow
# suite (e2e goldens, hermetic quality miniature) actually ran.
#
# Usage: scripts/gate.sh [--fast-only]
set -u
cd "$(dirname "$0")/.."

FAST_ONLY="${1:-}"
REV=$(git rev-parse --short HEAD)
START=$(date -u +"%Y-%m-%dT%H:%M:%SZ")

run() { # name, cmd...
  local name=$1; shift
  local t0=$SECONDS
  "$@" > "/tmp/gate_${name}.log" 2>&1
  local rc=$?
  local dt=$((SECONDS - t0))
  local tail_line
  tail_line=$(grep -E "passed|failed|error|LINT" "/tmp/gate_${name}.log" | tail -1)
  RESULTS+=("| ${name} | $([ $rc -eq 0 ] && echo PASS || echo "FAIL(rc=$rc)") | ${dt}s | ${tail_line} |")
  [ $rc -ne 0 ] && OVERALL=1
  return 0
}

OVERALL=0
RESULTS=()

run lint python scripts/lint.py
run fast python -m pytest tests/ -m "not slow" -q
if [ "$FAST_ONLY" != "--fast-only" ]; then
  run slow python -m pytest tests/ -m "slow" -q
fi

{
  echo "# GATE — full-suite run record"
  echo
  echo "- rev: ${REV}"
  echo "- started: ${START}  finished: $(date -u +"%Y-%m-%dT%H:%M:%SZ")"
  echo "- host: $(nproc) cpu(s), $(python -c 'import platform; print(platform.platform())')"
  echo "- overall: $([ $OVERALL -eq 0 ] && echo GREEN || echo RED)"
  echo
  echo "| step | status | wall | summary |"
  echo "|---|---|---|---|"
  for r in "${RESULTS[@]}"; do echo "$r"; done
} > GATE.md

cat GATE.md
exit $OVERALL
