#!/usr/bin/env bash
# Pre-snapshot guard: refuse to let a round end on a broken tree.
#
# Round 8 shipped a one-line compile error that zeroed the entire
# scorecard (CORRECTNESS_r08 = {}, BENCH_r08 rc=1) because the snapshot
# was committed without ever invoking the compiler. This 5-second check
# is the insurance: run it before ANY end-of-round / milestone commit.
#
# Usage:  tools/guard.sh            # Test/compile only (~10 s warm)
#         tools/guard.sh --test     # full sbt test as well
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[guard] sbt Test/compile ..."
if ! sbt -batch Test/compile >/tmp/guard_compile.log 2>&1; then
  echo "[guard] FAIL: tree does not compile. Do NOT commit a snapshot." >&2
  tail -30 /tmp/guard_compile.log >&2
  exit 1
fi
echo "[guard] compile OK"

if [[ "${1:-}" == "--test" ]]; then
  echo "[guard] sbt test ..."
  if ! sbt -batch test >/tmp/guard_test.log 2>&1; then
    echo "[guard] FAIL: test suite red." >&2
    grep -E "\*\*\* FAILED|Tests: " /tmp/guard_test.log | tail -20 >&2
    exit 1
  fi
  grep -E "Tests: succeeded" /tmp/guard_test.log | tail -1
  echo "[guard] tests OK"
fi
echo "[guard] PASS — safe to commit"
