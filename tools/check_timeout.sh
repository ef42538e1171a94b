#!/usr/bin/env bash
# Per-key oracle compare with a timeout: at volume (sf0.1/sf1) a few
# DuckDB oracles (recursive-CTE clustering, all-pairs masks) are
# infeasible; run each key in its own process with a budget so one
# pathological oracle can't hang the whole volume-correctness pass.
#
#   tools/check_timeout.sh <sfDir> <verifyOutDir> <budget_sec> [key ...]
#
# Keys default to every key in oracle_sql.json. Prints one line per key:
# PASS/FAIL/TIMEOUT, and a summary.
set -u
SF="$1"; OUT="$2"; BUDGET="$3"; shift 3
if [ $# -eq 0 ]; then
  set -- $(python3 -c "import json,sys; print(' '.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")
fi
pass=0; fail=0; tmo=0
for k in "$@"; do
  # capture timeout's exit status BEFORE grep — in a pipeline $? is the
  # tail's (grep's) status, so a 124 timeout would misreport as FAIL
  out=$(timeout "$BUDGET" python3 tools/check.py "$SF" "$OUT" "$k" 2>/dev/null)
  rc=$?
  res=$(printf '%s\n' "$out" | grep -E "^(PASS|FAIL)")
  if [ $rc -eq 124 ]; then echo "TIMEOUT $k"; tmo=$((tmo+1));
  elif echo "$res" | grep -q "^PASS"; then echo "$res"; pass=$((pass+1));
  else echo "${res:-FAIL $k (no output)}"; fail=$((fail+1)); fi
done
echo "SUMMARY pass=$pass fail=$fail timeout=$tmo budget=${BUDGET}s sf=$SF"
# Exit nonzero on FAIL (2) and, unless tolerated, on TIMEOUT (3) — a run
# where every key times out must not read as green to an exit-code gate.
# CHECK_ALLOW_TIMEOUT=1 restores the old behavior for volume passes where
# known-infeasible oracles (recursive-CTE clustering) are expected to
# time out and are verified elsewhere (tools/check.py unionfind mode).
if [ $fail -gt 0 ]; then exit 2; fi
if [ $tmo -gt 0 ] && [ "${CHECK_ALLOW_TIMEOUT:-0}" != "1" ]; then exit 3; fi
exit 0
