#!/usr/bin/env bash
# Tool-enforced 100x scale witness: restricted Verify at an sf10 corpus
# followed by the DuckDB gate replica, failing loudly unless EVERY named
# query PASSes. Usage:
#
#   scripts/sf10_witness.sh <sf10Dir> <outDir> q_name1 q_name2 ...
#
# Generate the corpus once per session with
#   sbt -batch "runMain graft.tools.ScaleData /root/testdata/sf0.1 /tmp/sf10 100"
set -euo pipefail
SF10=$1; OUT=$2; shift 2
QUERIES=("$@")
[ ${#QUERIES[@]} -gt 0 ] || { echo "name at least one query" >&2; exit 2; }
rm -rf "$OUT"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
  sbt -batch "runMain graft.Verify $SF10 $OUT ${QUERIES[*]}" >/dev/null
# check.py exits nonzero because every query NOT in the restricted run
# reports "no spark result written" — the per-query grep below is the gate
RES=$(python3 "$(dirname "$0")/check.py" "$SF10" "$OUT" 2>/dev/null || true)
RC=0
for q in "${QUERIES[@]}"; do
  if echo "$RES" | grep -q "^PASS $q "; then
    echo "WITNESS PASS $q"
  else
    echo "WITNESS FAIL $q:"; echo "$RES" | grep "^FAIL $q" || echo "  (no result row)"
    RC=1
  fi
done
exit $RC
