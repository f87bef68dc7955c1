#!/usr/bin/env bash
# The pre-snapshot gate as ONE command (round-14 lesson: the mechanical
# specs only protect the round if they are executed AFTER the last query
# lands and BEFORE the snapshot commit). Runs, in order:
#   1. sbt test                 — full ScalaTest suite (conventions, plans,
#                                 cache hygiene, recall gates, goldens)
#   2. graft.Verify @ sf0.01    — every query dumped to parquet
#   3. tools/check.py           — bitwise DuckDB oracle compare
#   4. graft.Bench @ sf0.001    — bench surface smoke (JSON line parses)
# Exits non-zero on the first failure. Usage: tools/round_close.sh
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/4] sbt test =="
sbt -batch test

echo "== [2/4] graft.Verify sf0.01 =="
OUT=$(mktemp -d /tmp/graft_round_close.XXXX)
trap 'rm -rf "$OUT"' EXIT
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"

echo "== [3/4] DuckDB oracle compare =="
# one run, captured: the grep reads the capture (check.py is the gate's
# slowest step — round-15 advice: don't pay it twice / don't re-race it)
CHECK_OUT=$(python3 tools/check.py /root/testdata/sf0.01 "$OUT" || true)
echo "$CHECK_OUT" | tail -3
echo "$CHECK_OUT" | grep -q " 0 failed" || { echo "ORACLE MISMATCH"; exit 1; }

echo "== [4/4] bench smoke sf0.001 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench.json" \
  sbt -batch "runMain graft.Bench" >/dev/null 2>&1
python3 -c "
import json, sys
d = json.load(open('$OUT/bench.json'))
bad = [k for k, v in d['queries'].items() if v < 0]
assert not bad, f'bench failures: {bad}'
print(f'bench ok: {len(d[\"queries\"])} queries, wall {d[\"wall\"]:.1f}s')"

echo "ROUND CLOSE: ALL GREEN"
