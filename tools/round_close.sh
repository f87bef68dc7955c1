#!/usr/bin/env bash
# The pre-snapshot gate as ONE command (round-14 lesson: the mechanical
# specs only protect the round if they are executed AFTER the last query
# lands and BEFORE the snapshot commit). Runs, in order:
#   1. sbt test                 — full ScalaTest suite (conventions, plans,
#                                 cache hygiene, recall gates, goldens)
#   2. graft.Verify @ sf0.01    — every query dumped to parquet
#   3. tools/check.py           — bitwise DuckDB oracle compare
#   4. graft.Bench @ sf0.001    — bench surface smoke (JSON line parses)
#   5. graft.Bench @ sf0.1      — per-query quiescent regression gate vs
#                                 the committed BENCH_LOCAL.json
#                                 (DEFAULT-ON; GRAFT_SKIP_SF01=1 skips —
#                                 dev loops only, never the pre-snapshot run)
# Exits non-zero on the first failure. Usage: tools/round_close.sh
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [0/5] bench-gate tools self-test =="
python3 tools/test_tools.py

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

# sf0.1 per-query regression gate — DEFAULT-ON (round-16 verdict Next
# #5: the x251 landmine passed two round-closes because this was
# opt-in). Runs the full gated-SF bench (concurrent wall + quiescent
# per-query), writes BENCH_LOCAL.json, and compares each query's
# QUIESCENT time against the last committed BENCH_LOCAL.json (>3x and
# >2s fails; a crashed or missing query also fails). The sf0.001 smoke
# above cannot see a plan-shape landmine that costs 349 s at sf0.1
# (x251's un-materialized planted-fixture tree) — only a per-query diff
# at the gated SF can. Escape hatch (quick dev loops ONLY, never the
# pre-snapshot run): GRAFT_SKIP_SF01=1.
if [ "${GRAFT_SKIP_SF01:-0}" != "1" ]; then
  echo "== [5/5] sf0.1 per-query regression gate =="
  if git cat-file -e HEAD:BENCH_LOCAL.json 2>/dev/null; then
    git show HEAD:BENCH_LOCAL.json > /tmp/bench_local_baseline.json
  else
    rm -f /tmp/bench_local_baseline.json
  fi
  # keep Bench stderr: the 'quiescent FAILED' lines are the only place
  # the exception text lands (round-16 ADVICE — don't discard them)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL.json \
    sbt -batch "runMain graft.Bench" >/dev/null 2>/tmp/bench_sf01_err.log \
    || { echo "sf0.1 bench run itself failed:"; tail -20 /tmp/bench_sf01_err.log; exit 1; }
  grep "FAILED" /tmp/bench_sf01_err.log || true
  if [ -f /tmp/bench_local_baseline.json ]; then
    # first pass; on failure, CONFIRM each flagged query with a solo
    # re-probe before failing the gate (BASELINE.md rules 3/4: this
    # host swings 3x on 1-2 s queries run-to-run — x83/x84/x87/x105/
    # x120 have all tripped and recovered with ZERO code change; a
    # regression is only real if it reproduces quiet). Confirmed-noise
    # entries are overwritten with the re-probed numbers so the spike
    # never becomes the next round's baseline.
    if ! python3 tools/bench_regress.py /tmp/bench_local_baseline.json \
        BENCH_LOCAL.json | tee /tmp/bench_regress.out; then
      # a crash or a silently-dropped query is NOT re-probeable noise —
      # hard-fail BEFORE the re-probe, otherwise noise-confirmed
      # REGRESSED entries would let reprobe_check exit 0 and wave the
      # FAILED/MISSING ones through (round-17 ADVICE)
      if grep -qE '^(FAILED|MISSING)' /tmp/bench_regress.out; then
        echo "bench gate: FAILED/MISSING queries cannot be host noise — failing"
        exit 1
      fi
      FLAGGED=$(grep '^REGRESSED' /tmp/bench_regress.out \
        | awk '{print $2}' | sed 's/:$//' | paste -sd,)
      if [ -z "$FLAGGED" ]; then
        echo "bench gate failed with no REGRESSED/FAILED/MISSING lines — failing"
        exit 1
      fi
      echo "== re-probing flagged queries solo: $FLAGGED =="
      SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
        sbt -batch "runMain graft.Probe /root/testdata/sf0.1 $FLAGGED" \
        2>/dev/null | tee /tmp/bench_reprobe.out
      python3 tools/reprobe_check.py /tmp/bench_local_baseline.json \
        BENCH_LOCAL.json /tmp/bench_reprobe.out
    fi
  else
    echo "no committed BENCH_LOCAL.json baseline yet — recording one"
  fi
  # rule 7 follow-through (round-18 verdict Next #7): replay the oracle
  # SQLs at the GATED SF and commit the per-query DuckDB map next to
  # BENCH_LOCAL.json, so the Spark/DuckDB per-query ratio table the
  # judge computed by hand is a standing, diffable artifact
  echo "== [6/6] sf0.1 per-query oracle pair (ORACLE_TIMES.json) =="
  python3 tools/time_oracle.py /root/testdata/sf0.1 "$OUT" 5
  cp "$OUT/oracle_times.json" ORACLE_TIMES.json
  python3 tools/oracle_ratio.py BENCH_LOCAL.json ORACLE_TIMES.json
else
  echo "== [5/5] sf0.1 regression gate SKIPPED (GRAFT_SKIP_SF01=1) =="
fi

# optional sf1 pair (GRAFT_SF1=1): refresh BENCH_sf1.json on the CURRENT
# query surface + a same-session DuckDB number, so the committed scale
# artifact can't go stale when queries land after the round's sf1 run
# (round-15 verdict Next #3). Generates tmp/sf1 on first use.
if [ "${GRAFT_SF1:-0}" = "1" ]; then
  echo "== [opt] sf1 pair =="
  [ -d tmp/sf1 ] || sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 tmp/sf1 10"
  SPARK_GRAFT_SF_DIR=tmp/sf1 SPARK_GRAFT_QUIESCENT=0 \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
    sbt -batch "runMain graft.Bench" >/dev/null 2>&1
  python3 tools/time_oracle.py tmp/sf1 "$OUT" 10 | tee /tmp/sf1_oracle.out
  python3 - <<'PY'
import json
d = json.load(open('BENCH_sf1.json'))
bad = [k for k, v in d['queries'].items() if v < 0]
assert not bad, f'sf1 bench failures: {bad}'
first = next(l for l in open('/tmp/sf1_oracle.out') if l.startswith('total'))
duck = float(first.split()[1])
d['duckdb_total_sec'] = duck
d['ratio_wall_vs_duckdb'] = round(d['wall'] / duck, 3)
json.dump(d, open('BENCH_sf1.json', 'w'))
print(f"sf1 pair: spark wall {d['wall']:.1f}s vs duckdb {duck:.1f}s "
      f"= {d['ratio_wall_vs_duckdb']}x ({len(d['queries'])} queries)")
PY
fi

echo "ROUND CLOSE: ALL GREEN"
