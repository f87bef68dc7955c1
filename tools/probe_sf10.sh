#!/usr/bin/env bash
# Committed sf10 heavy-chain probe (round-15 verdict Next #4): the 100x
# scale evidence as a MECHANICALLY regression-comparable artifact, not a
# PLANS.md prose note. Runs graft.Probe (solo quiescent, cold StageCache
# per query) against a GenScale'd sf10 dir and writes BENCH_sf10.json
# with per-query seconds + row counts and the exact generation recipe.
#
# Usage: tools/probe_sf10.sh [sf10Dir] [comma-separated query list]
set -euo pipefail
cd "$(dirname "$0")/.."
SF10=${1:-tmp/sf10}
QUERIES=${2:-q01_pricing_summary,q14_join_nway_revenue,x03_minhash_lsh,x54_curation_shard_map,x61_corpus_append}
if [ ! -d "$SF10" ]; then
  echo "== generating $SF10 (GenScale sf0.1 x100) =="
  sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 $SF10 100"
fi
sbt -batch "runMain graft.Probe $SF10 $QUERIES" | tee /tmp/probe_sf10.out
SF10="$SF10" python3 - <<'PY'
import json, os, re
rows = {}
for ln in open('/tmp/probe_sf10.out'):
    m = re.match(r'.*\[probe\] (\S+)\s+([0-9.]+) s\s+\((\d+) rows\)', ln.strip())
    if m:
        rows[m.group(1)] = {"sec": float(m.group(2)), "rows": int(m.group(3))}
assert rows, "no [probe] lines parsed - did graft.Probe run?"
out = {
    "sf_dir": os.environ["SF10"],
    "recipe": "runMain graft.GenScale /root/testdata/sf0.1 <dir> 100",
    "mode": "solo quiescent (graft.Probe: sequential, cold StageCache, "
            "untimed big-table warmup)",
    "queries": rows,
}
json.dump(out, open('BENCH_sf10.json', 'w'), indent=1)
print("wrote BENCH_sf10.json:", json.dumps(rows))
PY
