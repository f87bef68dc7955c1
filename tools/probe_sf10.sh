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
# default = the committed BENCH_sf10.json surface: TPC-H-ish heavy
# aggs/joins, the token-dedup chains, the pipeline chains, and the
# SEMANTIC trio — x251 (dense cell mode), x254 (banded 4x8), x257
# (banded at the sf10 tuning-rule shape 8x16) — so the artifact prices
# the dense chain NEXT TO its bounded replacement (round-16 Next #3)
QUERIES=${2:-q01_pricing_summary,q14_join_nway_revenue,x03_minhash_lsh,x18_ivf_topk,x54_curation_shard_map,x61_corpus_append,x112_curation_transitions,x246_dsir_mixture,x247_model_gated_funnel,x251_semantic_recall_curve,x252_cell_diverse_topk,x254_semantic_lsh_recall,x257_semantic_recall_banded_scale,x258_semantic_recall_auto}
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
    "mode": "solo quiescent (graft.Probe: sequential, cold transient "
            "StageCache per query, shared planted-fixture entries warm, "
            "untimed big-table warmup; since round 19 each query also "
            "runs ONE untimed pass first — fixture construction and "
            "page-cache warmth land outside the timed window, matching "
            "the in-suite quiescent protocol, so pre-r19 rows read "
            "slightly colder than r19+ rows for the same code)",
    "queries": rows,
}
json.dump(out, open('BENCH_sf10.json', 'w'), indent=1)
print("wrote BENCH_sf10.json:", json.dumps(rows))
PY
