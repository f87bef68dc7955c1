#!/usr/bin/env python3
"""Second-run confirmation for bench_regress failures (BASELINE.md rules
3/4, mechanized): a per-query regression on this host is only REAL if it
reproduces on a solo re-run. Reads the baseline bench JSON and a
graft.Probe output ([probe] <name> <sec> s lines) for the flagged
queries, applies the SAME thresholds as bench_regress (>RATIOx AND
>ABS_S s), and exits 1 only if a flagged query is still over them.

Confirmed-noise queries have their quiescent entries in the candidate
bench JSON overwritten with the re-probed (quiet) numbers, so a host
spike never pollutes the committed baseline the NEXT round gates
against.

Usage: tools/reprobe_check.py <baseline.json> <candidate.json> <probe.out>
"""
import json
import re
import sys

RATIO = 3.0
ABS_S = 2.0


def main():
    if len(sys.argv) != 4:
        sys.exit("usage: tools/reprobe_check.py <baseline.json> "
                 "<candidate.json> <probe.out>")
    base = json.load(open(sys.argv[1]))["quiescent"]
    cand_path = sys.argv[2]
    cand = json.load(open(cand_path))
    probed = {}
    for ln in open(sys.argv[3]):
        m = re.match(r".*\[probe\] (\S+)\s+([0-9.]+) s", ln.strip())
        if m:
            probed[m.group(1)] = float(m.group(2))
    if not probed:
        sys.exit("no [probe] lines parsed — did graft.Probe run?")
    still_bad = []
    for name, sec in sorted(probed.items()):
        b = base.get(name)
        if b is None:
            continue
        if sec > b * RATIO and sec - b > ABS_S:
            still_bad.append((name, b, sec))
        else:
            print(f"NOISE-CONFIRMED  {name}: bench spike not reproduced "
                  f"solo ({b:.1f}s baseline, {sec:.1f}s re-probe) — "
                  "overwriting the candidate entry with the quiet number")
            cand["quiescent"][name] = sec
    json.dump(cand, open(cand_path, "w"))
    if still_bad:
        for name, b, sec in still_bad:
            print(f"CONFIRMED-REGRESSION  {name}: {b:.1f}s -> {sec:.1f}s "
                  "on a solo re-run")
        sys.exit(1)
    print("re-probe: all flagged queries were host noise; gate OK")


if __name__ == "__main__":
    main()
