#!/usr/bin/env python3
"""Per-query quiescent regression gate between two graft.Bench outputs.

The round-16 lesson: the round-close bench smoke runs at sf0.001, where a
plan-shape landmine can cost 2 s and hide; at sf0.1 the same query read
349 s (x251's un-materialized planted-fixture tree) and would have blown
the driver's 2x wall gate. This comparator makes the committed sf0.1
baseline (BENCH_LOCAL.json) mechanically enforceable: any query whose
QUIESCENT time grew by more than RATIO x AND by more than ABS_S seconds
fails the gate. New queries (absent from the baseline) are reported but
never fail — they have no baseline to regress from.

Usage: tools/bench_regress.py <baseline.json> <candidate.json>
Exit 1 on regression, 0 otherwise.
"""
import json
import sys

RATIO = 3.0
ABS_S = 2.0


def quiescent(path):
    d = json.load(open(path))
    q = d.get("quiescent")
    if not q:
        sys.exit(f"{path}: no 'quiescent' map — run Bench without "
                 "SPARK_GRAFT_QUIESCENT=0")
    return q


def main():
    base, cand = quiescent(sys.argv[1]), quiescent(sys.argv[2])
    bad, new = [], []
    for name, sec in sorted(cand.items()):
        if name not in base:
            new.append((name, sec))
        elif sec > base[name] * RATIO and sec - base[name] > ABS_S:
            bad.append((name, base[name], sec))
    for name, sec in new:
        print(f"NEW  {name}: {sec:.1f}s (no baseline)")
    for name, b, c in bad:
        print(f"REGRESSED  {name}: {b:.1f}s -> {c:.1f}s "
              f"({c / b:.1f}x, +{c - b:.1f}s)")
    total_b = sum(base.values())
    total_c = sum(cand.values())
    print(f"quiescent_total: baseline {total_b:.1f}s vs candidate "
          f"{total_c:.1f}s ({len(base)} vs {len(cand)} queries)")
    if bad:
        print(f"FAIL: {len(bad)} per-query regression(s) past "
              f"{RATIO}x and +{ABS_S}s")
        sys.exit(1)
    print("bench regression gate: OK")


if __name__ == "__main__":
    main()
