#!/usr/bin/env python3
"""Per-query quiescent regression gate between two graft.Bench outputs.

The round-16 lesson: the round-close bench smoke runs at sf0.001, where a
plan-shape landmine can cost 2 s and hide; at sf0.1 the same query read
349 s (x251's un-materialized planted-fixture tree) and would have blown
the driver's 2x wall gate. This comparator makes the committed sf0.1
baseline (BENCH_LOCAL.json) mechanically enforceable: any query whose
QUIESCENT time grew by more than RATIO x AND by more than ABS_S seconds
fails the gate. Also failing (round-16 ADVICE — a crash must not pass a
regression gate): a query recorded as FAILED (-1.0) in the candidate
while the baseline ran it, and a query present in the baseline but
absent from the candidate entirely. New queries (absent from the
baseline) are reported but never fail — they have no baseline to
regress from. A query named in the candidate artifact's `excluded`
list (graft.Bench's deliberate suite retirements, each with a
rationale in Bench.scala) is reported as RETIRED instead of failing
as MISSING — the retirement is self-described by the artifact, so an
accidental drop (query deleted, crash before timing) still fails.

Usage: tools/bench_regress.py <baseline.json> <candidate.json>
Exit 1 on regression/failure/missing query, 0 otherwise.
"""
import json
import os
import sys

RATIO = 3.0
ABS_S = 2.0
USAGE = "usage: tools/bench_regress.py <baseline.json> <candidate.json>"


def load(path):
    d = json.load(open(path))
    q = d.get("quiescent")
    if not q:
        sys.exit(f"{path}: no 'quiescent' map — run Bench without "
                 "SPARK_GRAFT_QUIESCENT=0")
    return q, set(d.get("excluded", []))


def main():
    if len(sys.argv) != 3:
        sys.exit(USAGE)
    for p in sys.argv[1:3]:
        if not os.path.isfile(p):
            sys.exit(f"{p}: no such file\n{USAGE}")
    (base, _), (cand, retired_names) = load(sys.argv[1]), load(sys.argv[2])
    bad, new, failed = [], [], []
    for name, sec in sorted(cand.items()):
        if name not in base:
            new.append((name, sec))
        elif sec < 0 <= base[name]:
            # Bench records a crashed query as -1.0; "sec > base*RATIO"
            # alone would wave it through silently
            failed.append((name, base[name]))
        elif sec > base[name] * RATIO and sec - base[name] > ABS_S:
            bad.append((name, base[name], sec))
    missing = sorted(set(base) - set(cand) - retired_names)
    retired = sorted((set(base) - set(cand)) & retired_names)
    for name, sec in new:
        print(f"NEW  {name}: {sec:.1f}s (no baseline)")
    for name in retired:
        print(f"RETIRED  {name}: in baseline ({base[name]:.1f}s), "
              "deliberately excluded from the candidate suite "
              "(see graft.Bench.benchExcluded)")
    for name, b in failed:
        print(f"FAILED  {name}: baseline {b:.1f}s -> candidate CRASHED "
              "(-1.0; see Bench stderr for the exception)")
    for name in missing:
        print(f"MISSING  {name}: in baseline ({base[name]:.1f}s) but "
              "absent from candidate")
    for name, b, c in bad:
        print(f"REGRESSED  {name}: {b:.1f}s -> {c:.1f}s "
              f"({c / b:.1f}x, +{c - b:.1f}s)")
    total_b = sum(v for v in base.values() if v >= 0)
    total_c = sum(v for v in cand.values() if v >= 0)
    print(f"quiescent_total: baseline {total_b:.1f}s vs candidate "
          f"{total_c:.1f}s ({len(base)} vs {len(cand)} queries)")
    problems = []
    if bad:
        problems.append(f"{len(bad)} per-query regression(s) past "
                        f"{RATIO}x and +{ABS_S}s")
    if failed:
        problems.append(f"{len(failed)} crashed quer(ies)")
    if missing:
        problems.append(f"{len(missing)} missing quer(ies)")
    if problems:
        print("FAIL: " + "; ".join(problems))
        sys.exit(1)
    print("bench regression gate: OK")


if __name__ == "__main__":
    main()
