#!/usr/bin/env python3
"""Per-query Spark/DuckDB ratio report (round-18 verdict Next #7).

Joins a graft.Bench artifact's `quiescent` map with a time_oracle.py
`oracle_times.json` and prints every query whose quiescent Spark time
is more than RATIO x its DuckDB replay AND more than ABS_S seconds
slower — the rule-7 table the round-18 judge computed by hand, now a
standing artifact computed at every round close. INFORMATIONAL: the
gate for regressions is bench_regress.py (round-over-round, same
engine); an engine-vs-engine ratio swings with which heavy chains
both engines replay (BASELINE.md protocol) and must not hard-fail.

Usage: tools/oracle_ratio.py <bench.json> <oracle_times.json>
Exit 0 always (unless inputs are unreadable).
"""
import json
import sys

RATIO = 2.0
ABS_S = 5.0


def main():
    if len(sys.argv) != 3:
        sys.exit("usage: tools/oracle_ratio.py <bench.json> "
                 "<oracle_times.json>")
    bench = json.load(open(sys.argv[1]))
    oracle = json.load(open(sys.argv[2]))
    spark = bench.get("quiescent") or {}
    duck = oracle.get("queries") or {}
    if not spark or not duck:
        sys.exit(f"empty quiescent/queries map in inputs")
    rows = []
    for name in sorted(set(spark) & set(duck)):
        s, d = spark[name], duck[name]
        if s < 0 or d <= 0:
            continue
        if s > d * RATIO and s - d > ABS_S:
            rows.append((name, s, d, s / d))
    print(f"oracle ratio report: {len(set(spark) & set(duck))} paired "
          f"queries, {len(rows)} over {RATIO}x and +{ABS_S}s")
    for name, s, d, r in sorted(rows, key=lambda x: -x[3]):
        print(f"  RATIO  {name}: spark {s:.1f}s vs duckdb {d:.1f}s "
              f"({r:.1f}x)")


if __name__ == "__main__":
    main()
