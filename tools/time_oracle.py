#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the bench comparator.

Runs every SQL in <verifyOutDir>/oracle_sql.json sequentially against
the <sfDir> parquet tables (32 threads, like the driver host) and
prints total + slowest-N wall seconds. This is the apples-to-apples
comparator for BENCH_OUT.json's `wall` (Spark runs the same logical
queries as plans; DuckDB replays the oracle SQL renderings).

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir> [topN]
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, top_n=10):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    # an in-memory connection has NO spill path — a heavy sf1 replay
    # (multi-GB materialized CTEs) dies with OutOfMemory instead of
    # spilling (seen round 19: 1 MB allocation failure mid-suite).
    # Give it a temp dir and a cap below the Spark-sized host so the
    # comparator degrades to disk like Spark does, not to a crash.
    con.execute("SET memory_limit='60GB'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        # driver dirs hold single files; GenScale'd dirs are Spark-style
        # parquet DIRECTORIES of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    t0 = time.time()
    for name in sorted(oracle):
        q0 = time.time()
        con.execute(oracle[name]).fetchall()
        times[name] = time.time() - q0
    total = time.time() - t0
    print(f"total {total:.1f} s over {len(times)} queries")
    for name, s in sorted(times.items(), key=lambda x: -x[1])[:int(top_n)]:
        print(f"  {name}: {s:.2f} s")
    # full per-query map for pair accounting (e.g. subtracting queries
    # the Spark suite deliberately retires, so pairs compare the SAME
    # query set) — written next to the oracle it replayed
    with open(f"{out_dir}/oracle_times.json", "w") as f:
        json.dump({"total_sec": total, "queries": times}, f)
    print(f"per-query map: {out_dir}/oracle_times.json")


if __name__ == "__main__":
    main(*sys.argv[1:])
