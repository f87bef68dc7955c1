#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Reads the Verify.scala output dir (one parquet dir per query +
oracle_sql.json), runs each oracle SQL in DuckDB against the same
sf parquet tables, and diffs exactly: columns sorted by name, rows
sorted, values compared bitwise (floats must be identical — our
queries are designed to be order-independent).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; GenScale dev data is a
        # Spark-style directory of part files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            # oracle_sql.json now always carries ALL oracles; a query
            # dir that does not exist at all was filtered by
            # SPARK_GRAFT_ONLY (skip). A dir that EXISTS but is empty
            # is a failed/partial write (fail).
            if not os.path.isdir(f"{out_dir}/{name}"):
                n_skip += 1
                continue
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        diff_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
                ok = bool(eq.all())
            except Exception:
                ok = list(map(str, a)) == list(map(str, b))
            if not ok:
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                mask = ~((got[c] == want[c]) | (got[c].isna() & want[c].isna()))
                print(f"  {c}: got  {got[c][mask].head(3).tolist()}")
                print(f"  {c}: want {want[c][mask].head(3).tolist()}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    # queries without oracle → rows-only smoke
    have = set(oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        q = d.rstrip("/").split("/")[-1]
        if q not in have:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{d}*.parquet')").fetchone()[0]
            print(f"SMOKE {q}: {n} rows (no oracle)")
    skip = f", {n_skip} not run" if n_skip else ""
    print(f"\n{n_ok} ok, {n_bad} failed{skip}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
