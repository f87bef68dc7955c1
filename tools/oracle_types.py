#!/usr/bin/env python3
"""Oracle type-widening audit (the x219 lesson).

The driver's correctness hash is TYPE-sensitive: a DuckDB window-SUM
that widens to HUGEINT (or a SUM(int) that lands on DECIMAL/HUGEINT)
hash-diverges from Spark's BIGINT even when every value matches.
check.py's pandas compare tolerates that skew, so it cannot catch it.

This tool DESCRIBEs every oracle SQL in DuckDB (no execution) and
compares the declared result types against the Spark parquet output
schema, flagging:
  - any HUGEINT/UHUGEINT column (never hash-stable against Spark),
  - any DuckDB/Spark type pair outside the known-equivalent map.

Usage: python3 tools/oracle_types.py <sfDir> <verifyOutDir>
Exit 1 if any query is flagged.
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# duckdb type -> equivalent arrow type names (as str(pa.DataType))
EQUIV = {
    "BIGINT": {"int64"},
    "INTEGER": {"int32"},
    "SMALLINT": {"int16"},
    "TINYINT": {"int8"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string", "large_string"},
    "BOOLEAN": {"bool"},
    "DATE": {"date32[day]"},
    "TIMESTAMP": {"timestamp[us]", "timestamp[ns]"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp[us, tz=UTC]"},
}


def duck_to_ok(duck_t, arrow_t):
    duck_t = duck_t.upper()
    if duck_t.startswith("DECIMAL"):
        # DECIMAL(p,s) <-> decimal128(p, s); a DECIMAL oracle against a
        # Spark double is driver-proven benign (x216 epsilon: green in
        # CORRECTNESS_r12) — pandas reads both as float64
        inner = duck_t[duck_t.index("(") + 1:duck_t.index(")")]
        p, s = [x.strip() for x in inner.split(",")]
        return arrow_t in (f"decimal128({p}, {s})", "double")
    if duck_t.startswith("STRUCT") or duck_t.startswith("LIST") \
            or duck_t.endswith("[]"):
        return True  # nested: the hash flattens these; values-only check
    if duck_t == "BIGINT" and arrow_t in ("int32", "int16"):
        # narrower Spark ints widen to int64 in pandas — driver-proven
        # benign (q26 rk / q51 quartile: green since round 6). Only the
        # HUGEINT direction (pandas object) breaks the driver hash.
        return True
    return arrow_t in EQUIV.get(duck_t, set())


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            bad += 1
            continue
        duck_types = {r[0]: r[1] for r in desc}
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        spark_types = {}
        if files:
            sch = pq.read_schema(files[0])
            spark_types = {f.name: str(f.type) for f in sch}
        flags = []
        for c, dt in duck_types.items():
            if "HUGEINT" in dt.upper():
                flags.append(f"{c}: {dt} (widened — CAST it)")
            elif c in spark_types and not duck_to_ok(dt, spark_types[c]):
                flags.append(f"{c}: duckdb {dt} vs spark {spark_types[c]}")
        if files and sorted(duck_types) != sorted(spark_types):
            flags.append(f"columns {sorted(duck_types)} != {sorted(spark_types)}")
        if flags:
            print(f"FAIL {name}: " + "; ".join(flags))
            bad += 1
        else:
            print(f"OK   {name}")
    print(f"\n{len(oracle) - bad} ok, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
