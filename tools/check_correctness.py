#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the Scala
library has no Python dependency).

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
sf-dir parquet tables, loads the Spark-written parquet result for the same
query, sorts columns by name and rows by value, and compares cell-exactly.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)

def main(sf_dir, out_dir):
    # name the oracle engine version up front: any future hash mismatch is
    # immediately attributable to engine drift vs a real bug (round 11: the
    # HLL trio passed on DuckDB 1.0.0 and failed on the driver's DuckDB —
    # root cause was version-sensitive double/HUGEINT handling, since
    # removed from every contract surface)
    print(f"oracle engine: duckdb {duckdb.__version__}")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = {}
    fpath = f"{out_dir}/failures.json"
    if os.path.exists(fpath):
        failures = json.load(open(fpath))
    n_pass = n_fail = 0
    # thrown queries first: each is a red row even if it has no oracle SQL
    # (a missing key must never silently shrink the board)
    for name in sorted(failures):
        print(f"FAIL {name}: query threw during Verify: {failures[name]}")
        n_fail += 1
    for name in sorted(oracle):
        if name in failures:
            continue
        res_dir = f"{out_dir}/{name}"
        parts = glob.glob(f"{res_dir}/*.parquet")
        if not parts:
            print(f"FAIL {name}: no spark result at {res_dir}")
            n_fail += 1
            continue
        try:
            ocols, orows = frame(con, oracle[name])
            scols, srows = frame(con, f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if [c.lower() for c in ocols] != [c.lower() for c in scols]:
            print(f"FAIL {name}: columns differ\n  oracle: {ocols}\n  spark:  {scols}")
            n_fail += 1
        elif orows != srows:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(orows, srows) if a != b]
            print(f"FAIL {name}: {len(orows)} vs {len(srows)} rows, {len(diffs)} differing")
            for a, b in diffs[:3]:
                print(f"  oracle: {a}\n  spark:  {b}")
            if len(orows) != len(srows):
                print(f"  oracle head: {orows[:2]}\n  spark head:  {srows[:2]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(orows)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
