#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet and compare with the Spark result parquet."""
import sys, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_sf0.001"
only = set(sys.argv[3:])  # optional query-name filter for partial Verify dumps

con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
unknown = only - set(oracle)
if unknown:
    print(f"FAIL unknown query names (not in oracle_sql.json): {sorted(unknown)}")
    sys.exit(2)
fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        duck_df = con.execute(sql).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: exec error: {str(e)[:300]}"); continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        fails.append(name)
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        continue
    if len(s) != len(d):
        fails.append(name); print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); continue
    # sort rows for comparison, stringify values
    try:
        ss = s.astype(str).sort_values(by=list(s.columns)).reset_index(drop=True)
        dd = d.astype(str).sort_values(by=list(d.columns)).reset_index(drop=True)
        eq = ss.equals(dd)
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: compare error {e}"); continue
    if not eq:
        fails.append(name)
        neq = (ss != dd).any(axis=1)
        print(f"FAIL {name}: value mismatch in {neq.sum()}/{len(ss)} rows")
        both = pd.concat([ss[neq].head(3).add_suffix("_spark"),
                          dd[neq].head(3).add_suffix("_duck")], axis=1)
        print(both.to_string()[:1200])
    else:
        print(f"OK   {name} ({len(s)} rows)")
n = len(only) if only else len(oracle)
print(f"\n{n-len(fails)}/{n} passed")
sys.exit(1 if fails else 0)
