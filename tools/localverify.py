#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against DuckDB oracles and diff (rows / schema / values).

Usage: python3 tools/localverify.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob

import duckdb
import pandas as pd

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    # every table in the sf dir, like the driver (the contract example
    # queries lineitem, so the full TESTDATA set is registered there)
    import os
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        t = os.path.splitext(os.path.basename(p))[0]
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        d = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: schema {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); n_fail += 1; continue
        s = s.sort_values(by=list(s.columns), ignore_index=True).astype(str)
        d = d.sort_values(by=list(d.columns), ignore_index=True).astype(str)
        if not s.equals(d):
            diff = (s != d).any(axis=1)
            bad = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch ({diff.sum()} rows), e.g.")
            for i in bad:
                print(f"  spark: {s.iloc[i].to_dict()}")
                print(f"  duck : {d.iloc[i].to_dict()}")
            n_fail += 1; continue
        print(f"pass {name} ({len(s)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
