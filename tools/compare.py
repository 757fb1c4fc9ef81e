#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run DuckDB oracle SQL
against the testdata parquet and compare with Verify's parquet dumps
(columns sorted by name, values compared after canonical row sort)."""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        want = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}")); continue
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        fails.append((name, f"cols: want {list(want.columns)} got {list(got.columns)}")); continue
    if len(want) != len(got):
        fails.append((name, f"rows: want {len(want)} got {len(got)}")); continue
    # canonicalize: stringify (arrays -> lists), sort rows
    def canon(df):
        d = df.copy()
        for c in d.columns:
            d[c] = d[c].apply(lambda v: json.dumps(v.tolist() if hasattr(v, "tolist") else v, default=str))
        return d.sort_values(list(d.columns)).reset_index(drop=True)
    w, g = canon(want), canon(got)
    if not w.equals(g):
        diff = (w != g).any(axis=1)
        idx = diff[diff].index[:3]
        msg = "; ".join(f"row{j}: want {w.loc[j].to_dict()} got {g.loc[j].to_dict()}" for j in idx)
        fails.append((name, f"value mismatch: {msg[:400]}")); continue
    print(f"OK   {name} ({len(got)} rows)")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
