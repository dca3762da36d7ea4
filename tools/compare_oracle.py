#!/usr/bin/env python3
"""Emulates the driver's correctness gate: for each SparkEntry query result
dumped by `graft.Verify`, run the paired oracle SQL in DuckDB over the same
parquet tables and compare values exactly (columns sorted by name, rows
sorted by all columns). Usage:

    python3 tools/compare_oracle.py [sf_dir] [out_dir]
"""
import duckdb, json, glob, sys
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name:30s} NO OUTPUT")
        fails.append(name)
        continue
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    want = con.execute(sql).df()
    g, w = canon(got), canon(want)
    ok = (list(g.columns) == list(w.columns) and len(g) == len(w) and
          all((g[c].astype(str).values == w[c].astype(str).values).all()
              for c in g.columns))
    print(f"{name:30s} rows={len(g)}/{len(w)} ok={ok}")
    if not ok:
        fails.append(name)
        if list(g.columns) == list(w.columns) and len(g) == len(w):
            for c in g.columns:
                neq = g[c].astype(str).values != w[c].astype(str).values
                if neq.any():
                    i = neq.argmax()
                    print(f"   diff {c}: got {g[c].iloc[i]!r} want "
                          f"{w[c].iloc[i]!r} ({g[c].dtype} vs {w[c].dtype})")
        else:
            print(f"   cols got={list(g.columns)} want={list(w.columns)}")

print("FAILS:", fails)
sys.exit(1 if fails else 0)
