#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(dumps <out>/<query>/ parquet + <out>/oracle_sql.json), then this script
runs each oracle SQL in DuckDB over the same sf tables and compares
(sorted columns by name, sorted rows, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query...]
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize value representations for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list,)) else v)
        try:
            import numpy as np
            if df[c].dtype.kind in "fc":
                pass
        except Exception:
            pass
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(str))
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            n_bad += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_bad += 1
            continue
        gs = g.astype(str)
        es = e.astype(str)
        neq = (gs != es)
        if neq.any().any():
            cols = [c for c in g.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in cols {cols}")
            for c in cols[:3]:
                idx = neq[c].idxmax()
                print(f"   first diff col={c} row={idx}: spark={gs[c][idx]!r} duck={es[c][idx]!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
