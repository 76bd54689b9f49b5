#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet result (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the same testdata
parquet tables, and compares: schema (column names), row count, and exact
values after sorting rows by all columns. Reports per-query PASS/FAIL.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize tz-aware → naive for comparison visibility
    for c in df.columns:
        if pd.api.types.is_datetime64tz_dtype(df[c]):
            df[c] = df[c].dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no result parquet"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(p) for p in sorted(files)],
                        ignore_index=True)
        if name not in oracles:
            print(f"rows  {name}: rows-only ({len(got)} rows)"); n_rowsonly += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        mismatch = None
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                both_na = pd.isna(gv).to_numpy() & pd.isna(ev).to_numpy()
                eq = (gv.astype(object).where(pd.notna(gv), None) ==
                      ev.astype(object).where(pd.notna(ev), None))
                eq = pd.Series(eq.to_numpy() | both_na)
            except Exception:
                eq = pd.Series([False] * len(g))
            bad = (~eq).to_numpy().nonzero()[0]
            if len(bad):
                i = int(bad[0])
                mismatch = (c, i, gv.iloc[i], ev.iloc[i], len(bad))
                break
        if mismatch:
            c, i, gv, ev, nbad = mismatch
            print(f"FAIL  {name}: col {c} row {i}: spark={gv!r} oracle={ev!r} ({nbad} diffs, {len(g)} rows)")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
