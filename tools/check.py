#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
       python3 tools/check.py --selftest

Reads each <outDir>/<name> parquet result (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the same testdata
parquet tables, and compares: schema (column names), row count, and exact
values after sorting rows by all columns. Reports per-query PASS/FAIL.

DTYPE-STRICT (round 10): the driver hashes canonical value bytes, so an int64
18 vs a float64 18.0 is a driver FAIL even though Python's `18 == 18.0` is
True — exactly the q_max_concurrency r9 red row (DuckDB widened a windowed
sum(BIGINT) to HUGEINT, pandas rendered it float64). This gate now fails on
(a) column dtype-class mismatch (int vs float vs bool vs datetime vs object)
and (b) per-value type-class mismatch inside object columns (int vs float vs
Decimal vs str vs bytes). `--selftest` proves the gate goes red on the
int-vs-float fixture.
"""
import sys, json, glob, os
from decimal import Decimal
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize tz-aware → naive for comparison visibility
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def dtype_class(dt) -> str:
    """Collapse a pandas dtype to the class the driver hash distinguishes."""
    k = getattr(dt, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    if k == "m":
        return "timedelta"
    return "object"

def value_class(v) -> str:
    """Type class of a scalar inside an object column."""
    if v is None:
        return "null"
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, Decimal):
        return "decimal"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    return type(v).__name__

def compare(g: pd.DataFrame, e: pd.DataFrame):
    """Return None if frames match driver-strictly, else a FAIL message."""
    if list(g.columns) != list(e.columns):
        return f"columns {list(g.columns)} vs {list(e.columns)}"
    if len(g) != len(e):
        return f"rows {len(g)} vs {len(e)}"
    for c in g.columns:
        gc, ec = dtype_class(g[c].dtype), dtype_class(e[c].dtype)
        if gc != ec:
            return (f"col {c} dtype class: spark={gc} ({g[c].dtype}) vs "
                    f"oracle={ec} ({e[c].dtype}) — driver hash would differ")
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
            return (f"col {c} row {i}: spark={gv.iloc[i]!r} "
                    f"oracle={ev.iloc[i]!r} ({len(bad)} diffs, {len(g)} rows)")
        # per-value type class inside object columns (int vs float vs Decimal
        # all satisfy == but hash to different canonical bytes)
        if dtype_class(gv.dtype) == "object":
            na = pd.isna(gv).to_numpy() | pd.isna(ev).to_numpy()
            for i in range(len(g)):
                if na[i]:
                    continue
                a, b = value_class(gv.iloc[i]), value_class(ev.iloc[i])
                if a != b:
                    return (f"col {c} row {i} value class: spark={a} "
                            f"({gv.iloc[i]!r}) vs oracle={b} ({ev.iloc[i]!r})")
    return None

def selftest() -> int:
    """Prove the gate is dtype-strict: int64 18 vs float64 18.0 must FAIL."""
    ok = True
    g = canon(pd.DataFrame({"max_concurrent": pd.array([18], dtype="int64")}))
    e = canon(pd.DataFrame({"max_concurrent": pd.array([18.0], dtype="float64")}))
    msg = compare(g, e)
    print(f"{'PASS' if msg else 'FAIL'}  selftest int64-vs-float64 rejected: {msg}")
    ok &= msg is not None
    # object column with Python int vs float (DuckDB HUGEINT sometimes lands
    # as object ints; Spark decimal lands as object Decimal)
    g2 = pd.DataFrame({"v": pd.Series([18], dtype="object")})
    e2 = pd.DataFrame({"v": pd.Series([18.0], dtype="object")})
    msg2 = compare(canon(g2), canon(e2))
    print(f"{'PASS' if msg2 else 'FAIL'}  selftest object int-vs-float rejected: {msg2}")
    ok &= msg2 is not None
    # identical frames must still pass
    g3 = pd.DataFrame({"a": pd.array([1, 2], dtype="int64"),
                       "b": ["x", "y"]})
    msg3 = compare(canon(g3), canon(g3.copy()))
    print(f"{'PASS' if msg3 is None else 'FAIL'}  selftest identical accepted: {msg3}")
    ok &= msg3 is None
    print("selftest:", "OK" if ok else "BROKEN")
    return 0 if ok else 1

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
        msg = compare(canon(got), canon(exp))
        if msg:
            print(f"FAIL  {name}: {msg}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
