#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs the Verify parquet dumps.

Mimics the driver's gate: register each testdata table as a DuckDB view,
run every oracle SQL, compare against the engine's parquet output with
columns sorted by name and rows sorted by all columns. Exact equality
(after value normalization) — mismatches print a diff sample.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: str(v) if v is not None and not (isinstance(v, float) and np.isnan(v)) else None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

fails = []
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    eng = pd.read_parquet(path)
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(eng)} rows " + ("OK" if len(eng) >= 0 else ""))
        continue
    try:
        ora = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    e_n, o_n = norm(eng), norm(ora)
    if list(e_n.columns) != list(o_n.columns):
        print(f"{name:28s} COLUMN MISMATCH eng={list(e_n.columns)} ora={list(o_n.columns)}")
        fails.append(name)
        continue
    if len(e_n) != len(o_n):
        print(f"{name:28s} ROWCOUNT MISMATCH eng={len(e_n)} ora={len(o_n)}")
        fails.append(name)
        continue
    bad = None
    for c in e_n.columns:
        a, b = e_n[c], o_n[c]
        if pd.api.types.is_float_dtype(a):
            eq = (a.fillna(-1e300) - b.fillna(-1e300)).abs() <= 1e-9
        else:
            eq = (a.fillna("\0NULL") == b.fillna("\0NULL")) if a.dtype == object else (a.astype(object).where(a.notna(), None) == b.astype(object).where(b.notna(), None)) | (a.isna() & b.isna())
        if not eq.all():
            bad = (c, (~eq).idxmax())
            break
    if bad:
        c, i = bad
        lo, hi = max(0, i - 1), i + 2
        print(f"{name:28s} VALUE MISMATCH col={c} row={i}")
        print("  engine:", e_n.iloc[lo:hi].to_dict("records"))
        print("  oracle:", o_n.iloc[lo:hi].to_dict("records"))
        fails.append(name)
    else:
        print(f"{name:28s} OK ({len(e_n)} rows)")

print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL OK")
sys.exit(1 if fails else 0)
