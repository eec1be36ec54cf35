#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare (t2).

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
with the sf parquet tables registered as views, load the Spark parquet
result, canonicalize both (columns sorted by name, rows sorted, doubles
rounded to 9 significant digits), and diff.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            def r9(x):
                if pd.isna(x) or x == 0: return x
                from decimal import Decimal
                return float(f"{x:.9g}")
            df[c] = df[c].map(r9)
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[ms]").astype("int64")
        elif df[c].dtype == bool or str(df[c].dtype) == "boolean":
            df[c] = df[c].astype(bool)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        duck = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fails += 1
        continue
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    spark = pd.concat([pd.read_parquet(f) for f in spark_files])
    a, b = canon(duck), canon(spark)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns duck={list(a.columns)} spark={list(b.columns)}")
        fails += 1
        continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows duck={len(a)} spark={len(b)}")
        fails += 1
        continue
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in a.columns if neq[c].any()]
        print(f"FAIL {name}: value mismatch in {bad_cols}")
        for c in bad_cols[:2]:
            idx = neq[c].idxmax()
            print(f"   first diff col={c} row={idx}: duck={a[c][idx]!r} spark={b[c][idx]!r}")
        fails += 1
        continue
    print(f"OK   {name} ({len(a)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} match")
sys.exit(1 if fails else 0)
