#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <outDir>

Registers each test parquet as a view, runs every oracle_sql.json
query, loads the corresponding Spark result parquet, sorts columns by
name and rows by rendered text, and compares:
  1. row counts
  2. pandas dtypes per column (catches e.g. DuckDB HUGEINT -> float64
     vs Spark BIGINT -> int64, which the driver's hash check fails on)
  3. md5 of the exact rendered row text (no rounding, no float
     coercion) -- mirrors the driver's hash gate.
"""
import sys, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

import numpy as np

def render(v):
    # NaN (nulls through pandas) -> canonical token. Integers of any
    # width render identically ("1"); floats render with the decimal
    # point ("1.0") -- so an int-vs-float type difference fails (the
    # driver's HUGEINT->float64 case) while int32-vs-int64 passes
    # (driver r1 passed those).
    if v is None:
        return "<null>"
    if isinstance(v, (float, np.floating)):
        if v != v:
            return "<null>"
        return repr(float(v))
    if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
        return str(int(v))
    return repr(v)

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted("|".join(render(v) for v in r)
                  for r in df.itertuples(index=False, name=None))
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    # kind-level dtype: int vs float vs object vs datetime matters;
    # width does not (driver renders values, so i4 == i8).
    dtypes = {c: df[c].dtype.kind for c in cols}
    return cols, dtypes, rows, h

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark result")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"ORAFAIL  {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        wc, wt, wrows, wh = canon(want)
        gc, gt, grows, gh = canon(got)
        if wc != gc:
            print(f"SCHEMA   {name}: oracle={wc} spark={gc}")
            n_fail += 1
            continue
        if len(wrows) != len(grows):
            print(f"ROWS     {name}: oracle={len(wrows)} spark={len(grows)}")
            n_fail += 1
            continue
        if wt != gt:
            bad = {c: (wt[c], gt[c]) for c in wc if wt[c] != gt[c]}
            print(f"DTYPE    {name}: oracle vs spark {bad}")
            n_fail += 1
            continue
        if wh != gh:
            diffs = [(a, b) for a, b in zip(wrows, grows) if a != b][:3]
            nd = sum(1 for a, b in zip(wrows, grows) if a != b)
            print(f"HASH     {name}: {nd} differing rendered rows; e.g. {diffs}")
            n_fail += 1
            continue
        print(f"OK       {name} ({len(grows)} rows, md5={gh[:12]})")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
