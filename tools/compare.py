#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <outDir>

Registers each test parquet as a view, runs every oracle_sql.json
query, loads the corresponding Spark result parquet, sorts columns by
name and rows by all columns, and compares values.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if v != v:  # NaN (e.g. nulls through pandas) — make comparable
            return None
        return round(v, 9)
    return v

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
        wc, gc = sorted(want.columns), sorted(got.columns)
        if wc != gc:
            print(f"SCHEMA   {name}: oracle={wc} spark={gc}")
            n_fail += 1
            continue
        w = [tuple(norm(v) for v in r) for r in want[wc].itertuples(index=False)]
        g = [tuple(norm(v) for v in r) for r in got[wc].itertuples(index=False)]
        w.sort(key=repr); g.sort(key=repr)
        if len(w) != len(g):
            print(f"ROWS     {name}: oracle={len(w)} spark={len(g)}")
            n_fail += 1
        elif w != g:
            diffs = [(a, b) for a, b in zip(w, g) if a != b][:3]
            print(f"VALUES   {name}: {len([1 for a,b in zip(w,g) if a!=b])} differing rows; e.g. {diffs}")
            n_fail += 1
        else:
            print(f"OK       {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
