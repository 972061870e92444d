#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB (tables registered
from <sfDir>/*.parquet), sorts columns by name + rows by all columns,
and diffs exact values. Dev tool only — not part of the library.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps → ns naive, ints → int64, floats → float64
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None) if df[c].dt.tz is None else pd.to_datetime(df[c]).dt.tz_convert("UTC").dt.tz_localize(None)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_raw = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}"); n_fail += 1; continue
        try:
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}"); n_fail += 1; continue
        # the driver hashes values BEFORE dtype widening: a float32 Spark
        # column vs the oracle's float64 hash-mismatches even when every
        # value is identical after exact widening (r10 x_embed_stats).
        # Flag raw float32 outputs as failures so this never recurs.
        f32 = [c for c in spark_raw.columns if str(spark_raw[c].dtype) == "float32"]
        if f32:
            print(f"FAIL {name}: float32 output columns {f32} (driver hash sees float32 vs oracle float64)"); n_fail += 1; continue
        spark_df = canon(spark_raw)
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}"); n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}"); n_fail += 1; continue
        diffs = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if a.dtype.kind == "f":
                neq = ~((a == b) | (a.isna() & b.isna()))
            else:
                neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r} ({int(neq.sum())} diffs)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs)); n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
    # queries with no oracle: report rows-only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            try:
                n = len(pd.read_parquet(d))
                print(f"ROWS-ONLY {name}: {n} rows")
            except Exception as e:
                print(f"ROWS-ONLY {name}: unreadable: {e}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
