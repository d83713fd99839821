#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify output against
DuckDB oracles and compare (schema + sorted-row hash), per query.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, hashlib
import duckdb
import numpy as np
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types: ints -> int64, floats -> float64, rest -> str
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def negzero_cols(df: pd.DataFrame):
    """Columns containing IEEE -0.0 — invisible to the value compare below
    (pandas treats -0.0 == +0.0) but byte-different under the driver's raw
    hash. The catalog invariant is that NEITHER engine ever emits one."""
    bad = []
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            v = df[c].to_numpy(dtype="float64", na_value=np.nan)
            if np.any((v == 0.0) & np.signbit(v)):
                bad.append(c)
    return bad

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        nz_s, nz_d = negzero_cols(spark_df), negzero_cols(duck_df)
        if nz_s or nz_d:
            print(f"FAIL {name}: -0.0 present (spark={nz_s} duck={nz_d}) — "
                  "byte-hash hazard; normalize with `round(...) + 0.0`")
            n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns differ spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows differ spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} differing rows; first few:")
            print(pd.concat([a[bad].head(3).add_suffix("_spark"),
                             b[bad].head(3).add_suffix("_duck")], axis=1).to_string())
            n_fail += 1; continue
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
