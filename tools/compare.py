#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (dumped by graft.Verify), runs each
oracle SQL in DuckDB against the parquet tables in <sfDir>, loads the
Spark result parquet from <verifyOutDir>/<name>/, sorts columns by name
and rows by all columns, and reports exact matches / diffs.

Dev tool only — NOT part of the engine (the engine is Scala Spark).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a little: int-like floats stay as-is; just sort rows
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_glob = glob.glob(f"{outdir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            sdf = canon(con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df())
            ddf = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
            n_bad += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            n_bad += 1
            continue
        # driver-strict compare: the driver hashes canonical string
        # renders, which are dtype-sensitive — an int64 10077 vs a
        # float64 10077.0 hash-mismatch there, so they must FAIL here
        # too (r10 lesson: an uncast DuckDB sum() returns HUGEINT ->
        # float64 and the numeric == compare was silently green while
        # the driver's hash_match was red)
        mism = None
        for c in sdf.columns:
            a, b = sdf[c], ddf[c]
            ka, kb = a.dtype.kind, b.dtype.kind
            classes = {"i": "int", "u": "int", "f": "float", "b": "bool",
                       "M": "ts", "O": "obj"}
            if classes.get(ka, ka) != classes.get(kb, kb):
                mism = (c, -1, f"dtype {a.dtype}", f"dtype {b.dtype}", len(a))
                break
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mism = (c, i, a[i], b[i], int((~eq).sum()))
                break
        if mism:
            c, i, av, bv, n = mism
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} duck={bv!r} ({n} mismatches)")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(sdf)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
