#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Registers every parquet table in sfDir as a DuckDB view, runs each SQL in
<verifyOutDir>/oracle_sql.json, and compares against the Spark-written
parquet in <verifyOutDir>/<name>/ — columns sorted by name, rows sorted,
exact value equality (floats compared exactly after the queries' own
rounding, with a near-miss report).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    # NO array normalization: the driver's checker dies in pandas
    # sort_values on ndarray cells, so this local gate must die the same
    # way — gate queries must render arrays to strings themselves.
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = os.path.join(out_dir, name)
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        ok = True
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                aa = a.astype(float); bb = b.astype(float)
                eq = (aa == bb) | (aa.isna() & bb.isna())
                if not eq.all():
                    diff = (aa - bb).abs().max()
                    print(f"FAIL {name}: col {c} float mismatch, max |diff|={diff}")
                    ok = False
            else:
                eq = (a == b) | (a.isna() & b.isna()) if hasattr(a, "isna") else (a == b)
                if not eq.all():
                    i = int(np.argmin(eq.values))
                    print(f"FAIL {name}: col {c} first mismatch row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
