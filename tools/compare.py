#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, canonicalizes both sides (columns sorted by name, rows
sorted by all columns), and reports schema/row-count/value-hash equality.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracles:
            status = f"rows-only: {len(got)} rows"
            print(f"  [SKIP] {name:24s} {status}")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"  [FAIL] {name:24s} oracle error: {e}")
            n_fail += 1
            continue
        g, e_ = canon(got), canon(exp)
        ok_schema = list(g.columns) == list(e_.columns)
        ok_rows = len(g) == len(e_)
        ok_vals = False
        detail = ""
        if ok_schema and ok_rows:
            try:
                pd.testing.assert_frame_equal(g, e_, check_dtype=False,
                                              check_exact=True)
                ok_vals = True
            except AssertionError as ex:
                detail = str(ex).split("\n")[0]
                # find first differing cell for debugging
                for c in g.columns:
                    a, b = g[c].to_numpy(), e_[c].to_numpy()
                    if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                        neq = ~(np.isclose(a.astype(float), b.astype(float),
                                           rtol=0, atol=0, equal_nan=True))
                    else:
                        neq = a != b
                    if neq.any():
                        i = int(np.argmax(neq))
                        detail += f" | col={c} row={i} got={a[i]!r} exp={b[i]!r}"
                        break
        else:
            detail = (f"schema got={list(g.columns)} exp={list(e_.columns)}"
                      if not ok_schema else f"rows got={len(g)} exp={len(e_)}")
        if ok_schema and ok_rows and ok_vals:
            print(f"  [PASS] {name:24s} {len(g)} rows")
            n_pass += 1
        else:
            print(f"  [FAIL] {name:24s} {detail}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
