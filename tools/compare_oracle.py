#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
Reads each <out>/<name>/ parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB with tables bound to <sfDir>/*.parquet,
then compares values column-by-column (sorted column names, row order as
returned — both sides ORDER BY deterministically).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"[{name}] MISSING spark result"); n_fail += 1; continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in
                             sorted(glob.glob(spark_dir + "/*.parquet"))],
                            ignore_index=True)
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"[{name}] ERROR {e}"); n_fail += 1; continue
        s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
        if s_cols != d_cols:
            print(f"[{name}] SCHEMA mismatch spark={s_cols} duck={d_cols}")
            n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"[{name}] ROWS mismatch spark={len(sdf)} duck={len(ddf)}")
            n_fail += 1; continue
        ok = True
        for c in s_cols:
            a = sdf[c].tolist(); b = ddf[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                xn = x is None or (isinstance(x, float) and pd.isna(x))
                yn = y is None or (isinstance(y, float) and pd.isna(y))
                if xn and yn:
                    continue
                # The driver hash-compares STRINGIFIED values — numeric
                # coercion must not save us here, or HUGEINT/float-dtype
                # divergence passes locally and fails at the driver.
                eq = str(x) == str(y)
                if not eq:
                    num_eq = (isinstance(x, (int, float))
                              and isinstance(y, (int, float))
                              and float(x) == float(y))
                    hint = (" (numerically equal — dtype/stringify bug,"
                            " e.g. un-CAST DuckDB HUGEINT sum)") if num_eq else ""
                    print(f"[{name}] VALUE mismatch col={c} row={i}: "
                          f"spark={x!r} duck={y!r}{hint}")
                    ok = False
                    break
            if not ok:
                break
        if ok:
            print(f"[{name}] PASS ({len(sdf)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
