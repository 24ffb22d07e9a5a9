#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name> parquet against the DuckDB oracle in oracle_sql.json
executed over the same sfDir tables. Usage: check_oracle.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints vs floats, timestamps → ns ints
    for c in df.columns:
        if str(df[c].dtype).startswith('datetime'):
            df[c] = df[c].astype('int64')
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f'{sf_dir}/*.parquet'):
        name = os.path.basename(p)[:-8]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f'{out_dir}/{name}'
        if not os.path.isdir(spark_dir):
            print(f'FAIL {name}: no spark output'); n_fail += 1; continue
        try:
            got = canon(pd.read_parquet(spark_dir))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f'FAIL {name}: {e}'); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f'FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}')
            n_fail += 1; continue
        if len(got) != len(want):
            print(f'FAIL {name}: rows {len(got)} vs {len(want)}'); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=False, rtol=0, atol=0)
            print(f'PASS {name} ({len(got)} rows)'); n_pass += 1
        except AssertionError as e:
            print(f'FAIL {name}: {str(e).splitlines()[-1][:300]}'); n_fail += 1
    print(f'== {n_pass} pass, {n_fail} fail')
    return 1 if n_fail else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
