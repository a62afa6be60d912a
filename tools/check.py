#!/usr/bin/env python3
"""Dev-loop mirror of the driver's correctness gate: run each oracle SQL
in DuckDB against the raw parquet tables and compare (sorted cols, sorted
rows, stringified values) with the parquet dumped by graft.Verify.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query_filter]
"""
import glob, sys, json, duckdb
import pandas as pd

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    filt = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in ('region nation customer supplier part orders lineitem '
              'events documents embeddings').split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f'{outdir}/oracle_sql.json'))
    fails, npass = [], 0
    for name in sorted(oracle):
        if filt and filt not in name:
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            fails.append((name, f'oracle ERR: {e}')); continue
        try:
            # pandas/pyarrow, NOT duckdb: the driver reads the Spark
            # parquet directly, so e.g. a DECIMAL column stays Decimal
            # here but becomes float64 through duckdb — reading both
            # sides through duckdb would mask that class of mismatch
            got = pd.concat([pd.read_parquet(p) for p in
                             glob.glob(f'{outdir}/{name}/*.parquet')],
                            ignore_index=True)
        except Exception as e:
            fails.append((name, f'spark output ERR: {e}')); continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            fails.append((name,
                f'cols exp={list(exp.columns)} got={list(got.columns)}'))
            continue
        if len(exp) != len(got):
            fails.append((name, f'rows exp={len(exp)} got={len(got)}'))
            continue
        cols = list(exp.columns)
        exp = exp.sort_values(by=cols).reset_index(drop=True)
        got = got.sort_values(by=cols).reset_index(drop=True)
        es, gs = exp.astype(str), got.astype(str)
        neq = (es != gs).any(axis=1)
        if neq.any():
            i = int(neq.idxmax())
            ecols = {c: exp.iloc[i][c] for c in cols
                     if str(exp.iloc[i][c]) != str(got.iloc[i][c])}
            gcols = {c: got.iloc[i][c] for c in ecols}
            fails.append((name,
                f'{int(neq.sum())} mismatched rows; first at {i}: '
                f'exp={ecols} got={gcols}'))
        else:
            npass += 1
            print(f'OK   {name} ({len(exp)} rows)')
    for n, msg in fails:
        print(f'FAIL {n}: {msg}')
    print(f'{npass} passed, {len(fails)} failed')
    return 1 if fails else 0

if __name__ == '__main__':
    sys.exit(main())
