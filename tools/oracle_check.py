#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB with views named
after the parquet tables in <sf_dir>, and compares: schema (column names
sorted), row count, and values (rows sorted, columns sorted by name,
floats rounded). This is a developer tool only — not part of the Scala
library.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for compare
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype('float64').round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype('datetime64[us]')
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('Int64')
        elif df[c].dtype == object:
            import datetime
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
            if df[c].apply(lambda v: v is None or isinstance(v, (datetime.date, datetime.datetime))).all():
                df[c] = pd.to_datetime(df[c]).astype('datetime64[us]')
    df = df.sort_values(by=list(df.columns), kind='mergesort', na_position='last')
    return df.reset_index(drop=True)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(p)[:-len('.parquet')]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))]
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, '*.parquet'))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            status = f'NO-ORACLE rows={len(got)}'
            print(f'{name:28s} {status}')
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f'{name:28s} ORACLE-SQL-ERROR {e}')
            failures += 1
            continue
        g, e_ = canon(got.copy()), canon(exp.copy())
        if list(g.columns) != list(e_.columns):
            print(f'{name:28s} SCHEMA-MISMATCH got={list(g.columns)} exp={list(e_.columns)}')
            failures += 1
        elif len(g) != len(e_):
            print(f'{name:28s} ROWCOUNT got={len(g)} exp={len(e_)}')
            failures += 1
        elif not g.equals(e_):
            neq = (g != e_) & ~(g.isna() & e_.isna())
            bad = neq.any(axis=1)
            print(f'{name:28s} VALUE-MISMATCH rows={bad.sum()}/{len(g)}')
            print('  got:', g[bad].head(3).to_dict('records'))
            print('  exp:', e_[bad].head(3).to_dict('records'))
            failures += 1
        else:
            print(f'{name:28s} OK rows={len(g)}')
    print(f'\n{len(names)} queries, {failures} failures')
    sys.exit(1 if failures else 0)

if __name__ == '__main__':
    main()
