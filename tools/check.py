#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run DuckDB oracle SQL
against the fixture tables and compare with graft.Verify's parquet output.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes-ish: round floats, stringify everything
    for c in df.columns:
        if df[c].dtype.kind == 'f':
            df[c] = df[c].round(9)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df.astype(str)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    con = duckdb.connect()
    for name in ['region','nation','customer','supplier','part','orders',
                 'lineitem','events','documents','embeddings']:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    failures = 0
    for q, sql in sorted(oracle.items()):
        if only and q not in only:
            continue
        pdir = os.path.join(out_dir, q)
        files = glob.glob(os.path.join(pdir, '*.parquet'))
        if not files:
            print(f"[MISS] {q}: no spark output"); failures += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files])
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"[ERR ] {q}: {e}"); failures += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"[COLS] {q}: spark={list(g.columns)} oracle={list(e.columns)}")
            failures += 1; continue
        if len(g) != len(e):
            print(f"[ROWS] {q}: spark={len(g)} oracle={len(e)}"); failures += 1; continue
        if not g.equals(e):
            diff = (g != e).any(axis=1)
            print(f"[HASH] {q}: {int(diff.sum())}/{len(g)} rows differ")
            print(pd.concat([g[diff].head(3).add_prefix('spark_'),
                             e[diff].head(3).add_prefix('duck_')], axis=1).to_string())
            failures += 1; continue
        print(f"[ OK ] {q}: {len(g)} rows")
    # rows-only entries (queries without oracle). The Verify sidecar
    # rows_only.json lists the BY-DESIGN set (inherently approximate
    # surfaces / index-produce paths); an oracle-less query NOT in it is
    # a builder bug, reported as NO-ORACLE? and counted as a failure.
    try:
        declared = set(json.load(open(os.path.join(out_dir, 'rows_only.json'))))
    except Exception:
        declared = None
    for pdir in sorted(glob.glob(os.path.join(out_dir, '*'))):
        q = os.path.basename(pdir)
        if q in oracle or not os.path.isdir(pdir):
            continue
        if only and q not in only:
            continue
        files = glob.glob(os.path.join(pdir, '*.parquet'))
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        if declared is not None and q not in declared:
            print(f"[NO-ORACLE?] {q}: {n} rows — oracle-less but not in rows_only.json")
            failures += 1
            continue
        print(f"[ROWS-ONLY] {q}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
        if n == 0: failures += 1
    sys.exit(1 if failures else 0)

if __name__ == '__main__':
    main()
