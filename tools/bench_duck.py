#!/usr/bin/env python3
"""DuckDB-side timing of the oracle SQL, for comparing graft.Bench numbers
(BASELINE target: within 2x of the oracle engine at the same scale factor).

Usage: python3 tools/bench_duck.py <sfDir> <verifyOutDir-with-oracle_sql.json>
"""
import json, sys, time
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for name in ['region','nation','customer','supplier','part','orders',
                 'lineitem','events','documents','embeddings']:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    results = {}
    for q, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            results[q] = round(time.time() - t0, 3)
        except Exception as e:
            results[q] = None
    total = sum(v for v in results.values() if v is not None)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 2),
                      "unit": "sec", "queries": results, "sf": sf_dir}))

if __name__ == '__main__':
    main()
