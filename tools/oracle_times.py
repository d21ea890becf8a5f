#!/usr/bin/env python3
"""Per-oracle DuckDB wall-time profiler for the t2 correctness gate.

Usage: python3 tools/oracle_times.py <verify_out_dir> <sf_dir> [out_json]

Runs every SQL in <verify_out_dir>/oracle_sql.json against DuckDB views
over <sf_dir>/*.parquet, timing each (execution only — no compare), and
writes a {name: seconds} JSON sorted slowest-first, plus a total.
Committed as tools/oracle_times.json each round so oracle-side runtime
regressions are visible before the driver's gate budget hits them
(round-10 postmortem: the suite silently grew past ~25 min and the
driver's CORRECTNESS file came back empty). Developer tool only — not
part of the Scala library.
"""
import sys, os, json, glob, time
import duckdb

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(p)[:-len('.parquet')]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    times = {}
    t_all = time.time()
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            times[name] = round(time.time() - t0, 3)
            print(f'{name:32s} ERROR {e}', file=sys.stderr)
        print(f'{name:32s} {times[name]:8.2f}s', flush=True)
    total = round(time.time() - t_all, 1)
    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    print(f'\nTOTAL {total}s over {len(times)} oracles; top 10:')
    for n, s in list(ranked.items())[:10]:
        print(f'  {n:32s} {s:8.2f}s')
    if out_json:
        json.dump({'total_sec': total, 'per_query_sec': ranked},
                  open(out_json, 'w'), indent=1)
        print(f'wrote {out_json}')

if __name__ == '__main__':
    main()
