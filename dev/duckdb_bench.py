#!/usr/bin/env python3
"""Dev-only: time every oracle SQL (from a graft.Verify dump's
oracle_sql.json) in DuckDB over a given sf dir — the baseline side of the
BASELINE.md ratio table.

Results are fully materialized (fetchall) to match the Spark bench's
noop-sink materialization. One warmup pass, then min of 2 timed passes —
the same protocol as graft.Bench, so the BASELINE.md ratios are symmetric
(r5; previously a single timed pass, which slightly favored Spark).

Usage: python3 dev/duckdb_bench.py <sfDir> <oracle_sql.json> [out.json] [skip.csv]

skip.csv: comma-separated entry names to leave out (recorded as null).
The r6 dedup-family oracles (p03/p04/p05) brute-force ALL doc pairs —
feasible at the correctness sf (sf0.01: 500 docs), O(n^2)-impossible at
bench scale (sf>=1: 500k docs), so the sf1 baseline skips them; the
Spark side runs its LSH entries at every sf.
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, oracle_path, out_path=None, skip_csv=""):
    skip = set(s for s in skip_csv.split(",") if s)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    # q02/q03 embed literal fixture paths (the oracle runs at sf0.01);
    # repoint them at the bench dir
    oracle = {k: v.replace("/root/testdata/sf0.01", sfdir) for k, v in oracle.items()}
    results = {}
    for name in sorted(oracle):
        if name in skip:
            results[name] = None
            print(f"SKIP {name}", file=sys.stderr)
            continue
        try:
            con.execute(oracle[name]).fetchall()  # warmup
            times = []
            for _ in range(2):
                t0 = time.time()
                con.execute(oracle[name]).fetchall()
                times.append(time.time() - t0)
            results[name] = round(min(times), 4)
        except Exception as e:
            results[name] = None
            print(f"ERR {name}: {e}", file=sys.stderr)
    total = sum(v for v in results.values() if v is not None)
    out = {"metric": "total", "value": round(total, 4), "unit": "sec",
           "queries": results, "sf": sfdir}
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")

if __name__ == "__main__":
    main(*sys.argv[1:])
