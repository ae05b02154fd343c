#!/usr/bin/env python3
"""Dev-only: synthesize an ~sf1 dataset from the sf0.1 fixtures by unioning
COPIES copies with key-shifted surrogate keys (foreign keys shifted
consistently, dimension tables kept as-is), so every declared query keeps
its join/group semantics at 10x the data.

Usage: python3 dev/gen_sf1.py [outdir] [copies]   (default /tmp/graft_sf1 10)
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
S = 10_000_000  # key stride per copy; far above any sf0.1 key range

# table -> columns to shift by i*S (everything else passes through)
SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t, shifted in SHIFTS.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if not shifted:  # dimensions: single copy
            con.execute(f"COPY (SELECT * FROM {src}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
            n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
            print(f"{t}: {n} rows (unchanged)")
            continue
        cols = con.sql(f"SELECT * FROM {src} LIMIT 0").columns
        selects = []
        for i in range(COPIES):
            proj = ", ".join(
                f"({c} + {i * S}) AS {c}" if c in shifted else c for c in cols)
            selects.append(f"SELECT {proj} FROM {src}")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows ({COPIES} copies)")

if __name__ == "__main__":
    main()
