#!/usr/bin/env python3
"""r17 harness-normalization probe (VERDICT r16 #1).

Theory: the driver's correctness gate fetches the ORACLE result into
pandas via duckdb's .df() — which converts every DECIMAL column to
float64 (measured on 1.0.0 and unchanged upstream) — while the SPARK
result parquet is read via pyarrow, whose DECIMAL columns become
object cells of decimal.Decimal. A decimal cell therefore hashes as
repr(round(float(v), 9)) on the oracle side but str(Decimal) on the
spark side: any value whose full-scale decimal string differs from its
shortest float repr ('6.0600' vs '6.06', '1' vs '1.0') is RED no
matter what rounding policy the engine picks.

This script replays every declared oracle SQL on the LOCAL duck and
reports which entries the theory predicts RED: entries with at least
one DECIMAL output cell where str(Decimal) != float-norm. The
prediction is checked against the driver's CORRECTNESS_r16.json.

Usage: python3 dev/float_theory_probe.py /root/testdata/sf0.01 /tmp/graft_verify
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def float_norm(v):
    # the replica's norm_val for floats
    if v is None:
        return "NULL"
    f = float(v)
    if math.isnan(f):
        return "NaN"
    return repr(round(f, 9))


def dec_norm(v):
    if v is None:
        return "NULL"
    return str(v)


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    predicted_red = []
    dec_entries = []
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            types = [str(t).upper() for t in rel.types]
            cols = list(rel.columns)
            if not any(t.startswith("DECIMAL") for t in types):
                continue
            rows = rel.fetchall()
        except Exception as e:
            print(f"ORAERR {name}: {str(e).splitlines()[0][:90]}")
            continue
        dec_cols = [i for i, t in enumerate(types) if t.startswith("DECIMAL")]
        dec_entries.append(name)
        bad = None
        for r in rows:
            for i in dec_cols:
                if dec_norm(r[i]) != float_norm(r[i]):
                    bad = (cols[i], dec_norm(r[i]), float_norm(r[i]))
                    break
            if bad:
                break
        if bad:
            predicted_red.append(name)
            print(f"PREDICT-RED {name}: col={bad[0]} decimal_str={bad[1]} float_norm={bad[2]}")
        else:
            print(f"predict-ok  {name} (decimal cols but float-safe values)")
    print(f"\ndecimal-output entries: {len(dec_entries)}")
    print("predicted red:", sorted(predicted_red))
    cpath = "/root/repo/CORRECTNESS_r16.json"
    if os.path.exists(cpath):
        c = json.load(open(cpath))
        actual_red = sorted(n for n, v in c.items()
                            if not (v["rows_match"] and v["schema_match"] and v["hash_match"]))
        print("actual   red:", actual_red)
        fp = sorted(set(predicted_red) - set(actual_red))
        fn = sorted(set(actual_red) - set(predicted_red))
        print("false positives (predicted red, driver green):", fp)
        print("false negatives (driver red, predicted green):", fn)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
