#!/usr/bin/env python3
"""DuckDB side of the differential fuzz harness (see
src/main/scala/graft/tools/DiffProbe.scala). Same canonicalization; diff
the two outputs to get the divergence report.

Usage: python3 dev/diff_probe.py <sfDir> <queryFile>
"""
import sys, os, math, datetime, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # inf/nan first: math.floor(inf) raises (r9 batch-5 harness fix);
        # spellings match Scala's Double formatting
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if abs(v) >= 1e15:
            # canonical large-double form — mirrors DiffProbe.norm (r12)
            return f"{v:.9e}"
        if v == math.floor(v) and abs(v) < 1e15:
            return str(int(v))
        # Java's %.6f (DiffProbe.norm) rounds the SHORTEST digits then
        # pads, while python's %.6f expands the exact binary — identical
        # doubles rendered differently once |v| has >11 integer digits
        # (r13 dec fuzz, num probe 34: .898100 vs .898102). Mirror Java:
        # HALF_UP on repr()'s shortest digits.
        return str(decimal.Decimal(repr(v)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP))
    if isinstance(v, datetime.timedelta):
        # intervals canonicalize to seconds on both sides (Spark returns
        # java.time.Duration, rendered as seconds there too)
        return norm(v.total_seconds())
    if isinstance(v, decimal.Decimal):
        # integral decimals print exactly (mirror DiffProbe.scala — the
        # float route lost precision past 2^53; r10 batch 8)
        if v == v.to_integral_value():
            return str(int(v))
        return norm(float(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        # this duckdb client returns MAP values as {'key': [...], 'value':
        # [...]} — re-pair so maps render {k:v,...} like plain dicts /
        # Spark maps (r9 batch-4 canonicalization)
        if set(v.keys()) == {"key", "value"} and isinstance(v.get("key"), list) \
                and isinstance(v.get("value"), list) \
                and len(v["key"]) == len(v["value"]):
            items = zip(v["key"], v["value"])
            return "{" + ",".join(sorted(f"{norm(k)}:{norm(x)}" for k, x in items)) + "}"
        return "{" + ",".join(sorted(f"{norm(k)}:{norm(x)}" for k, x in v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, datetime.datetime):
        # tz-aware (TIMESTAMPTZ) → UTC naive; fraction trailing zeros
        # stripped to line up with java.sql.Timestamp.toString (r9)
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        out = str(v).removesuffix(".0")
        if "." in out:
            out = out.rstrip("0").rstrip(".")
        return out
    return str(v)


def main(sfdir, qfile):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = [q.strip() for q in open(qfile)
          if q.strip() and not q.strip().startswith("#")]
    for i, q in enumerate(qs):
        try:
            rows = con.execute(q).fetchall()[:100]
            body = " ;; ".join(sorted("|".join(norm(v) for v in r) for r in rows))
            print(f"{i}\tOK\t{body}")
        except Exception as e:
            print(f"{i}\tERR\t{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main(*sys.argv[1:])
