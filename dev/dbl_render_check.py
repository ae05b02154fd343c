#!/usr/bin/env python3
"""Cross-check graft_double_str renders against DuckDB's CAST(x AS VARCHAR).

Usage:
  sbt -batch "runMain graft.tools.DoubleRenderProbe 20000" 2>/dev/null \
      | grep -P '^-?\\d+\\t' > /tmp/dbl_renders.tsv
  python3 dev/dbl_render_check.py /tmp/dbl_renders.tsv

NOTE: the local replica is DuckDB 1.0.0; double rendering has been
shortest-round-trip since 0.10 and is believed version-stable, so this
check is meaningful for the driver's newer oracle too (unlike the
decimal-downscale class).
"""
import sys, struct
import duckdb

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dbl_renders.tsv"
rows, frows = [], []
for line in open(path):
    bits, render = line.rstrip("\n").split("\t")
    if bits.startswith("F"):
        f = struct.unpack("<f", struct.pack("<i", int(bits[1:])))[0]
        frows.append((f, render))
    else:
        d = struct.unpack("<d", struct.pack("<q", int(bits)))[0]
        rows.append((d, render))

con = duckdb.connect()
con.execute("CREATE TABLE t(d DOUBLE, r VARCHAR)")
con.executemany("INSERT INTO t VALUES (?, ?)", rows)
bad = con.execute(
    "SELECT d, CAST(d AS VARCHAR) AS duck, r AS graft FROM t "
    "WHERE CAST(d AS VARCHAR) <> r").fetchall()
fbad = []
if frows:
    con.execute("CREATE TABLE tf(f FLOAT, r VARCHAR)")
    con.executemany("INSERT INTO tf VALUES (?, ?)", frows)
    fbad = con.execute(
        "SELECT f, CAST(f AS VARCHAR) AS duck, r AS graft FROM tf "
        "WHERE CAST(f AS VARCHAR) <> r").fetchall()
print(f"{len(rows)} double + {len(frows)} float renders checked, "
      f"{len(bad)} + {len(fbad)} mismatches")
for d, duck, graft in (bad + fbad)[:25]:
    print(f"  MISMATCH {d!r}: duck={duck} graft={graft}")
sys.exit(1 if bad or fbad else 0)
