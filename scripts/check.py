#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify output vs DuckDB.

Usage: python3 scripts/check.py <sfDir> <outDir>
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)

Mirrors the driver: for each query with oracle SQL, run the SQL in DuckDB
over views named after the parquet tables, sort COLUMNS by name, and compare
row count, schema shape, and cell values (exact; floats compared exactly
since both sides are supposed to be bit-identical by construction).
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"create view {name} as select * from '{f}'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails, oks, weak = [], [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    got = con.execute(f"select * from '{d}/*.parquet'").fetchdf()
    if name not in oracles:
        weak.append(f"{name}: rows={len(got)} (no oracle)")
        continue
    try:
        exp = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        fails.append(f"{name}: ORACLE SQL ERROR: {e}")
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        fails.append(f"{name}: cols {list(got.columns)} != {list(exp.columns)}")
        continue
    if len(got) != len(exp):
        fails.append(f"{name}: rows {len(got)} != {len(exp)}")
        continue
    bad = None
    for c in got.columns:
        gv, ev = list(got[c]), list(exp[c])
        for i, (g, e) in enumerate(zip(gv, ev)):
            if g != e and str(g) != str(e):
                bad = f"col {c} row {i}: got {g!r} want {e!r}"
                break
        if bad:
            break
    if bad:
        fails.append(f"{name}: {bad}")
    else:
        oks.append(name)

print(f"OK ({len(oks)}): {' '.join(oks)}")
for w in weak:
    print("WEAK", w)
for f in fails:
    print("FAIL", f)
sys.exit(1 if fails else 0)
