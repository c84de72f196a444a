#!/usr/bin/env python3
"""Full-registry sf1 (10x) oracle validation — the round-10 judge item.

Mirrors the driver's t2 gate (scripts/check.py) but:
  - emits the driver-format JSON artifact (rows/schema/hash per query) to
    the path given as argv[3] (e.g. CORRECTNESS_sf1.json);
  - runs each oracle under a per-query timeout (argv[4], default 600s):
    some oracle SQL is quadratic-ish in DuckDB at 10x even though the
    Spark side is banded/bucketed — a timeout is recorded as
    err="oracle timeout", NOT as a mismatch, and dispositioned in
    COVERAGE.md.

Usage: python3 scripts/check_sf1.py <sfDir> <verifyOutDir> <jsonOut> [timeoutSec]
(Run `graft.Verify <sfDir> <verifyOutDir>` first.)
"""
import gc
import json, sys, glob, os, hashlib, threading
import duckdb

sfdir, outdir, jsonout = sys.argv[1], sys.argv[2], sys.argv[3]
timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 600.0


def fresh_con():
    """One connection PER ORACLE: at 100x a heavy oracle can exhaust the
    process (a shared connection accumulates DuckDB caches, and a worker
    that dies mid-query poisons the connection's internal lock — observed
    as a MemoryError followed by a permanent wedge). Fresh + capped =
    each query is isolated and the process stays bounded."""
    c = duckdb.connect()
    c.execute("SET threads TO 16")
    c.execute("SET memory_limit = '48GB'")
    for f in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(f)[:-8]
        # Spark-written tables are directories of part files; driver-
        # generated testdata is single files — handle both
        src = f"{f}/*.parquet" if os.path.isdir(f) else f
        c.execute(f"create view {name} as select * from '{src}'")
    return c


con = fresh_con()  # for the (small) spark-output reads

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
# RESUME: at 100x a single DuckDB native crash (segfault / MemoryError)
# forty minutes in must not discard the finished queries — results are
# checkpointed to <jsonout>.partial after EVERY query, and a rerun skips
# queries the checkpoint already holds green (or terminally errored).
partial = f"{jsonout}.partial"
if os.path.exists(partial):
    try:
        results = json.load(open(partial))
        print(f"resuming: {len(results)} queries from {partial}", flush=True)
    except Exception:
        results = {}


def checkpoint():
    tmp = partial + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=1)
    os.replace(tmp, partial)


def run_with_timeout(sql):
    out, err = [], []
    qcon = fresh_con()

    def work():
        try:
            out.append(qcon.execute(sql).fetchdf())
        except Exception as e:
            err.append(str(e))

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        qcon.interrupt()
        t.join(30)
        return None, "oracle timeout"
    try:
        qcon.close()
    except Exception:
        pass
    gc.collect()
    if err:
        return None, err[0]
    return out[0], None


def cols_equal(g, e):
    """Vectorized exact-or-str equality per column (mirrors check.py's
    `g != e and str(g) != str(e)` cell rule, but at sf1 row counts)."""
    import pandas as pd
    if len(g) == 0:
        return True, None
    try:
        if bool((g.values == e.values).all()):
            return True, None
    except Exception:
        pass
    gs, es = g.astype(str), e.astype(str)
    neq = (gs.values != es.values)
    if not neq.any():
        return True, None
    i = int(neq.argmax())
    return False, f"row {i}: got {g.iloc[i]!r} want {e.iloc[i]!r}"


for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    if name in results:
        continue  # resumed from checkpoint
    r = {"rows_match": False, "schema_match": False, "hash_match": False,
         "spark_rows": None, "oracle_rows": None, "err": None}
    results[name] = r
    try:
        got = con.execute(f"select * from '{d}/*.parquet'").fetchdf()
    except Exception as e:
        r["err"] = f"spark output read: {e}"
        checkpoint()
        continue
    r["spark_rows"] = len(got)
    if name not in oracles:
        r["err"] = "no oracle (rows-only)"
        r["rows_match"] = len(got) > 0
        checkpoint()
        continue
    exp, err = run_with_timeout(oracles[name])
    if err:
        r["err"] = err
        checkpoint()
        continue
    r["oracle_rows"] = len(exp)
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    r["schema_match"] = list(got.columns) == list(exp.columns)
    r["rows_match"] = len(got) == len(exp)
    if r["schema_match"] and r["rows_match"]:
        ok = True
        for c in got.columns:
            eq, detail = cols_equal(got[c], exp[c])
            if not eq:
                ok = False
                r["err"] = f"col {c} {detail}"
                break
        r["hash_match"] = ok
    print(name, "OK" if r["hash_match"] or (r["err"] or "").startswith("no oracle")
          else f"FAIL {r['err']}", flush=True)
    checkpoint()

with open(jsonout, "w") as f:
    json.dump(results, f, indent=1)
if os.path.exists(partial):
    os.remove(partial)

n = len(results)
green = sum(1 for r in results.values()
            if r["hash_match"] or (r["err"] or "").startswith("no oracle"))
to = sum(1 for r in results.values() if r["err"] == "oracle timeout")
print(f"TOTAL {n} green {green} oracle-timeouts {to}")
