#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
scale factor, then run each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, values rounded).

Usage: python3 scripts/check.py [sfdir] [outdir] [--skip-verify]
                                [--isolate] [--mem=24GB] [--qtimeout=300]

--isolate runs every oracle SQL in a FRESH DuckDB connection with a
memory cap and a per-query timeout. Use it for large scale factors
(sf1+): a few oracles are deliberately quadratic twins (exact ANN,
pair enumeration) that are feasible at sf0.01 but not at sf1 — without
isolation one of those OOMs the shared connection and poisons every
query after it. Timeouts/OOMs are reported as INFEASIBLE, not FAIL.
"""
import json, math, subprocess, sys, threading
from pathlib import Path

import duckdb
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
ISOLATE = "--isolate" in sys.argv
MEM = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--mem=")),
           "24GB")
QTIMEOUT = float(next((a.split("=", 1)[1] for a in sys.argv
                       if a.startswith("--qtimeout=")), "300"))
SF = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
OUT = args[1] if len(args) > 1 else "/tmp/verify_out"
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        ONLY = set(a[len("--only="):].split(","))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-verify" not in sys.argv:
    flt = f" {','.join(sorted(ONLY))}" if ONLY else ""
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}{flt}'],
        capture_output=True, text=True, cwd="/root/repo")
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
    if r.returncode != 0:
        print(tail); sys.exit(1)

def fresh_con():
    c = duckdb.connect()
    if ISOLATE:
        c.execute(f"SET memory_limit='{MEM}'")
        Path("/root/repo/.tmp/duckspill").mkdir(parents=True,
                                                exist_ok=True)
        c.execute("SET temp_directory='/root/repo/.tmp/duckspill'")
    for t in TABLES:
        p = Path(SF) / f"{t}.parquet"
        if p.is_dir():
            # Spark-written parquet (MakeScale sf1 fixtures) is a directory
            # of part files; glob it for DuckDB
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif p.exists():
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c

def run_sql(c, sql):
    """Run one oracle; under --isolate, interrupt it past QTIMEOUT."""
    if not ISOLATE:
        return c.sql(sql).df()
    timer = threading.Timer(QTIMEOUT, c.interrupt)
    timer.start()
    try:
        return c.sql(sql).df()
    finally:
        timer.cancel()

con = None if ISOLATE else fresh_con()

oracle = json.loads(Path(OUT, "oracle_sql.json").read_text())
if ONLY:
    oracle = {k: v for k, v in oracle.items() if k in ONLY}
n_pass = n_fail = n_infeasible = 0
for name, sql in sorted(oracle.items()):
    c = fresh_con() if ISOLATE else con
    try:
        exp = run_sql(c, sql)
        got = pd.read_parquet(Path(OUT) / name)
    except (duckdb.OutOfMemoryException, duckdb.InterruptException) as e:
        if not ISOLATE:
            # without isolation this is a hard FAIL: the shared
            # connection is now poisoned and the query went unverified
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        print(f"INFEASIBLE {name}: {type(e).__name__} "
              f"(oracle SQL too heavy at this sf; Spark side did run)")
        n_infeasible += 1
        continue
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        n_fail += 1
        continue
    finally:
        if ISOLATE:
            try:
                c.close()
            except Exception:
                pass
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    status, detail = "PASS", ""
    if list(exp.columns) != list(got.columns):
        status, detail = "FAIL", f"cols exp={list(exp.columns)} got={list(got.columns)}"
    elif len(exp) != len(got):
        status, detail = "FAIL", f"rows exp={len(exp)} got={len(got)}"
    else:
        exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        got = got.sort_values(list(got.columns)).reset_index(drop=True)
        for colname in exp.columns:
            e, g = exp[colname], got[colname]
            # the driver hashes exact values: int64 8570 vs float64 8570.0
            # mismatch, so flag any dtype-kind difference (duckdb returns
            # HUGEINT->float64 for integer SUM unless ::BIGINT-cast)
            if e.dtype.kind != g.dtype.kind:
                status, detail = "FAIL", (
                    f"col {colname} dtype kind exp={e.dtype} got={g.dtype}")
                break
            if e.dtype.kind in "fc" or g.dtype.kind in "fc":
                bad = ~((e.isna() & g.isna()) |
                        (abs(e.astype(float) - g.astype(float)) <= 1e-9))
                if bad.any():
                    i = bad.idxmax()
                    status, detail = "FAIL", f"col {colname} row {i}: exp={e[i]} got={g[i]}"
                    break
            else:
                if not e.astype(str).equals(g.astype(str)):
                    i = (e.astype(str) != g.astype(str)).idxmax()
                    status, detail = "FAIL", f"col {colname} row {i}: exp={e[i]!r} got={g[i]!r}"
                    break
    if status == "PASS":
        n_pass += 1
    else:
        n_fail += 1
    print(f"{status} {name} {detail}", flush=True)
print(f"\n{n_pass} passed, {n_fail} failed, {n_infeasible} infeasible "
      f"/ {len(oracle)} total")
sys.exit(1 if n_fail else 0)
