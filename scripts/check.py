#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
scale factor, then run each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, values rounded).

Usage: python3 scripts/check.py [sfdir] [outdir] [--skip-verify]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--only=")
        and a != "--skip-verify"]
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

con = duckdb.connect()
for t in TABLES:
    p = Path(SF) / f"{t}.parquet"
    if p.is_dir():
        # Spark-written parquet (MakeScale sf1 fixtures) is a directory
        # of part files; glob it for DuckDB
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif p.exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.loads(Path(OUT, "oracle_sql.json").read_text())
if ONLY:
    oracle = {k: v for k, v in oracle.items() if k in ONLY}
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got = pd.read_parquet(Path(OUT) / name)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        n_fail += 1
        continue
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
        for c in exp.columns:
            e, g = exp[c], got[c]
            # the driver hashes exact values: int64 8570 vs float64 8570.0
            # mismatch, so flag any dtype-kind difference (duckdb returns
            # HUGEINT->float64 for integer SUM unless ::BIGINT-cast)
            if e.dtype.kind != g.dtype.kind:
                status, detail = "FAIL", (
                    f"col {c} dtype kind exp={e.dtype} got={g.dtype}")
                break
            if e.dtype.kind in "fc" or g.dtype.kind in "fc":
                bad = ~((e.isna() & g.isna()) |
                        (abs(e.astype(float) - g.astype(float)) <= 1e-9))
                if bad.any():
                    i = bad.idxmax()
                    status, detail = "FAIL", f"col {c} row {i}: exp={e[i]} got={g[i]}"
                    break
            else:
                if not e.astype(str).equals(g.astype(str)):
                    i = (e.astype(str) != g.astype(str)).idxmax()
                    status, detail = "FAIL", f"col {c} row {i}: exp={e[i]!r} got={g[i]!r}"
                    break
    if status == "PASS":
        n_pass += 1
    else:
        n_fail += 1
    print(f"{status} {name} {detail}")
print(f"\n{n_pass} passed, {n_fail} failed / {len(oracle)} total")
sys.exit(1 if n_fail else 0)
