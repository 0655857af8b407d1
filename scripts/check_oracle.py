#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query result dumped
by graft.Verify (outDir/<name>/ parquet + outDir/oracle_sql.json), run the
oracle SQL in DuckDB over the same sf tables and compare (sorted columns,
sorted rows, exact values). Usage:
    python3 scripts/check_oracle.py <outDir> [sfDir]
Local tooling only — not part of the shipped library.
"""
import json, math, sys
from pathlib import Path

import duckdb

outdir = Path(sys.argv[1])
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracles = json.loads((outdir / "oracle_sql.json").read_text())

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [c for _, c in sorted(zip(range(len(cols)), cols), key=lambda p: cols[p[0]])], out

fail = 0
for name, sql in sorted(oracles.items()):
    qdir = outdir / name
    if not qdir.exists():
        print(f"FAIL {name}: no result dir (query crashed in Verify)")
        fail += 1
        continue
    got_rel = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
    got_cols = [d[0] for d in got_rel.description]
    got = got_rel.fetchall()
    try:
        exp_rel = con.execute(sql)
        exp_cols = [d[0] for d in exp_rel.description]
        exp = exp_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fail += 1
        continue
    gc, g = canon(got, got_cols)
    ec, e = canon(exp, exp_cols)
    if gc != ec:
        print(f"FAIL {name}: column mismatch spark={gc} duckdb={ec}")
        fail += 1
        continue
    if len(g) != len(e):
        print(f"FAIL {name}: row count spark={len(g)} duckdb={len(e)}")
        fail += 1
        continue
    bad = None
    for i, (a, b) in enumerate(zip(g, e)):
        if a != b:
            # tolerate float ulp noise only to REPORT it distinctly; the
            # driver may be exact, so any float diff is still a failure here
            bad = (i, a, b)
            break
    if bad:
        i, a, b = bad
        print(f"FAIL {name}: first row diff at {i}:\n  spark : {a}\n  duckdb: {b}")
        fail += 1
    else:
        print(f"OK   {name}: {len(g)} rows")

sys.exit(1 if fail else 0)
