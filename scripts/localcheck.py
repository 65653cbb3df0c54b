#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet per query, run the dumped oracle SQL in DuckDB over the fixture
tables, normalize (column-name sort), and compare values.

Usage: python3 scripts/localcheck.py <sfdir> <verify_outdir> [query ...]
"""
import sys, json, math, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

npass = nfail = nskip = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    pq = f"{outdir}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        print(f"MISS  {name}: no spark output")
        nfail += 1
        continue
    try:
        duck = con.sql(sql)
        dcols = [c.lower() for c in duck.columns]
        dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
        drows = [[norm(r[i]) for i in dorder] for r in duck.fetchall()]
    except Exception as e:
        print(f"ORA-ERR {name}: {e}")
        nfail += 1
        continue
    try:
        sp = con.sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
        scols = [c.lower() for c in sp.columns]
        sorder = sorted(range(len(scols)), key=lambda i: scols[i])
        srows = [[norm(r[i]) for i in sorder] for r in sp.fetchall()]
    except Exception as e:
        print(f"SPK-ERR {name}: {e}")
        nfail += 1
        continue
    if sorted(dcols) != sorted(scols):
        print(f"COLS  {name}: spark={sorted(scols)} duck={sorted(dcols)}")
        nfail += 1
        continue
    if srows == drows:
        npass += 1
        print(f"PASS  {name} ({len(srows)} rows)")
    else:
        nfail += 1
        # find first diff
        msg = f"len spark={len(srows)} duck={len(drows)}"
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                msg = f"row {i}: spark={a} duck={b}"
                break
        print(f"DIFF  {name}: {msg}")

print(f"\n{npass} pass, {nfail} fail")
