#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: for each query dir in
the Verify output, run the oracle SQL in DuckDB against the sfDir parquet
tables, sort columns by name, sort rows, and compare values."""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-vout"

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = f.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracles.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        bad.append((name, f"oracle SQL failed: {e}"))
        continue
    got = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{out_dir}/{name}/*.parquet")])
    ec = sorted(exp.columns); gc = sorted(got.columns)
    if ec != gc:
        bad.append((name, f"schema mismatch: oracle={ec} got={gc}"))
        continue
    exp = exp[ec].sort_values(ec).reset_index(drop=True)
    got = got[ec].sort_values(ec).reset_index(drop=True)
    if len(exp) != len(got):
        bad.append((name, f"row count: oracle={len(exp)} got={len(got)}"))
        continue
    mismatch = None
    for c in ec:
        a, b = exp[c], got[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            eqs = [(x == y) or (isinstance(x, float) and isinstance(y, float)
                   and (math.isnan(x) and math.isnan(y) or abs(x - y) < 1e-9))
                   for x, y in zip(a.tolist(), b.tolist())]
            if not all(eqs):
                i = eqs.index(False)
                mismatch = f"col {c} row {i}: oracle={a.iloc[i]} got={b.iloc[i]}"
                break
        else:
            if not (a.astype(object) == b.astype(object)).all():
                i = (a.astype(object) != b.astype(object)).idxmax()
                mismatch = f"col {c} row {i}: oracle={a.iloc[i]!r} got={b.iloc[i]!r}"
                break
    if mismatch:
        bad.append((name, mismatch))
    else:
        ok.append((name, len(exp)))

for name, n in ok:
    print(f"OK    {name} ({n} rows)")
for name, why in bad:
    print(f"FAIL  {name}: {why}")
rows_only = [d.split('/')[-1] for d in sorted(glob.glob(f"{out_dir}/*"))
             if '.' not in d.split('/')[-1] and d.split('/')[-1] not in oracles]
print(f"\n{len(ok)} ok, {len(bad)} fail, rows-only: {rows_only}")
sys.exit(1 if bad else 0)
