#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (rows sorted,
columns sorted by name, values hashed). Usage: check.py <sfdir> <outdir>"""
import sys, json, duckdb, glob, os
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        exp = con.sql(sql).df()
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            fail += 1; continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        if len(gs) != len(es):
            print(f"FAIL {name}: rows {len(gs)} vs {len(es)}")
            fail += 1; continue
        # normalize dtypes for compare
        import numpy as np
        mismatch = False
        for c in gs.columns:
            a, b = gs[c], es[c]
            try:
                if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                    if not np.allclose(a.fillna(-1e300).astype(float), b.fillna(-1e300).astype(float), rtol=0, atol=1e-9, equal_nan=True):
                        mismatch = True; break
                else:
                    if not (a.astype(str).values == b.astype(str).values).all():
                        mismatch = True; break
            except Exception as e:
                print(f"  cmp error col {c}: {e}"); mismatch = True; break
        if mismatch:
            print(f"FAIL {name}: value mismatch in column {c}")
            d = pd.concat([a.rename('got'), b.rename('exp')], axis=1)
            print(d[d['got'].astype(str) != d['exp'].astype(str)].head(5))
            fail += 1
        else:
            print(f"ok   {name} ({len(gs)} rows)")
            ok += 1
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
        fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
