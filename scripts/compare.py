#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and strictly compare to the Verify
parquet dumps (columns sorted by name, values compared exactly)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for qname, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{qname}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {qname}: no spark output"); fails += 1; continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {qname}: duckdb error {e}"); fails += 1; continue
    sdf = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
    odf = odf.reindex(sorted(odf.columns), axis=1)
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    if list(odf.columns) != list(sdf.columns):
        print(f"FAIL {qname}: cols oracle={list(odf.columns)} spark={list(sdf.columns)}")
        fails += 1; continue
    if len(odf) != len(sdf):
        print(f"FAIL {qname}: rows oracle={len(odf)} spark={len(sdf)}")
        fails += 1; continue
    # exact value compare, row by row in given order
    bad = None
    for c in odf.columns:
        a, b = odf[c], sdf[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                av, bv = a.to_numpy(dtype=float), b.to_numpy(dtype=float)
                neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
            else:
                neq = ~((a == b) | (a.isna() & b.isna()))
        except Exception as e:
            print(f"FAIL {qname}: col {c} compare error {e} (o={a.dtype} s={b.dtype})")
            bad = c; break
        import numpy as np
        neq = np.asarray(neq)
        if neq.any():
            i = int(neq.nonzero()[0][0])
            print(f"FAIL {qname}: col {c} differs at row {i}: oracle={a.iloc[i]!r} spark={b.iloc[i]!r}")
            bad = c; break
    if bad:
        fails += 1
    else:
        print(f"PASS {qname} ({len(odf)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
