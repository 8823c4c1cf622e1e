#!/usr/bin/env python3
"""Strict driver-mimic correctness check, stricter than selfcheck.py.

The round driver reads Spark's Verify parquet and the DuckDB oracle
result through pandas and compares with a dtype-sensitive hash. Two
artifact classes pass selfcheck.py (9-dp float rounding, repr compare)
but fail the driver:
  1. DuckDB sum(int) -> HUGEINT -> pandas float64 vs Spark int64
  2. array/struct output columns crash pandas sort_values
This script reproduces the driver's view: pandas sort over all columns
(catches 2), int-vs-float dtype clashes (catches 1), then astype(str)
value equality. int32/int64 and datetime ns/us differences are allowed,
matching observed driver behavior.

Usage: python3 tools/strictcheck.py [sfdir] [outdir]   (expects a prior
`sbt "runMain graft.Verify <sfdir> <outdir>"` or selfcheck.py run)
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

bad = 0
dump_dirs = {os.path.basename(d) for d in glob.glob(f"{outdir}/q*")}
# a query that crashed in Verify leaves no dump at all — that's a FAIL,
# not a silent skip (the real driver would fail it)
for name in sorted(oracle.keys() - dump_dirs):
    print(f"FAIL {name}: oracle declared but no Verify dump (query crashed?)")
    bad += 1
for d in sorted(glob.glob(f"{outdir}/q*")):
    name = os.path.basename(d)
    parts = glob.glob(f"{d}/*.parquet")
    if not parts:
        print(f"FAIL {name}: dump dir has no parquet parts")
        bad += 1
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in parts], ignore_index=True)
    cols = sorted(sdf.columns)
    try:
        sdf2 = sdf[cols].sort_values(cols).reset_index(drop=True)
    except Exception as e:  # unsortable column (arrays/structs)
        print(f"FAIL {name}: driver sort would crash: {str(e)[:120]}")
        bad += 1
        continue
    if name not in oracle:
        print(f"ok   {name} (rows-only, {len(sdf)} rows, sortable)")
        continue
    ddf = con.execute(oracle[name]).df()
    if sorted(ddf.columns) != cols:
        print(f"FAIL {name}: columns {cols} vs {sorted(ddf.columns)}")
        bad += 1
        continue
    ddf2 = ddf[cols].sort_values(cols).reset_index(drop=True)
    clash = [c for c in cols
             if str(sdf2[c].dtype) != str(ddf2[c].dtype)
             and 'float64' in (str(sdf2[c].dtype), str(ddf2[c].dtype))
             and {'int64', 'int32'} & {str(sdf2[c].dtype), str(ddf2[c].dtype)}]
    if clash:
        print(f"FAIL {name}: int-vs-float dtype clash on {clash} "
              "(HUGEINT in the oracle? add a BIGINT cast)")
        bad += 1
        continue
    diff = None
    for c in cols:
        a, b = sdf2[c].astype(str).values, ddf2[c].astype(str).values
        if len(a) != len(b) or (a != b).any():
            diff = c
            break
    if diff:
        print(f"FAIL {name}: values differ on column {diff}")
        bad += 1
    else:
        print(f"ok   {name} ({len(sdf2)} rows)")

print(f"\n{'CLEAN' if not bad else f'{bad} FAILURES'} under strict driver-mimic compare")
sys.exit(1 if bad else 0)
