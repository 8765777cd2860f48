#!/usr/bin/env python
"""50-slot driver-gate simulation: run the FIRST 50 __spark_entry__
.queries() entries against their oracle_sql() on DuckDB at sf0.01 and
compare sorted normalized tuples — the same comparison shape the
driver's CORRECTNESS gate records.  Run from the repo root after ANY
_GATE_ORDER edit (the round contract: never ship a rotation without a
green 50/50 sim).

Usage: python tools/gate_sim.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datetime, decimal, json, sys
import duckdb
import __spark_entry__ as e
from htsql_spark import get_spark

SF = "/root/testdata/sf0.01"
s = get_spark("gatesim", cpus=8)
s.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
qs, osql = e.queries(), e.oracle_sql()
gate = list(qs.keys())[:50]

def norm(v):
    if isinstance(v, bool): return v
    if isinstance(v, float): return round(v, 6)
    if isinstance(v, decimal.Decimal): return round(float(v), 6)
    if isinstance(v, (datetime.datetime, datetime.date)): return str(v)
    if isinstance(v, list): return tuple(norm(x) for x in v)
    if isinstance(v, dict): return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

bad = []
for k in gate:
    try:
        df = qs[k](s, SF)
        cols = sorted(df.columns)
        got = sorted((tuple(norm(r[c]) for c in cols) for r in df.collect()), key=repr)
        if k not in osql:
            print(f"{k}: rows-only ({len(got)})", flush=True)
            continue
        cur = con.execute(osql[k])
        ocols = [d[0] for d in cur.description]
        if sorted(ocols) != cols:
            bad.append(k); print(f"{k}: SCHEMA MISMATCH {cols} vs {sorted(ocols)}", flush=True); continue
        idx = [ocols.index(c) for c in cols]
        exp = sorted((tuple(norm(row[i]) for i in idx) for row in cur.fetchall()), key=repr)
        ok = got == exp
        if not ok: bad.append(k)
        print(f"{k}: rows {len(got)}/{len(exp)} match={ok}", flush=True)
    except Exception as ex:
        bad.append(k)
        print(f"{k}: ERROR {type(ex).__name__}: {str(ex)[:120]}", flush=True)
print("FAILED:", bad, flush=True)
sys.exit(1 if bad else 0)
