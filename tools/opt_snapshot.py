#!/usr/bin/env python
"""Optimization-round safety net: bit-exact result snapshots.

Captures each named registry query's full result (sorted rows, raw
float repr — NO rounding) at one or more scale factors to a pickle,
or compares the current tree's results against an existing snapshot.
Used to prove "optimization changed the plan, not the values" before
committing — stronger than the oracle replay's 6-decimal tolerance,
and exactly the invariant the driver's value hash checks.

Usage:
    python tools/opt_snapshot.py capture out.pkl q1 [q2...]
    python tools/opt_snapshot.py compare out.pkl q1 [q2...]

SFs: sf0.001, sf0.01 by default; add sf0.1 via SNAP_SF=all.
"""

from __future__ import annotations

import os
import pickle
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
if os.environ.get("SNAP_SF") == "all":
    SFS.append("/root/testdata/sf0.1")


def _rows(df):
    pdf = df.toPandas()
    cols = list(pdf.columns)
    recs = [tuple(r) for r in pdf.itertuples(index=False)]
    return cols, sorted(map(repr, recs))


def main() -> None:
    mode, path, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    import __spark_entry__ as entry_mod
    from htsql_spark import get_spark

    spark = get_spark("htsql-spark-snap")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    if mode == "capture":
        snap = {}
        for sf in SFS:
            for n in names:
                spark.catalog.clearCache()
                snap[(sf, n)] = _rows(qs[n](spark, sf))
                print(f"captured {n} @ {sf}: {len(snap[(sf, n)][1])} rows",
                      file=sys.stderr)
        with open(path, "wb") as fh:
            pickle.dump(snap, fh)
        return

    with open(path, "rb") as fh:
        snap = pickle.load(fh)
    bad = []
    for sf in SFS:
        for n in names:
            if (sf, n) not in snap:
                print(f"SKIP {n} @ {sf}: not in snapshot", file=sys.stderr)
                continue
            spark.catalog.clearCache()
            cols, rows = _rows(qs[n](spark, sf))
            ecols, erows = snap[(sf, n)]
            if cols != ecols or rows != erows:
                bad.append((sf, n))
                diff = [
                    (g, e) for g, e in zip(rows, erows) if g != e
                ][:3] if len(rows) == len(erows) else [
                    ("rowcount", (len(rows), len(erows)))
                ]
                print(f"MISMATCH {n} @ {sf}: {diff}", file=sys.stderr)
            else:
                print(f"ok {n} @ {sf} ({len(rows)} rows)", file=sys.stderr)
    if bad:
        raise SystemExit(f"MISMATCHES: {bad}")
    print("ALL IDENTICAL")


if __name__ == "__main__":
    main()
