#!/usr/bin/env python
"""Optimization-round helper: re-measure a subset of registry
queries with bench.py's exact methodology (warm + median-of-3 through
the noop sink, cache cleared between queries) and/or dump
``explain("formatted")`` to plans/r13/.

Usage:
    python tools/opt_measure.py [--explain before|after] name [name...]

Never writes BENCH.json — this is the in-round iteration loop; the
committed numbers stay bench.py's.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import CPUS, SF_DIR, _measure  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    explain_tag = None
    if args and args[0] == "--explain":
        explain_tag = args[1]
        args = args[2:]
    import __spark_entry__ as entry_mod
    from htsql_spark import get_spark

    spark = get_spark("htsql-spark-opt", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    unknown = [n for n in args if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    qs["scan"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    out: dict[str, float] = {}
    for name in args:
        spark.catalog.clearCache()
        if explain_tag:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(HERE, "plans", os.environ.get("PLANS_ROUND", "r14"), f"{name}_{explain_tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path}", file=sys.stderr)
            spark.catalog.clearCache()
        if os.environ.get("OPT_NO_MEASURE"):
            continue
        spark.sparkContext.setJobDescription(f"opt13:{name}")
        out[name] = _measure(spark, qs[name])
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
