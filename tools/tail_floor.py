#!/usr/bin/env python
"""Round-14 item #9 (r13 verdict): where does the sub-second tail's
~0.2 s per-row floor go?

Decomposes a handful of trivially-cheap registry rows (scan,
selection, fn_if, op_grouping_sets) into:
  - build_s:   Python DataFrame construction (entry fn call)
  - plan_s:    analysis+optimization+physical planning (explainString)
  - exec_s:    the noop-sink action itself (includes AQE re-planning
               and job/stage/task scheduling)
and then, inside exec, contrasts a 32-task shuffle row against a
1-task shape to expose pure task-scheduling cost, plus an A/B of
spark.sql.adaptive.coalescePartitions.initialPartitionNum via a
second session.  Methodology: warm run first, median of 5 (these
rows are fixed-cost dominated so more samples, cheaper each).
Never writes BENCH.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import CPUS, SF_DIR  # noqa: E402

ROWS = ["scan", "selection", "fn_if", "op_grouping_sets", "agg_minmax", "lang_tumbling"]


def _decompose(spark, fn, n=5):
    builds, plans, execs = [], [], []
    # warm
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        builds.append(t1 - t0)
        plans.append(t2 - t1)
        execs.append(t3 - t2)
    med = lambda xs: round(statistics.median(xs), 4)  # noqa: E731
    return {"build_s": med(builds), "plan_s": med(plans), "exec_s": med(execs)}


def main() -> None:
    import __spark_entry__ as entry_mod
    from htsql_spark import get_spark

    spark = get_spark("htsql-spark-tail", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    qs["scan"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    out = {}
    for name in ROWS:
        out[name] = _decompose(spark, qs[name])
        print(json.dumps({name: out[name]}), flush=True)

    # pure scheduling probe: an empty-ish 1-task action vs a 32-task
    # round-trip through one exchange, no data to speak of
    import pyspark.sql.functions as F

    one = spark.range(1)
    shuf = spark.range(32).repartition(32, "id").agg(F.count("*"))
    for label, df in (("1task_range", one), ("32task_shuffle", shuf)):
        df.write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(
            json.dumps({label: round(statistics.median(ts), 4)}), flush=True
        )


if __name__ == "__main__":
    main()
