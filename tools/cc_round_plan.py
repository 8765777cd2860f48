#!/usr/bin/env python
"""Dump the physical plan of ONE connected-components round —
``_small_star(_large_star(E))`` over a lineage-severed edge table —
for the r13 star shape vs the r14 fused shape (plans/r14/
cc_round_{before,after}.txt).  The terminal lang_cluster /
op_dedup_clusters plans cannot show this: the iteration runs eagerly
behind per-round localCheckpoint severs, so the committed evidence
for the star restructure is this per-round dump.

The r13 shape is inlined verbatim from the r13 code (git 64c08be,
dedup.py _large_star/_small_star); the r14 shape calls the LIVE
``dedup._cc_large_star``/``_cc_small_star`` the iteration runs.

Usage: python tools/cc_round_plan.py
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def dump(df, name):
    # execute FIRST (collect runs the DataFrame's own QueryExecution)
    # so the dump is the FINAL adaptive plan — exchange reuse is an
    # AQE runtime decision and a pre-execution dump cannot show the
    # ReusedExchange nodes the round actually runs with
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(HERE, "plans", "r14", f"{name}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print("wrote", path)


def r13_round(F, E):
    sym = E.union(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    ls = (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    d = ls.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m2 = (
        d.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    dm = d.join(m2, "u")
    return (
        dm.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m2.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def r14_round(F, E):
    from htsql_spark.operators import dedup

    return dedup._cc_small_star(dedup._cc_large_star(E))


def main() -> None:
    from pyspark.sql import functions as F

    from htsql_spark import get_spark

    spark = get_spark("htsql-spark-ccplan")
    spark.sparkContext.setLogLevel("ERROR")
    # a severed edge table, exactly like the loop's per-round input
    E = (
        spark.range(2000)
        .select(
            F.col("id").alias("u"),
            F.pmod(F.col("id") * F.lit(37) + F.lit(11), F.lit(2000)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .localCheckpoint()
    )
    # bench regime: default conf — AQE broadcasts the per-node min
    # table while it is small
    dump(r13_round(F, E), "cc_round_before")
    dump(r14_round(F, E), "cc_round_after")
    # 100 TB regime: the min table has one row per node — far past
    # any broadcast threshold — so the joins go shuffle-side and the
    # single-exchange co-partitioning is what pays
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dump(r13_round(F, E), "cc_round_before_nobroadcast")
        dump(r14_round(F, E), "cc_round_after_nobroadcast")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


if __name__ == "__main__":
    main()
