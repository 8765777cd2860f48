#!/usr/bin/env python
"""Dump explain("formatted") for INNER optimization-relevant stages
that terminal query plans hide behind localCheckpoint/parquet-sever
boundaries (the scoring join of the n-gram dedup, one connected-
components round, the simhash signature projection).

Usage: python tools/opt_stage_plans.py <tag>   # tag = before|after
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

TAG = sys.argv[1]


def dump(df, name):
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(HERE, "plans", "r13", f"{name}_{TAG}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print("wrote", path)


def main() -> None:
    from pyspark.sql import functions as F

    from htsql_spark import get_spark
    from htsql_spark.operators import dedup

    spark = get_spark("htsql-spark-stageplans")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    # n-gram pair scoring stage (pre-checkpoint subtree): build the
    # same shape as _ngram_scored_pairs but WITHOUT the lineage-cut
    # pins so the whole stage is visible in one plan
    d = dedup._ngram_pruned(docs, 3, 200)
    if TAG != "before":
        d = d.withColumn("__gn", F.size("g"))
    l, r = d.alias("l"), d.alias("r")
    pairs = l.join(
        r,
        (F.col("l.lang") == F.col("r.lang"))
        & (F.col("l.lbucket") == F.col("r.lbucket"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    )
    if TAG == "before":
        jac = dedup.jaccard(F.col("l.g"), F.col("r.g"))
        scored = pairs.select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.round(jac, 6).alias("jaccard"),
        )
    else:
        scored = pairs.select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.size(F.array_intersect(F.col("l.g"), F.col("r.g"))).alias("__i"),
            (F.col("l.__gn") + F.col("r.__gn")).alias("__s"),
        )
    dump(scored, "ngram_scoring_stage")

    # simhash signature projection
    dump(dedup.simhash_signatures(docs), "simhash_signature_stage")

    # one connected-components round over a tiny edge set: shows the
    # per-round plan INCLUDING the convergence probe the loop runs
    E = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "u long, v long"
    )
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
    dump(ls, "cc_large_star_round")


if __name__ == "__main__":
    main()
