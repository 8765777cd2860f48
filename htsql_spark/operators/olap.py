"""OLAP grouping extensions: cube / rollup / grouping sets, and set
operations.

The reference has neither (SURVEY.md §3.1 "Set ops: absent", §3.2
"grouping sets, cube, rollup: absent") — these are checklist gaps
filled with Spark built-ins.  All are single-shuffle plans: Spark
expands cube/rollup/grouping-sets into one Expand + one Aggregate
(not N scans), which is exactly the 100 TB-safe shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cube_agg(df: DataFrame, dims: list[str], aggs: list[Column]) -> DataFrame:
    """GROUP BY CUBE(dims): every subset of dims, rolled-up levels
    NULL-filled (matches ANSI CUBE semantics)."""
    return df.cube(*dims).agg(*aggs)


def rollup_agg(df: DataFrame, dims: list[str], aggs: list[Column]) -> DataFrame:
    """GROUP BY ROLLUP(dims): hierarchical prefixes of dims."""
    return df.rollup(*dims).agg(*aggs)


def grouping_sets_agg(
    df: DataFrame, sets: list[list[str]], dims: list[str], aggs: list[Column]
) -> DataFrame:
    """GROUP BY GROUPING SETS(sets) over dims."""
    return df.groupingSets([[F.col(c) for c in s] for s in sets], *dims).agg(*aggs)


# ----------------------------------------------------------------------
# set operations (ANSI bag/set semantics; DISTINCT variants match the
# SQL UNION / INTERSECT / EXCEPT defaults)
# ----------------------------------------------------------------------
def union(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    u = a.unionByName(b)
    return u if all else u.distinct()


def intersect(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.intersectAll(b) if all else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.exceptAll(b) if all else a.subtract(b)


def equi_depth_histogram(
    df: DataFrame, col: str, buckets: int = 4
) -> DataFrame:
    """Equi-depth histogram: exact interpolated percentile boundaries
    (Spark's ``percentile`` — same type-7 linear interpolation as
    ANSI ``quantile_cont``, so a SQL oracle reproduces boundaries
    bit-for-bit) plus per-bucket counts.

    Two aggregations: boundaries + min/max come from ONE single-row
    agg (broadcast back), bucket assignment is a narrow counting
    expression (#boundaries < value), counts map-side combine.  The
    exact percentile sorts within groups at 100 TB — for a cheaper
    scan swap in ``approx_percentile`` (the GK sketch already in the
    aggregate registry) at identical plan shape.

    Returns (bucket, lo, hi, n): lo/hi are the bucket's value range
    endpoints (global min/max at the edges); ties land in the lower
    bucket (strict > counting) in both engines.  NULL values of
    ``col`` are excluded entirely — min/max/percentile already ignore
    them, and without the filter each NULL would land in bucket 0
    (every boundary comparison is NULL, so the filtered-array size is
    0), silently inflating the lowest bucket."""
    if buckets < 1:
        raise ValueError(f"equi_depth_histogram: buckets must be >= 1, got {buckets}")
    df = df.filter(F.col(col).isNotNull())
    qs = [i / buckets for i in range(1, buckets)]
    qlist = ", ".join(repr(q) for q in qs)
    bounds = df.agg(
        F.expr(
            f"percentile({col}, array({qlist}))" if qs else "array()"
        ).alias("__b"),
        F.min(col).alias("__lo"),
        F.max(col).alias("__hi"),
    )
    tagged = df.crossJoin(F.broadcast(bounds))
    idx = F.size(F.filter("__b", lambda b: F.col(col) > b))
    counts = (
        tagged.groupBy(idx.alias("bucket"), "__b", "__lo", "__hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    edges = F.concat(
        F.array(F.col("__lo")), F.col("__b"), F.array(F.col("__hi"))
    )
    return counts.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.round(F.element_at(edges, F.col("bucket") + 1), 4).alias("lo"),
        F.round(F.element_at(edges, F.col("bucket") + 2), 4).alias("hi"),
        "n",
    )
