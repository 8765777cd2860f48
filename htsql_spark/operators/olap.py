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
