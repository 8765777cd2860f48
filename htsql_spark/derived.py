"""Derived catalog tables: tables with no backing file, built as
DataFrame plans from other catalog tables.

The driver fixture ships no ``partsupp`` (TPC-H's part↔supplier
bridge), which blocked the faithful Q2/Q11/Q16/Q20 shapes.  Rather
than synthesizing parquet (the fixture dirs are read-only), partsupp
is *derived* deterministically from ``part`` × ``supplier`` with pure
integer arithmetic that a DuckDB oracle reproduces verbatim — so
every query over it stays value-checked.

Derivation (0-based contiguous keys, S = |supplier|):

* 4 suppliers per part (TPC-H's fan-out):
  ``ps_suppkey = (p_partkey + i·max(1, S÷4)) mod S`` for i ∈ 0..3 —
  the stride spreads a part's suppliers across the key space, and the
  four values are distinct whenever S ≥ 4 (dbgen's supplier-rotation
  idea; the exact dbgen formula needs 1-based keys).
* ``ps_availqty  = (p_partkey·31 + ps_suppkey·17) mod 9999 + 1``
* ``ps_supplycost = ((p_partkey·131 + ps_suppkey·29) mod 99900
  + 100) / 100.0`` — 1.00 … 999.99, two decimals, bit-identical in
  any engine computing the same integer expression then dividing.

Scale posture: the build is one narrow projection over ``part`` with
a 4-row explode plus a 1-row broadcast of count(supplier) — no
shuffle, no driver-side collect; at 100 TB it pipelines into
whatever consumes it.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from .engine import HTSQL


def build_partsupp(eng: "HTSQL") -> DataFrame:
    part = eng.table("part").select("p_partkey")
    n_supp = F.broadcast(eng.table("supplier").agg(F.count("*").alias("__S")))
    base = part.crossJoin(n_supp).select(
        "p_partkey",
        "__S",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("__i"),
    )
    stride = F.greatest(F.lit(1), F.floor(F.col("__S") / 4)).cast("long")
    sk = (F.col("p_partkey") + F.col("__i") * stride) % F.col("__S")
    keys = base.select(
        F.col("p_partkey").alias("ps_partkey"),
        sk.cast("long").alias("ps_suppkey"),
    )
    return keys.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        (
            ((F.col("ps_partkey") * 131 + F.col("ps_suppkey") * 29) % 99900 + 100)
            / 100.0
        ).alias("ps_supplycost"),
    )


BUILDERS: dict[str, Callable[["HTSQL"], DataFrame]] = {
    "partsupp": build_partsupp,
}

#: the same derivation as ANSI SQL CTEs — prepend to any oracle query
#: that references partsupp (the driver's DuckDB session registers
#: only the file-backed fixture tables as views)
PARTSUPP_ORACLE_CTE = """
WITH __ps0 AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + t.i * greatest(1, (SELECT count(*) FROM supplier) // 4))
           % (SELECT count(*) FROM supplier) AS ps_suppkey
  FROM part, (SELECT unnest([0, 1, 2, 3]) AS i) t
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST((ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1 AS INTEGER)
           AS ps_availqty,
         CAST((ps_partkey * 131 + ps_suppkey * 29) % 99900 + 100 AS DOUBLE)
           / 100.0 AS ps_supplycost
  FROM __ps0
)
"""
