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


def table_stats(
    df: DataFrame, cols: list[str] | None = None, exact_ndv: bool = True
) -> DataFrame:
    """ANALYZE-style per-column table profile: row count, null count
    + fraction, distinct count, min and max
    (stringified so heterogeneous columns share a schema).  The
    statistics every planner / data-quality monitor wants before
    touching a new table (the reference's `/meta` exposes schema
    only; this is the value-level companion).

    ``exact_ndv=True`` keeps exact count_distinct, but each column's
    NDV runs as its OWN two-phase hash aggregation (partial-distinct
    per partition → tiny merge), unioned into a (col, ndv) side table
    that broadcast-joins back onto the unpivoted profile row.  A
    single agg carrying every count_distinct made Catalyst rewrite
    the pass through an Expand node (rows × (columns+1)
    intermediate) feeding a SortAggregate — a full sort of the
    expanded corpus; the split shape is all hash aggregation with no
    expansion (measured 2.7 s → 0.8 s on the 5-column orders profile
    at sf0.1, identical values).  At 100 TB set ``exact_ndv=False``:
    HLL ``approx_count_distinct`` is mergeable and collapses the NDV
    side back into the single profile aggregate.  Output: one row per
    column (deterministic column order); the driver never holds more
    than (#cols) rows."""
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
        if not exact_ndv:
            aggs.append(
                F.approx_count_distinct(F.col(c)).alias(f"__ndv_{c}")
            )
    one = df.agg(*aggs)
    if exact_ndv:
        ndvs = None
        for c in cols:
            a = df.agg(F.count_distinct(F.col(c)).alias("__ndv")).select(
                F.lit(c).alias("__ndv_col"), "__ndv"
            )
            ndvs = a if ndvs is None else ndvs.unionByName(a)
        stack = ", ".join(
            f"'{c}', __n_{c}, __nn_{c}, __mn_{c}, __mx_{c}" for c in cols
        )
        out = one.select(
            F.expr(
                f"stack({len(cols)}, {stack}) AS "
                "(col, n_rows, n_null, min_val, max_val)"
            )
        ).join(F.broadcast(ndvs), F.col("col") == F.col("__ndv_col"))
        ndv_col = F.col("__ndv")
    else:
        stack = ", ".join(
            f"'{c}', __n_{c}, __nn_{c}, __ndv_{c}, __mn_{c}, __mx_{c}"
            for c in cols
        )
        out = one.select(
            F.expr(
                f"stack({len(cols)}, {stack}) AS "
                "(col, n_rows, n_null, ndv, min_val, max_val)"
            )
        )
        ndv_col = F.col("ndv")
    return out.select(
        "col",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.round(F.col("n_null") / F.col("n_rows"), 6).alias("null_frac"),
        ndv_col.cast("long").alias("ndv"),
        "min_val",
        "max_val",
    )


def group_zscore(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Group-wise z-score standardization — the feature-engineering
    normalizer (per-segment anomaly scoring, per-language length
    normalization, …): z = (x − μ_g) / σ_g with the group's sample
    stddev; σ_g = 0 or a single-row group yields NULL (no information,
    not ±inf).

    ONE shuffle on the group key: both moments and the normalized
    value come from the same Window partitioning (Catalyst evaluates
    all three aggregates in a single Window node over one sort)."""
    # dict.fromkeys dedupes role overlaps (value_col repeated in
    # id_cols/group_cols would make F.col(value_col) ambiguous)
    keep = list(dict.fromkeys([*(id_cols or []), *group_cols, value_col]))
    out, names = append_zscore(
        df.select(*keep), F.col(value_col), [F.col(c) for c in group_cols]
    )
    return out.withColumnRenamed(names[0], "z")


def append_zscore(
    df: DataFrame,
    value: Column,
    groups: list[Column],
    prefix: str = "__zs_",
) -> tuple[DataFrame, list[str]]:
    """Append the group-wise z-score of ``value`` (expressions, not
    just physical columns) as ``{prefix}z`` — the kernel group_zscore
    and the zscore() flow method share.  Same single-Window contract:
    both moments and the normalized value come from one partitioning;
    σ_g = 0 or a single-row group yields NULL."""
    from pyspark.sql import Window

    w = Window.partitionBy(*groups)
    mu = F.avg(value).over(w)
    sd = F.stddev_samp(value).over(w)
    name = f"{prefix}z"
    return (
        df.withColumn(name, F.round(F.when(sd > 0, (value - mu) / sd), 6)),
        [name],
    )


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
