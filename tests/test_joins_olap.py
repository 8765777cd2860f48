"""Extended joins (as-of / range / theta) and OLAP grouping / set ops
— semantics locked on tiny constructed frames with hand-computed
answers, plus fixture-level invariants."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny(spark):
    ts = lambda s: dt.datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01 10:00:00")),
            (2, 10, ts("2024-01-01 12:00:00")),
            (3, 20, ts("2024-01-01 09:00:00")),
        ],
        "pid long, k long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (100, 10, ts("2024-01-01 09:30:00")),
            (101, 10, ts("2024-01-01 11:00:00")),
            (102, 20, ts("2024-01-01 09:30:00")),  # after left's only row
        ],
        "rid long, k long, ts timestamp_ntz",
    )
    return left, right


def test_asof_backward(tiny):
    from htsql_spark.operators.joins import asof_join

    left, right = tiny
    out = asof_join(left, right, on="k", right_cols=["rid"])
    got = {r["pid"]: r["rid"] for r in out.collect()}
    assert got == {1: 100, 2: 101, 3: None}


def test_asof_tolerance(tiny):
    from htsql_spark.operators.joins import asof_join

    left, right = tiny
    out = asof_join(left, right, on="k", right_cols=["rid"], tolerance="45 minutes")
    got = {r["pid"]: r["rid"] for r in out.collect()}
    # pid=1 matched rid=100 at 30 min back (within), pid=2's match is
    # 60 min back (outside tolerance)
    assert got == {1: 100, 2: None, 3: None}


def test_asof_same_instant_matches(spark):
    from htsql_spark.operators.joins import asof_join

    t = dt.datetime(2024, 1, 1, 10, 0, 0)
    left = spark.createDataFrame([(1, 5, t)], "pid long, k long, ts timestamp_ntz")
    right = spark.createDataFrame([(9, 5, t)], "rid long, k long, ts timestamp_ntz")
    out = asof_join(left, right, on="k", right_cols=["rid"]).collect()
    assert out[0]["rid"] == 9


def test_theta_band_partition(db):
    """Every customer lands in exactly one half-open band."""
    from htsql_spark.operators.joins import customers_banded

    cust = db.table("customer")
    banded = customers_banded(cust)
    assert banded.count() == cust.count()
    assert banded.select("custkey").distinct().count() == cust.count()


def test_range_join_counts(db, duck):
    from htsql_spark.operators.joins import purchase_clicks_within

    got = sorted(
        (r["event_id"], r["n_clicks"])
        for r in purchase_clicks_within(db.table("events")).collect()
    )
    exp = sorted(
        (r[0], r[1])
        for r in duck.execute(
            "SELECT p.event_id, count(c.ts) FROM"
            " (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase') p"
            " LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type='click') c"
            " ON c.user_id = p.user_id AND c.ts <= p.ts"
            " AND c.ts >= p.ts - INTERVAL 24 HOURS"
            " GROUP BY p.event_id"
        ).fetchall()
    )
    assert got == exp


def test_cube_group_counts(db):
    """cube(a, b) emits |a×b obs| + |a| + |b| + 1 grouping rows."""
    from htsql_spark.operators.olap import cube_agg

    cust = db.table("customer")
    out = cube_agg(cust, ["c_mktsegment", "c_nationkey"], [F.count(F.lit(1)).alias("n")])
    n_ab = cust.select("c_mktsegment", "c_nationkey").distinct().count()
    n_a = cust.select("c_mktsegment").distinct().count()
    n_b = cust.select("c_nationkey").distinct().count()
    assert out.count() == n_ab + n_a + n_b + 1
    # grand total row carries the full count
    total = out.filter(F.col("c_mktsegment").isNull() & F.col("c_nationkey").isNull())
    assert total.collect()[0]["n"] == cust.count()


def test_rollup_is_prefix_hierarchy(db):
    from htsql_spark.operators.olap import rollup_agg

    orders = db.table("orders")
    out = rollup_agg(
        orders, ["o_orderstatus", "o_orderpriority"], [F.count(F.lit(1)).alias("n")]
    )
    # no (NULL, status) rows — rollup only rolls up from the right
    bad = out.filter(
        F.col("o_orderstatus").isNull() & F.col("o_orderpriority").isNotNull()
    )
    assert bad.count() == 0


def test_set_ops(spark):
    from htsql_spark.operators import olap

    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "x long")
    b = spark.createDataFrame([(2,), (3,), (4,)], "x long")
    assert sorted(r["x"] for r in olap.union(a, b).collect()) == [1, 2, 3, 4]
    assert sorted(r["x"] for r in olap.intersect(a, b).collect()) == [2, 3]
    assert sorted(r["x"] for r in olap.except_(a, b).collect()) == [1]
    assert sorted(r["x"] for r in olap.union(a, b, all=True).collect()) == [
        1, 2, 2, 2, 3, 3, 4,
    ]


def test_session_window_matches_gaps_and_islands(db, duck):
    from htsql_spark.streaming import session_counts

    got = sorted(
        (r["user_id"], str(r["s_start"]), str(r["s_end"]), r["n"])
        for r in session_counts(db.table("events"), gap="30 minutes").collect()
    )
    exp = sorted(
        (r[0], str(r[1]), str(r[2]), r[3])
        for r in duck.execute(
            "WITH marked AS (SELECT user_id, ts,"
            " CASE WHEN lag(ts) OVER w IS NULL"
            "  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS news"
            " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
            " grp AS (SELECT *, sum(news) OVER (PARTITION BY user_id ORDER BY ts,"
            "  news DESC ROWS UNBOUNDED PRECEDING) AS sid FROM marked)"
            " SELECT user_id, min(ts), max(ts) + INTERVAL 30 MINUTES, count(*)"
            " FROM grp GROUP BY user_id, sid"
        ).fetchall()
    )
    assert got == exp


def test_asof_plan_has_no_inequality_join(db):
    """The 100 TB contract: as-of must plan as window-over-union, not
    a nested-loop/inequality join."""
    from htsql_spark.operators.joins import purchases_asof_clicks

    plan = (
        purchases_asof_clicks(db.table("events"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_salted_agg_matches_plain(db):
    from htsql_spark.operators.skew import salted_agg

    li = db.table("lineitem")
    plain = {
        r["l_returnflag"]: (round(r["s"], 4), r["c"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (round(r["s"], 4), r["c"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            partials=[F.sum("l_quantity").alias("ps"), F.count(F.lit(1)).alias("pc")],
            finals=[F.sum("ps").alias("s"), F.sum("pc").alias("c")],
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(db):
    from htsql_spark.operators.skew import salted_join

    cust = db.table("customer").select("c_custkey", "c_nationkey")
    nat = db.table("nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    plain = sorted(
        (r["c_custkey"], r["n_name"]) for r in cust.join(nat, "c_nationkey").collect()
    )
    salted = sorted(
        (r["c_custkey"], r["n_name"])
        for r in salted_join(cust, nat, on="c_nationkey").collect()
    )
    assert salted == plain


def test_write_partitioned_layout(db, spark, tmp_path):
    from htsql_spark.operators.layout import write_partitioned

    out = str(tmp_path / "by_seg")
    write_partitioned(db.table("customer"), out, ["c_mktsegment"])
    import glob

    dirs = glob.glob(out + "/c_mktsegment=*")
    assert len(dirs) == 5
    # dense layout: one file per directory
    for d in dirs:
        assert len(glob.glob(d + "/*.parquet")) == 1
    back = spark.read.parquet(out)
    assert back.count() == db.table("customer").count()
    # partition pruning: a predicate on the partition column reaches
    # the scan as a PartitionFilter (directories pruned, not read)
    sel = back.filter(F.col("c_mktsegment") == "BUILDING")
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(c_mktsegment" in plan, plan


def test_write_clustered_skips_files(db, spark, tmp_path):
    from htsql_spark.operators.layout import write_clustered

    out = str(tmp_path / "clustered")
    write_clustered(db.table("orders"), out, ["o_totalprice"], n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == db.table("orders").count()
    # disjoint ranges → a selective filter scans fewer rows than total
    sel = back.filter(F.col("o_totalprice") > 400000)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan


def test_write_bucketed_join_no_shuffle(db, spark, tmp_path):
    """Two tables bucketed on the join key join with ZERO Exchange —
    the co-located fact-fact join that replaces a dual shuffle at
    100 TB."""
    from htsql_spark.operators.layout import write_bucketed

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(db.table("orders"), "b_orders", ["o_orderkey"], n_buckets=8)
        write_bucketed(
            db.table("lineitem"), "b_lineitem", ["l_orderkey"], n_buckets=8
        )
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # inner join: one group per order that has lineitems
        expected = db.table("lineitem").select("l_orderkey").distinct().count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_asof_forward_and_nearest(spark):
    """direction='forward' matches the earliest right at/after left;
    'nearest' picks the closer side with backward winning ties."""
    from htsql_spark.operators.joins import asof_join

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    left = spark.createDataFrame(
        [(1, 5, ts(0)), (2, 5, ts(100))], "pid long, k long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(10, 5, ts(-30)), (20, 5, ts(40)), (30, 5, ts(170))],
        "rid long, k long, ts timestamp_ntz",
    )
    fwd = {r["pid"]: r["rid"] for r in asof_join(
        left, right, on="k", right_cols=["rid"], direction="forward").collect()}
    assert fwd == {1: 20, 2: 30}  # earliest right at/after each left
    near = {r["pid"]: r["rid"] for r in asof_join(
        left, right, on="k", right_cols=["rid"], direction="nearest").collect()}
    # pid1: back 30 min (rid 10) vs fwd 40 min (rid 20) → backward
    # pid2: back 60 min (rid 20) vs fwd 70 min (rid 30) → backward
    assert near == {1: 10, 2: 20}
    # equidistant tie prefers backward
    left2 = spark.createDataFrame([(9, 5, ts(5))], "pid long, k long, ts timestamp_ntz")
    right2 = spark.createDataFrame(
        [(1, 5, ts(0)), (2, 5, ts(10))], "rid long, k long, ts timestamp_ntz"
    )
    tie = asof_join(left2, right2, on="k", right_cols=["rid"], direction="nearest")
    assert tie.collect()[0]["rid"] == 1
    import pytest as _p

    with _p.raises(ValueError):
        asof_join(left, right, on="k", direction="sideways")


def test_asof_tolerance_calendar_backward(spark):
    """Calendar-varying tolerances measure each direction with its own
    calendar length from the left anchor: from Mar 31, '1 month' back
    reaches Feb 29 (31 days in a 2024 leap year), while the forward
    month is only 30 days (Apr 30).  A backward match 31 days out must
    pass; a forward match 31 days out must fail."""
    import datetime as dt

    from htsql_spark.operators.joins import asof_join

    anchor = dt.datetime(2024, 3, 31, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 7, anchor)], "pid long, k long, ts timestamp_ntz"
    )
    # exactly 31 days back = Feb 29 12:00 (== anchor - INTERVAL 1 MONTH)
    back31 = spark.createDataFrame(
        [(100, 7, anchor - dt.timedelta(days=31))],
        "rid long, k long, ts timestamp_ntz",
    )
    got = asof_join(
        left, back31, on="k", right_cols=["rid"], tolerance="1 month"
    ).collect()
    assert got[0]["rid"] == 100  # inside the 31-day backward month

    # exactly 31 days forward = May 1 12:00 > Apr 30 12:00 → outside
    fwd31 = spark.createDataFrame(
        [(200, 7, anchor + dt.timedelta(days=31))],
        "rid long, k long, ts timestamp_ntz",
    )
    got = asof_join(
        left, fwd31, on="k", right_cols=["rid"],
        tolerance="1 month", direction="forward",
    ).collect()
    assert got[0]["rid"] is None
    # 30 days forward = Apr 30 12:00 → exactly on the bound, inside
    fwd30 = spark.createDataFrame(
        [(201, 7, anchor + dt.timedelta(days=30))],
        "rid long, k long, ts timestamp_ntz",
    )
    got = asof_join(
        left, fwd30, on="k", right_cols=["rid"],
        tolerance="1 month", direction="forward",
    ).collect()
    assert got[0]["rid"] == 201


def test_salted_join_hot_matches_plain(db):
    """Selective salting ≡ plain inner join under planted skew."""
    from pyspark.sql import functions as F

    from htsql_spark.operators.skew import salted_join_hot

    ev = db.table("events")
    # plant a hot user: replicate one user's rows 20x under new ids
    hot_rows = ev.filter("user_id = 1")
    big = ev
    for i in range(20):
        big = big.unionByName(
            hot_rows.withColumn("event_id", F.col("event_id") + 100000 * (i + 1))
        )
    dim = ev.select("user_id").distinct().withColumn(
        "tag", F.md5(F.col("user_id").cast("string"))
    )
    got = sorted(
        (r["event_id"], r["tag"])
        for r in salted_join_hot(big, dim, "user_id", min_freq=0.05).collect()
    )
    exp = sorted(
        (r["event_id"], r["tag"]) for r in big.join(dim, "user_id").collect()
    )
    assert got == exp


def test_salted_join_hot_detects_planted_key(spark):
    """The hot set is the exact frequent-key set: only the planted key
    gets salted (verified via the detector it delegates to)."""
    from pyspark.sql import functions as F

    from htsql_spark.operators.sketches import heavy_hitters

    rows = [(i, 1 if i % 4 == 0 else i) for i in range(4000)]
    big = spark.createDataFrame(rows, "id long, k long")
    hh = {r["k"] for r in heavy_hitters(big.select("k"), "k", 0.1).collect()}
    assert hh == {"1"} or hh == {1}


def test_salted_join_hot_rejects_outer(spark):
    import pytest as _pytest

    from htsql_spark.operators.skew import salted_join_hot

    df = spark.range(2).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError, match="inner"):
        salted_join_hot(df, df, "k", how="left")


def test_equi_depth_histogram_properties(db):
    """Buckets tile [min, max], counts sum to the row count, and the
    depth is balanced within interpolation ties."""
    from htsql_spark.operators.olap import equi_depth_histogram

    li = db.table("lineitem")
    total = li.count()
    rows = sorted(
        map(tuple, equi_depth_histogram(li, "l_extendedprice", 5).collect())
    )
    assert len(rows) == 5
    assert sum(r[3] for r in rows) == total
    # contiguous edges
    for (b1, lo1, hi1, _), (b2, lo2, hi2, _) in zip(rows, rows[1:]):
        assert b2 == b1 + 1 and lo2 == hi1
    # balanced to within 2% of ideal depth (exact boundaries)
    ideal = total / 5
    assert all(abs(r[3] - ideal) <= max(2, 0.02 * total) for r in rows)


def test_equi_depth_histogram_single_bucket(db):
    from htsql_spark.operators.olap import equi_depth_histogram

    li = db.table("lineitem")
    rows = equi_depth_histogram(li, "l_quantity", 1).collect()
    assert len(rows) == 1 and rows[0]["n"] == li.count()


def test_equi_depth_histogram_excludes_nulls(spark):
    """NULL values must not inflate bucket 0 (every boundary
    comparison on NULL is NULL, so the unfiltered count landed them
    there); the bucket counts over a column with NULLs equal the
    counts over the same column pre-filtered."""
    from pyspark.sql import functions as F

    from htsql_spark.operators.olap import equi_depth_histogram

    vals = spark.range(100).select(
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id").cast("double"))
        .alias("x")
    )
    got = sorted(map(tuple, equi_depth_histogram(vals, "x", 4).collect()))
    clean = vals.filter("x IS NOT NULL")
    exp = sorted(map(tuple, equi_depth_histogram(clean, "x", 4).collect()))
    assert got == exp
    assert sum(r[-1] for r in got) == 90


def test_asof_null_timestamps_never_match(spark):
    """A NULL right ts can never be 'latest <= ts' (it would otherwise
    sort NULLS FIRST and become the phantom predecessor); a NULL left
    ts comes back unmatched rather than matched arbitrarily."""
    import datetime as dt

    from htsql_spark.operators.joins import asof_join

    ts = lambda s: dt.datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01 10:00:00")), (2, 10, None)],
        "pid long, k long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(100, 10, None), (101, 10, ts("2024-01-01 11:00:00"))],
        "rid long, k long, ts timestamp_ntz",
    )
    got = {r["pid"]: r["rid"] for r in asof_join(
        left, right, on="k", right_cols=["rid"]).collect()}
    # pid 1 has no real predecessor (rid 101 is later; rid 100 is
    # null-ts) and pid 2 has no timestamp at all
    assert got == {1: None, 2: None}
    fwd = {r["pid"]: r["rid"] for r in asof_join(
        left, right, on="k", right_cols=["rid"], direction="forward").collect()}
    assert fwd == {1: 101, 2: None}


def test_asof_equal_ts_ties_deterministic(spark):
    """Several right rows sharing (key, ts): the match is a pure
    function of the payload (max xxhash64), identical across runs and
    physical row orders."""
    import datetime as dt

    from htsql_spark.operators.joins import asof_join

    t = dt.datetime.fromisoformat("2024-01-01 10:00:00")
    left = spark.createDataFrame(
        [(1, 10, dt.datetime.fromisoformat("2024-01-01 11:00:00"))],
        "pid long, k long, ts timestamp_ntz",
    )
    rows = [(100, 10, t), (101, 10, t), (102, 10, t)]
    a = spark.createDataFrame(rows, "rid long, k long, ts timestamp_ntz")
    b = spark.createDataFrame(rows[::-1], "rid long, k long, ts timestamp_ntz").repartition(3)
    pick = lambda r: asof_join(left, r, on="k", right_cols=["rid"]).collect()[0]["rid"]
    assert pick(a) == pick(b)


def test_asof_nearest_per_side_tolerance(spark):
    """'nearest' applies the tolerance PER SIDE before selection: when
    the nearer candidate fails its bound, a within-tolerance match on
    the other side wins instead of being discarded."""
    import datetime as dt

    from htsql_spark.operators.joins import asof_join

    ts = lambda s: dt.datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01 12:00:00"))], "pid long, k long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [
            (100, 10, ts("2024-01-01 10:30:00")),  # 90 min back (nearer)
            (101, 10, ts("2024-01-01 13:40:00")),  # 100 min forward
        ],
        "rid long, k long, ts timestamp_ntz",
    )
    got = asof_join(
        left, right, on="k", right_cols=["rid"],
        direction="nearest", tolerance="105 minutes",
    ).collect()[0]["rid"]
    assert got == 100  # both in tolerance: nearest wins
    got = asof_join(
        left, right, on="k", right_cols=["rid"],
        direction="nearest", tolerance="85 minutes",
    ).collect()[0]["rid"]
    assert got is None  # neither in tolerance
    right2 = spark.createDataFrame(
        [
            (100, 10, ts("2024-01-01 10:00:00")),  # 120 min back (nearer? no: 120)
            (101, 10, ts("2024-01-01 13:45:00")),  # 105 min forward — nearer AND in tol
        ],
        "rid long, k long, ts timestamp_ntz",
    )
    got = asof_join(
        left, right2, on="k", right_cols=["rid"],
        direction="nearest", tolerance="110 minutes",
    ).collect()[0]["rid"]
    assert got == 101
    # the finding's shape: the NEARER side fails its bound, the other
    # side is within its bound — the valid match must be returned
    right3 = spark.createDataFrame(
        [
            (100, 10, ts("2024-01-01 10:30:00")),  # 90 min back, nearer
            (101, 10, ts("2024-01-01 13:35:00")),  # 95 min forward
        ],
        "rid long, k long, ts timestamp_ntz",
    )
    got = asof_join(
        left, right3, on="k", right_cols=["rid"],
        direction="nearest", tolerance="89 minutes",
    ).collect()[0]["rid"]
    assert got is None
    got = asof_join(
        left.withColumn("ts", F.col("ts")), right3, on="k", right_cols=["rid"],
        direction="nearest", tolerance="92 minutes",
    ).collect()[0]["rid"]
    # backward (90m) within 92m — nearest still backward
    assert got == 100


def test_asof_explicit_empty_right_cols(spark, tiny):
    """right_cols=[] means 'just the matched timestamp', not 'all
    right columns' (the falsy-default trap)."""
    from htsql_spark.operators.joins import asof_join

    left, right = tiny
    out = asof_join(left, right, on="k", right_cols=[])
    assert out.columns == [*left.columns, "r_ts"]


def test_range_join_multi_bucket_covers_straddle(spark):
    """A range pair straddling a bucket boundary is found when the
    left side supplies the covered bucket list [b-1, b, b+1] — with a
    single bucket column the pair is silently lost."""
    import datetime as dt

    from htsql_spark.operators.joins import range_join

    ts = lambda s: dt.datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:01:00"))], "lid long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(2, ts("2024-01-01 09:58:00"))], "rid long, ts timestamp_ntz"
    )
    cond = (
        F.abs(
            F.col("l.ts").cast("timestamp").cast("double")
            - F.col("r.ts").cast("timestamp").cast("double")
        )
        <= 300
    )
    l, r = left.alias("l"), right.alias("r")
    hour = lambda side: F.date_trunc("hour", F.col(f"{side}.ts")).cast("timestamp").cast("long")
    single = range_join(l, r, cond, bucket=(hour("l"), hour("r"), "__b"))
    assert single.count() == 0  # the straddle loss, kept as documentation
    multi = range_join(
        l, r, cond,
        bucket=([hour("l") - 3600, hour("l"), hour("l") + 3600], hour("r"), "__b"),
    )
    assert [(x["lid"], x["rid"]) for x in multi.collect()] == [(1, 2)]


def test_range_join_multi_bucket_rejects_outer(spark):
    """The multi-bucket candidate-list path explodes the left side
    once per bucket; an outer join would null-pad every replica
    (len(buckets) duplicates per unmatched row) — it must refuse
    loudly rather than return duplicated rows."""
    import pytest as _pytest

    from htsql_spark.operators.joins import range_join

    l = spark.range(5).withColumnRenamed("id", "a")
    r = spark.range(5).withColumnRenamed("id", "b")
    cond = F.abs(F.col("a") - F.col("b")) <= 1
    with _pytest.raises(ValueError, match="inner"):
        range_join(
            l,
            r,
            cond,
            bucket=([F.col("a") - 1, F.col("a")], F.col("b"), "__bk"),
            how="left",
        )
