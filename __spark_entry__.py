"""Driver contract for the spark-graft builder (PySpark target).

Every ``queries()`` entry routes through the htsql_spark engine (the
HTSQL-style language front-end compiled to DataFrame plans) unless
noted; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for the
driver's t2 correctness gate.  Column names and types are aligned on
both sides (aggregate aliases, explicit casts where DuckDB and Spark
default types differ).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_DBS: dict = {}


def _db(spark: SparkSession, sf_dir: str):
    from htsql_spark import HTSQL

    key = (id(spark), sf_dir)
    if key not in _DBS:
        _DBS[key] = HTSQL(spark, sf_dir)
    return _DBS[key]


def _q(text: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _db(spark, sf_dir).df(text)

    run.__doc__ = text
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: navigational correlated count (scan + FK navigation +
    sieve + grouped-join aggregate), sf0.001."""
    return _db(spark, "/root/testdata/sf0.001").df(
        "/nation{name, count(customer) :as cnt}?region.name='ASIA'"
    )


# ----------------------------------------------------------------------
# queries: operator inventory coverage (SURVEY.md §2 / §3.1-3.3)
# ----------------------------------------------------------------------
_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # F1 root scan
    "scan": _q("/region"),
    # F5 selection + computed expressions
    "selection": _q(
        "/customer{name := c_name, seg := lower(c_mktsegment), bal2 := c_acctbal * 2}"
    ),
    # F4 sieve with boolean connectives
    "sieve": _q(
        "/orders{okey := o_orderkey, tot := o_totalprice}"
        "?o_orderstatus='F' & o_totalprice > 100000"
    ),
    # F2 singular navigation (FK chains)
    "nav_singular": _q(
        "/customer{name := c_name, nat := nation.name, reg := nation.region.name}"
    ),
    # F3 plural navigation as flow
    "nav_plural": _q("/nation.customer?nation.region.name='ASIA'"),
    # F10 correlated aggregates (count/sum over plural link)
    "agg_flagship": _q("/nation{name, count(customer) :as cnt}?region.name='ASIA'"),
    "agg_sum_count": _q(
        "/customer{name := c_name, total := sum(orders.o_totalprice),"
        " cnt := count(orders)}"
    ),
    "agg_minmax": _q(
        "/nation{name, mn := min(customer.c_acctbal), mx := max(customer.c_acctbal),"
        " av := avg(customer.c_acctbal)}"
    ),
    # F10 multi-hop plural aggregate + exists
    "agg_exists": _q(
        "/customer{name := c_name, has := exists(orders.lineitem), "
        "nli := count(orders.lineitem)}"
    ),
    # F7 quotient (projection) + F8 complement
    "quotient": _q(
        "/customer^{seg := c_mktsegment}"
        "{seg, n := count(^), avgbal := avg(^.c_acctbal)}"
    ),
    # F15 fork (correlated comparison against global aggregate)
    "fork": _q("/customer{name := c_name}?c_acctbal > avg(fork().c_acctbal)"),
    # F14 detach (@): share of a global count
    "detach": _q("/nation{name, share := count(customer) / count(@customer)}"),
    # F9+F11 sort & limit/offset
    "sort_limit": _q("/orders.sort(o_totalprice-).limit(10){okey := o_orderkey, tot := o_totalprice}"),
    # F12 locator with composite identity
    "locator": _q("/lineitem[1.3]{l_orderkey, l_linenumber, l_quantity}"),
    # F18 define/given + references
    "define": _q(
        "/customer.define(big := c_acctbal > 5000){name := c_name, big := if(big, 1, 0)}?big"
    ),
    # §3.3 text functions
    "fn_text": _q(
        "/customer{name := upper(c_name), l := length(c_name), h := head(c_name, 3),"
        " t := tail(c_name, 2), r := replace(c_name, 'Customer', 'C')}"
    ),
    # §3.3 date functions
    "fn_date": _q(
        "/orders{okey := o_orderkey, yr := year(o_orderdate), mo := month(o_orderdate),"
        " dy := day(o_orderdate)}?year(o_orderdate) = 1995"
    ),
    # §3.3 conditionals
    "fn_if": _q(
        "/customer{name := c_name,"
        " tier := if(c_acctbal > 5000, 'high', c_acctbal > 0, 'mid', 'low')}"
    ),
    # §3.3 set membership
    "in_set": _q("/customer{name := c_name}?c_mktsegment = {'AUTOMOBILE', 'BUILDING'}"),
    # §3.3 null handling
    "fn_null": _q(
        "/customer{name := c_name, nb := if_null(null_if(c_mktsegment, 'BUILDING'), 'X')}"
    ),
    # events + JSON props column (beyond-reference scalar funcs)
    "events_json": _q(
        "/events{eid := event_id, k := integer(json_get(props, 'k'))}"
        "?event_type = 'purchase'"
    ),
    # F17 nested segment (list-of-records output) — no SQL oracle;
    # rows-only check (driver's weaker path)
    "nested_segment": _q(
        "/region{name, /nation{nname := name}}"
    ),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return {
        "scan": "SELECT * FROM region",
        "selection": (
            "SELECT c_name AS name, lower(c_mktsegment) AS seg,"
            " c_acctbal * 2 AS bal2 FROM customer"
        ),
        "sieve": (
            "SELECT o_orderkey AS okey, o_totalprice AS tot FROM orders"
            " WHERE o_orderstatus = 'F' AND o_totalprice > 100000"
        ),
        "nav_singular": (
            "SELECT c_name AS name, n_name AS nat, r_name AS reg"
            " FROM customer"
            " LEFT JOIN nation ON c_nationkey = n_nationkey"
            " LEFT JOIN region ON n_regionkey = r_regionkey"
        ),
        "nav_plural": (
            "SELECT c.* FROM nation n JOIN customer c ON c_nationkey = n_nationkey"
            " JOIN region r ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'"
        ),
        "agg_flagship": (
            "SELECT n_name AS name, count(c_custkey) AS cnt"
            " FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey"
            " JOIN region ON n_regionkey = r_regionkey"
            " WHERE r_name = 'ASIA' GROUP BY n_name"
        ),
        "agg_sum_count": (
            "SELECT c_name AS name, sum(o_totalprice) AS total,"
            " count(o_orderkey) AS cnt"
            " FROM customer LEFT JOIN orders ON o_custkey = c_custkey"
            " GROUP BY c_custkey, c_name"
        ),
        "agg_minmax": (
            "SELECT n_name AS name, min(c_acctbal) AS mn, max(c_acctbal) AS mx,"
            " avg(c_acctbal) AS av"
            " FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey"
            " GROUP BY n_nationkey, n_name"
        ),
        "agg_exists": (
            "SELECT c_name AS name,"
            " coalesce((SELECT count(*) FROM orders JOIN lineitem ON l_orderkey = o_orderkey"
            "   WHERE o_custkey = c_custkey) > 0, FALSE) AS has,"
            " coalesce((SELECT count(*) FROM orders JOIN lineitem ON l_orderkey = o_orderkey"
            "   WHERE o_custkey = c_custkey), 0) AS nli"
            " FROM customer"
        ),
        "quotient": (
            "SELECT c_mktsegment AS seg, count(*) AS n, avg(c_acctbal) AS avgbal"
            " FROM customer GROUP BY c_mktsegment"
        ),
        "fork": (
            "SELECT c_name AS name FROM customer"
            " WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)"
        ),
        "detach": (
            "SELECT n_name AS name,"
            " count(c_custkey) / (SELECT count(*) FROM customer) AS share"
            " FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey"
            " GROUP BY n_nationkey, n_name"
        ),
        "sort_limit": (
            "SELECT o_orderkey AS okey, o_totalprice AS tot FROM orders"
            " ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "locator": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"
            " WHERE l_orderkey = 1 AND l_linenumber = 3"
        ),
        "define": (
            "SELECT c_name AS name, CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END AS big"
            " FROM customer WHERE c_acctbal > 5000"
        ),
        "fn_text": (
            "SELECT upper(c_name) AS name, CAST(length(c_name) AS INTEGER) AS l,"
            " substr(c_name, 1, 3) AS h, substr(c_name, length(c_name) - 1, 2) AS t,"
            " replace(c_name, 'Customer', 'C') AS r FROM customer"
        ),
        "fn_date": (
            "SELECT o_orderkey AS okey, CAST(year(o_orderdate) AS INTEGER) AS yr,"
            " CAST(month(o_orderdate) AS INTEGER) AS mo,"
            " CAST(day(o_orderdate) AS INTEGER) AS dy"
            " FROM orders WHERE year(o_orderdate) = 1995"
        ),
        "fn_if": (
            "SELECT c_name AS name,"
            " CASE WHEN c_acctbal > 5000 THEN 'high'"
            " WHEN c_acctbal > 0 THEN 'mid' ELSE 'low' END AS tier FROM customer"
        ),
        "in_set": (
            "SELECT c_name AS name FROM customer"
            " WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')"
        ),
        "fn_null": (
            "SELECT c_name AS name,"
            " coalesce(nullif(c_mktsegment, 'BUILDING'), 'X') AS nb FROM customer"
        ),
        "events_json": (
            "SELECT event_id AS eid,"
            " CAST(json_extract_string(props, '$.k') AS BIGINT) AS k"
            " FROM events WHERE event_type = 'purchase'"
        ),
        # nested_segment: intentionally omitted (non-flat output;
        # driver records the weaker rows-only check)
    }
