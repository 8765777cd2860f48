"""Ordered-mode regress corpus (reference: test/regress/input/
function.yaml + link.yaml + sort.yaml in the htsql 2.3.3 tree — YAML
cases whose EXACT ordered output is recorded and diffed).

Unlike tests/test_golden.py (order-insensitive, locks values), this
suite runs every case through ``HTSQL(..., ordered=True)`` and
compares row lists **in order** — exercising the reference's
total-order output contract end to end: scans in PK order, quotients
in kernel order, explicit sort decorations winning over both, nested
segments ordered inside their parent row.

Re-train after an intentional semantic change with::

    python tests/test_ordered_regress.py --train
"""

import math
import os
import sys

import pytest
import yaml

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ordered.yaml")

#: regress-style cases, translated from the reference suites' spirit
#: onto the fixture graph.  Each must be deterministic under
#: ordered=True (total order: PK / kernel / explicit sort keys).
QUERIES = [
    # --- link.yaml spirit: navigation in PK order -----------------
    "/region",
    "/nation?region.name='ASIA'",
    "/customer{c_name, nat := nation.name, reg := nation.region.name}?c_custkey < 8",
    "/nation.customer{c_name}?nation.name='NATION_2' & c_acctbal > 8000",
    "/nation{name, nc := count(customer), rich := count(customer?c_acctbal > 5000)}"
    "?region.name='AFRICA'",
    "/region{name, /nation{nname := name}}",
    # --- sort.yaml spirit: explicit order wins --------------------
    "/customer.sort(c_acctbal-).limit(5){c_name, bal := c_acctbal}",
    "/customer.sort(c_mktsegment, c_acctbal-).limit(6)"
    "{seg := c_mktsegment, bal := c_acctbal}",
    "/orders.sort(o_totalprice-).limit(5){okey := o_orderkey, tot := o_totalprice}",
    "/nation.sort(name-).limit(3){name}",
    "/nation{name, /customer.sort(c_acctbal-).limit(2){c_name}}?region.name='ASIA'",
    # --- distinct/quotient: kernel order --------------------------
    "/customer^{seg := c_mktsegment}{seg, n := count(^)}",
    "/orders^{st := o_orderstatus}"
    "{st, n := count(^), tot := round(sum(^.o_totalprice), 2)}",
    "/lineitem?l_orderkey < 300^{rf := l_returnflag, ls := l_linestatus}"
    "{rf, ls, qty := sum(^.l_quantity)}",
    # --- function.yaml spirit: scalar families in row order -------
    "/region{name, up := upper(name), lo := lower(name), ln := length(name)}",
    "/region{name, h := head(name, 3), t := tail(name, 2), s := slice(name, 1, 3),"
    " r := replace(name, 'A', '@')}",
    "/customer{c_custkey, b := round(c_acctbal / 7, 2), pos := c_acctbal > 0,"
    " lab := if(c_acctbal < 0, 'neg', 'pos')}?c_custkey < 6",
    "/orders{okey := o_orderkey, y := year(o_orderdate), m := month(o_orderdate),"
    " d := day(o_orderdate)}?o_orderkey < 12",
    "/customer{c_custkey, z := null_if(c_mktsegment, 'BUILDING'),"
    " nz := if_null(null_if(c_mktsegment, 'BUILDING'), '?')}?c_custkey < 6",
    "/nation{name}?contains(name, '1')",
    # --- locator / identity / home scope --------------------------
    "/region['ASIA']",
    "/nation{name, lid := text(id())}?n_nationkey < 4",
    "/{n := count(customer), mx := max(customer.c_acctbal),"
    " seg := count(customer^{c_mktsegment})}",
    # --- detach / define / given -----------------------------------
    "/nation{name, frac := round(count(customer) / count(@customer), 4)}"
    "?region.name='ASIA'",
    "/nation.define(rich := customer?c_acctbal > 9000)"
    "{name, nrich := count(rich)}?region.name='EUROPE'",
    "/nation{name}?given($n := count(customer), $n > 7)",
    # --- wildcard ---------------------------------------------------
    "/region{*}",
    # --- round-6 breadth: offset, expression sort keys, per-parent top
    "/customer.sort(c_acctbal-).limit(3, 2){c_name, bal := c_acctbal}",
    "/customer.sort(length(c_name), c_acctbal).limit(3){c_name, bal := c_acctbal}",
    "/nation{name, /customer.sort(c_acctbal-).top(2){c_name, bal := c_acctbal}}"
    "?n_nationkey = 0",
    # --- round-8 language bridge: explicit sort on operator-appended
    # attributes wins the order contract like any column
    "/documents.entropy().sort(entropy-).limit(3){doc_id, entropy}",
    "/documents.dedup_exact().sort(doc_id).limit(2){doc_id}",
    "/documents.stats().sort(stats_quality-).limit(3){doc_id, q := stats_quality}",
    "/events.sessionize(45).sort(user_id, session_id).limit(4)"
    "{user_id, event_id, session_id}",
    # --- round-9 reshaping methods: implicit KERNEL order, like
    # quotients (the projection-scope parity of the reference's
    # always-ordered contract)
    "/events.funnel('view','click','purchase')",
    "/events.transitions()?n>=45",
    "/documents.heavy_hitters(lang, 0.15)",
    # --- round-10/11 reshapes: the streaming-family flow methods and
    # the sketch freq() carry the same implicit KERNEL order; asof()
    # is an APPENDER, so the flow keeps its PK order
    "/events.tumbling('1 day')?n>11",
    "/events.sliding('2 days', '1 day')?n>75",
    "/events.sessions('30 minutes')?n>2",
    "/events.anomalies(2.2)",
    "/events.freq(event_type)",
    "/(orders?o_orderstatus='F').hist(o_totalprice, 5)",
    "/(events?event_type='purchase')"
    ".asof(events?event_type='click', user_id, ts, event_id)"
    "{event_id, asof_event_id}?event_id<200",
    # --- round-12: within() interval join — a reshape, so implicit
    # KERNEL order (on, l_ts, l_payload, r_ts, r_payload)
    "/(events?event_type='purchase').within(events?event_type='click',"
    " user_id, ts, event_id, event_id, '24 hours')?user_id<5",
    # --- round-12: multi-expression quantiles — kernel order
    # (groups, attr, n, err, pXX)
    "/lineitem.quantiles({l_quantity, price := l_extendedprice},"
    " 0.5, l_returnflag)",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        return int(r) if r == int(r) else r
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if v is None or isinstance(v, (bool, int, str)):
        return v
    return str(v)  # dates, decimals, …


@pytest.fixture(scope="module")
def odb(spark):
    from htsql_spark import HTSQL
    from tests.conftest import SF_DIR

    return HTSQL(spark, SF_DIR, ordered=True)


def _run(odb, query):
    # NO sorting — the recorded order IS the contract under ordered=True
    return [_norm(r) for r in odb.produce(query)]


def _load():
    with open(GOLDEN) as f:
        return yaml.safe_load(f)


CASES = _load() if os.path.exists(GOLDEN) else []


def test_ordered_corpus_covers_all_queries():
    assert [c["q"] for c in CASES] == QUERIES, (
        "golden out of sync — retrain: python tests/test_ordered_regress.py --train"
    )


@pytest.mark.parametrize("case", CASES, ids=[c["q"][:60] for c in CASES])
def test_ordered_regress(odb, case):
    got = _run(odb, case["q"])
    assert got == case["rows"], case["q"]


def train() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from htsql_spark import HTSQL, get_spark
    from tests.conftest import SF_DIR

    spark = get_spark("ordered-train", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    odb = HTSQL(spark, SF_DIR, ordered=True)
    cases = [{"q": q, "rows": _run(odb, q)} for q in QUERIES]
    with open(GOLDEN, "w") as f:
        yaml.safe_dump(cases, f, sort_keys=False, allow_unicode=True, width=100)
    print(f"trained {len(cases)} ordered cases -> {GOLDEN}")
    spark.stop()


if __name__ == "__main__":
    if "--train" in sys.argv:
        train()
    else:
        print(__doc__)
