"""Property-based oracle fuzzing: random expression / predicate /
aggregate queries are generated as (HTSQL text, equivalent SQL) pairs
from one tree and executed on both engines — any semantic drift in the
compiler (coercion, null handling, operator precedence, aggregate
lowering) surfaces as a value mismatch.

The reference locks semantics with a hand-written golden corpus
(test/regress/); hypothesis gives the same lock with adversarial
coverage of the expression grammar.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

# -- expression generator ----------------------------------------------
# each node is (htsql_text, sql_text); both sides derive from the same
# random tree so the only degree of freedom is engine semantics

NUM_COLS = [("c_acctbal", "c_acctbal"), ("c_custkey", "c_custkey")]
TEXT_COLS = [("c_name", "c_name"), ("c_mktsegment", "c_mktsegment")]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]


def _num_atom():
    return st.one_of(
        st.sampled_from(NUM_COLS),
        st.integers(min_value=-1000, max_value=1000).map(lambda v: (str(v), str(v))),
    )


def _num_expr(depth=2):
    if depth == 0:
        return _num_atom()
    sub = _num_expr(depth - 1)
    binop = st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
        lambda t: (f"({t[0][0]} {t[1]} {t[2][0]})", f"({t[0][1]} {t[1]} {t[2][1]})")
    )
    absfn = sub.map(lambda a: (f"abs({a[0]})", f"abs({a[1]})"))
    return st.one_of(_num_atom(), binop, absfn)


def _predicate(depth=2):
    ne = _num_expr(1)
    cmp_ = st.tuples(ne, st.sampled_from(["<", "<=", ">", ">=", "=", "!="]), ne).map(
        lambda t: (
            f"({t[0][0]} {t[1]} {t[2][0]})",
            f"({t[0][1]} {'=' if t[1] == '=' else ('<>' if t[1] == '!=' else t[1])} {t[2][1]})",
        )
    )
    seg = st.sampled_from(SEGMENTS).map(
        lambda v: (f"(c_mktsegment = '{v}')", f"(c_mktsegment = '{v}')")
    )
    if depth == 0:
        return st.one_of(cmp_, seg)
    sub = _predicate(depth - 1)
    conj = st.tuples(sub, st.sampled_from(["&", "|"]), sub).map(
        lambda t: (
            f"({t[0][0]} {t[1]} {t[2][0]})",
            f"({t[0][1]} {'AND' if t[1] == '&' else 'OR'} {t[2][1]})",
        )
    )
    neg = sub.map(lambda p: (f"(!{p[0]})", f"(NOT {p[1]})"))
    return st.one_of(cmp_, seg, conj, neg)


def _normrow(t):
    out = []
    for v in t:
        if v is None:
            out.append(None)
        elif isinstance(v, float):
            out.append("nan" if math.isnan(v) else round(v, 4))
        else:
            out.append(v)
    return tuple(out)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(sel=_num_expr(2), pred=_predicate(2))
def test_fuzz_selection_filter(db, duck, sel, pred):
    hq = f"/customer{{k := c_custkey, v := {sel[0]}}}?{pred[0]}"
    sql = (
        f"SELECT c_custkey AS k, {sel[1]} AS v FROM customer WHERE {pred[1]}"
    )
    got = sorted(_normrow((r["k"], r["v"])) for r in db.df(hq).collect())
    exp = sorted(_normrow(t) for t in duck.execute(sql).fetchall())
    assert got == exp, (hq, sql)


AGGS = [
    ("count", "count"),
    ("sum", "sum"),
    ("min", "min"),
    ("max", "max"),
]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(agg=st.sampled_from(AGGS), val=_num_expr(1), pred=_predicate(1))
def test_fuzz_correlated_aggregate(db, duck, agg, val, pred):
    """nation{AGG((customer?pred){expr})} vs a grouped LEFT JOIN."""
    hname, sname = agg
    if hname == "count":
        hq = f"/nation{{nk := n_nationkey, a := count(customer?{pred[0]})}}"
        sql = (
            "SELECT n_nationkey AS nk, count(c_custkey) AS a FROM nation"
            f" LEFT JOIN customer ON c_nationkey = n_nationkey AND {pred[1]}"
            " GROUP BY n_nationkey"
        )
    else:
        hq = (
            f"/nation{{nk := n_nationkey,"
            f" a := {hname}((customer?{pred[0]}){{{val[0]}}})}}"
        )
        sql = (
            f"SELECT n_nationkey AS nk, {sname}(CASE WHEN {pred[1]} THEN {val[1]} END) AS a"
            " FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey"
            " GROUP BY n_nationkey"
        )
    got = sorted(_normrow((r["nk"], r["a"])) for r in db.df(hq).collect())
    exp = sorted(_normrow(t) for t in duck.execute(sql).fetchall())
    assert got == exp, (hq, sql)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(agg=st.sampled_from(AGGS), val=_num_expr(1), pred=_predicate(1))
def test_fuzz_quotient(db, duck, agg, val, pred):
    """(customer?pred)^{kernel}{kernel, AGG(^{expr})} vs GROUP BY —
    exercises the fused single-groupBy path."""
    hname, sname = agg
    arg = "^" if hname == "count" else f"^{{{val[0]}}}"
    sval = "*" if hname == "count" else val[1]
    hq = (
        f"/(customer?{pred[0]})^{{seg := c_mktsegment}}"
        f"{{seg, a := {hname}({arg})}}"
    )
    sql = (
        f"SELECT c_mktsegment AS seg, {sname}({sval}) AS a FROM customer"
        f" WHERE {pred[1]} GROUP BY c_mktsegment"
    )
    got = sorted(_normrow((r["seg"], r["a"])) for r in db.df(hq).collect())
    exp = sorted(_normrow(t) for t in duck.execute(sql).fetchall())
    assert got == exp, (hq, sql)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    part=st.sampled_from([("year", "year"), ("month", "month"), ("day", "day")]),
    delta=st.integers(min_value=-400, max_value=400),
    yr=st.integers(min_value=1995, max_value=1999),
    cmp_=st.sampled_from(["<", ">=", "="]),
)
def test_fuzz_date_predicates(db, duck, part, delta, yr, cmp_):
    """Date extraction, arithmetic, and comparison against literals."""
    hq = (
        f"/orders{{k := o_orderkey, p := {part[0]}(o_orderdate),"
        f" d := o_orderdate + {delta}}}"
        f"?{part[0]}(o_orderdate) {cmp_} {yr if part[0] == 'year' else (abs(delta) % 12) + 1}"
    )
    rhs = yr if part[0] == "year" else (abs(delta) % 12) + 1
    sql = (
        f"SELECT o_orderkey AS k, CAST({part[1]}(o_orderdate) AS INTEGER) AS p,"
        f" CAST(o_orderdate AS DATE) + {delta} AS d FROM orders"
        f" WHERE {part[1]}(o_orderdate) {cmp_} {rhs}"
    )
    got = sorted((r["k"], r["p"], str(r["d"])) for r in db.df(hq).collect())
    exp = sorted((t[0], t[1], str(t[2])) for t in duck.execute(sql).fetchall())
    assert got == exp, (hq, sql)


def _text_expr(depth=2):
    atom = st.sampled_from(TEXT_COLS)
    if depth == 0:
        return atom
    sub = _text_expr(depth - 1)
    unary = st.tuples(st.sampled_from(["upper", "lower", "trim"]), sub).map(
        lambda t: (f"{t[0]}({t[1][0]})", f"{t[0]}({t[1][1]})")
    )
    head = st.tuples(sub, st.integers(min_value=1, max_value=10)).map(
        lambda t: (f"head({t[0][0]}, {t[1]})", f"substr({t[0][1]}, 1, {t[1]})")
    )
    concat = st.tuples(sub, st.sampled_from(["-", "_", "X"]), sub).map(
        lambda t: (
            f"({t[0][0]} + '{t[1]}' + {t[2][0]})",
            f"({t[0][1]} || '{t[1]}' || {t[2][1]})",
        )
    )
    repl = sub.map(
        lambda a: (
            f"replace({a[0]}, 'e', '@')",
            f"replace({a[1]}, 'e', '@')",
        )
    )
    return st.one_of(atom, unary, head, concat, repl)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(te=_text_expr(3))
def test_fuzz_text_functions(db, duck, te):
    hq = f"/customer{{k := c_custkey, v := {te[0]}}}?c_custkey < 40"
    sql = f"SELECT c_custkey AS k, {te[1]} AS v FROM customer WHERE c_custkey < 40"
    got = sorted((r["k"], r["v"]) for r in db.df(hq).collect())
    exp = sorted((t[0], t[1]) for t in duck.execute(sql).fetchall())
    assert got == exp, (hq, sql)


# -- defined-aggregate memo (compile.resolve_name name_memo) -----------
# integer-only arithmetic: exact on both engines, so the sieve
# threshold can never flip on a float summation-order ulp

def _int_expr(depth=1):
    atom = st.one_of(
        st.just(("c_custkey", "c_custkey")),
        st.integers(min_value=-50, max_value=50).map(lambda v: (str(v), str(v))),
    )
    if depth == 0:
        return atom
    sub = _int_expr(depth - 1)
    binop = st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
        lambda t: (f"({t[0][0]} {t[1]} {t[2][0]})", f"({t[0][1]} {t[1]} {t[2][1]})")
    )
    return st.one_of(atom, binop)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    agg=st.sampled_from([("count", "count"), ("sum", "sum"), ("min", "min"), ("max", "max")]),
    val=_int_expr(1),
    pred=_predicate(1),
    lo=st.integers(min_value=-2000, max_value=2000),
)
def test_fuzz_defined_aggregate_memo(db, duck, agg, val, pred, lo):
    """An aggregate-valued define referenced from selection (twice)
    AND sieve — the name_memo path — vs plain SQL with the aggregate
    written once.  Any stale-column or missed-lowering bug in the memo
    shows up as a value or row-set mismatch."""
    hname, sname = agg
    if hname == "count":
        hx = f"count(customer?{pred[0]})"
        sx = "count(CASE WHEN {p} THEN 1 END)".format(p=pred[1])
    else:
        hx = f"{hname}((customer?{pred[0]}){{{val[0]}}})"
        sx = f"{sname}(CASE WHEN {pred[1]} THEN {val[1]} END)"
    hq = (
        f"/nation.define(x := {hx})"
        f"{{nk := n_nationkey, a := x, b := x + x}}?x >= {lo}"
    )
    sql = (
        f"SELECT nk, a, a + a AS b FROM ("
        f" SELECT n_nationkey AS nk, {sx} AS a FROM nation"
        f" LEFT JOIN customer ON c_nationkey = n_nationkey GROUP BY 1)"
        f" WHERE a >= {lo}"
    )
    got = sorted(_normrow((r["nk"], r["a"], r["b"])) for r in db.df(hq).collect())
    exp = sorted(_normrow(t) for t in duck.execute(sql).fetchall())
    assert got == exp, (hq, sql)


# -- navigation-chain fuzzer -------------------------------------------
# random multi-hop singular navigation from lineitem (two paths into
# nation!) + mixed local/navigated predicates vs explicit LEFT JOINs —
# exercises per-path join aliasing and memoization (compile.py
# ensure_singular_join)

_JOINS = {
    "orders": ("LEFT JOIN orders ON l_orderkey = o_orderkey", ()),
    "customer": ("LEFT JOIN customer ON o_custkey = c_custkey", ("orders",)),
    "cnation": (
        "LEFT JOIN nation cn ON c_nationkey = cn.n_nationkey",
        ("orders", "customer"),
    ),
    "supplier": ("LEFT JOIN supplier ON l_suppkey = s_suppkey", ()),
    "snation": (
        "LEFT JOIN nation sn ON s_nationkey = sn.n_nationkey",
        ("supplier",),
    ),
    "part": ("LEFT JOIN part ON l_partkey = p_partkey", ()),
}
_JOIN_ORDER = ["orders", "customer", "cnation", "supplier", "snation", "part"]

_NAV_ATTRS = [
    ("l_quantity", "l_quantity", ()),
    ("l_extendedprice", "l_extendedprice", ()),
    ("orders.o_totalprice", "o_totalprice", ("orders",)),
    ("orders.customer.c_acctbal", "c_acctbal", ("orders", "customer")),
    ("orders.customer.nation.name", "cn.n_name", ("orders", "customer", "cnation")),
    ("supplier.nation.name", "sn.n_name", ("supplier", "snation")),
    ("supplier.s_acctbal", "s_acctbal", ("supplier",)),
    ("part.p_brand", "p_brand", ("part",)),
    ("part.p_retailprice", "p_retailprice", ("part",)),
]

_NAV_PREDS = [
    ("l_quantity < 25", "l_quantity < 25", ()),
    ("orders.o_totalprice > 150000", "o_totalprice > 150000", ("orders",)),
    (
        "orders.customer.nation.name = supplier.nation.name",
        "cn.n_name = sn.n_name",
        ("orders", "customer", "cnation", "supplier", "snation"),
    ),
    ("part.p_retailprice < 1500", "p_retailprice < 1500", ("part",)),
    ("supplier.s_acctbal > 0", "s_acctbal > 0", ("supplier",)),
    (
        "orders.customer.c_acctbal < part.p_retailprice",
        "c_acctbal < p_retailprice",
        ("orders", "customer", "part"),
    ),
]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    attrs=st.lists(st.sampled_from(_NAV_ATTRS), min_size=1, max_size=3),
    preds=st.lists(st.sampled_from(_NAV_PREDS), min_size=1, max_size=2),
    conj=st.sampled_from(["&", "|"]),
)
def test_fuzz_navigation_chains(db, duck, attrs, preds, conj):
    sel_h = ", ".join(f"a{i} := {a[0]}" for i, a in enumerate(attrs))
    sel_s = ", ".join(f"{a[1]} AS a{i}" for i, a in enumerate(attrs))
    pred_h = f" {conj} ".join(p[0] for p in preds)
    pred_s = f" {'AND' if conj == '&' else 'OR'} ".join(f"({p[1]})" for p in preds)
    deps = {d for a in attrs for d in a[2]} | {d for p in preds for d in p[2]}
    joins = " ".join(_JOINS[j][0] for j in _JOIN_ORDER if j in deps)
    hq = f"/lineitem{{k1 := l_orderkey, k2 := l_linenumber, {sel_h}}}?{pred_h}"
    sql = (
        f"SELECT l_orderkey AS k1, l_linenumber AS k2, {sel_s}"
        f" FROM lineitem {joins} WHERE {pred_s}"
    )
    got = sorted(
        _normrow(tuple(r)) for r in db.df(hq).collect()
    )
    exp = sorted(_normrow(t) for t in duck.execute(sql).fetchall())
    assert got == exp, (hq, sql)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    agg=st.sampled_from([("sum", "sum"), ("min", "min"), ("max", "max")]),
    val=_num_expr(1),
    pred=_predicate(1),
)
def test_fuzz_two_hop_navigation_aggregate(db, duck, agg, val, pred):
    """Random two-hop (region→nation→customer) correlated aggregates
    with a random sieve and a random mapped expression — the
    navigation-depth counterpart of the flat fuzz cases."""
    hq = (
        f"/region{{name := r_name, v := {agg[0]}((nation.customer?{pred[0]})"
        f".define(x := {val[0]}).x)}}"
    )
    sql = f"""
SELECT r_name AS name,
       {agg[1]}(CASE WHEN c_custkey IS NOT NULL THEN {val[1]} END) AS v
FROM region
LEFT JOIN nation ON n_regionkey = r_regionkey
LEFT JOIN customer ON c_nationkey = n_nationkey AND {pred[1]}
GROUP BY r_name
"""
    got = sorted(_normrow((r["name"], r["v"])) for r in db.df(hq).collect())
    exp = sorted(_normrow(t) for t in duck.execute(sql).fetchall())
    assert got == exp, (hq, sql)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    agg=st.sampled_from([("sum", "sum"), ("min", "min"), ("max", "max"), ("avg", "avg")]),
    val=_num_expr(1),
    pred=_predicate(1),
)
def test_fuzz_quotient_aggregate(db, duck, agg, val, pred):
    """Random quotient (GROUP BY) shapes: sieve → group by segment →
    complement aggregate of a random expression."""
    hq = (
        f"/customer?{pred[0]}"
        f"^{{seg := c_mktsegment}}"
        f"{{seg, v := {agg[0]}(^.define(x := {val[0]}).x)}}"
    )
    sql = (
        f"SELECT c_mktsegment AS seg, {agg[1]}({val[1]}) AS v"
        f" FROM customer WHERE {pred[1]} GROUP BY 1"
    )
    got = sorted(_normrow((r["seg"], r["v"])) for r in db.df(hq).collect())
    exp = sorted(_normrow(t) for t in duck.execute(sql).fetchall())
    assert got == exp, (hq, sql)


def test_fuzz_bloom_membership(spark):
    """Randomized bloom property sweep: across random (n, fpp,
    membership-set) draws, members are NEVER missed and the
    anti-join equals the exact anti-join."""
    import random

    from pyspark.sql import functions as F

    from htsql_spark.operators import sketches as S

    rng = random.Random(1234)
    for _ in range(5):
        n = rng.randint(1, 400)
        fpp = rng.choice([0.2, 0.05, 0.01])
        base = rng.randint(0, 10**6)
        members = spark.range(n).select(
            F.concat(F.lit(f"m{base}_"), F.col("id")).alias("v")
        )
        probes = spark.range(300).select(
            F.when(
                F.col("id") % 3 == 0, F.concat(F.lit(f"m{base}_"), F.col("id"))
            )
            .otherwise(F.concat(F.lit(f"x{base}_"), F.col("id")))
            .alias("v")
        )
        got = S.bloom_anti_join(probes, members, "v", fpp=fpp)
        exact = probes.join(members, "v", "left_anti")
        assert got.exceptAll(exact).count() == 0, (n, fpp)
        assert exact.exceptAll(got).count() == 0, (n, fpp)


def test_fuzz_flow_method_chains(db):
    """Randomized flow-method composition sweep: for random chains of
    appending + restricting pipeline methods over /documents,
    (1) appenders never change the key set, (2) restrictors only
    shrink it, (3) the whole chain is deterministic across runs, and
    (4) the dedup tiers are idempotent.  Locks the bridge's algebra —
    any method that silently duplicates, drops, or reorders keys
    under composition fails here regardless of which golden queries
    exist."""
    import random

    APPEND = [
        ".stats()", ".classify()", ".entropy()", ".gopher()",
        ".repetition()", ".pii()", ".split()",
        # round-9 waves 6-8: appenders keep the key set too
        ".dup_spans()", ".cluster()",
    ]
    RESTRICT = [
        ".dedup_exact()", ".sample(0.5)", ".sample(0.25)",
        ".split('train')", ".dedup_simhash()",
        ".decontaminate(documents?doc_id>=450)",
    ]
    base = {r["doc_id"] for r in db.produce("/documents{doc_id}")}
    rng = random.Random(99)
    for _ in range(6):
        chain = ""
        expect_shrunk = False
        for _ in range(rng.randint(1, 3)):
            if rng.random() < 0.5:
                chain += rng.choice(APPEND)
            else:
                chain += rng.choice(RESTRICT)
                expect_shrunk = True
        q = f"/documents{chain}{{doc_id}}"
        ids1 = [r["doc_id"] for r in db.produce(q)]
        assert len(ids1) == len(set(ids1)), (q, "duplicated keys")
        assert set(ids1) <= base, q
        if not expect_shrunk:
            assert set(ids1) == base, (q, "appender changed the key set")
        ids2 = [r["doc_id"] for r in db.produce(q)]
        assert sorted(ids1) == sorted(ids2), (q, "nondeterministic")
    # dedup idempotence: a second pass removes nothing
    for tier in (".dedup_exact()", ".dedup_minhash()", ".dedup_simhash()"):
        once = {r["doc_id"] for r in db.produce(f"/documents{tier}{{doc_id}}")}
        twice = {r["doc_id"] for r in db.produce(f"/documents{tier}{tier}{{doc_id}}")}
        assert once == twice, tier


@pytest.mark.parametrize("dummy", [0])  # keep hypothesis fixtures happy
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(
            st.integers(0, 3),          # join key
            st.integers(0, 1000),       # ts offset (seconds)
            st.integers(0, 99),         # payload
        ),
        max_size=25,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 99)),
        max_size=25,
    ),
    window=st.integers(min_value=1, max_value=500),
)
def test_fuzz_interval_join_matches_bruteforce(spark, dummy, left, right, window):
    """interval_join (the within()/stream_join kernel) against the
    obviously-correct double loop: every equal-key pair with
    right.ts ∈ [left.ts − window, left.ts], bounds INCLUSIVE on both
    ends — adversarial coverage of ties, boundary-exact offsets,
    empty sides and duplicate keys that a fixture corpus misses."""
    import datetime

    from htsql_spark.streaming.events import interval_join

    base = datetime.datetime(2024, 1, 1)

    def ts(off):
        return base + datetime.timedelta(seconds=off)

    ldf = spark.createDataFrame(
        [(k, ts(o), p) for k, o, p in left],
        "lk int, lts timestamp, lp int",
    )
    rdf = spark.createDataFrame(
        [(k, ts(o), p) for k, o, p in right],
        "rk int, rts timestamp, rp int",
    )
    got = sorted(
        tuple(r)
        for r in interval_join(
            ldf, rdf, "lk", "rk", "lts", "rts", window=f"{window} seconds"
        ).collect()
    )
    exp = sorted(
        (lk, ts(lo), lp, rk, ts(ro), rp)
        for lk, lo, lp in left
        for rk, ro, rp in right
        if lk == rk and ro <= lo and ro >= lo - window
    )
    assert got == exp


@pytest.mark.parametrize("dummy", [0])
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.dictionaries(
        st.tuples(st.integers(0, 2), st.integers(0, 2)),
        st.integers(0, 99),
        max_size=8,
    ),
    changes=st.lists(
        st.tuples(
            st.integers(0, 2),              # k1
            st.integers(0, 2),              # k2
            st.integers(0, 20),             # ts
            st.sampled_from(["U", "I", "D"]),
        ),
        max_size=20,
    ),
)
def test_fuzz_apply_cdc_multikey_matches_dict_fold(spark, dummy, base, changes):
    """Multi-column-key apply_cdc (new in round 12) against the
    obviously-correct dict fold: per key the LATEST change wins
    (ts desc, then op desc — 'U' beats 'I' beats 'D' on ties),
    non-deletes upsert, deletes remove, untouched base rows survive.
    The payload is a function of (ts, op) so identical-ranked ties
    are value-identical and the window's arbitrary pick is harmless."""
    from htsql_spark.operators.analytics import apply_cdc

    def payload(ts_, op_):
        return ts_ * 10 + {"U": 2, "I": 1, "D": 0}[op_]

    bdf = spark.createDataFrame(
        [(k1, k2, v) for (k1, k2), v in base.items()] or [],
        "k1 int, k2 int, v int",
    )
    cdf = spark.createDataFrame(
        [(k1, k2, payload(ts_, op_), ts_, op_) for k1, k2, ts_, op_ in changes]
        or [],
        "k1 int, k2 int, v int, ts int, op string",
    )
    got = sorted(
        tuple(r)
        for r in apply_cdc(bdf, cdf, key=["k1", "k2"], ts_col="ts", op_col="op").collect()
    )
    latest = {}
    for k1, k2, ts_, op_ in changes:
        cur = latest.get((k1, k2))
        if cur is None or (ts_, op_) > (cur[0], cur[1]):
            latest[(k1, k2)] = (ts_, op_)
    snap = {k: v for k, v in base.items()}
    for key, (ts_, op_) in latest.items():
        if op_ == "D":
            snap.pop(key, None)
        else:
            snap[key] = payload(ts_, op_)
    exp = sorted((k1, k2, v) for (k1, k2), v in snap.items())
    assert got == exp
