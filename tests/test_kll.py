"""KLL mergeable quantile sketch (operators/sketches.py): the
self-certified rank-error bound is checked against exact quantiles on
raw data, under merges, rollups, repartitioning, and null group keys.
The certificate — |true_rank(estimate) - q*n| <= err — is the
invariant every test here locks; the driver gate (op_kll_quantiles)
checks the same certificate at sf0.01."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from htsql_spark.operators import sketches as S
from tests.conftest import SF_DIR


def _lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def _cert_ok(values, estimate, q, err):
    """True rank of `estimate` within err of ceil(q*n) — the exact
    query returns the value at rank ceil(q*n) (smallest cumulative
    weight >= q*n), so the integral target is the ceiling, not the
    raw fraction (rank = count <= v, checked against the inclusive
    band [count < v, count <= v])."""
    import math

    v = np.asarray(sorted(values), dtype=np.float64)
    n = len(v)
    lo = np.searchsorted(v, estimate, side="left")
    hi = np.searchsorted(v, estimate, side="right")
    target = math.ceil(q * n - 1e-9)
    # any rank in [lo+1, hi] is a valid rank for a tied value
    return (lo + 1) - err <= target <= hi + err


# ----------------------------------------------------------------------
# pure-python kernel
# ----------------------------------------------------------------------

def test_kll_exact_below_k():
    """n < k means zero compactions: err == 0 and every quantile is
    exactly the order statistic."""
    sk = S._kll_new(64)
    vals = [float(x) for x in range(50)]
    S._kll_feed(sk, vals)
    assert sk["err"] == 0
    assert S._kll_n(sk) == 50
    assert S._kll_query(sk, 0.5) == 24.0  # ceil(0.5*50) = rank 25 -> 24.0
    assert S._kll_query(sk, 1.0) == 49.0
    assert S._kll_query(sk, 0.02) == 0.0


def test_kll_certificate_large_stream():
    """50k values through a k=64 sketch: every query satisfies the
    carried certificate, and the bound is non-vacuous (err << n)."""
    rng = np.random.RandomState(7)
    vals = rng.lognormal(0, 2, 50_000)
    sk = S._kll_new(256)
    S._kll_feed(sk, vals)
    assert S._kll_n(sk) == 50_000
    # worst-case bound scales ~n*log2(n/k)/(2k); at k=256 it must be
    # an informative (<5%) certificate for this n
    assert sk["err"] < 0.05 * 50_000
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
        est = S._kll_query(sk, q)
        assert _cert_ok(vals, est, q, sk["err"]), q


def test_kll_merge_certificate_and_exact_n():
    """Merging partial sketches (any split) keeps n exact and the
    summed certificate valid against the union of the raw data."""
    rng = np.random.RandomState(11)
    vals = rng.normal(100, 15, 30_000)
    parts = np.array_split(vals, 7)
    sks = []
    for p in parts:
        sk = S._kll_new(64)
        S._kll_feed(sk, p)
        sks.append(sk)
    # left fold and right fold both certify
    left = sks[0]
    for sk in sks[1:]:
        left = S._kll_merge_two(left, sk)
    right = sks[-1]
    for sk in reversed(sks[:-1]):
        right = S._kll_merge_two(right, sk)
    for merged in (left, right):
        assert S._kll_n(merged) == 30_000
        for q in (0.1, 0.5, 0.9):
            est = S._kll_query(merged, q)
            assert _cert_ok(vals, est, q, merged["err"]), q


def test_kll_serialize_roundtrip():
    rng = np.random.RandomState(3)
    sk = S._kll_new(32)
    S._kll_feed(sk, rng.uniform(-1, 1, 5_000))
    back = S._kll_deserialize(S._kll_serialize(sk))
    assert back == sk


def test_kll_kernel_validation():
    with pytest.raises(ValueError, match="not a KLL sketch"):
        S._kll_deserialize(b"\x00" * 32)
    a, b = S._kll_new(32), S._kll_new(64)
    with pytest.raises(ValueError, match="k mismatch"):
        S._kll_merge_two(a, b)


# ----------------------------------------------------------------------
# DataFrame surface
# ----------------------------------------------------------------------

def test_kll_states_grouped_certificate(spark):
    """Per-l_returnflag sketches on l_quantity: n matches the exact
    group count and every p50/p90 estimate certifies against the
    exact ranks of the raw group values."""
    li = _lineitem(spark)
    states = S.kll_sketch_states(li, "l_quantity", by=["l_returnflag"], k=64)
    out = {
        r["l_returnflag"]: r
        for r in S.kll_quantiles(states, [0.5, 0.9]).collect()
    }
    raw = {}
    for r in li.select("l_returnflag", "l_quantity").collect():
        raw.setdefault(r["l_returnflag"], []).append(float(r["l_quantity"]))
    assert set(out) == set(raw)
    for flag, vals in raw.items():
        row = out[flag]
        assert row["n"] == len(vals)
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            assert _cert_ok(vals, row[col], q, row["err"]), (flag, q)


def test_kll_partitioning_invariant_certificate(spark):
    """The certificate holds regardless of input partitioning (1 vs
    16 partitions) and n stays exact — the mergeability contract."""
    li = _lineitem(spark).select("l_quantity")
    n_exact = li.count()
    for parts in (1, 16):
        states = S.kll_sketch_states(li.repartition(parts), "l_quantity", k=32)
        row = S.kll_quantiles(states, [0.5]).collect()[0]
        assert row["n"] == n_exact
    vals = [float(r["l_quantity"]) for r in li.collect()]
    states = S.kll_sketch_states(li.repartition(16), "l_quantity", k=32)
    row = S.kll_quantiles(states, [0.25, 0.75]).collect()[0]
    for q, col in ((0.25, "p25"), (0.75, "p75")):
        assert _cert_ok(vals, row[col], q, row["err"]), q


def test_kll_rollup_across_hierarchy(spark):
    """Fine-grained (l_returnflag, l_linestatus) states rolled up via
    kll_merge to l_returnflag: exact n at the coarse grain and a
    valid certificate — no raw-data rescan."""
    li = _lineitem(spark)
    fine = S.kll_sketch_states(
        li, "l_quantity", by=["l_returnflag", "l_linestatus"], k=64
    )
    coarse = S.kll_merge(fine, by=["l_returnflag"])
    out = {
        r["l_returnflag"]: r for r in S.kll_quantiles(coarse, [0.5]).collect()
    }
    raw = {}
    for r in li.select("l_returnflag", "l_quantity").collect():
        raw.setdefault(r["l_returnflag"], []).append(float(r["l_quantity"]))
    assert set(out) == set(raw)
    for flag, vals in raw.items():
        assert out[flag]["n"] == len(vals)
        assert _cert_ok(vals, out[flag]["p50"], 0.5, out[flag]["err"]), flag


def test_kll_null_group_keys_and_null_values(spark):
    """NULL group keys survive the dropna=False groupby as their own
    group; NULL values are excluded from the sketch (count semantics
    match SQL count(col))."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 3.0), (None, 4.0), ("a", None), (None, None)],
        "g string, v double",
    )
    states = S.kll_sketch_states(df, "v", by=["g"], k=8)
    rows = {r["g"]: r for r in S.kll_quantiles(states, [1.0]).collect()}
    assert set(rows) == {"a", None}
    assert rows["a"]["n"] == 2 and rows["a"]["p100"] == 2.0
    assert rows[None]["n"] == 2 and rows[None]["p100"] == 4.0


def test_kll_empty_input(spark):
    df = spark.createDataFrame([], "g string, v double")
    states = S.kll_sketch_states(df, "v", by=["g"], k=8)
    assert S.kll_quantiles(states, [0.5]).count() == 0


def test_kll_validation_errors(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="k must be even"):
        S.kll_sketch_states(df, "v", k=7)
    with pytest.raises(ValueError, match="k must be even"):
        S.kll_sketch_states(df, "v", k=4)
    states = S.kll_sketch_states(df, "v", k=8)
    with pytest.raises(ValueError, match="outside"):
        S.kll_quantiles(states, [0.0])
    with pytest.raises(ValueError, match="duplicate"):
        S.kll_quantiles(states, [0.5, 0.5])


def test_kll_states_persist_parquet(spark, tmp_path):
    """Serialized states written to parquet and re-read answer the
    same queries byte-identically — the store-and-rollup-later
    workflow the sketch-state family exists for."""
    li = _lineitem(spark)
    states = S.kll_sketch_states(li, "l_quantity", by=["l_returnflag"], k=32)
    p = str(tmp_path / "qsk")
    states.write.parquet(p)
    reread = spark.read.parquet(p)
    a = {
        r["l_returnflag"]: (r["n"], r["err"], r["p50"])
        for r in S.kll_quantiles(states, [0.5]).collect()
    }
    b = {
        r["l_returnflag"]: (r["n"], r["err"], r["p50"])
        for r in S.kll_quantiles(reread, [0.5]).collect()
    }
    assert a == b


# ----------------------------------------------------------------------
# property fuzz (pure-python kernel — no Spark session per example)
# ----------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    vals=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=3000,
    ),
    k=st.sampled_from([8, 16, 64]),
    n_splits=st.integers(min_value=1, max_value=5),
    q=st.floats(min_value=0.001, max_value=1.0),
)
def test_kll_fuzz_certificate_under_random_splits(vals, k, n_splits, q):
    """Adversarial sweep: ANY value distribution (subnormals, huge
    magnitudes, duplicates), ANY split into partial sketches, ANY
    quantile — the merged sketch's n is exact and the carried
    certificate holds."""
    import numpy as np

    parts = np.array_split(np.asarray(vals, dtype=np.float64), n_splits)
    sks = []
    for p in parts:
        sk = S._kll_new(k)
        S._kll_feed(sk, p)
        sks.append(sk)
    merged = sks[0]
    for sk in sks[1:]:
        merged = S._kll_merge_two(merged, sk)
    assert S._kll_n(merged) == len(vals)
    est = S._kll_query(merged, q)
    assert _cert_ok(vals, est, q, merged["err"]), (q, est, merged["err"])
    # serialization roundtrip is lossless at any state
    assert S._kll_deserialize(S._kll_serialize(merged)) == merged


def test_kll_quantile_name_single_source():
    """kll_quantile_name is the ONE naming formula (round-10 ADVICE:
    the gate certificate derived its own f"p{int(round(q*100))}",
    which diverges for fractional percents like 0.255)."""
    from htsql_spark.operators.sketches import kll_quantile_name

    assert kll_quantile_name(0.5) == "p50"
    assert kll_quantile_name(0.999) == "p99_9"
    assert kll_quantile_name(0.255) == "p25_5"
    # the certificate helper resolves the SAME names the kernel emits
    import inspect

    import __spark_entry__ as entry

    src = inspect.getsource(entry._kll_rank_certificate)
    assert "kll_quantile_name" in src
