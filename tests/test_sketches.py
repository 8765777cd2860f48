"""Sketch operators: Bloom anti-join (exact semantics at sketch
cost), HLL distinct counts, plus the round's other pipeline adds
(chunk dedup, hashed classifier).  Oracle-grade value checks live in
test_entry.py via the driver entries; these tests lock the sketch
GUARANTEES (no false negatives, lossless union) and edge cases the
driver fixtures don't reach."""

import pytest
from pyspark.sql import functions as F

from htsql_spark.operators import sketches as S
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_bloom_params_sizing():
    m, k = S.bloom_params(1000, 0.001)
    assert m % 64 == 0 and m > 1000  # ~14.4 bits/item at 0.1% fpp
    assert 5 <= k <= 15
    assert S.bloom_params(0) == (64, 1)


def test_bloom_no_false_negatives(spark):
    """Every member's probe must come back positive — the property
    the exactness argument rests on.  Probed over the full byte
    range of positions (hash streams hit bytes >= 0x80, the case the
    ascii() probe bug silently broke)."""
    vals = spark.range(2000).select(F.concat(F.lit("v"), F.col("id")).alias("s"))
    m_bits, k = S.bloom_params(2000, 0.01)
    bloom = S.build_bloom(vals, "s", m_bits, k)
    probed = vals.crossJoin(F.broadcast(bloom)).select(
        S.bloom_might_contain(F.col("s"), F.col("bloom"), m_bits, k).alias("hit")
    )
    assert probed.filter(~F.col("hit")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    """Non-members should mostly miss: at fpp=0.01 over 2000 disjoint
    probes, expect ~20 false positives — assert an order-of-magnitude
    bound, not the exact draw."""
    members = spark.range(2000).select(F.concat(F.lit("in"), F.col("id")).alias("s"))
    others = spark.range(2000).select(F.concat(F.lit("out"), F.col("id")).alias("s"))
    m_bits, k = S.bloom_params(2000, 0.01)
    bloom = S.build_bloom(members, "s", m_bits, k)
    hits = (
        others.crossJoin(F.broadcast(bloom))
        .filter(S.bloom_might_contain(F.col("s"), F.col("bloom"), m_bits, k))
        .count()
    )
    assert hits < 200  # 10x the expected ~20


def test_bloom_anti_join_equals_exact(spark):
    """bloom_anti_join ≡ left_anti on the fixture corpus fingerprints
    (includes natural exact-dup texts across different doc_ids)."""
    from htsql_spark.operators.textstats import fingerprint

    docs = _docs(spark).withColumn("fp", fingerprint(F.col("text")))
    probe = docs.filter(F.col("doc_id") % 5 == 0).select("fp")
    got = S.bloom_anti_join(docs, probe, "fp").select("doc_id")
    exact = docs.join(probe, "fp", "left_anti").select("doc_id")
    assert got.exceptAll(exact).count() == 0
    assert exact.exceptAll(got).count() == 0


def test_bloom_anti_join_empty_probe(spark):
    """Empty small side ⇒ all-zeros bloom ⇒ big side unchanged."""
    from htsql_spark.operators.textstats import fingerprint

    docs = _docs(spark).withColumn("fp", fingerprint(F.col("text")))
    probe = docs.filter(F.lit(False)).select("fp")
    assert S.bloom_anti_join(docs, probe, "fp").count() == docs.count()


def test_bloom_decontaminate_matches_audit(spark):
    """The bloom filter stage and the cross_split_contamination AUDIT
    agree: no clean doc is flagged, every flagged train doc is
    removed."""
    from htsql_spark.operators.pipeline import cross_split_contamination, hash_split

    docs = _docs(spark)
    clean = S.bloom_decontaminate(docs)
    flagged = (
        cross_split_contamination(docs)
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
    )
    train = hash_split(docs, "doc_id").filter(F.col("split") == "train")
    assert clean.join(flagged, "doc_id", "left_semi").count() == 0
    assert clean.count() == train.count() - flagged.count()


def test_hll_rollup_lossless(spark):
    """Union of same-lgK sketches is lossless: rolling daily sketches
    up to a global estimate equals the direct global estimate."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    direct = S.hll_distinct(ev, [], "user_id").collect()[0][0]
    sk = S.hll_sketches(ev, ["event_type"], "user_id")
    rolled = S.hll_rollup(sk, []).collect()[0][0]
    assert rolled == direct


def test_hll_within_error(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in S.hll_distinct(ev, ["event_type"], "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(est[t] - n) <= max(1, 0.05 * n), (t, est[t], n)


def test_dedup_chunks_drops_clone_chunks(spark):
    """A cloned document's chunks all duplicate the original's, so the
    clone reassembles to the empty string and the original survives
    verbatim in token content."""
    from htsql_spark.operators.pipeline import dedup_chunks

    docs = _docs(spark).filter("doc_id < 20")
    clones = docs.select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    out = dedup_chunks(docs.unionByName(clones), chunk_tokens=16)
    clone_rows = out.filter("doc_id >= 9000")
    assert clone_rows.count() == 20
    assert clone_rows.filter("clean_text != '' OR kept_chunks != 0").count() == 0
    # adding the clones must not change the originals' outcome (keep-
    # first: a larger doc_id can never steal a first occurrence)
    alone = dedup_chunks(docs, chunk_tokens=16)
    got = sorted(map(tuple, out.filter("doc_id < 9000").collect()))
    exp = sorted(map(tuple, alone.collect()))
    assert got == exp


def test_dedup_chunks_reassembles_text(spark):
    """With no duplicate chunks at all (synthetic disjoint-token
    docs), clean_text round-trips the whitespace-normalized text."""
    from htsql_spark.operators.pipeline import dedup_chunks

    rows = [
        (i, " ".join(f"tok{i}_{j}" for j in range(40))) for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["clean_text"] for r in dedup_chunks(docs, 16).collect()}
    src = {i: t for i, t in rows}
    assert out == src


def test_classifier_scores_shape_and_determinism(spark):
    from htsql_spark.operators.textstats import classifier_scores

    docs = _docs(spark).filter("doc_id < 50")
    a = classifier_scores(docs).collect()
    b = classifier_scores(docs).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        assert r["keep"] == (r["score"] > 0.0)
        assert -0.5 <= r["score"] <= 0.5


def test_classifier_threshold_monotone(spark):
    """Raising the threshold can only shrink the kept set."""
    from htsql_spark.operators.textstats import classifier_scores

    docs = _docs(spark)
    low = classifier_scores(docs, threshold=-0.01).filter("keep").count()
    high = classifier_scores(docs, threshold=0.01).filter("keep").count()
    assert high <= low


def test_bloom_ngram_decontaminate_matches_exact_rule(spark):
    """Filter output == hash_split-train minus docs sharing >= 1
    8-gram with any eval doc (uncapped ngram_contamination truth)."""
    from htsql_spark.operators.pipeline import hash_split, ngram_contamination

    docs = _docs(spark)
    clean = S.bloom_ngram_decontaminate(docs, n=8)
    aud = (
        ngram_contamination(docs, n=8, max_postings=10**9)
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
    )
    train = hash_split(docs, "doc_id").filter("split = 'train'")
    exact = train.join(aud, "doc_id", "left_anti").select("doc_id")
    got = clean.select("doc_id")
    assert got.exceptAll(exact).count() == 0
    assert exact.exceptAll(got).count() == 0


def test_bloom_ngram_short_docs_survive(spark):
    """Docs below n tokens emit no grams and can never be flagged."""
    rows = [(1, "a b c"), (2, "a b c"), (3, "x y z")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = S.bloom_ngram_decontaminate(docs, n=8, eval_splits=("valid", "test"))
    # every train-split doc survives regardless of shared short text
    from htsql_spark.operators.pipeline import hash_split

    train_n = (
        hash_split(docs, "doc_id").filter("split = 'train'").count()
    )
    assert out.count() == train_n


def test_heavy_hitters_exact_vs_groupby(spark):
    """MG candidates + recount == the full GROUP BY truth on the
    fixture's token stream (several thresholds)."""
    docs = _docs(spark)
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    )
    total = toks.count()
    for min_freq in (0.005, 0.02, 0.04):
        hh = S.heavy_hitters(toks, "w", min_freq)
        exact = (
            toks.groupBy("w")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= total * min_freq)
        )
        assert (
            hh.select("w", "cnt").exceptAll(exact).count() == 0
            and exact.exceptAll(hh.select("w", "cnt")).count() == 0
        ), min_freq


def test_heavy_hitters_skewed_across_partitions(spark):
    """A heavy item spread thinly across many partitions (never
    locally dominant in any single batch order) must still surface —
    the cross-partition union guarantee."""
    import itertools

    # 64 partitions; 'hot' is 10% overall but interleaved with noise
    rows = []
    uid = itertools.count()
    for i in range(6400):
        rows.append((next(uid), "hot" if i % 10 == 0 else f"noise{i}"))
    df = spark.createDataFrame(rows, "id long, v string").repartition(64)
    hh = S.heavy_hitters(df, "v", min_freq=0.05)
    got = {r["v"]: r["cnt"] for r in hh.collect()}
    assert got == {"hot": 640}


def test_heavy_hitters_partitioning_invariant(spark):
    """Same output whatever the physical layout."""
    docs = _docs(spark)
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    )
    a = sorted(map(tuple, S.heavy_hitters(toks, "w", 0.02).collect()))
    b = sorted(
        map(tuple, S.heavy_hitters(toks.repartition(37), "w", 0.02).collect())
    )
    assert a == b


def test_cms_never_underestimates(spark):
    """The defining CMS guarantee: est >= true for EVERY key, under
    several (eps, delta) settings."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    vals = ev.select(F.col("event_type").alias("v"))
    exact = {
        r["v"]: r["n"]
        for r in vals.groupBy("v").agg(F.count("*").alias("n")).collect()
    }
    for eps in (0.1, 0.01):
        mat, d, w = S.cms_build(vals, "v", eps=eps, delta=1e-3)
        est = {
            r["v"]: r["freq_est"]
            for r in S.cms_estimate(vals.distinct(), "v", mat).collect()
        }
        n = sum(exact.values())
        for k, true_n in exact.items():
            assert est[k] >= true_n, (eps, k)
            assert est[k] <= true_n + eps * n + 1, (eps, k)


def test_cms_partitioning_invariant(spark):
    """The matrix is the same whatever the physical layout (integer
    adds commute exactly)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    vals = ev.select(F.col("user_id").cast("string").alias("v"))
    m1, _, _ = S.cms_build(vals, "v", eps=0.05)
    m2, _, _ = S.cms_build(vals.repartition(17), "v", eps=0.05)
    assert m1 == m2


def test_cms_empty_input(spark):
    df = spark.range(0).select(F.col("id").cast("string").alias("v"))
    mat, d, w = S.cms_build(df, "v", eps=0.1)
    assert sum(map(sum, mat)) == 0


def test_compression_ratio_orders_repetition(spark):
    """Repetitive text compresses below word-soup; word-soup below
    high-entropy noise; empty text gets the 1.0 convention."""
    import random

    rng = random.Random(7)
    noise = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(8))
        for _ in range(60)
    )
    rows = [
        (1, "spam ham " * 120),
        (2, " ".join(rng.choice(["join", "scan", "merge", "sort", "row"]) for _ in range(240))),
        (3, noise),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from htsql_spark.operators.textstats import compression_ratio

    r = {row["doc_id"]: row["ratio"] for row in compression_ratio(docs).collect()}
    assert r[1] < r[2] < r[3]
    assert r[4] == 1.0
    # deterministic
    r2 = {row["doc_id"]: row["ratio"] for row in compression_ratio(docs).collect()}
    assert r == r2


def test_hll_sketch_states_roundtrip_parquet(spark, tmp_path):
    """Sketch STATES are persistable: write per-group sketches to
    parquet, read them back, roll up — estimates identical to an
    in-memory rollup (the incremental-analytics contract: daily
    sketch files -> monthly distincts with no rescan)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    sk = S.hll_sketches(ev, ["event_type"], "user_id")
    path = str(tmp_path / "sketches")
    sk.write.parquet(path)
    reread = spark.read.parquet(path)
    direct = S.hll_rollup(sk, []).collect()[0][0]
    persisted = S.hll_rollup(reread, []).collect()[0][0]
    assert persisted == direct
    # and the per-group states survive byte-identically
    a = {r["event_type"]: bytes(r["hll"]) for r in sk.collect()}
    b = {r["event_type"]: bytes(r["hll"]) for r in reread.collect()}
    assert a == b


def test_heavy_hitters_adversarial_near_threshold(spark):
    """Many items sitting just under the MG eviction pressure (forcing
    constant decrements) must not break exactness: the recount pass
    discards sketch error entirely."""
    rows = []
    uid = 0
    # 100 items x 30 occurrences (3000 rows) + 2 hot items x 300
    for i in range(100):
        for _ in range(30):
            rows.append((uid, f"mid{i}")); uid += 1
    for h in ("hotA", "hotB"):
        for _ in range(300):
            rows.append((uid, h)); uid += 1
    df = spark.createDataFrame(rows, "id long, v string").repartition(16)
    total = len(rows)
    for min_freq in (0.05, 0.008):
        got = {
            (r["v"], r["cnt"])
            for r in S.heavy_hitters(df.select("v"), "v", min_freq).collect()
        }
        exp = {
            (r["v"], r["cnt"])
            for r in df.groupBy("v")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= total * min_freq)
            .collect()
        }
        assert got == exp, min_freq


def test_operator_validation_errors_are_named(spark):
    """Every new operator rejects bad parameters with a ValueError
    naming the parameter — the same fail-at-bind discipline the query
    error corpus (tests/golden/errors.yaml) locks for the language."""
    from htsql_spark.operators.analytics import funnel, pagerank
    from htsql_spark.operators.olap import equi_depth_histogram
    from htsql_spark.operators.pipeline import dedup_chunks
    from htsql_spark.operators.skew import salted_join_hot

    df = spark.range(3).withColumnRenamed("id", "k")
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(1, "v")], "user_id long, event_type string"
    )
    cases = [
        (lambda: S.bloom_params(10, 0.5) and S.build_bloom(df, "k", 63, 2),
         "multiple of 64"),
        (lambda: S.bloom_might_contain(F.lit("x"), F.lit([0]), 64, 0),
         "num_hashes"),
        (lambda: S.heavy_hitters(df, "k", 0.0), "min_freq"),
        (lambda: S.heavy_hitters(df, "k", 1.5), "min_freq"),
        (lambda: S.bloom_ngram_decontaminate(docs, n=0), "n must be"),
        (lambda: dedup_chunks(docs, chunk_tokens=0), "chunk_tokens"),
        (lambda: equi_depth_histogram(df, "k", 0), "buckets"),
        (lambda: pagerank(df.selectExpr("k as src", "k as dst"), -1),
         "iterations"),
        (lambda: funnel(ev, []), "steps"),
        (lambda: salted_join_hot(df, df, "k", how="left"), "inner"),
    ]
    for fn, needle in cases:
        with pytest.raises(ValueError) as ei:
            fn()
        assert needle in str(ei.value), (needle, str(ei.value))


def test_empty_graph_pagerank_returns_empty(spark):
    from htsql_spark.operators.analytics import pagerank

    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges, iterations=3).count() == 0


def test_heavy_hitters_native_key_no_string_roundtrip(spark):
    """Keys keep their native type end-to-end: a decimal column comes
    back as decimal with exact counts (a string round-trip would
    reformat or merge), a timestamp key survives, and nested key
    types are rejected up front."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    rows = [(Decimal("1.50"),)] * 40 + [(Decimal("2.25"),)] * 30 + [
        (Decimal(f"{i}.00"),) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k decimal(12,2)")
    hh = S.heavy_hitters(df, "k", min_freq=0.2)
    assert hh.schema["k"].dataType.simpleString() == "decimal(12,2)"
    got = {r["k"]: r["cnt"] for r in hh.collect()}
    assert got == {Decimal("1.50"): 40, Decimal("2.25"): 30}

    ts = spark.createDataFrame(
        [("2024-01-01 00:00:00",)] * 5 + [("2024-06-30 12:34:56",)],
        "s string",
    ).select(F.col("s").cast("timestamp").alias("k"))
    hts = S.heavy_hitters(ts, "k", min_freq=0.5)
    out = hts.collect()
    assert len(out) == 1 and out[0]["cnt"] == 5
    assert hts.schema["k"].dataType.simpleString() == "timestamp"

    arr = spark.createDataFrame([([1, 2],)], "k array<int>")
    with pytest.raises(ValueError, match="unsupported key type"):
        S.heavy_hitters(arr, "k", min_freq=0.5)


def test_heavy_hitters_nan_is_a_real_item(spark):
    """NaN is a groupable Spark value (passes isNotNull; NaN == NaN in
    grouping/joins): a NaN heavy hitter must be found exactly — raw
    float('nan') dict keys would fragment its count across per-batch
    counter entries and silently evict it."""
    import math

    from htsql_spark.operators.sketches import heavy_hitters

    rows = [(float("nan"),)] * 60 + [(float(i),) for i in range(40)]
    df = spark.createDataFrame(rows, "v double").repartition(8)
    got = heavy_hitters(df, "v", min_freq=0.5).collect()
    assert len(got) == 1
    assert math.isnan(got[0]["v"]) and got[0]["cnt"] == 60
    assert abs(got[0]["freq"] - 0.6) < 1e-9


def test_kll_excludes_nan_like_null(spark):
    """NaN has no rank: it is excluded from KLL sketches like NULL, so
    the certified error bound stays valid and quantiles come from the
    ordered values only."""
    from htsql_spark.operators.sketches import kll_quantiles, kll_sketch_states

    rows = [(float("nan"),)] * 50 + [(float(i),) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "v double").repartition(4)
    states = kll_sketch_states(df, "v", k=256)
    q = kll_quantiles(states, [0.5]).collect()[0]
    # exact at this size: the median of 1..100, unpolluted by NaN
    assert 49.0 <= q["p50"] <= 52.0
