"""Sketch-backed operators: a portable distributed Bloom filter
(membership), HyperLogLog (distinct counts), Misra-Gries (exact
heavy hitters), and Count-Min (per-key frequency estimates).

Why sketches at 100 TB: the exact decontamination tiers
(operators/pipeline.py) shuffle the BIG side's fingerprints to join
them against the eval set.  A Bloom filter inverts that: the small
side (eval/test fingerprints) is folded into an m-bit bitset — a few
hundred KB even for millions of entries — broadcast to every task,
and the 100 TB side is probed with O(k) byte lookups per row, no
shuffle of the big side at all.  Bloom filters have NO false
negatives, so a "definitely clean" answer is exact; the (tunable,
~0.1%) false-positive sliver is re-checked with an equi-join that
only ever sees the sliver.  The final output is therefore EXACTLY the
anti-join — sketch speed, exact semantics.

HLL: Spark's built-in Datasketches HLL (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) gives mergeable distinct
counts: partial sketches are combined associatively, so a per-source
distinct count over 100 TB is one map-side-combined aggregation of
~KB-sized sketch states instead of a full shuffle of every key the
way ``countDistinct`` re-shuffles rows.

Reference parity: htsql 2.3.3 has no sketch layer (its
``count(distinct)`` lowers to SQL COUNT DISTINCT — see SURVEY.md
§3.2); these are beyond-reference operators for the LLM-pipeline use
case, same contract style as operators/dedup.py.

The bloom build is the repo's standard Arrow pattern (mapInPandas
partial state + single-group applyInPandas merge — same shape as the
k-means assign/step kernels in operators/similarity.py); everything
else is built-in functions inside whole-stage codegen.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def bloom_params(n_items: int, fpp: float = 0.001) -> tuple[int, int]:
    """Classic Bloom sizing: optimal bits m = -n·ln(p)/ln(2)² rounded
    up to a whole 64-bit word, k = m/n·ln(2) hash functions."""
    if n_items <= 0:
        return 64, 1
    m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _positions(value: Column, m_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions for ``value``: independent xxhash64 streams
    seeded by an appended literal (the production 64-bit hash; the
    bloom's correctness contract is output-level — no false negatives
    — so the hash needs no cross-engine replica)."""
    return [
        F.pmod(F.xxhash64(value, F.lit(i)), F.lit(m_bits)).cast("long")
        for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame, col: str, m_bits: int, num_hashes: int
) -> DataFrame:
    """Fold ``df[col]`` into a single-row DataFrame
    ``(bloom: array<long>)`` of ``m_bits`` bits packed 64 per word
    (the word layout the ``getbit`` probe reads).

    Plan: positions are computed JVM-side (explode of k pmod-xxhash64
    columns, narrow), then ONE Arrow pass builds a partial bitset per
    partition (mapInPandas, numpy ``bitwise_or.at``), and the
    per-partition partials — #partitions rows of m/8 bytes — are
    OR-reduced in a single tiny applyInPandas group.  At 1000
    executors that merge moves 1000 × m/8 bytes, e.g. 128 MB for a
    2^20-bit filter: a model-sized artifact, not a data shuffle.  (A
    two-level tree merge drops that 1000× to √1000× if m grows; not
    needed at current sizes.)
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    nwords = m_bits // 64
    pos = df.select(
        F.explode(F.array(*_positions(F.col(col), m_bits, num_hashes))).alias("p")
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(nwords, dtype=np.uint64)
        seen = False
        for pdf in batches:
            p = pdf["p"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(
                bits, p >> 6, np.uint64(1) << (p & 63).astype(np.uint64)
            )
            seen = True
        if seen:
            yield pd.DataFrame({"g": [0], "bits": [bits.view(np.int64).tolist()]})

    part = pos.mapInPandas(partials, "g int, bits array<bigint>")
    # seed row: guarantees exactly one output row even for an empty
    # build side (empty eval set ⇒ all-zeros bloom ⇒ nothing flagged)
    seed = df.sparkSession.createDataFrame(
        [(0, [0] * nwords)], "g int, bits array<bigint>"
    )

    def merge(_key, pdf):
        acc = np.bitwise_or.reduce(
            [np.asarray(b, dtype=np.int64) for b in pdf["bits"]]
        )
        return pd.DataFrame({"bloom": [acc.tolist()]})

    return (
        part.unionByName(seed).groupBy("g").applyInPandas(merge, "bloom array<bigint>")
    )


#: above this bitset size the word-array literal stops being the right
#: vehicle: PySpark builds array literals one py4j ``lit`` per element
#: and every analyzer/optimizer rule then walks the 10k-child
#: CreateArray node — measured ~6 s of pure DRIVER time at 10,775
#: words, dwarfing the probe itself.  Past the cap the probe switches
#: to the Arrow path (SparkContext broadcast + vectorized bit tests).
LITERAL_MAX_WORDS = 1024


def bloom_words(df: DataFrame, col: str, m_bits: int, num_hashes: int) -> list[int]:
    """Build the bloom over ``df[col]`` and return the packed 64-bit
    words — the model-artifact form (same boundary as collecting the
    k-means centroid matrix in operators/similarity.py: m/8 bytes of
    model state, never row data).  Eager: runs the build job now."""
    row = build_bloom(df, col, m_bits, num_hashes).head()
    return list(row["bloom"])


def bloom_hits(
    df: DataFrame,
    col: str,
    words: list[int],
    m_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Rows of ``df`` whose ``col`` the bloom reports as (maybe)
    present.  Picks the probe vehicle by bitset size: small blooms
    embed as a plan literal (constant-folded, probed in whole-stage
    codegen); large ones ride a SparkContext broadcast probed in one
    vectorized Arrow pass.  Both are narrow — no shuffle, no per-row
    copies of the bitset."""
    if len(words) <= LITERAL_MAX_WORDS:
        # explicit element type: lit() infers array<int> when every
        # word happens to fit 32 bits, and getbit then rejects (or
        # mis-scopes) positions >= 32
        lit = F.lit([int(x) for x in words]).cast("array<bigint>")
        return df.filter(bloom_might_contain(F.col(col), lit, m_bits, num_hashes))
    probed = bloom_probe_arrow(df, col, words, m_bits, num_hashes, flag="__hit")
    return probed.filter(F.col("__hit")).drop("__hit")


def bloom_might_contain(
    value: Column, bloom: Column, m_bits: int, num_hashes: int
) -> Column:
    """Pure built-in probe, two cheap ops per hash:
    ``getbit(element_at(bloom, p div 64 + 1), p mod 64)`` — word
    lookup in the literal array plus a bit test, all inside codegen,
    no UDF on the probe (big) side.  (Earlier byte-wise designs died
    on semantics or cost: ``ascii(substring(...))`` decodes bytes ≥
    0x80 through UTF-8 into U+FFFD — silent false negatives — and
    ``conv(hex(substring(...)))`` is a string round-trip per hash.)"""
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    checks = []
    for p in _positions(value, m_bits, num_hashes):
        word = F.element_at(bloom, F.shiftright(p, 6).cast("int") + F.lit(1))
        checks.append(F.getbit(word, F.pmod(p, F.lit(64))) == F.lit(1))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_probe_arrow(
    df: DataFrame,
    col: str,
    words: list[int],
    m_bits: int,
    num_hashes: int,
    flag: str = "bloom_hit",
) -> DataFrame:
    """Membership probe for blooms too big to embed as a plan literal
    (eval sets of 10M+ items → bitsets of tens/hundreds of MB): the k
    bit POSITIONS are still computed JVM-side (the hash stays
    xxhash64 inside codegen), and one Arrow pass tests them against a
    SparkContext broadcast of the bitset — one copy per executor,
    vectorized ``(bits[p >> 6] >> (p & 63)) & 1`` in numpy.  Appends a
    boolean ``flag`` column; narrow, no shuffle."""
    if flag in df.columns or "__sketch_pos" in df.columns:
        raise ValueError(
            f"bloom_probe_arrow: input already has a {flag!r}/'__sketch_pos' "
            "column — it would be silently overwritten"
        )
    bc = df.sparkSession.sparkContext.broadcast(
        np.asarray(words, dtype=np.int64).view(np.uint64)
    )
    with_pos = df.withColumn(
        "__sketch_pos", F.array(*_positions(F.col(col), m_bits, num_hashes))
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = bc.value
        for pdf in batches:
            pos = np.stack(pdf["__sketch_pos"].to_numpy()).astype(np.int64)
            hit = (
                (bits[pos >> 6] >> (pos & 63).astype(np.uint64))
                & np.uint64(1)
            ).astype(bool).all(axis=1)
            out = pdf.drop(columns=["__sketch_pos"])
            out[flag] = hit
            yield out

    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        + f", {flag} boolean"
    )
    return with_pos.mapInPandas(probe, out_schema)


def bloom_anti_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    fpp: float = 0.001,
    n_items: int | None = None,
) -> DataFrame:
    """``big`` rows whose ``on`` value does NOT appear in ``small`` —
    exact anti-join semantics at Bloom cost.

    Plan (the 100 TB story): (1) fold ``small[on]`` into an m-bit
    bloom (one Arrow pass over the SMALL side) and materialize the
    bitset ONCE as a plan literal — a model artifact exactly like the
    k-means centroid matrix (operators/similarity.py), shipped to
    executors inside the task binary, NOT carried as a per-row column
    (a crossJoined bitset column re-materializes m/8 bytes into every
    probe row's UnsafeRow — measured 77 s vs 2 s at sf0.1 for the
    n-gram variant); (2) probe every ``big`` row JVM-side — rows the
    bloom rejects are DEFINITELY clean (no false negatives) and never
    enter any join; (3) the bloom-positive sliver (true matches +
    ~fpp false positives) is exact-verified with a left-semi join
    against the small side, and the verified ids — a tiny set — are
    broadcast back as a left-anti filter.  The big side is never
    shuffled; it is scanned twice (once to compute the sliver ids,
    once to filter), both scans columnar and filter-pushed, which at
    scale is far cheaper than one full-width shuffle of its
    fingerprints.

    Sizing boundary: the literal is the right vehicle up to a few MB
    of bitset (~1M probe items at 0.1% fpp).  Past that, switch the
    probe to ``bloom_probe_arrow`` (positions stay JVM-computed, bit
    tests run vectorized in Arrow against a SparkContext broadcast of
    the bitset — one copy per executor, any m).

    ``n_items``: expected small-side cardinality for sizing; by
    default it is the pinned probe table's count (single long).

    The small side's distinct key set is pinned with an eager
    localCheckpoint: it is consumed three times (sizing count, bloom
    build, sliver verify), and beyond the 3× recompute a
    NON-DETERMINISTIC small side would otherwise build the bloom from
    different values than the verify join sees — voiding the
    no-false-negatives exactness argument.
    """
    probe = small.select(on).distinct().localCheckpoint(eager=True)
    if n_items is None:
        n_items = probe.count()
    m_bits, k = bloom_params(n_items, fpp)
    words = bloom_words(probe, on, m_bits, k)
    maybe = bloom_hits(big, on, words, m_bits, k)
    confirmed = (
        maybe.select(on)
        .join(probe, on, "left_semi")
        .distinct()
    )
    return big.join(F.broadcast(confirmed), on, "left_anti")


def bloom_decontaminate(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    train: str = "train",
    eval_splits: tuple[str, ...] = ("valid", "test"),
    salt: str = "split",
    fpp: float = 0.001,
) -> DataFrame:
    """Exact-tier decontamination, bloom-accelerated: drop from the
    TRAIN split every document whose normalized-content fingerprint
    appears in an eval split.  Same splits (``hash_split``) and same
    fingerprint (``textstats.fingerprint``) as
    ``cross_split_contamination`` — the audit and the filter agree by
    construction — but the train side is probed against a broadcast
    bloom of the eval fingerprints instead of being shuffled into an
    equi-join, which is the shape that survives a 100 TB train split.
    Output: the surviving (clean) train documents.
    """
    from .textstats import fingerprint
    from .pipeline import hash_split

    tagged = hash_split(docs, key, salt=salt).withColumn(
        "fp", fingerprint(F.col(text_col))
    )
    tr = tagged.filter(F.col("split") == train).drop("split")
    ev = tagged.filter(F.col("split").isin(list(eval_splits))).select("fp")
    return bloom_anti_join(tr, ev, "fp", fpp=fpp).drop("fp")


def hll_distinct(
    df: DataFrame, by: list[str], col: str, lgk: int = 14
) -> DataFrame:
    """Mergeable approximate distinct count of ``col`` per ``by``
    group via Spark's Datasketches HLL.  One map-side-combined
    aggregation whose partial state is a ~2^lgk-byte sketch — at
    100 TB the shuffle moves per-group sketches, not per-row keys.
    Returns ``by + [approx_distinct]``.  (Native PySpark functions,
    not an expr() f-string: column names with spaces/keywords would
    break — or worse, inject — a string-built expression.)"""
    return df.groupBy(*by).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col(col), lgk)).alias(
            "approx_distinct"
        )
    )


def hll_sketches(df: DataFrame, by: list[str], col: str, lgk: int = 14) -> DataFrame:
    """Per-group HLL sketch STATES (binary) — the persistable /
    unionable form: write these per partition/day, then roll up any
    grouping with ``hll_union_agg`` without touching row data again
    (sketch unions are lossless at equal lgK)."""
    return df.groupBy(*by).agg(F.hll_sketch_agg(F.col(col), lgk).alias("hll"))


def hll_rollup(sketches: DataFrame, by: list[str]) -> DataFrame:
    """Merge previously-built sketch states up to a coarser grouping:
    ``by + [approx_distinct]``.  This is the incremental-analytics
    contract: daily sketches → monthly distincts with no rescan.
    (Union of same-lgK sketches is lossless, so rolled-up estimates
    equal the estimate a direct scan would have produced.)"""
    grouped = sketches.groupBy(*by) if by else sketches.groupBy()
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll"))).alias(
            "approx_distinct"
        )
    )


def bloom_ngram_decontaminate(
    docs: DataFrame,
    n: int = 8,
    key: str = "doc_id",
    text_col: str = "text",
    train: str = "train",
    eval_splits: tuple[str, ...] = ("valid", "test"),
    salt: str = "split",
    fpp: float = 0.001,
) -> DataFrame:
    """Partial-contamination filter at Bloom cost: drop from the TRAIN
    split every document sharing at least one word-``n``-gram with an
    eval document (the GPT-3 §C / Gopher 13-gram rule, as a FILTER
    rather than ``ngram_contamination``'s audit-pair report).

    The 100 TB shape: the eval side's gram set (small — eval corpora
    are MBs, not TBs) folds into a bloom whose word array constant-
    folds into the task binary; train grams explode (narrow, streamed
    — row expansion, NOT a shuffle) and are probed inside whole-stage
    codegen.  Deliberately NOT an ``exists`` lambda over the gram
    array: Spark higher-order functions evaluate their lambda
    INTERPRETED, per element — measured 27 s vs sub-second for the
    identical probe arithmetic via explode + codegen filter.  Bloom
    false positives would drop clean docs, so bloom-positive grams —
    the tiny sliver — are re-checked exactly against the eval gram
    table, and only CONFIRMED doc ids (broadcast) are anti-joined
    out.  The only shuffle anywhere is the distinct over those
    contaminated-doc ids.  Output = surviving train documents,
    exactly the shared-gram rule.

    Same tokenization and window rule as ``ngram_contamination``;
    gram identity here is ``xxhash64`` over the window's words
    directly (no md5, no string concat — this is a production filter
    with no oracle-replica obligation on the internal hash: two
    documents share a gram iff they share its 64-bit hash, up to a
    ~2^-64 collision).  Gram rows are produced by exploding the
    window START positions and hashing in plain codegen expressions —
    NOT by a ``transform``/``exists`` lambda over a gram array: Spark
    evaluates higher-order-function lambdas interpreted, per element,
    and a ``withColumn``-chained gram array additionally collapses
    the split() into every ``element_at`` read (measured 40 s vs
    0.3 s at sf0.1 for the identical gram stream).
    """
    from .pipeline import hash_split

    if n < 1:
        raise ValueError(f"bloom_ngram_decontaminate: n must be >= 1, got {n}")
    base = hash_split(docs, key, salt=salt).withColumn(
        "__w", F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    )
    tr = base.filter(F.col("split") == train)

    def side_grams(df: DataFrame) -> DataFrame:
        w = F.col("__w")
        # guard short docs BEFORE explode: sequence(1, stop) DESCENDS
        # for stop < 1, which would emit out-of-range positions whose
        # null-padded hashes spuriously collide across short docs
        starts = F.when(
            F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        posed = df.select(F.col(key), w.alias("__w"), F.explode(starts).alias("__i"))
        return posed.select(
            F.col(key),
            F.xxhash64(
                *[F.element_at(F.col("__w"), F.col("__i") + j) for j in range(n)]
            ).alias("g"),
        )

    # the eval gram table is consumed 3x (count, bloom build, sliver
    # verify) and is small by the operator's contract — pin it with an
    # eager localCheckpoint instead of recomputing the explode+distinct
    ev_grams = (
        side_grams(base.filter(F.col("split").isin(list(eval_splits))))
        .select("g")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_items = ev_grams.count()
    m_bits, k = bloom_params(n_items, fpp)
    words = bloom_words(ev_grams, "g", m_bits, k)
    confirmed = (
        bloom_hits(side_grams(tr), "g", words, m_bits, k)
        .join(ev_grams, "g", "left_semi")
        .select(key)
        .distinct()
    )
    return (
        tr.join(F.broadcast(confirmed), key, "left_anti")
        .drop("__w", "split")
    )


def heavy_hitters(
    df: DataFrame, col: str, min_freq: float = 0.01
) -> DataFrame:
    """EXACT frequent-items: every distinct ``col`` value with global
    frequency ≥ ``min_freq``, with its exact count — found at sketch
    cost (Misra-Gries candidates + a recount restricted to them).

    Why not a plain groupBy at 100 TB: the full distinct-item table
    (e.g. a web corpus vocabulary) is billions of rows; the shuffle
    materializes all of it to find the handful of frequent items.
    Here each partition streams through a bounded Misra-Gries summary
    (capacity c = ceil(2/min_freq) counters, classic decrement
    sketch): if an item's GLOBAL count exceeds n/c, some partition has
    count_p > n_p/c (else summing the per-partition bounds would
    contradict the global count), and MG with capacity c never evicts
    an item with count_p > n_p/c — so the union of partition summaries
    contains every true heavy hitter.  The recount pass filters to the
    ≤ c·P candidate values (broadcast) and aggregates — map-side
    combine makes the shuffle ≤ c·P rows per partition.  Output is
    exact (no false positives survive the recount threshold; the MG
    margin of 2 rules out false negatives).

    Returns (``col``, cnt, freq) for items with freq ≥ min_freq (the
    key keeps its input type).  The threshold compares in scaled
    INTEGER space (cnt·10⁹ ≥ n·round(min_freq·10⁹)) so an item
    sitting exactly on the boundary is kept — a double-arithmetic
    ``cnt >= n*min_freq`` silently drops exact-boundary items when
    n·min_freq rounds up by one ulp.
    """
    if not (0 < min_freq <= 1):
        raise ValueError(f"heavy_hitters: min_freq must be in (0, 1], got {min_freq}")
    capacity = max(1, math.ceil(2.0 / min_freq))
    key_type = df.schema[col].dataType
    # the MG dict is keyed by the RAW value through Arrow — a
    # string round-trip would merge distinct natives that stringify
    # identically and can come back lossy/NULL for decimals or
    # timestamps.  Nested keys aren't hashable dict keys; reject them.
    if isinstance(key_type, (T.ArrayType, T.MapType, T.StructType)):
        raise ValueError(
            f"heavy_hitters: unsupported key type {key_type.simpleString()}"
            " (atomic types only)"
        )
    vals = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())

    # NaN is a groupable Spark value (passes isNotNull; NaN == NaN in
    # grouping) but CANNOT ride through the pandas leg: float('nan')
    # dict keys fragment one item's count across per-batch entries,
    # and an object->Arrow double conversion turns a NaN VALUE into
    # null.  NaN is therefore counted EXACTLY in its own per-partition
    # counter column — stronger than the MG bound, same single pass.

    def mg_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        nrows = 0
        nan_cnt = 0
        for pdf in batches:
            nrows += len(pdf)
            for v, c in pdf["v"].value_counts(dropna=False).items():
                if (isinstance(v, float) and v != v) or v is None:
                    nan_cnt += int(c)
                    continue
                counters[v] = counters.get(v, 0) + int(c)
                if len(counters) > capacity:
                    # decrement step: subtract the (capacity+1)-th
                    # smallest count from everyone, evict <= 0
                    dec = sorted(counters.values())[len(counters) - capacity - 1]
                    counters = {
                        k: n - dec for k, n in counters.items() if n - dec > 0
                    }
        # one sentinel row per partition carries its row count, so the
        # total needs no separate third scan of the input; the key
        # column keeps the input's Arrow type end-to-end
        yield pd.DataFrame(
            {
                "v": pd.Series(list(counters.keys()) + [None], dtype=object),
                "nrows": [0] * len(counters) + [nrows],
                "nan_cnt": [0] * len(counters) + [nan_cnt],
            }
        )

    summary = vals.mapInPandas(
        mg_partials, T.StructType(
            [
                T.StructField("v", key_type),
                T.StructField("nrows", T.LongType()),
                T.StructField("nan_cnt", T.LongType()),
            ]
        )
    ).localCheckpoint(eager=True)
    candidates = summary.filter(F.col("v").isNotNull()).select("v").distinct()
    total = summary.agg(
        F.sum("nrows").alias("__n"), F.sum("nan_cnt").alias("__nan")
    )
    scaled = int(round(min_freq * 1_000_000_000))
    hits = (
        vals.join(F.broadcast(candidates), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(1_000_000_000) >= F.col("__n") * F.lit(scaled))
        .select(
            F.col("v").alias(col),
            F.col("cnt"),
            F.round(F.col("cnt") / F.col("__n"), 6).alias("freq"),
        )
    )
    if not isinstance(key_type, (T.FloatType, T.DoubleType)):
        return hits
    # the exactly-counted NaN item, included iff it clears the same
    # scaled-integer boundary as every other value
    nan_row = (
        total.filter(
            F.col("__nan") * F.lit(1_000_000_000) >= F.col("__n") * F.lit(scaled)
        )
        .select(
            F.lit(float("nan")).cast(key_type).alias(col),
            F.col("__nan").alias("cnt"),
            F.round(F.col("__nan") / F.col("__n"), 6).alias("freq"),
        )
    )
    return hits.unionByName(nan_row)


def cms_build(
    df: DataFrame, col: str, eps: float = 0.01, delta: float = 1e-4
) -> tuple[list[list[int]], int, int]:
    """Count-Min Sketch over ``df[col]``: a depth×width counter matrix
    (depth = ceil(ln 1/δ) independent xxhash64 rows, width = ceil(e/ε))
    supporting point-frequency estimates with the classic guarantee
    ``true ≤ est ≤ true + ε·n`` (upper bound with probability ≥ 1−δ
    per query).  A CMS cell count is just the exact count of rows
    hashing to (r, c), and the matrix has at most d·w non-empty cells
    regardless of corpus size — so the build is a plain
    ``groupBy(r, c).count()`` that stays inside whole-stage codegen
    end-to-end: the map side partial-aggregates each partition down
    to ≤ d·w rows (the same per-partition state the old Arrow pass
    kept in numpy), one tiny shuffle merges them, and the driver
    assembles the matrix from ≤ d·w result rows (model-sized, the
    same boundary as the old single-row head()).  Replaces the former
    mapInPandas partial-matrix + applyInPandas merge: identical
    counts, no JVM↔Python crossing of row data.  Returns (matrix,
    depth, width)."""
    depth = max(1, math.ceil(math.log(1.0 / delta)))
    width = max(8, math.ceil(math.e / eps))
    pos = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(width))
                        .cast("int")
                        .alias("c"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p")
    ).select("p.r", "p.c")

    cells = pos.groupBy("r", "c").agg(F.count(F.lit(1)).alias("n")).collect()
    mat = np.zeros((depth, width), dtype=np.int64)
    for row in cells:
        mat[row["r"], row["c"]] = row["n"]
    return mat.tolist(), depth, width


def cms_estimate(
    df: DataFrame,
    col: str,
    matrix: list[list[int]],
    flag: str = "freq_est",
) -> DataFrame:
    """Point-frequency estimates: min over the depth rows of each
    value's counter.  Positions are computed JVM-side (the shared
    ``_positions`` hash convention, width standing in for m_bits),
    the matrix rides a SparkContext broadcast, lookups run vectorized
    in one Arrow pass (same vehicle as ``bloom_probe_arrow``).
    Appends a long ``flag`` column; narrow, no shuffle.  depth and
    width BOTH derive from the matrix — a separately-passed width
    that disagreed with the build would silently land probes on wrong
    counters and void the never-underestimate guarantee."""
    depth = len(matrix)
    width = len(matrix[0])
    if flag in df.columns or "__sketch_pos" in df.columns:
        raise ValueError(
            f"cms_estimate: input already has a {flag!r}/'__sketch_pos' "
            "column — it would be silently overwritten"
        )
    bc = df.sparkSession.sparkContext.broadcast(
        np.asarray(matrix, dtype=np.int64)
    )
    with_pos = df.withColumn(
        "__sketch_pos", F.array(*_positions(F.col(col), width, depth))
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mat = bc.value
        rows = np.arange(mat.shape[0])
        for pdf in batches:
            pos = np.stack(pdf["__sketch_pos"].to_numpy()).astype(np.int64)
            est = mat[rows[None, :], pos].min(axis=1)
            out = pdf.drop(columns=["__sketch_pos"])
            out[flag] = est
            yield out

    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        + f", {flag} bigint"
    )
    return with_pos.mapInPandas(probe, out_schema)


# ----------------------------------------------------------------------
# KLL-style mergeable quantile sketch (self-certifying error bound)
# ----------------------------------------------------------------------
#
# Spark's approx_percentile/percentile compute FINAL quantiles; their
# partial states are not exposed, so per-group quantile summaries
# cannot be stored, merged across batches, or rolled up a dimension
# hierarchy the way the HLL sketch-state family can.  This is the
# quantile parallel: per-partition compactor sketches (Karnin-Lang-
# Liberty '16 structure: levels of capacity-k buffers, level i items
# carry weight 2^i, a full buffer sorts and promotes every other
# element), built in one Arrow pass, merged level-wise per group, and
# queried by weighted rank.
#
# Instead of quoting the KLL theory constant, every sketch CARRIES its
# own worst-case rank error: a compaction at level i displaces any
# query rank by at most 2^i, so the state accumulates `err += 2^i` per
# compaction (merges add the two bounds).  Queries are then
# *certified*: the true rank of the returned estimate for quantile q
# is within `err` of ceil(q*n) (the exact query's integral rank
# target), valid for ANY partitioning or merge order.
# tests/test_kll.py checks the certificate against raw data under
# merges/rollups/repartitioning; the driver gate (op_kll_quantiles,
# __spark_entry__.py) checks it at sf0.01.  Total count n is always
# exact.

_KLL_MAGIC = 0x4B4C4C31  # "KLL1"


def _kll_new(k: int) -> dict:
    return {"k": int(k), "err": 0, "levels": [[]]}


def _kll_compact(sk: dict, level: int) -> None:
    buf = sk["levels"][level]
    # weight conservation: promotion halves an EVEN count (each
    # promoted item carries 2x weight); an odd buffer holds one item
    # back at this level — popped before the sort so the choice is
    # value-agnostic
    held = [buf.pop()] if len(buf) % 2 else []
    buf.sort()
    if len(sk["levels"]) == level + 1:
        sk["levels"].append([])
    # deterministic alternating offset (practical KLL "sweep" mode):
    # parity flips per compaction via the accumulated error term
    offset = (sk["err"] >> level) & 1
    sk["levels"][level + 1].extend(buf[offset::2])
    sk["levels"][level] = held
    sk["err"] += 1 << level


def _kll_feed(sk: dict, values) -> None:
    k = sk["k"]
    lvl0 = sk["levels"][0]
    for v in values:
        lvl0.append(float(v))
        if len(lvl0) >= k:
            _kll_compact(sk, 0)
            lvl0 = sk["levels"][0]
            i = 1
            while i < len(sk["levels"]) and len(sk["levels"][i]) >= k:
                _kll_compact(sk, i)
                i += 1


def _kll_n(sk: dict) -> int:
    return sum(len(b) << i for i, b in enumerate(sk["levels"]))


def _kll_serialize(sk: dict) -> bytes:
    import struct as _struct

    head = _struct.pack(
        "<IiqI", _KLL_MAGIC, sk["k"], sk["err"], len(sk["levels"])
    )
    parts = [head]
    for buf in sk["levels"]:
        parts.append(_struct.pack("<I", len(buf)))
        parts.append(np.asarray(buf, dtype=np.float64).tobytes())
    return b"".join(parts)


def _kll_deserialize(data: bytes) -> dict:
    import struct as _struct

    magic, k, err, n_levels = _struct.unpack_from("<IiqI", data, 0)
    if magic != _KLL_MAGIC:
        raise ValueError("not a KLL sketch state")
    pos = _struct.calcsize("<IiqI")
    levels = []
    for _ in range(n_levels):
        (cnt,) = _struct.unpack_from("<I", data, pos)
        pos += 4
        levels.append(
            list(np.frombuffer(data, np.float64, count=cnt, offset=pos))
        )
        pos += 8 * cnt
    return {"k": k, "err": err, "levels": levels}


def _kll_merge_two(a: dict, b: dict) -> dict:
    if a["k"] != b["k"]:
        raise ValueError(f"KLL k mismatch: {a['k']} != {b['k']}")
    out = {"k": a["k"], "err": a["err"] + b["err"], "levels": []}
    for i in range(max(len(a["levels"]), len(b["levels"]))):
        buf = []
        if i < len(a["levels"]):
            buf.extend(a["levels"][i])
        if i < len(b["levels"]):
            buf.extend(b["levels"][i])
        out["levels"].append(buf)
    i = 0
    while i < len(out["levels"]):
        if len(out["levels"][i]) >= out["k"]:
            _kll_compact(out, i)
        i += 1
    return out


def _kll_query(sk: dict, q: float) -> float:
    items = [
        (v, 1 << i)
        for i, buf in enumerate(sk["levels"])
        for v in buf
    ]
    if not items:
        return float("nan")
    items.sort()
    n = sum(w for _, w in items)
    target = q * n
    cum = 0
    for v, w in items:
        cum += w
        if cum >= target:
            return v
    return items[-1][0]


def kll_sketch_states(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Per-group KLL quantile sketch states: (by..., qsk binary).

    One Arrow pass per partition builds bounded per-(partition,
    group) compactor sketches; the only shuffle moves serialized
    STATES (≤ ~k·log(n/k) doubles each), never values — the same
    100 TB posture as the HLL/CMS/Misra-Gries builders above.  States
    merge associatively (``kll_merge``): store them per fine-grained
    cell, roll up any dimension hierarchy without rescanning raw
    data, query with ``kll_quantiles``."""
    if k < 8 or k % 2:
        raise ValueError(f"kll_sketch_states: k must be even and >= 8, got {k}")
    by = list(by or [])
    vals = df.select(*by, F.col(col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    if isinstance(vals.schema["__v"].dataType, (T.FloatType, T.DoubleType)):
        # NaN passes isNotNull but has no rank: inside the compactor
        # buffers every comparison is False, Python's sort leaves them
        # effectively unsorted, and compaction then promotes a
        # non-alternating sample — the certified worst-case rank error
        # would be silently void.  Quantiles are defined over ordered
        # values only; NaN is excluded like NULL.
        vals = vals.filter(~F.isnan(F.col("__v")))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states: dict = {}
        for pdf in batches:
            if by:
                for key, sub in pdf.groupby(by, sort=False, dropna=False):
                    gk = key if isinstance(key, tuple) else (key,)
                    sk = states.get(gk)
                    if sk is None:
                        sk = states[gk] = _kll_new(k)
                    _kll_feed(sk, sub["__v"].to_numpy())
            else:
                sk = states.get(())
                if sk is None:
                    sk = states[()] = _kll_new(k)
                _kll_feed(sk, pdf["__v"].to_numpy())
        rows = {c: [] for c in by}
        rows["qsk"] = []
        for gk, sk in states.items():
            for c, v in zip(by, gk):
                rows[c].append(v)
            rows["qsk"].append(_kll_serialize(sk))
        yield pd.DataFrame(rows)

    fields = [df.schema[c] for c in by] + [T.StructField("qsk", T.BinaryType())]
    partials = vals.mapInPandas(build, T.StructType(fields))
    return kll_merge(partials, by=by)


def kll_merge(
    states: DataFrame,
    by: list[str] | None = None,
    state_col: str = "qsk",
) -> DataFrame:
    """Merge KLL states to the ``by`` grain (coarser keys = rollup).
    Shuffles only serialized states; count stays exact and the
    certified error bounds add."""
    by = list(by or [])

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sks = [_kll_deserialize(bytes(b)) for b in pdf[state_col]]
        out = sks[0]
        for sk in sks[1:]:
            out = _kll_merge_two(out, sk)
        row = {c: [pdf[c].iloc[0]] for c in by}
        row[state_col] = [_kll_serialize(out)]
        return pd.DataFrame(row)

    fields = [states.schema[c] for c in by] + [
        T.StructField(state_col, T.BinaryType())
    ]
    schema = T.StructType(fields)
    if not by:
        # global merge: one synthetic group, dropped after the reduce
        return (
            states.select(F.lit(1).alias("__g"), state_col)
            .groupBy("__g")
            .applyInPandas(
                merge_group,
                T.StructType([T.StructField(state_col, T.BinaryType())]),
            )
        )
    return states.groupBy(*by).applyInPandas(merge_group, schema)


def kll_quantile_name(q: float) -> str:
    """The output-column name for quantile ``q`` (``p50`` for 0.5,
    ``p25_5`` for 0.255).  SINGLE source of truth — the certificate
    helpers that later resolve these columns import this formula, so
    kernel and certificate can never drift (round-10 ADVICE)."""
    pct = q * 100
    if abs(pct - round(pct)) < 1e-9:
        return f"p{int(round(pct))}"
    return "p" + f"{pct:g}".replace(".", "_")


def kll_quantiles(
    states: DataFrame,
    qs: list[float],
    state_col: str = "qsk",
) -> DataFrame:
    """Expand each state row with ``n``, the certified worst-case
    rank error ``err``, and one estimate column per requested
    quantile (``p50`` for 0.5 etc.): the smallest retained value
    whose cumulative weight reaches q·n.  Certificate: the true rank
    of ``pXX`` in the sketched data is within ``err`` of ceil(q·n),
    the exact query's integral rank target."""
    for q in qs:
        if not (0 < q <= 1):
            raise ValueError(f"kll_quantiles: quantile {q} outside (0, 1]")
    names = [kll_quantile_name(q) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"kll_quantiles: duplicate quantiles {qs}")
    keep = [c for c in states.columns if c != state_col]

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sks = [_kll_deserialize(bytes(b)) for b in pdf[state_col]]
            out = pdf[keep].copy()
            out["n"] = pd.Series([_kll_n(s) for s in sks], dtype="int64").values
            out["err"] = pd.Series([s["err"] for s in sks], dtype="int64").values
            for q, name in zip(qs, names):
                out[name] = [_kll_query(s, q) for s in sks]
            yield out

    fields = [states.schema[c] for c in keep] + [
        T.StructField("n", T.LongType()),
        T.StructField("err", T.LongType()),
    ] + [T.StructField(nm, T.DoubleType()) for nm in names]
    return states.mapInPandas(expand, T.StructType(fields))
