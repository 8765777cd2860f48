"""Sketch-backed operators: a portable distributed Bloom filter and
HyperLogLog distinct counting.

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


def bloom_params(n_items: int, fpp: float = 0.001) -> tuple[int, int]:
    """Classic Bloom sizing: optimal bits m = -n·ln(p)/ln(2)² rounded
    up to a whole byte, k = m/n·ln(2) hash functions."""
    if n_items <= 0:
        return 8, 1
    m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(8, (m + 7) // 8 * 8)
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
    """Fold ``df[col]`` into a single-row DataFrame ``(bloom: binary)``
    of ``m_bits`` bits.

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
    if m_bits % 8 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 8, got {m_bits}")
    nbytes = m_bits // 8
    pos = df.select(
        F.explode(F.array(*_positions(F.col(col), m_bits, num_hashes))).alias("p")
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            p = pdf["p"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
            seen = True
        if seen:
            yield pd.DataFrame({"g": [0], "bits": [bits.tobytes()]})

    part = pos.mapInPandas(partials, "g int, bits binary")
    # seed row: guarantees exactly one output row even for an empty
    # build side (empty eval set ⇒ all-zeros bloom ⇒ nothing flagged)
    seed = df.sparkSession.createDataFrame(
        [(0, bytearray(nbytes))], "g int, bits binary"
    )

    def merge(_key, pdf):
        acc = np.bitwise_or.reduce(
            [np.frombuffer(b, dtype=np.uint8) for b in pdf["bits"]]
        )
        return pd.DataFrame({"bloom": [acc.tobytes()]})

    return part.unionByName(seed).groupBy("g").applyInPandas(merge, "bloom binary")


def bloom_might_contain(
    value: Column, bloom: Column, m_bits: int, num_hashes: int
) -> Column:
    """Pure built-in probe: for each of the k positions, extract the
    byte with ``conv(hex(substring(bloom, p div 8 + 1, 1)), 16, 10)``
    and test the bit with an AND mask (mask = 2^(p mod 8), exact for
    exponents 0..7).  O(k) byte lookups inside codegen — no UDF on the
    probe (big) side.  (NOT ``ascii(...)``: that casts the byte
    through UTF-8, and a lone byte ≥ 0x80 is invalid UTF-8 — it
    decodes to U+FFFD and silently breaks half the bit tests.)"""
    checks = []
    for p in _positions(value, m_bits, num_hashes):
        byte = (
            F.conv(F.hex(F.substring(bloom, (F.floor(p / 8) + 1).cast("int"), 1)), 16, 10)
            .cast("int")
        )
        mask = F.pow(F.lit(2.0), F.pmod(p, F.lit(8))).cast("int")
        checks.append(byte.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


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
    bloom (one Arrow pass over the SMALL side); (2) broadcast the
    1-row bloom and probe every ``big`` row JVM-side — rows the bloom
    rejects are DEFINITELY clean (no false negatives) and never enter
    any join; (3) the bloom-positive sliver (true matches + ~fpp false
    positives) is exact-verified with a left-semi join against the
    small side, and the verified ids — a tiny set — are broadcast
    back as a left-anti filter.  The big side is never shuffled; it is
    scanned twice (once to compute the sliver ids, once to filter),
    both scans columnar and filter-pushed, which at scale is far
    cheaper than one full-width shuffle of its fingerprints.

    ``n_items``: expected small-side cardinality for sizing; by
    default it is computed with one count() over the small side
    (cheap: single long).
    """
    if n_items is None:
        n_items = small.count()
    m_bits, k = bloom_params(n_items, fpp)
    bloom = build_bloom(small, on, m_bits, k)
    tagged = big.crossJoin(F.broadcast(bloom))
    maybe = tagged.filter(
        bloom_might_contain(F.col(on), F.col("bloom"), m_bits, k)
    ).drop("bloom")
    confirmed = (
        maybe.select(on)
        .join(small.select(on), on, "left_semi")
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
    Returns ``by + [approx_distinct]``."""
    return df.groupBy(*by).agg(
        F.expr(f"hll_sketch_estimate(hll_sketch_agg({col}, {lgk}))").alias(
            "approx_distinct"
        )
    )


def hll_sketches(df: DataFrame, by: list[str], col: str, lgk: int = 14) -> DataFrame:
    """Per-group HLL sketch STATES (binary) — the persistable /
    unionable form: write these per partition/day, then roll up any
    grouping with ``hll_union_agg`` without touching row data again
    (sketch unions are lossless at equal lgK)."""
    return df.groupBy(*by).agg(
        F.expr(f"hll_sketch_agg({col}, {lgk})").alias("hll")
    )


def hll_rollup(sketches: DataFrame, by: list[str]) -> DataFrame:
    """Merge previously-built sketch states up to a coarser grouping:
    ``by + [approx_distinct]``.  This is the incremental-analytics
    contract: daily sketches → monthly distincts with no rescan.
    (Union of same-lgK sketches is lossless, so rolled-up estimates
    equal the estimate a direct scan would have produced.)"""
    grouped = sketches.groupBy(*by) if by else sketches.groupBy()
    return grouped.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(hll))").alias("approx_distinct")
    )
