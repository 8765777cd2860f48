"""Skew-mitigation utilities (beyond-reference; 100 TB posture).

AQE's skew-join splitting handles most hot-key cases automatically,
but two shapes still need explicit salting at extreme skew:

* ``salted_agg`` — two-stage aggregation: group on (key, salt) first
  (spreads one hot key over N reducers), then re-aggregate on the key.
  Works for any algebraic aggregate (sum/count/min/max — pass the
  merge expressions).
* ``salted_join`` — replicate the small side N ways and salt the big
  side's key so one hot key's rows land on N partitions instead of
  one.  Only for when the small side is too big to broadcast but the
  big side has pathological key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: list[Column],
    finals: list[Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage grouped aggregation.

    ``partials`` aggregate within (keys, salt); ``finals`` merge the
    partials per key.  Example::

        salted_agg(df, ["k"],
                   partials=[F.sum("x").alias("s"), F.count("*").alias("c")],
                   finals=[F.sum("s").alias("total"), F.sum("c").alias("n")])
    """
    salted = df.withColumn(_SALT, (F.rand(seed=42) * buckets).cast("int"))
    stage1 = salted.groupBy(*keys, _SALT).agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side
    replicated ``buckets`` ways."""
    bigs = big.withColumn(_SALT, (F.rand(seed=42) * buckets).cast("int"))
    rep = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return bigs.join(rep, [on, _SALT], how).drop(_SALT)


def salted_join_hot(
    big: DataFrame,
    small: DataFrame,
    on: str,
    min_freq: float = 0.01,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Selective salting: find the big side's hot keys EXACTLY
    (sketches.heavy_hitters — per-partition Misra-Gries candidates +
    recount, no vocabulary shuffle), then salt ONLY those keys.

    Blanket ``salted_join`` replicates the ENTIRE small side
    ``buckets``×, multiplying its shuffle/build cost even though the
    overwhelming majority of keys never needed it.  Here the hot-key
    set (tiny by definition: at most 1/min_freq keys) is broadcast;
    cold rows take the ordinary equi-join untouched, hot big-side
    rows spread over ``buckets`` random salts while only the hot
    small-side rows replicate.  Output ≡ the plain join — salting is
    pure physical redistribution.

    ``how`` is limited to 'inner' (the split-union rewrite is only
    equivalence-preserving when unmatched rows need no resurrection).
    """
    if how != "inner":
        raise ValueError(
            f"salted_join_hot supports how='inner' only, got {how!r}"
        )
    from .sketches import heavy_hitters

    hot = F.broadcast(
        heavy_hitters(big.select(on), on, min_freq)
        .select(F.col(on).cast(big.schema[on].dataType))
    )
    big_hot = big.join(hot, on, "left_semi").withColumn(
        _SALT, (F.rand(seed=42) * buckets).cast("int")
    )
    big_cold = big.join(hot, on, "left_anti")
    small_hot = small.join(hot, on, "left_semi").withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    small_cold = small.join(hot, on, "left_anti")
    hot_joined = big_hot.join(small_hot, [on, _SALT], "inner").drop(_SALT)
    cold_joined = big_cold.join(small_cold, on, "inner")
    return hot_joined.unionByName(cold_joined)
