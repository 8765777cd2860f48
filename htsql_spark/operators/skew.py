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
