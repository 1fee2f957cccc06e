"""Skew mitigation for joins and aggregations at scale.

At 100 TB a single hot key (one user, one null-ish default, one viral
document) can pin an entire shuffle partition to one reducer. AQE's skew-join
splitting (``spark.sql.adaptive.skewJoin``) handles sort-merge joins at
runtime; these helpers cover the cases AQE doesn't:

* :func:`salted_join` — explicit salting for an equi-join with a small-ish
  right side: the big side gets a uniform random salt, the small side is
  replicated across all salt values, so one hot key spreads over ``buckets``
  reducers. Result is identical to the unsalted join (the salt is an extra
  equi-key that always matches exactly one replica).
* :func:`salted_agg` — two-phase aggregation for aggregates whose partial
  state is large (``collect_list``-ish) or whose keys are so skewed that even
  map-side partial aggregation leaves one reducer hot: aggregate on
  ``(key, salt)`` first, then fold the per-salt partials.

Both are deterministic given a fixed seed (``rand(seed)`` is deterministic
for a fixed partitioning) and produce results identical to their unsalted
equivalents — which is exactly what the oracle gate checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__ice_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-resilient equi-join on shared key columns ``on``.

    The big side is salted uniformly at random (NOT by key hash — that would
    put the hot key back in one bucket); the small side is replicated
    ``buckets``× via an explode, so the join condition
    ``key AND salt`` matches each big-side row against exactly one replica.
    Shuffle volume for the small side grows ``buckets``×; reducer load for
    the hottest key drops ``buckets``×.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "cross"):
        # right/full joins would keep every unmatched small-side REPLICA
        # (buckets× row inflation); salting is only sound when unmatched
        # rows can come from the big side alone
        raise ValueError(
            f"salted_join supports inner/left/left_semi joins, not {how!r}"
        )
    b = big.withColumn(_SALT, F.floor(F.rand(seed) * buckets).cast("int"))
    s = small.withColumn(
        _SALT, F.explode(F.array([F.lit(i).cast("int") for i in range(buckets)]))
    )
    return b.join(s, on=[*on, _SALT], how=how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase skew-resilient aggregation.

    ``partial_aggs`` maps output-column name -> aggregate over the raw rows
    (applied per ``(keys, salt)`` group); ``final_aggs`` maps final name ->
    aggregate over the partial columns (applied per ``keys``). The caller
    supplies both halves because only algebraic aggregates decompose
    (sum→sum, count→sum, min→min, max→max, avg→sum/sum).

    Example::

        salted_agg(df, ["k"],
                   {"s": F.sum("x"), "c": F.count(F.lit(1))},
                   {"s": F.sum("s"), "c": F.sum("c")})
    """
    salted = df.withColumn(_SALT, F.floor(F.rand(seed) * buckets).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(name) for name, c in final_aggs.items()]
    )
