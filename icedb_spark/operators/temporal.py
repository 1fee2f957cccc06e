"""Temporal / ordered-data operators: as-of join, interval range join,
gap-based sessionization.

The reference engine has no joins at all (SURVEY §2.2 — its analytics surface
is single-table), but any event/time-series workload on top of it needs these
three shapes, and naive Spark formulations of all three explode at scale:

* an as-of join written as ``t1.ts >= t2.ts`` + window-rank is an inequality
  join — Catalyst can only plan it as a broadcast-nested-loop or a full
  cross-product-per-key.  :func:`asof_join` instead unions both sides and
  runs ONE window scan per key group: one shuffle, no pair blow-up, identical
  semantics to DuckDB's ``ASOF JOIN`` / pandas ``merge_asof``.
* a point-in-interval join (``lo <= x < hi``) has the same inequality-join
  trap.  :func:`range_join` bands both sides into fixed-width buckets so the
  join is an equi-join on the bucket id with the exact predicate applied
  after — each point lands in exactly one bucket, so no dedup pass is needed.
* sessionization is lag/cumsum windowing; :func:`sessionize` keeps it wholly
  JVM-side and frame-compatible with the SQL-standard default RANGE frame so
  independent engines agree on tied timestamps.

All three are pure built-in-function compositions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "sessionize"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the single right row with the closest
    ``right_ts`` at-or-before (``backward``) / at-or-after (``forward``) the
    left row's ``left_ts``, matching on equal ``on`` keys.

    Scale shape: both sides are unioned, shuffled ONCE on ``on``, and scanned
    with a running ``last(..., ignorenulls)`` window — cost is a sort per key
    group, not |L|x|R| candidate pairs. This is the distributed formulation
    of DuckDB's ``ASOF JOIN`` (our oracle) and pandas ``merge_asof``. A
    single mega-hot key serializes into one window task; pre-split such keys
    upstream (see ``operators.skew``) if profiles show it.

    Ties: a right row whose ts equals the left ts matches (>= / <=
    semantics). If several right rows share (key, ts), the match among them
    is unspecified — pre-aggregate the right side to one row per (key, ts)
    for deterministic output.

    ``tolerance`` (same units as the ts columns) drops matches further than
    that distance; with ``how="left"`` unmatched left rows survive with null
    right columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    right_ts = right_ts or left_ts
    overlap = [c for c in right.columns if c not in on and c in left.columns]
    if overlap:
        raise ValueError(
            f"right payload columns collide with left: {overlap}; rename before joining"
        )
    rpay_cols = [c for c in right.columns if c not in on]

    lhs = left.select(
        *on,
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lpay"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in rpay_cols]).alias("__rpay"),
    )
    u = lhs.unionByName(rhs, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts (side 0 < 1), so an
    # equal-ts right row is inside the left row's preceding frame — the >=
    # (resp. <=) tie rule falls out of the sort order.
    order = (
        [F.asc("__ats"), F.asc("__side")]
        if direction == "backward"
        else [F.desc("__ats"), F.asc("__side")]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__rpay", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )

    valid = F.col("__m").isNotNull()
    if tolerance is not None:
        dist = (
            F.col("__ats") - F.col("__m")[right_ts]
            if direction == "backward"
            else F.col("__m")[right_ts] - F.col("__ats")
        )
        valid = valid & (dist <= F.lit(tolerance))
    if how == "inner":
        matched = matched.where(valid)
    else:
        matched = matched.withColumn(
            "__m", F.when(valid, F.col("__m")).otherwise(F.lit(None))
        )
    return matched.select(
        *[F.col(f"__lpay.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(c) for c in rpay_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    closed: str = "left",
) -> DataFrame:
    """Join point rows to every interval row with ``lo <= point < hi``
    (``closed="left"``; ``"both"`` makes hi inclusive). No equi-key needed.

    Scale shape: each interval is exploded to the fixed-width buckets it
    overlaps; each point hashes to exactly ONE bucket — so the join is a
    plain equi-join on the bucket id (hash-partitionable, AQE/broadcast
    eligible) with the exact range predicate applied as a post-filter, and
    every qualifying (point, interval) pair appears exactly once, no
    ``distinct`` needed. Pick ``bucket_width`` near the typical interval
    length: replication per interval is ``~len/bucket_width + 1`` rows.
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be left|both, got {closed!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    w = float(bucket_width)
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__b", F.floor(F.col(point_col) / w).cast("long"))
    upper = (
        F.col(point_col) < F.col(hi_col)
        if closed == "left"
        else F.col(point_col) <= F.col(hi_col)
    )
    return (
        pt.join(iv, "__b")
        .where((F.col(point_col) >= F.col(lo_col)) & upper)
        .drop("__b")
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int | float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key session index (1-based, ordered by time): a new
    session starts when the time since the previous event of the same key
    exceeds ``gap`` (same units as ``ts_col``).

    One shuffle on ``key_col``, then lag + running sum — all JVM-side. The
    running sum deliberately uses the SQL-default RANGE frame (peers
    included), so rows with tied timestamps get the same session id in any
    engine regardless of tie order — that keeps results bit-stable across
    Spark and the DuckDB oracle.
    """
    wo = Window.partitionBy(key_col).orderBy(ts_col)
    is_new = F.when(
        F.lag(ts_col).over(wo).isNull()
        | ((F.col(ts_col) - F.lag(ts_col).over(wo)) > F.lit(gap)),
        1,
    ).otherwise(0)
    # no rowsBetween: default RANGE frame (see docstring)
    running = Window.partitionBy(key_col).orderBy(ts_col)
    return df.withColumn("__new", is_new).withColumn(
        session_col, F.sum("__new").over(running)
    ).drop("__new")
