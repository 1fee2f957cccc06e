"""Z-order (Morton) clustering for multi-dimensional data layout.

Lexicographic ``sort_order`` clusters perfectly on its leading column and not
at all on the others: a filter on the second sort key still reads every row
group. Interleaving the bits of several normalized columns gives every
column partial locality, so Parquet row-group min/max stats prune scans for
filters on ANY of the z-ordered columns (the standard Delta/Iceberg OPTIMIZE
ZORDER technique, built here from plain column expressions — JVM-side, no
UDF).

Layout only: z-ordering changes row placement inside files, never query
results, so it needs no oracle — its effect is asserted on Parquet row-group
statistics (see tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    cols: list[Column],
    bounds: list[tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Morton code of ``cols`` normalized into ``bits``-bit integers.

    ``bounds[i] = (min, max)`` for the i-th column (precomputed — one tiny
    agg job per batch). Nulls sort first (code 0 contribution).
    """
    if len(cols) != len(bounds):
        raise ValueError("one (min, max) bound per column required")
    n = len(cols)
    # the interleaved code must fit a signed long: shifting into bit 63
    # flips the sign and scrambles the sort (16-bit default breaks at 4
    # columns). Auto-reduce per-column precision — layout-only, and low
    # bits contribute the least locality anyway.
    bits = min(bits, 63 // n)
    scaled = []
    top = (1 << bits) - 1
    for c, (lo, hi) in zip(cols, bounds):
        span = (hi - lo) or 1.0
        q = F.floor((c.cast("double") - F.lit(float(lo))) / F.lit(span) * top)
        q = F.least(F.greatest(q, F.lit(0)), F.lit(top))
        scaled.append(F.coalesce(q, F.lit(0)).cast("long"))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def column_bounds(df: DataFrame, cols: list[str]) -> list[tuple[float, float]]:
    """(min, max) per column in one aggregation job."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))]
    row = df.agg(*aggs).collect()[0]
    return [
        (row[2 * i] or 0.0, row[2 * i + 1] or 0.0) for i in range(len(cols))
    ]


def zorder_dataframe(
    df: DataFrame, cols: list[str], bits: int = 16, out_col: str = "__zorder__"
) -> DataFrame:
    """Attach the Morton code of ``cols`` (bounds computed from the batch)."""
    bounds = column_bounds(df, cols)
    return df.withColumn(
        out_col, zorder_value([F.col(c) for c in cols], bounds, bits)
    )
