"""Deterministic cross-engine hashing.

``HASH60`` maps a string + integer seed to a 60-bit non-negative bigint via
md5 — chosen over Spark's native ``xxhash64``/``hash`` because the exact same
value is computable in ANSI-ish SQL on other engines
(``cast(concat('0x', substr(md5(s || ':' || seed), 1, 15)) as bigint)``),
making every hash-based operator (MinHash, SimHash, LSH) independently
verifiable. md5 runs JVM-side inside whole-stage codegen; the cost is one
digest per (value, seed) pair.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column, seed: int) -> Column:
    """60-bit deterministic hash of a string column with an integer seed."""
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(f":{seed}"))), 1, 15),
        16,
        10,
    ).cast("long")


def hash60_sql(expr: str, seed: int) -> str:
    """The same hash as :func:`hash60`, as DuckDB SQL over ``expr``."""
    return (
        f"cast(concat('0x', substr(md5({expr} || ':{seed}'), 1, 15)) as bigint)"
    )
