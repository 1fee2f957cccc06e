"""Data-quality gates for ingestion: CHECK constraints and quarantine
splits (the Delta CHECK-constraint / DLT-expectations analog).

A rule is a named SQL boolean expression over the batch's columns. SQL
CHECK semantics apply: a row violates a rule only when the expression
evaluates to FALSE — NULL passes (use ``col is not null`` to demand
presence). Everything here is a column expression (JVM-side, fused into
the batch's scan) — the quarantine split reads the batch once per side
and never touches the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ConstraintViolation(ValueError):
    """Raised by ``IceTable.insert`` in ``fail`` mode; carries the per-rule
    violation counts so callers can log/alert without re-running the batch."""

    def __init__(self, table_path: str, counts: dict[str, int]):
        self.table_path = table_path
        self.counts = counts
        detail = ", ".join(f"{k}: {v}" for k, v in sorted(counts.items()))
        super().__init__(
            f"constraint violations on {table_path} ({detail}); "
            "no file was written"
        )


def rule_ok(expr: str) -> Column:
    """TRUE unless the rule evaluates FALSE (NULL passes — SQL CHECK)."""
    return F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))


def all_ok(rules: dict[str, str]) -> Column:
    """Conjunction of every rule (TRUE for an empty rule set)."""
    if not rules:
        return F.lit(True)
    return reduce(lambda a, b: a & b, (rule_ok(e) for e in rules.values()))


def violation_counts(df: DataFrame, rules: dict[str, str]) -> dict[str, int]:
    """Per-rule violation counts in ONE aggregate job (no per-rule scans).
    Returns only rules with a non-zero count."""
    if not rules:
        return {}
    row = df.agg(
        *[
            F.sum((~rule_ok(e)).cast("long")).alias(name)
            for name, e in rules.items()
        ]
    ).collect()[0]
    return {k: int(v) for k, v in row.asDict().items() if v}


def split_valid(
    df: DataFrame, rules: dict[str, str], violations_col: str = "_violations"
) -> tuple[DataFrame, DataFrame]:
    """Quarantine split: ``(valid, invalid)`` where the invalid side gains
    ``violations_col`` — the array of rule names the row failed — so the
    quarantine table records WHY each row was held. Insert the valid side
    into the main table and the invalid side into a quarantine IceTable
    (or any sink); reprocess after fixing upstream.

    Both sides are lazy filters over the same plan — at scale each
    materializes in its own ingest job with the predicate fused into the
    scan; nothing is collected."""
    if not rules:
        return df, df.where(F.lit(False)).withColumn(
            violations_col, F.array().cast("array<string>")
        )
    tags = F.array_compact(
        F.array(
            *[
                F.when(~rule_ok(e), F.lit(name))
                for name, e in rules.items()
            ]
        )
    )
    valid = df.where(all_ok(rules))
    invalid = df.where(~all_ok(rules)).withColumn(violations_col, tags)
    return valid, invalid
