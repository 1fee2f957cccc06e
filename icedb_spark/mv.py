"""Materialized views as double-written tables.

The reference realizes a materialized view as a *second table* with its own
partition spec and a ``custom_merge_query`` that incrementally folds rows,
double-writing every insert (/root/reference/examples/materialized-view.py:44-52,
README.md:630). The view's aggregate state converges under merges; queries
re-apply the same aggregate (the AggregatingMergeTree contract).

``DoubleWriter`` is that pattern as an object: one ``insert`` commits the
batch to the base table and each view table. Commits are per-table atomic
(one log append each) but not atomic across tables — same as the reference;
readers of a view see batch-aligned state.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

from .table import IceTable


class DoubleWriter:
    """Writes every batch to a base table and its materialized views.

    ``transforms`` optionally maps a view's name to a DataFrame transform
    applied before inserting into that view (the reference's ``format_row``
    hook, generalized to a DataFrame function).
    """

    def __init__(
        self,
        base: IceTable,
        views: dict[str, IceTable],
        transforms: Optional[dict[str, Callable[[DataFrame], DataFrame]]] = None,
    ):
        self.base = base
        self.views = views
        self.transforms = transforms or {}

    def insert(self, rows=None, df: Optional[DataFrame] = None) -> dict[str, list]:
        if df is None:
            # route row dicts through the base table's own rows path so its
            # format_row hook applies — building the DataFrame here would
            # silently bypass it and diverge from base.insert(rows=...)
            if self.base.format_row:
                rows = [self.base.format_row(dict(r)) for r in rows]
            df = self.base.spark.createDataFrame(rows)
        out = {"base": self.base.insert(df=df)}
        for name, view in self.views.items():
            vdf = self.transforms.get(name, lambda d: d)(df)
            out[name] = view.insert(df=vdf)
        return out

    def merge_all(self, **merge_kwargs) -> int:
        """Run merge-to-exhaustion on the base and every view; returns the
        number of merge operations performed."""
        n = 0
        for t in [self.base, *self.views.values()]:
            while t.merge(**merge_kwargs) is not None:
                n += 1
        return n
