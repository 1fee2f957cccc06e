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

import re
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .log import get_log_file_info
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


class IncrementalView:
    """Aggregate materialized view maintained INCREMENTALLY from the base
    table's row-level change feed — classic incremental view maintenance
    (IVM) over the commutative-group algebra (COUNT / SUM), the derived-
    table pattern a lakehouse uses when re-aggregating the base at every
    refresh is unaffordable.

    Where :class:`DoubleWriter` folds the view in at INGEST time (the
    reference's double-write, examples/materialized-view.py:44-52), this
    maintains it AFTER the fact from :meth:`IceTable.changes_feed`: each
    ``refresh()`` turns the window's change rows into signed DELTA partials
    (+1 for ``insert``/``update_postimage``, -1 for ``delete``/
    ``update_preimage``) aggregated by the view keys, and commits them to
    the view table in ONE atomic insert. Reading the view re-folds
    partials (``SUM`` over deltas), so deletes cancel inserts exactly and
    groups whose live count reaches zero vanish.

    Exactly-once refresh: the window's head timestamp rides in the commit
    tag (``ivmt<ms>``) inside the committed log file name — the cursor
    advances ATOMICALLY with the delta commit, so a crash between the two
    is impossible by construction. A monotonic ``_ivm/cursor`` marker
    (written after commit, read as max(marker, tags)) carries the cursor
    past vacuum horizons that collapse old tagged logs.

    Scale shape per refresh: one metadata fold on the base, a scan of ONLY
    the window's changed files/images, one groupBy on the view keys (the
    delta is O(changed groups), not O(table)), one small insert. The view
    table should be built with :meth:`merge_sql` as its
    ``custom_merge_query`` so compaction folds partials without changing
    read results (the AggregatingMergeTree contract).

    Requirements: base DML must run with ``capture_changes=True``
    (uncaptured DML is invisible to the feed — same contract as
    ``changes_feed``), and base commit timestamps must be monotonic at the
    refresh boundary (single writer, or writers with bounded clock skew
    and a refresh lag above it — the same assumption time travel makes).
    Run ONE refresher at a time (two concurrent refreshes of the same
    window would each commit under a distinct writer identity and
    double-apply — the same external-lock contract every maintenance op
    in this engine carries).
    Supported aggregates are the self-inverse ones: COUNT and SUM. MIN/MAX
    are not incrementally maintainable under deletes (a retracted max
    needs the base) — recompute those with :class:`DoubleWriter` or a full
    refresh instead.
    """

    CURSOR_KEY = "_ivm/cursor"
    _TAG_RE = re.compile(r"-(?:ivmt(\d+))\.jsonl$")

    def __init__(
        self,
        base: IceTable,
        view: IceTable,
        keys: list[str],
        sums: Optional[list[str]] = None,
        count_col: str = "cnt",
    ):
        if count_col in (sums or []) or count_col in keys:
            raise ValueError(f"count_col {count_col!r} collides")
        self.base = base
        self.view = view
        self.keys = list(keys)
        self.sums = list(sums or [])
        self.count_col = count_col

    def merge_sql(self) -> str:
        """The view table's ``custom_merge_query``: folds delta partials at
        compaction so merge never changes what :meth:`read` returns."""
        keys = ", ".join(self.keys)
        aggs = ", ".join(
            f"sum({c}) as {c}" for c in [self.count_col, *self._sum_cols()]
        )
        return f"select {keys}, {aggs} from source_files group by {keys}"

    def _sum_cols(self) -> list[str]:
        return [f"sum_{c}" for c in self.sums]

    def cursor(self) -> int:
        """Highest base-log timestamp already applied (0 = never)."""
        cur = 0
        try:
            cur = int(self.view.storage.get(self.CURSOR_KEY).decode())
        except Exception:
            pass
        for key, _size in self.view.log_io.get_current_log_files(
            self.view.log_storage
        ):
            m = self._TAG_RE.search(key)
            if m:
                cur = max(cur, int(m.group(1)))
        return cur

    def refresh(self, until_ms: Optional[int] = None) -> dict:
        """Fold the base's changes in ``(cursor, head]`` into the view.

        Returns ``{"since", "until", "delta_groups"}``; a window with no
        changes commits nothing. Safe to re-run: a replayed window is a
        no-op because its tag already names a committed view log.
        """
        since = self.cursor()
        state = self.base.snapshot(until_ms, keep_parsed=True)
        head = since
        for key in state.log_files:
            head = max(head, get_log_file_info(key)[0])
        if head <= since:
            return {"since": since, "until": since, "delta_groups": 0}
        feed = self.base.changes_feed(since, head)
        sign = (
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                F.lit(1),
            )
            .when(
                F.col("_change_type").isin("delete", "update_preimage"),
                F.lit(-1),
            )
            .otherwise(F.lit(0))
        )
        aggs = [F.sum(sign).cast("long").alias(self.count_col)] + [
            F.sum(sign * F.col(c)).alias(f"sum_{c}") for c in self.sums
        ]
        delta = feed.groupBy(*self.keys).agg(*aggs)
        markers = self.view.insert(df=delta, commit_tag=f"ivmt{head}")
        # marker write is AFTER the commit: on crash the tag alone carries
        # the cursor; the marker only needs to win once before vacuum
        self.view.storage.put(self.CURSOR_KEY, str(head).encode())
        return {"since": since, "until": head, "delta_groups": len(markers)}

    def read(self, at_ms: Optional[int] = None) -> DataFrame:
        """The view's current aggregate state: partials folded, zero-count
        groups (every live row retracted) dropped."""
        folded = (
            self.view.read(at_ms=at_ms)
            .groupBy(*self.keys)
            .agg(
                F.sum(self.count_col).alias(self.count_col),
                *[F.sum(c).alias(c) for c in self._sum_cols()],
            )
        )
        return folded.where(F.col(self.count_col) != 0)
