"""Multi-table registry: cross-table Spark SQL over MVCC-consistent
snapshots.

The reference is strictly single-table (one ``IceDBv3`` instance per table);
real analytics joins lakehouse tables. ``IceCatalog`` holds named
:class:`~icedb_spark.table.IceTable` instances and registers each table's
snapshot as a temp view for one query — with ``at_ms`` applying the SAME
timestamp to every table, so a cross-table join is evaluated against one
consistent point in history (each table's log is folded independently, but
both folds stop at the same wall-clock instant).

Scale note: registration is pure driver-side metadata (each ``read()`` is a
file-list fold, no data touched); the query itself is ordinary Spark SQL —
broadcast hints, AQE, and all Catalyst optimizations apply across the views.
"""

from __future__ import annotations

import re
import threading
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from .log import read_horizon_ms
from .table import IceTable

# temp views are session-global: registration and the query that reads them
# must not interleave with another sql() call's registration, or a join
# could mix snapshots from two different at_ms instants (spark.sql analyzes
# eagerly, so holding the lock across register+sql is sufficient — same
# contract as table._VIEW_LOCK)
_CATALOG_LOCK = threading.Lock()


class IceCatalog:
    """Named collection of IceTables sharing one SparkSession."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, IceTable] = {}
        self._txn_store = None
        self._txn_vis = None

    def enable_transactions(self, txn_root: str) -> "IceCatalog":
        """Turn on cross-table ACID transactions (:mod:`icedb_spark.txn`).

        ``txn_root`` is a directory/prefix (any supported scheme) holding
        the transaction markers — give every catalog of the same
        warehouse the SAME root. Every table registered (before or
        after) gets the shared visibility filter, so catalog readers
        never observe a partial transaction; raw readers that bypass the
        catalog carry the documented raw-reader obligation."""
        from .log import storage_for
        from .txn import TxnVisibility

        self._txn_store = storage_for(txn_root.rstrip("/"))
        self._txn_vis = TxnVisibility(self._txn_store)
        with _CATALOG_LOCK:
            for t in self._tables.values():
                t.commit_visibility = self._txn_vis
        return self

    def transaction(self) -> "object":
        """``with catalog.transaction() as txn: txn.insert("t", df=...)``
        — commits atomically on clean exit (one marker PUT flips every
        participant visible at the same instant), aborts to nothing on
        exception. Requires :meth:`enable_transactions`."""
        if self._txn_vis is None:
            raise RuntimeError(
                "call enable_transactions(txn_root) before transaction()"
            )
        from contextlib import contextmanager

        from .txn import CatalogTransaction

        @contextmanager
        def _run():
            txn = CatalogTransaction(self, self._txn_store)
            try:
                yield txn
            except BaseException:
                txn.abort()
                raise
            txn.commit()
            self._txn_vis.refresh()

        return _run()

    def txn_cleanup(self, min_age_ms: int = 3_600_000) -> dict:
        """Collect transactions that died between intent and commit —
        see :func:`icedb_spark.txn.abort_orphans`."""
        from .txn import abort_orphans

        if self._txn_vis is None:
            raise RuntimeError("transactions are not enabled")
        return abort_orphans(self, min_age_ms)

    def add(self, name: str, table: IceTable) -> "IceCatalog":
        if not name.isidentifier():
            raise ValueError(f"table name {name!r} is not a valid identifier")
        if table.spark is not self.spark:
            raise ValueError("table belongs to a different SparkSession")
        if self._txn_vis is not None and table.commit_visibility is None:
            table.commit_visibility = self._txn_vis
        # under the lock: a concurrent sql() mid-registration must not see
        # the name flip tables, and replacing a name must drop the prior
        # table's frozen view — a stale snapshot answering for the new
        # table is silent wrong data
        with _CATALOG_LOCK:
            replacing = name in self._tables
            self._tables[name] = table
            if replacing:
                try:
                    self.spark.catalog.dropTempView(name)
                except Exception:
                    pass
        return self

    def add_path(self, name: str, path: str, **overrides) -> "IceCatalog":
        """Mount a table straight from its storage root via the persisted
        ``_meta/spec.json`` (:meth:`IceTable.open`) — no spec restating,
        the one-liner for attaching an existing lakehouse directory."""
        return self.add(name, IceTable.open(self.spark, path, **overrides))

    def discover(self, warehouse_root: str) -> "IceCatalog":
        """Mount every table under a warehouse root: each immediate child
        directory holding a persisted ``_meta/spec.json`` is attached
        under its directory name (``warehouse/events`` → table
        ``events``). One storage listing, then one :meth:`add_path` per
        table — the zero-config way to open an existing lakehouse
        directory tree. Children without a readable spec (or whose
        directory name can't be a view name) are skipped; a name that
        collides with an already-registered table replaces it, same
        contract as :meth:`add`."""
        from .log import storage_for

        store = storage_for(warehouse_root.rstrip("/"))
        names = sorted(
            {
                key.split("/")[0]
                for key, _size in store.list("", include_hidden=True)
                if key.split("/")[1:] == ["_meta", "spec.json"]
            }
        )
        # a directory name that can't be a view name can't be mounted —
        # skip it rather than abort the whole warehouse
        names = [n for n in names if n.isidentifier()]
        for name in names:
            try:
                self.add_path(name, f"{warehouse_root.rstrip('/')}/{name}")
            except Exception:
                continue  # unreadable or corrupt spec: skip, per contract
        return self

    def remove(self, name: str) -> None:
        # same lock as sql(): dropping the view while another thread is
        # between registration and query would race it into a missing or
        # stale view
        with _CATALOG_LOCK:
            self._tables.pop(name, None)
            # drop any view a previous sql() registered — a stale frozen
            # snapshot answering for a removed table is silent wrong data
            try:
                self.spark.catalog.dropTempView(name)
            except Exception:
                pass

    def table(self, name: str) -> IceTable:
        return self._tables[name]

    def names(self) -> list[str]:
        return sorted(self._tables)

    def sql(self, query: str, at_ms: Optional[int] = None) -> DataFrame:
        """Run Spark SQL with the registered tables visible as views.

        ``at_ms`` time-travels ALL tables to the same instant — the
        cross-table analog of ``IceTable.read(at_ms=...)``; a join of two
        tables at T sees exactly the commits each table had at T.

        Only tables whose name appears in the query are folded and
        registered (word-boundary match — a name inside a string literal
        registers harmlessly): with many registered tables, each holding
        thousands of log files, folding all of them for a one-table query
        would dominate the driver's planning time.

        DML and maintenance statements route to the NAMED table's own
        operators, exactly like ``IceTable.sql`` (``DELETE FROM t ...``,
        ``UPDATE t SET ...``, ``OPTIMIZE t``, ``VACUUM t [RETAIN n
        HOURS]``) — but only when ``at_ms`` is unset: mutating the
        present from a time-traveled session is a contradiction and
        raises.

        Caveat (same as ``IceTable.sql``): each call RE-REGISTERS the
        referenced tables' session-global temp views, narrowed to the
        columns this query's text references. A caller that keeps using
        those view names after ``sql()`` returns sees that reduced
        schema — register your own full-width view
        (``table.read().createOrReplaceTempView(...)``) for reuse.
        """
        if re.match(r"\s*(delete|update|optimize|vacuum)\b", query, re.I):
            # Route first, then enforce the at_ms contradiction only when a
            # registered table actually matches the DML shape — a query that
            # merely STARTS with one of these words (e.g. selecting from an
            # unregistered `delete_log` table) falls through to plain SQL.
            for name, table in self._tables.items():
                if at_ms is not None:
                    if table._route_sql_dml(query, name, dry_run=True):
                        raise ValueError(
                            "DML through a time-traveled catalog session is "
                            "not allowed; drop at_ms to mutate"
                        )
                    continue
                routed = table._route_sql_dml(query, name)
                if routed is not None:
                    return routed
        # Pin ONE instant even when the caller passed none: each read()
        # lists and folds its table's log independently, so with
        # at_ms=None a commit landing between two registrations would give
        # a cross-table join mixing snapshots — the consistency this class
        # advertises must hold on the default path too.
        if at_ms is None:
            # read_horizon_ms, not now_ms: unique_ms commit stamps run
            # ahead of the wall clock when several commits share a
            # millisecond, and a default snapshot must cover every
            # commit that has already returned to its caller
            at_ms = read_horizon_ms()
        # one txn-visibility refresh for the WHOLE query: a transaction
        # committing between two tables' folds must not appear in the
        # second but not the first (that partial view is exactly what the
        # txn layer exists to prevent)
        from contextlib import nullcontext

        vis_window = (
            self._txn_vis.consistent() if self._txn_vis else nullcontext()
        )
        with _CATALOG_LOCK, vis_window:
            for name, table in self._tables.items():
                if re.search(rf"\b{re.escape(name)}\b", query):
                    # same conservative projection as IceTable.sql: the
                    # fallback scan path cannot be column-pruned past
                    # its mapInArrow boundary, so narrow each view to
                    # the columns the query text can reference — one
                    # fold shared by the derivation and the scan
                    state = table.snapshot(at_ms)
                    cols = table._query_columns(
                        query, table.spark_schema(state)
                    )
                    table.read(
                        at_ms=at_ms, columns=cols, state=state
                    ).createOrReplaceTempView(name)
            return self.spark.sql(query)
