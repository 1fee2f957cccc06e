"""Cross-table ACID transactions through the catalog.

The reference engine is strictly table-scoped — each table's JSONL log is
its own commit domain (``/root/reference/ARCHITECTURE.md``), so a pipeline
writing facts + dims atomically has no primitive to lean on. This layer
adds one, from the same object-store primitives the table log already
relies on (atomic PUT, list-after-write):

Protocol (coordinator-free, all steps idempotent):

1. **STAGE** — inserts inside the transaction are WAP staged
   (``insert(publish=False)``: files land, no log commit exists);
   DELETE/UPDATE ops are QUEUED and execute at commit under the txn tag
   (each sees the pre-txn state plus this transaction's earlier tagged
   commits — self-visibility — never other pending transactions).
2. **INTENT** — one marker ``<txn_root>/<id>.intent.json`` records the
   participant tables and their staged files (the cleanup manifest).
3. **PUBLISH** — queued DML executes, then each participant publishes
   its staged batches; every commit carries ``commit_tag="txn<id>-NNN"``
   and the SAME ``timestamp_ms`` (the seq keeps same-instant log names
   unique and fold-ordered). The tag rides in the log FILENAME
   (log.py:log_file_name), so visibility filtering is metadata-only —
   no extra GETs on the read path.
4. **COMMIT** — one PUT of ``<txn_root>/<id>.commit.json``. This single
   PUT is the atomic visibility flip: a txn-aware reader treats a
   txn-tagged log commit as visible IFF its commit marker exists, so the
   whole transaction appears in every table at once — or never.

Reader contract: tables registered in a catalog with
``enable_transactions(txn_root)`` filter automatically (the catalog
attaches a shared :class:`TxnVisibility` to each). ``catalog.sql`` pins
ONE marker listing per query (``TxnVisibility.consistent``), so a
transaction committing mid-query cannot appear in table B but not table
A. Raw readers that bypass the catalog (plain ``IceTable.open`` without
``commit_visibility``, external Parquet scanners) may observe a partial
transaction during the publish window — the same documented raw-reader
obligation merge-on-read delete sets already carry.

Crash windows: dying before INTENT leaves only staged files (each
table's ``gc_orphans`` reclaims them); dying after INTENT but before
COMMIT leaves txn-tagged commits no filtered reader ever saw —
:func:`abort_orphans` uses the intent manifest to delete their log
commits and data files after a grace window. Commit markers are tiny and
kept forever (they are the transaction's durability record).
"""

from __future__ import annotations

import json
import re
import threading
import uuid
from typing import TYPE_CHECKING, Optional

from .log import get_log_file_info, now_ms, unique_ms

if TYPE_CHECKING:  # pragma: no cover
    from .catalog import IceCatalog

# tag chars survive log_file_name's '/'->'-' '_'->'-' mangling untouched.
# The optional -NNN suffix sequences a transaction's several commits (all
# stamped at the SAME instant): it keeps their log filenames unique and
# makes the fold's sorted-key order equal their execution order, so a
# later op's tombstones win LWW over an earlier op's markers.
_TXN_TAG_RE = re.compile(r"-txn([0-9a-f]{12})(?:-\d{3})?\.jsonl$")


def txn_tag(txn_id: str) -> str:
    return f"txn{txn_id}"


def parse_txn_id(log_key: str) -> Optional[str]:
    """The transaction id a log commit is tagged with, or None."""
    m = _TXN_TAG_RE.search(log_key)
    return m.group(1) if m else None


class TxnVisibility:
    """Shared reader-side filter over one transaction store.

    ``is_visible(log_key)`` hides txn-tagged commits whose commit marker
    is absent as of the last ``refresh()`` — ONE listing of the (tiny)
    txn store, not a GET per commit. ``consistent()`` holds a refresh
    across a multi-table fold so every table in one query sees the same
    committed set (without it, a transaction landing mid-query could
    appear in the second table folded but not the first)."""

    def __init__(self, store):
        self.store = store
        self._committed: set[str] = set()
        # transactions THIS THREAD is mid-commit on: their tagged
        # commits are visible to their own later operations (a txn's
        # second DML on a table must see its first), never to readers in
        # other processes (no marker yet) — and never to OTHER THREADS
        # of this process either: a serving thread folding tables while
        # commit() is between two publishes would otherwise observe the
        # torn state the whole layer exists to prevent
        self._own_local = threading.local()
        self._lock = threading.RLock()
        self._hold = 0

    def _own(self) -> set:
        s = getattr(self._own_local, "tids", None)
        if s is None:
            s = self._own_local.tids = set()
        return s

    # the DataSource reader ships its handle (and this object) to
    # executors; the lock and thread-local must not ride along, and a
    # deserialized copy starts unheld with fresh ones
    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_lock", None)
        d.pop("_own_local", None)
        d["_hold"] = 0
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self._lock = threading.RLock()
        self._own_local = threading.local()

    def refresh(self) -> None:
        with self._lock:
            if self._hold:
                return
            self._committed = {
                key[: -len(".commit.json")]
                for key, _size in self.store.list("", include_hidden=True)
                if key.endswith(".commit.json")
            }

    def is_visible(self, log_key: str) -> bool:
        tid = parse_txn_id(log_key)
        return tid is None or tid in self._committed or tid in self._own()

    def pending(self) -> set[str]:
        """Txn ids with an intent marker but (as of the last refresh) no
        commit marker — transactions in flight or crashed mid-commit."""
        out = set()
        for key, _size in self.store.list("", include_hidden=True):
            if key.endswith(".intent.json"):
                tid = key[: -len(".intent.json")]
                if tid not in self._committed:
                    out.add(tid)
        return out

    def self_visible(self, tid: str):
        """Context: make ``tid``'s tagged commits visible to THIS THREAD
        while its commit() is in flight."""
        vis = self

        class _Own:
            def __enter__(self):
                vis._own().add(tid)
                return vis

            def __exit__(self, *exc):
                vis._own().discard(tid)
                return False

        return _Own()

    def consistent(self):
        """Context manager: one refresh for a whole multi-table query."""
        vis = self

        class _Hold:
            def __enter__(self):
                vis.refresh()
                with vis._lock:
                    vis._hold += 1
                return vis

            def __exit__(self, *exc):
                with vis._lock:
                    vis._hold -= 1
                return False

        return _Hold()


class CatalogTransaction:
    """One transaction: stage writes, then one-PUT atomic commit.

    Use through ``with catalog.transaction() as txn:`` — the context
    manager commits on clean exit and aborts (stages become orphans, no
    commit ever exists) when the body raises."""

    def __init__(self, catalog: "IceCatalog", store):
        self.catalog = catalog
        self.store = store
        self.txn_id = uuid.uuid4().hex[:12]
        self._staged: list[tuple[str, object]] = []  # (table name, StagedInsert)
        self._dml: list[tuple[str, str, tuple]] = []  # (table, op, args)
        self._done = False

    def insert(self, table_name: str, rows=None, df=None):
        """Stage one insert into a registered table (WAP staged — files
        written now, visible only if the transaction commits)."""
        if self._done:
            raise RuntimeError("transaction already finished")
        t = self.catalog.table(table_name)
        staged = t.insert(rows=rows, df=df, publish=False)
        self._staged.append((table_name, staged))
        return staged

    def delete(self, table_name: str, where: str) -> None:
        """Queue a row-level DELETE. DML ops execute at commit() under
        the transaction's tag and shared instant — they see the
        PRE-transaction snapshot (this txn's staged inserts are not yet
        visible to them), and they do not support capture_changes."""
        self._queue_dml(table_name, "delete", (where,))

    def update(self, table_name: str, assignments: dict, where: str) -> None:
        """Queue a row-level UPDATE (same contract as :meth:`delete`)."""
        self._queue_dml(table_name, "update", (assignments, where))

    def merge_into(self, table_name: str, source, on, **kwargs) -> None:
        """Queue a ``MERGE INTO`` upsert (same contract as
        :meth:`delete`: executes at commit under the txn tag against the
        pre-txn snapshot; the source DataFrame is evaluated then).
        ``capture_changes`` is not supported inside a transaction."""
        if kwargs.get("capture_changes"):
            raise ValueError(
                "capture_changes is not supported inside a transaction"
            )
        self._queue_dml(table_name, "merge_into", (source, on, kwargs))

    def _queue_dml(self, table_name: str, op: str, args: tuple) -> None:
        if self._done:
            raise RuntimeError("transaction already finished")
        self.catalog.table(table_name)  # KeyError early for typos
        self._dml.append((table_name, op, args))

    def commit(self) -> Optional[int]:
        """INTENT -> tagged DML execution + per-table tagged PUBLISH
        (same instant) -> one-PUT COMMIT marker. Returns the
        transaction's commit timestamp, or None for an empty
        transaction."""
        if self._done:
            raise RuntimeError("transaction already finished")
        self._done = True
        if not self._staged and not self._dml:
            return None
        n_ops = len(self._dml) + len(
            {name for name, _ in self._staged}
        )
        if n_ops > 999:
            # the 3-digit tag sequence is a correctness boundary: a
            # 4-digit seq would not parse as a txn tag (instantly
            # visible mid-commit — torn) and would sort before -999
            raise ValueError(
                f"transaction has {n_ops} operations; the limit is 999 "
                "— batch DML predicates or split the transaction"
            )
        participants = {name for name, _ in self._staged} | {
            name for name, _, _ in self._dml
        }
        staged_files: dict[str, list[str]] = {}
        for name, staged in self._staged:
            staged_files.setdefault(name, []).extend(
                m.path for m in staged.markers
            )
        intent = {
            "txn": self.txn_id,
            "ts": now_ms(),  # age-gating stamp for abort_orphans
            # staged-insert files are listed here; files a tagged DML
            # writes are recovered from its tagged log at cleanup time
            "tables": [
                {
                    "name": name,
                    "path": self.catalog.table(name).path,
                    "files": staged_files.get(name, []),
                }
                for name in sorted(participants)
            ],
        }
        self.store.put(
            f"{self.txn_id}.intent.json", json.dumps(intent).encode()
        )
        # pin the commit instant AFTER the intent is durable: any
        # incremental reader whose watermark could reach ts must have
        # listed the txn store after this PUT and therefore sees the
        # pending marker (the safe-watermark clamp) — pinning before the
        # PUT would leave a sliver where a concurrent reader advances
        # past ts with no way to know a transaction was in flight
        ts = unique_ms()
        tag = txn_tag(self.txn_id)
        vis = self.catalog._txn_vis
        seq = 0
        with vis.self_visible(self.txn_id):
            # ordering inside the transaction: DML ops run first (each
            # sees the pre-txn state plus this txn's EARLIER tagged
            # commits, via self-visibility), then staged inserts append.
            # Every commit shares ts; the zero-padded seq in the tag
            # keeps same-instant log names unique and fold-ordered.
            for name, op, args in self._dml:
                t = self.catalog.table(name)
                with t._tagged_commits(f"{tag}-{seq:03d}", ts):
                    if op == "delete":
                        t.delete(args[0])
                    elif op == "update":
                        t.update(args[0], args[1])
                    else:
                        t.merge_into(args[0], args[1], **args[2])
                seq += 1
            by_table: dict[str, list] = {}
            for name, staged in self._staged:
                by_table.setdefault(name, []).append(staged)
            for name, batches in by_table.items():
                self.catalog.table(name).publish(
                    batches, commit_tag=f"{tag}-{seq:03d}", timestamp_ms=ts
                )
                seq += 1
        # the atomic visibility flip
        self.store.put(
            f"{self.txn_id}.commit.json",
            json.dumps({"txn": self.txn_id, "ts": ts}).encode(),
        )
        # the intent is only the crash-cleanup manifest — once the
        # commit marker exists it is dead weight on every reader's
        # marker listing; best-effort delete (abort_orphans sweeps
        # stragglers from a crash landing exactly here)
        try:
            self.store.delete(f"{self.txn_id}.intent.json")
        except Exception:
            pass
        return ts

    def abort(self) -> None:
        """Walk away: nothing was published (or, if commit() died midway,
        nothing is visible to filtered readers). Staged files are
        unreferenced and per-table ``gc_orphans`` / :func:`abort_orphans`
        reclaim them after their grace windows."""
        self._done = True


def abort_orphans(catalog: "IceCatalog", min_age_ms: int = 3_600_000) -> dict:
    """Collect transactions that died between INTENT and COMMIT: for each
    intent marker older than ``min_age_ms`` with no commit marker, delete
    the participants' txn-tagged log commits (never visible to filtered
    readers), their staged data files (from the intent manifest), and
    finally the intent marker itself. Returns per-txn counts.

    The grace window serves two roles: raw readers bypassing the
    catalog may be mid-scan over a partial transaction, AND the intent
    timestamp is stamped at commit START — so ``min_age_ms`` must
    comfortably exceed the longest plausible commit (DML Spark jobs
    included) or a slow-but-healthy transaction could be reaped mid
    flight. The commit marker is re-checked immediately before anything
    is destroyed, which closes the window to the final deletion pass;
    run cleanup like vacuum (scheduled, rare), not beside every commit.
    """
    store = catalog._txn_store
    cutoff = now_ms() - min_age_ms
    # fresh listing, not the shared visibility snapshot: a concurrent
    # consistent() hold makes vis.refresh() a deliberate no-op, and
    # reaping from a frozen committed-set would destroy a transaction
    # that committed during the hold
    listed = store.list("", include_hidden=True)
    committed = {
        k[: -len(".commit.json")]
        for k, _s in listed
        if k.endswith(".commit.json")
    }
    out: dict[str, dict] = {}
    for key, _size in listed:
        if not key.endswith(".intent.json"):
            continue
        tid = key[: -len(".intent.json")]
        if tid in committed:
            # committed: the intent is dead weight (commit() deletes it
            # on the happy path; this sweeps crash stragglers)
            store.delete(key)
            continue
        intent = json.loads(store.get(key).decode())
        if intent.get("ts", 0) > cutoff:
            continue
        # last-instant re-check: the committer may have landed its
        # marker since the listing
        if store.exists(f"{tid}.commit.json"):
            store.delete(key)
            continue
        counts = {"logs": 0, "files": 0}
        for entry in intent.get("tables", []):
            name = entry.get("name")
            try:
                t = catalog.table(name)
            except KeyError:
                continue
            # tagged log commits of this txn (metadata-only match). A
            # tagged DML log's ALIVE markers are rewrite files the txn
            # itself wrote (uuid-fresh, referenced nowhere else) —
            # delete them with the log; its TOMBSTONE markers reference
            # pre-txn files and are left strictly alone (deleting the
            # log un-tombstones them, which IS the abort).
            deleted: set[str] = set()
            for log_key, _sz in t.log_io.get_current_log_files(
                t.log_storage
            ):
                if parse_txn_id(log_key) != tid:
                    continue
                get_log_file_info(log_key)  # validates shape
                try:
                    _m, _s, fms, _t = t.log_io.read_log(
                        t.log_storage, log_key
                    )
                except Exception:
                    fms = []
                for m in fms:
                    if m.alive and m.path not in deleted:
                        t.storage.delete(m.path)
                        deleted.add(m.path)
                t.log_storage.delete(log_key)
                counts["logs"] += 1
            for rel in entry.get("files", []):
                if rel not in deleted:  # staged-but-never-published
                    t.storage.delete(rel)
                    deleted.add(rel)
            counts["files"] += len(deleted)
        store.delete(key)
        out[tid] = counts
    return out
