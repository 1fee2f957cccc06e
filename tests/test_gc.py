"""Orphan-file garbage collection: data files a crashed writer left behind
(written but never committed to the log) are invisible to every reader and
would otherwise live forever. ``gc_orphans`` deletes them once provably
older than the grace window; everything the log references — alive OR
tombstoned-awaiting-vacuum — is untouchable."""

from __future__ import annotations

import os
import time

import pytest

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.log import MemoryStorage, storage_for


@pytest.fixture()
def table(spark, tmp_path):
    t = IceTable(
        spark,
        str(tmp_path / "tbl"),
        partition_spec=PartitionSpec(fields=[PartitionField("b", "bucket")]),
        sort_order=["ts"],
    )
    t.insert([{"bucket": "b1", "ts": i, "v": float(i)} for i in range(10)])
    t.insert([{"bucket": "b1", "ts": 10 + i, "v": float(i)} for i in range(10)])
    return t


def _plant_orphan(t: IceTable, name: str = "deadbeef.parquet") -> str:
    key = f"_data/b=b1/{name}"
    t.storage.put(key, b"PAR1 not really parquet PAR1")
    return key


def test_gc_deletes_old_orphan_keeps_committed(table):
    orphan = _plant_orphan(table)
    before = table.read().count()
    deleted, kept = table.gc_orphans(grace_ms=0)
    assert deleted == [orphan]
    assert kept == []
    assert not table.storage.exists(orphan)
    # every committed file survives and the table still reads identically
    assert table.read().count() == before


def test_gc_respects_grace_window(table):
    orphan = _plant_orphan(table)
    deleted, kept = table.gc_orphans(grace_ms=3_600_000)
    assert deleted == [] and kept == [orphan]
    assert table.storage.exists(orphan)


def test_gc_keeps_tombstoned_files_until_vacuum(table):
    """Merged-away files are tombstoned but still log-referenced (time
    travel / in-flight readers) — GC must never touch them."""
    assert table.merge() is not None
    state = table.snapshot()
    tombstoned = [m.path for m in state.file_markers if m.tombstone is not None]
    assert tombstoned
    deleted, _kept = table.gc_orphans(grace_ms=0)
    assert deleted == []
    for p in tombstoned:
        assert table.storage.exists(p)


def test_gc_after_vacuum_finds_nothing(table):
    table.merge()
    table.tombstone_cleanup(0)
    deleted, kept = table.gc_orphans(grace_ms=0)
    assert deleted == [] and kept == []


def test_memory_storage_mtime():
    s = MemoryStorage("gc-test-root")
    t0 = int(time.time() * 1000)
    s.put("_data/x", b"abc")
    mt = s.mtime_ms("_data/x")
    assert mt is not None and mt >= t0 - 1000
    assert s.mtime_ms("_data/missing") is None


def test_posix_storage_mtime(tmp_path):
    s = storage_for(str(tmp_path))
    s.put("_data/y", b"abc")
    assert s.mtime_ms("_data/y") is not None
    assert s.mtime_ms("_data/missing") is None


def test_gc_collects_crashed_writer_tmp_file(table):
    """A POSIX writer dying between pq.write_table(tmp) and the atomic
    rename leaves a `.tmp-` file that normal listings hide — GC must still
    see and delete it."""
    tmp_key = "_data/b=b1/feedface.parquet.tmp-deadbeef"
    table.storage.put(tmp_key, b"partial bytes")
    # normal listing hides it; hidden listing sees it
    normal = {k for k, _ in table.storage.list("_data")}
    hidden = {k for k, _ in table.storage.list("_data", include_hidden=True)}
    assert tmp_key not in normal and tmp_key in hidden
    deleted, kept = table.gc_orphans(grace_ms=0)
    assert tmp_key in deleted and kept == []
    assert not table.storage.exists(tmp_key)


def test_gc_warns_below_min_safe_grace(table):
    """A grace below MIN_SAFE_GC_GRACE_MS risks deleting a live writer's
    uncommitted files (clock skew shrinks it further) — must warn."""
    from icedb_spark.table import MIN_SAFE_GC_GRACE_MS

    with pytest.warns(UserWarning, match="safe minimum"):
        table.gc_orphans(grace_ms=0)
    with pytest.warns(UserWarning):
        table.gc_orphans(grace_ms=MIN_SAFE_GC_GRACE_MS - 1)
