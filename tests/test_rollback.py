"""IceTable.rollback — one-commit snapshot restore from pure log metadata.

The MVCC fold is last-writer-wins, so a rollback commit's re-added markers
must win over older tombstones for the same paths, and maintenance
(vacuum) afterwards must treat restored files as alive.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec, get_log_file_info


def make_table(spark, tmp_path, **kw) -> IceTable:
    return IceTable(
        spark,
        str(tmp_path / "tbl"),
        partition_spec=kw.pop(
            "partition_spec",
            PartitionSpec(fields=[PartitionField("b", "bucket")]),
        ),
        sort_order=kw.pop("sort_order", ["id"]),
        **kw,
    )


def rows(ids, bucket="x", v=1.0):
    return [{"id": i, "bucket": bucket, "v": float(v)} for i in ids]


def ids_of(df):
    return sorted(r["id"] for r in df.select("id").collect())


def head_ms(t):
    return get_log_file_info(t.snapshot().log_files[-1])[0]


def test_rollback_restores_insert_boundary(spark, tmp_path):
    t = make_table(spark, tmp_path)
    t.insert(rows([1, 2]))
    at = head_ms(t)
    t.insert(rows([3, 4], bucket="y"))
    logs_before = len(t.snapshot().log_files)
    s = t.rollback(at)
    assert s == {"files_restored": 0, "files_removed": 1}
    assert len(t.snapshot().log_files) == logs_before + 1  # one append
    assert ids_of(t.read()) == [1, 2]


def test_rollback_undoes_delete_and_merge(spark, tmp_path):
    t = make_table(spark, tmp_path)
    t.insert(rows([1, 2]))
    t.insert(rows([3, 4]))
    at = head_ms(t)
    t.merge_all(max_file_size=1 << 40, max_file_count=100)
    t.delete("id in (2, 3)")
    assert ids_of(t.read()) == [1, 4]
    s = t.rollback(at)
    assert s["files_restored"] == 2  # the two pre-merge small files
    assert ids_of(t.read()) == [1, 2, 3, 4]


def test_rollback_is_itself_time_travelable(spark, tmp_path):
    t = make_table(spark, tmp_path)
    t.insert(rows([1]))
    at1 = head_ms(t)
    t.insert(rows([2]))
    at2 = head_ms(t)
    t.rollback(at1)
    assert ids_of(t.read()) == [1]
    assert ids_of(t.read(at_ms=at2)) == [1, 2]  # pre-rollback still visible
    # roll the rollback back
    t.rollback(at2)
    assert ids_of(t.read()) == [1, 2]


def test_rollback_noop_at_head(spark, tmp_path):
    t = make_table(spark, tmp_path)
    t.insert(rows([1]))
    at = head_ms(t)
    logs = len(t.snapshot().log_files)
    assert t.rollback(at) == {"files_restored": 0, "files_removed": 0}
    assert len(t.snapshot().log_files) == logs


def test_rollback_refuses_vacuumed_target(spark, tmp_path):
    t = make_table(spark, tmp_path)
    t.insert(rows([1, 2]))
    t.insert(rows([3, 4]))
    at = head_ms(t)
    t.merge_all(max_file_size=1 << 40, max_file_count=100)
    t.tombstone_cleanup(min_age_ms=0)  # pre-merge files physically deleted
    with pytest.raises(
        RuntimeError, match="vacuum"
    ):
        t.rollback(at)
    assert ids_of(t.read()) == [1, 2, 3, 4]  # table unharmed


def test_vacuum_after_rollback_keeps_restored_files(spark, tmp_path):
    t = make_table(spark, tmp_path)
    t.insert(rows([1, 2]))
    t.insert(rows([3, 4]))
    at = head_ms(t)
    t.merge_all(max_file_size=1 << 40, max_file_count=100)
    t.rollback(at)
    # LWW: restored markers are now alive; vacuum must remove only the
    # merged file (tombstoned by the rollback), never the restored ones
    t.tombstone_cleanup(min_age_ms=0)
    assert ids_of(t.read()) == [1, 2, 3, 4]
    assert len(t.snapshot().alive_files()) == 2


def test_vacuum_dry_run_previews_without_deleting(spark, tmp_path):
    """dry_run returns exactly what a real vacuum would delete, touching
    nothing; the subsequent real vacuum deletes exactly that set."""
    t = make_table(spark, tmp_path)
    t.insert(rows([1, 2]))
    t.insert(rows([3, 4]))
    t.merge_all(max_file_size=1 << 40, max_file_count=100)
    logs_before = set(t.snapshot().log_files)
    files_before = {m.path for m in t.snapshot().alive_files()}
    dry_logs, dry_data = t.tombstone_cleanup(min_age_ms=0, dry_run=True)
    assert dry_data and dry_logs
    # nothing happened: same logs, same alive files, data still readable
    assert set(t.snapshot().log_files) == logs_before
    assert {m.path for m in t.snapshot().alive_files()} == files_before
    real_logs, real_data = t.tombstone_cleanup(min_age_ms=0)
    assert sorted(real_data) == sorted(dry_data)
    assert sorted(real_logs) == sorted(dry_logs)
    assert ids_of(t.read()) == [1, 2, 3, 4]


def test_gc_dry_run(spark, tmp_path):
    t = make_table(spark, tmp_path)
    t.insert(rows([1]))
    # plant an orphan (never-committed data file)
    t.storage.put("_data/b=x/orphan.parquet", b"junk")
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        dry_del, _ = t.gc_orphans(grace_ms=0, dry_run=True)
        assert dry_del == ["_data/b=x/orphan.parquet"]
        assert t.storage.exists("_data/b=x/orphan.parquet")  # untouched
        real_del, _ = t.gc_orphans(grace_ms=0)
    assert real_del == dry_del
    assert not t.storage.exists("_data/b=x/orphan.parquet")


def test_rollback_refuses_partially_collapsed_target(spark, tmp_path):
    """The subtle hazard: after a vacuum, an intermediate instant can fold
    to a PARTIAL state (a surviving insert log + markers that were carried
    into the newer collapsed log). The horizon guard must refuse every
    pre-vacuum instant, not just fully-empty ones."""
    t = make_table(spark, tmp_path)
    t.insert(rows([1, 2], bucket="a"))
    t.insert(rows([3, 4], bucket="a"))
    t.merge_all(max_file_size=1 << 40, max_file_count=100)  # merged log M
    t.insert(rows([5, 6], bucket="z"))  # L3: survives the vacuum untouched
    at = head_ms(t)  # everything alive: {merged a-file, z-file}
    t.tombstone_cleanup(min_age_ms=0)  # deletes L1, L2, M → collapsed C(now)
    # without the horizon guard, snapshot(at) would fold to z's file only
    # (M's marker rides in C, stamped after `at`) — a silent partial state
    with pytest.raises(RuntimeError, match="vacuum"):
        t.rollback(at)
    assert ids_of(t.read()) == [1, 2, 3, 4, 5, 6]  # table unharmed


def test_rollback_allowed_after_vacuum_for_younger_instants(spark, tmp_path):
    t = make_table(spark, tmp_path)
    t.insert(rows([1, 2]))
    t.merge_all(max_file_size=1 << 40, max_file_count=100)
    t.tombstone_cleanup(min_age_ms=0)
    at = head_ms(t)  # post-vacuum instant: fully reconstructible
    t.insert(rows([9]))
    t.rollback(at)
    assert ids_of(t.read()) == [1, 2]
