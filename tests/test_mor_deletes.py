"""Merge-on-read (predicate) deletes: O(1) write, read-time application,
compaction folds them in, vacuum collects obsolete sets, rewrites guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec


def _mk(spark, tmp_path, name="t"):
    return IceTable(
        spark, str(tmp_path / name),
        partition_spec=PartitionSpec(fields=[PartitionField("k", "kind")]),
        sort_order=["id"],
    )


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_mor_delete_applies_at_read_without_rewrites(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.insert(rows=[{"id": i, "kind": "a", "v": float(i)} for i in range(6)])
    files_before = {m.path for m in t.snapshot().alive_files()}
    r = t.delete_where("v >= 4")
    # zero rewrites, zero new commits — pure metadata
    assert {m.path for m in t.snapshot().alive_files()} == files_before
    assert _ids(t.read()) == [0, 1, 2, 3]
    # sql() rides the same scan
    assert t.sql("select count(*) as c from ice").collect()[0]["c"] == 4
    # time travel BEFORE the delete still sees everything
    assert _ids(t.read(at_ms=r["ts"] - 1)) == [0, 1, 2, 3, 4, 5]


def test_mor_delete_is_time_scoped_sql_semantics(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.insert(rows=[{"id": 1, "kind": "a", "v": 9.0}])
    t.delete_where("v > 5")
    # a LATER insert of a matching row is NOT deleted (SQL DELETE is a
    # point-in-time statement, not a standing rule)
    t.insert(rows=[{"id": 2, "kind": "a", "v": 9.0}])
    assert _ids(t.read()) == [2]
    # stacking a second set composes
    t.delete_where("id = 2")
    assert _ids(t.read()) == []


def test_mor_sets_fold_in_at_merge_and_vacuum_collects(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.insert(rows=[{"id": 1, "kind": "a", "v": 1.0}])
    t.insert(rows=[{"id": 2, "kind": "a", "v": 8.0}])
    t.delete_where("v > 5")
    assert _ids(t.read()) == [1]
    n = t.optimize(max_file_size=1 << 40, max_file_count=100)
    assert n > 0
    assert _ids(t.read()) == [1]          # physically folded now
    assert t._mor_sets()                  # set still present...
    t.tombstone_cleanup(min_age_ms=0)
    assert t._mor_sets() == []            # ...collected once obsolete
    assert _ids(t.read()) == [1]


def test_rewrites_refuse_while_sets_pending(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.insert(rows=[{"id": 1, "kind": "a", "v": 1.0}])
    t.delete_where("v > 100")
    with pytest.raises(RuntimeError, match="merge-on-read"):
        t.delete("id = 1")
    with pytest.raises(RuntimeError, match="merge-on-read"):
        t.update({"v": "v + 1"}, "true")
    with pytest.raises(RuntimeError, match="merge-on-read"):
        t.merge_into(
            spark.createDataFrame([(1, "a", 2.0)], "id long, kind string, v double"),
            on="id",
        )
    # and the DataSource batch reader refuses too
    from icedb_spark.datasource import IceDataSource

    try:
        spark.dataSource.register(IceDataSource)
    except Exception:
        pass
    with pytest.raises(Exception, match="merge-on-read"):
        spark.read.format("icedb").option("path", t.path).load().count()
    # after folding + vacuum the guards lift (apply_deletes targets the
    # single-file partition optimize has no reason to compact)
    assert t.apply_deletes() == 1
    t.tombstone_cleanup(min_age_ms=0)
    t.update({"v": "v + 1"}, "id = 1")
    assert t.read().collect()[0]["v"] == 2.0


def test_bad_predicate_fails_fast(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.insert(rows=[{"id": 1, "kind": "a", "v": 1.0}])
    with pytest.raises(Exception):
        t.delete_where("no_such_column > 5")
    assert t._mor_sets() == []


def test_tag_pins_mor_set_for_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.insert(rows=[{"id": 1, "kind": "a", "v": 1.0},
                   {"id": 2, "kind": "a", "v": 9.0}])
    t.delete_where("v > 5")
    t.tag("post-delete")
    assert t.apply_deletes() == 1
    t.tombstone_cleanup(min_age_ms=0)
    # the tag pins both the pre-compaction file AND the delete set, so the
    # tagged read still shows the deleted view, not the raw file
    assert _ids(t.read(tag="post-delete")) == [1]
    t.delete_tag("post-delete")
    t.tombstone_cleanup(min_age_ms=0)
    assert t._mor_sets() == []
