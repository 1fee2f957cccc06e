"""File-level zone maps (per-file min/max stats) and driver-side data
skipping.

The feature: every write captures ``{col: [min, max]}`` for the table's
stats columns (default: the clustering columns) into the file's log marker
(wire key ``"st"`` — an EXTRA key the reference's marker reader ignores,
/root/reference/icedb/log.py:127-137), and ``read(column_ranges=...)``
skips files whose zone map proves no row can satisfy ``col BETWEEN lo AND
hi``. At 100 TB this prunes the scan plan with O(markers) driver-side
metadata instead of opening Parquet footers.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.log import FileMarker
from icedb_spark.table import _stats_overlap


def make_table(spark, path, **kw):
    kw.setdefault(
        "partition_spec",
        PartitionSpec(fields=[PartitionField("b", "bucket")]),
    )
    kw.setdefault("sort_order", ["ts"])
    return IceTable(spark, str(path), **kw)


def rows_for(bucket, ts_values):
    return [
        {"bucket": bucket, "ts": t, "val": f"v{t}"} for t in ts_values
    ]


# ---------------------------------------------------------------- wire format


def test_marker_stats_roundtrip():
    m = FileMarker("_data/b=1/f.parquet", 100, 10, stats={"ts": [5, 90]})
    d = m.to_dict()
    assert d["st"] == {"ts": [5, 90]}
    back = FileMarker.from_dict(json.loads(json.dumps(d)))
    assert back.stats == {"ts": [5, 90]}
    # markers written by the reference (no "st" key) parse with stats=None
    legacy = FileMarker.from_dict({"p": "_data/x.parquet", "t": 1, "b": 2})
    assert legacy.stats is None


def test_stats_overlap_is_conservative():
    # disjoint above and below
    assert not _stats_overlap({"ts": [5, 9]}, {"ts": (10, 20)})
    assert not _stats_overlap({"ts": [25, 30]}, {"ts": (10, 20)})
    # touching bounds are inclusive
    assert _stats_overlap({"ts": [5, 10]}, {"ts": (10, 20)})
    assert _stats_overlap({"ts": [20, 25]}, {"ts": (10, 20)})
    # open sides
    assert _stats_overlap({"ts": [5, 9]}, {"ts": (None, 20)})
    assert not _stats_overlap({"ts": [5, 9]}, {"ts": (10, None)})
    # no stats for the column / no stats at all -> keep
    assert _stats_overlap({"other": [1, 2]}, {"ts": (10, 20)})
    assert _stats_overlap(None, {"ts": (10, 20)})
    # incomparable types -> keep, never raise
    assert _stats_overlap({"ts": ["2023-01-01", "2023-02-01"]}, {"ts": (10, 20)})
    # malformed predicate is an error, not a silent full prune
    with pytest.raises(ValueError):
        _stats_overlap({"ts": [1, 2]}, {"ts": (1, 2, 3)})


# ------------------------------------------------------------------- capture


def test_insert_captures_minmax_on_sort_columns(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.insert(rows_for("a", [10, 30, 20]))
    t.insert(rows_for("a", [100, 150]))
    markers = sorted(t.snapshot().alive_files(), key=lambda m: m.created_ms)
    assert [m.stats for m in markers] == [
        {"ts": [10, 30]},
        {"ts": [100, 150]},
    ]


def test_stats_skip_all_null_and_nan_columns(spark, tmp_path):
    t = make_table(
        spark, tmp_path / "t", sort_order=["ts"], stats_columns=["ts", "x"]
    )
    # x all-null in the first file, NaN-poisoned in the second
    t.insert(
        df=spark.createDataFrame(
            [("a", 1, None), ("a", 2, None)],
            "bucket string, ts long, x double",
        )
    )
    t.insert([{"bucket": "a", "ts": 3, "x": float("nan")}, {"bucket": "a", "ts": 4, "x": 1.0}])
    markers = sorted(t.snapshot().alive_files(), key=lambda m: m.created_ms)
    assert markers[0].stats == {"ts": [1, 2]}  # no "x" entry
    assert markers[1].stats == {"ts": [3, 4]}  # NaN min/max dropped


def test_stats_on_timestamp_column_are_iso_strings(spark, tmp_path):
    t = make_table(spark, tmp_path / "t", sort_order=["when"])
    df = spark.createDataFrame(
        [("a", "2023-06-01 10:00:00"), ("a", "2023-06-03 12:00:00")],
        ["bucket", "s"],
    ).select("bucket", F.col("s").cast("timestamp").alias("when"))
    t.insert(df=df)
    (m,) = t.snapshot().alive_files()
    assert m.stats == {"when": ["2023-06-01T10:00:00", "2023-06-03T12:00:00"]}
    # ISO bounds prune; datetime-object bounds are incomparable -> kept
    assert t.files_for(column_ranges={"when": ("2023-06-04T00:00:00", None)}) == []
    assert len(t.files_for(column_ranges={"when": ("2023-06-02T00:00:00", None)})) == 1


# ------------------------------------------------------------------- pruning


def test_read_column_ranges_prunes_files_and_preserves_answers(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.insert(rows_for("a", [0, 5, 9]))
    t.insert(rows_for("a", [10, 15, 19]))
    t.insert(rows_for("b", [20, 25, 29]))
    t.insert(rows_for("b", [30, 35, 39]))

    assert len(t.files_for()) == 4
    pruned = t.files_for(column_ranges={"ts": (12, 27)})
    assert len(pruned) == 2  # [10,19] and [20,29] overlap; [0,9], [30,39] skip

    pred = F.col("ts").between(12, 27)
    full = {r["ts"] for r in t.read().where(pred).collect()}
    skipped = {
        r["ts"]
        for r in t.read(column_ranges={"ts": (12, 27)}).where(pred).collect()
    }
    assert skipped == full == {15, 19, 20, 25}
    # composes with partition pruning
    both = t.files_for(
        partition_values={"b": "a"}, column_ranges={"ts": (12, 27)}
    )
    assert len(both) == 1


def test_nulls_in_stats_column_do_not_break_pruning(spark, tmp_path):
    # zone maps cover non-null values only; a BETWEEN predicate excludes
    # NULL rows anyway, so skipping a disjoint file that also holds nulls
    # must not change any answer
    t = make_table(spark, tmp_path / "t")
    t.insert([{"bucket": "a", "ts": v, "val": "x"} for v in [1, None, 3]])
    t.insert([{"bucket": "a", "ts": v, "val": "y"} for v in [50, None, 60]])
    (m1, m2) = sorted(t.snapshot().alive_files(), key=lambda m: m.created_ms)
    assert m1.stats == {"ts": [1, 3]} and m2.stats == {"ts": [50, 60]}
    kept = t.files_for(column_ranges={"ts": (40, 100)})
    assert [m.path for m in kept] == [m2.path]
    pred = F.col("ts").between(40, 100)
    assert {
        r["ts"] for r in t.read(column_ranges={"ts": (40, 100)}).where(pred).collect()
    } == {50, 60}


# ------------------------------------------------- stats survive maintenance


def test_merge_rewrites_stats_for_merged_file(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.insert(rows_for("a", [10, 20]))
    t.insert(rows_for("a", [30, 40]))
    t.insert(rows_for("b", [99]))
    res = t.merge()
    assert res is not None
    _log, new_marker, part, acc = res
    assert part == "b=a" and len(acc) == 2
    assert new_marker.stats == {"ts": [10, 40]}
    # the untouched partition's marker carried its stats through the fold
    state = t.snapshot()
    by_part = {m.partition(): m for m in state.alive_files()}
    assert by_part["b=b"].stats == {"ts": [99, 99]}
    # pruning works on the post-merge table
    assert len(t.files_for(column_ranges={"ts": (95, 100)})) == 1


def test_rewrite_partition_recomputes_stats(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.insert(rows_for("a", [10, 20, 30, 40]))
    t.rewrite_partition("b=a", "select * from _rows where ts < 25")
    (m,) = t.snapshot().alive_files()
    assert m.stats == {"ts": [10, 20]}


def test_zorder_table_captures_stats_on_every_z_column(spark, tmp_path):
    t = IceTable(
        spark,
        str(tmp_path / "t"),
        partition_spec=PartitionSpec(fields=[PartitionField("p", "'all'")]),
        sort_order=[],
        zorder_by=["x", "y"],
    )
    t.insert([{"x": float(i), "y": float(9 - i)} for i in range(10)])
    (m,) = t.snapshot().alive_files()
    assert m.stats == {"x": [0.0, 9.0], "y": [0.0, 9.0]}


def test_column_in_prunes_by_zone_map_and_keeps_any_match(spark, tmp_path):
    from icedb_spark import IceTable, PartitionField, PartitionSpec

    t = IceTable(
        spark,
        str(tmp_path / "tin"),
        partition_spec=PartitionSpec(fields=[PartitionField("p", "'x'")]),
        sort_order=["id"],
        stats_columns=["id"],
    )
    t.insert([{"id": i} for i in (1, 2, 3)])
    t.insert([{"id": i} for i in (100, 200)])
    t.insert([{"id": i} for i in (900, 950)])
    # IN-list spanning files 1 and 3 — file 2 provably disjoint
    kept = t.files_for(column_in={"id": [2, 940]})
    assert len(kept) == 2
    # sql() auto-derives the same hint end-to-end
    df = t.sql("select count(*) as c from ice where id in (2, 940)")
    assert df.collect()[0]["c"] == 1  # 940 not present; 2 is
    import pytest

    with pytest.raises(ValueError, match="non-null"):
        t.files_for(column_in={"id": [1, None]})
    with pytest.raises(ValueError, match="non-empty"):
        t.files_for(column_in={"id": []})
