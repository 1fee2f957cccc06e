"""Materialized-view double-write tests (reference examples/materialized-view.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.mv import DoubleWriter


def test_mv_double_write_and_converge(spark, tmp_path):
    base = IceTable(
        spark,
        str(tmp_path / "base"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("d", "date_format(timestamp_millis(ts), 'yyyy-MM-dd')")]
        ),
        sort_order=["event", "ts"],
    )
    # view: per-user event counts, folded incrementally on merge
    mv = IceTable(
        spark,
        str(tmp_path / "mv"),
        partition_spec=PartitionSpec(fields=[PartitionField("u", "user_id")]),
        sort_order=["user_id"],
        custom_merge_query=(
            "select user_id, cast(sum(cnt) as bigint) as cnt, max(ts) as ts "
            "from source_files group by user_id"
        ),
    )
    w = DoubleWriter(
        base,
        {"counts": mv},
        transforms={
            "counts": lambda df: df.groupBy("user_id").agg(
                F.count("*").cast("long").alias("cnt"), F.max("ts").alias("ts")
            )
        },
    )

    rows = [
        {"ts": 1686000000000 + i, "event": "page_load", "user_id": ["a", "b", "a"][i % 3]}
        for i in range(9)
    ]
    for i in range(3):
        w.insert(rows[3 * i : 3 * i + 3])

    def view_counts():
        return {
            r["user_id"]: r["total"]
            for r in mv.read()
            .groupBy("user_id")
            .agg(F.sum("cnt").alias("total"))
            .collect()
        }

    truth = {
        r["user_id"]: r["c"]
        for r in base.read().groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    assert view_counts() == truth == {"a": 6, "b": 3}

    # merges fold the view's partial aggregates without changing the answer
    n = w.merge_all(max_file_count=100)
    assert n >= 1
    assert view_counts() == truth
    # the view physically converged to one row per user
    assert mv.read().count() == 2

def test_doublewriter_rows_path_applies_format_row(spark, tmp_path):
    """DoubleWriter.insert(rows=...) must honor the base table's format_row
    hook exactly like base.insert(rows=...) does."""
    from icedb_spark import IceTable, PartitionField, PartitionSpec
    from icedb_spark.mv import DoubleWriter

    spec = PartitionSpec(fields=[PartitionField("d", "'x'")])

    def fmt(row):
        row["tagged"] = "yes"
        return row

    base = IceTable(spark, str(tmp_path / "b"), partition_spec=spec,
                    sort_order=[], format_row=fmt)
    view = IceTable(spark, str(tmp_path / "v"), partition_spec=spec, sort_order=[])
    dw = DoubleWriter(base, {"v": view})
    dw.insert(rows=[{"k": 1}])
    assert base.read().collect()[0]["tagged"] == "yes"
    assert view.read().collect()[0]["tagged"] == "yes"
