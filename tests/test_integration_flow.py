"""Scaled-down replica of the reference's many-insert integration loop
(/root/reference/integration_test.py:311-426): N inserts → merge to
exhaustion → tombstone cleanup, with exact file/log-count invariants and
result invariance at every step. Also covers CSV ingest (F5 pipeline shape),
empty tables, and the v2 file-range lookup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec

SPEC = PartitionSpec(
    fields=[PartitionField("d", "date_format(timestamp_millis(ts), 'yyyy-MM-dd')")]
)


def test_many_insert_merge_cleanup_loop(spark, tmp_path):
    t = IceTable(spark, str(tmp_path / "tbl"), partition_spec=SPEC,
                 sort_order=["event", "ts"])
    n_inserts = 12
    day = 86_400_000
    base = 1686_000_000_000
    # rows spread over 3 day-partitions per insert
    for i in range(n_inserts):
        rows = [
            {"ts": base + (j % 3) * day, "event": f"e{j % 2}", "user_id": "a", "n": i}
            for j in range(6)
        ]
        t.insert(rows)

    state = t.snapshot()
    assert len(state.log_files) == n_inserts
    assert len(state.alive_files()) == 3 * n_inserts

    def result():
        return sorted(
            (r["event"], r["c"])
            for r in t.read().groupBy("event").agg(F.count("*").alias("c")).collect()
        )

    before = result()
    assert before == [("e0", 36), ("e1", 36)]

    merges = 0
    while t.merge(max_file_size=1 << 40, max_file_count=1000) is not None:
        merges += 1
    assert merges == 3  # one per partition
    state = t.snapshot()
    assert len(state.alive_files()) == 3
    # every original file is now tombstoned but still listed
    assert len([m for m in state.file_markers if not m.alive]) == 3 * n_inserts
    assert result() == before

    deleted_logs, deleted_data = t.tombstone_cleanup(min_age_ms=0)
    assert len(deleted_data) == 3 * n_inserts
    state = t.snapshot()
    assert len(state.log_files) == 1
    assert len(state.alive_files()) == 3
    assert result() == before


def test_empty_table_read(spark, tmp_path):
    t = IceTable(spark, str(tmp_path / "tbl"), partition_spec=SPEC)
    state = t.snapshot()
    assert state.alive_files() == []
    assert t.merge() is None
    assert t.remove_partitions(lambda parts: parts) == 0


def test_csv_ingest_pipeline(spark, tmp_path):
    """F5 shape: CSV source → typed columns → partitioned sorted insert."""
    csv_path = str(tmp_path / "src.csv")
    with open(csv_path, "w") as f:
        f.write("trip_id,started_ms,fare\n")
        for i in range(100):
            f.write(f"t{i},{1686_000_000_000 + (i % 4) * 86_400_000},{i * 1.5}\n")
    src = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(csv_path)
    )
    t = IceTable(
        spark,
        str(tmp_path / "tbl"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("d", "date_format(timestamp_millis(started_ms), 'yyyy-MM-dd')")]
        ),
        sort_order=["started_ms"],
    )
    t.insert(df=src)
    assert t.read().count() == 100
    assert len(t.snapshot().alive_files()) == 4
    total = t.read().agg(F.round(F.sum("fare"), 2)).collect()[0][0]
    assert total == round(sum(i * 1.5 for i in range(100)), 2)


def test_alive_files_in_range(spark, tmp_path):
    t = IceTable(spark, str(tmp_path / "tbl"), partition_spec=SPEC, sort_order=["ts"])
    day = 86_400_000
    for i in range(5):
        t.insert([{"ts": 1686_000_000_000 + i * day, "event": "x"}])
    files = t.alive_files_in_range("d", "2023-06-06", "2023-06-08")
    assert len(files) == 3
    assert all("_data/d=2023-06-0" in f for f in files)
    # spark can consume the pre-pruned list directly
    df = spark.read.parquet(*files)
    assert df.count() == 3
