"""Tail a table's append stream with incremental (CDC) reads.

A downstream consumer (feature builder, search indexer, replication job)
wants "every row inserted since my last run" WITHOUT re-reading the table.
``IceTable.changes(since_ms, until_ms)`` answers from log metadata alone:
insert commits inside the window contribute exactly their files;
merge/rewrite commits are invisible (they rewrite existing rows). The
consumer stores one watermark integer between runs, and consecutive
windows compose into the full stream — even across a compaction.

Run: python examples/cdc_tail.py  (uses temp dirs; prints each batch)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from icedb_spark import IceTable, PartitionField, PartitionSpec, get_log_file_info


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as d:
        table = IceTable(
            spark,
            os.path.join(d, "events"),
            partition_spec=PartitionSpec(
                fields=[PartitionField("d", "substr(day, 1, 10)")]
            ),
            sort_order=["ts"],
        )

        watermark = 0  # the consumer's only state
        for batch_no in range(3):
            table.insert(
                [
                    {
                        "day": f"2024-02-0{batch_no + 1}",
                        "ts": 1_700_000_000_000 + 100 * batch_no + i,
                        "user": f"u{i % 3}",
                        "v": float(batch_no * 10 + i),
                    }
                    for i in range(5)
                ]
            )
            if batch_no == 1:
                # compaction between producer and consumer must be invisible
                table.merge_all(max_file_size=1 << 40, max_file_count=100)

            head = get_log_file_info(table.snapshot().log_files[-1])[0]
            batch = table.changes(watermark, head)
            print(f"batch {batch_no}: {batch.count()} new rows")
            batch.orderBy("ts").show(5, truncate=False)
            watermark = head

        total = table.read().count()
        print(f"table holds {total} rows; consumer saw 15 across 3 windows")
        assert total == 15

        # row-level feed: DML run with capture_changes lands in
        # changes_feed as delete / update_preimage / update_postimage
        # images, composed with insert commits under the same watermark
        table.delete("user = 'u2'", capture_changes=True)
        table.update({"v": "v + 0.5"}, "user = 'u0'", capture_changes=True)
        feed = table.changes_feed(watermark)
        print("DML change feed since the last watermark:")
        feed.groupBy("_change_type").count().orderBy("_change_type").show()
        assert feed.where("_change_type = 'delete'").count() == 3
        assert feed.where("_change_type = 'update_postimage'").count() == 6


if __name__ == "__main__":
    main()
