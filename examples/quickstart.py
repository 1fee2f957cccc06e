"""Quickstart — the reference's README flow (quick start at
/root/reference/README.md:120-191), re-expressed on the Spark engine.

Creates a table partitioned by user + event date, inserts JSON-ish row
dicts (nested properties stringified, the recommended pattern), queries
with JSON extraction, compacts, and time-travels to the pre-merge state.

Run: python examples/quickstart.py  (uses a temp dir; prints results)
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from icedb_spark import IceTable, PartitionField, PartitionSpec, get_log_file_info
from icedb_spark.session import get_spark


def main() -> None:
    spark = get_spark("icedb-spark-quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    table = IceTable(
        spark,
        tempfile.mkdtemp(prefix="quickstart-"),
        # Hive-style u=<user>/d=<date> partitions from native expressions
        # (reference partition function, README.md:128-134)
        partition_spec=PartitionSpec(
            fields=[
                PartitionField("u", "user_id"),
                PartitionField("d", "date_format(timestamp_millis(ts), 'yyyy-MM-dd')"),
            ]
        ),
        sort_order=["event", "ts"],
    )

    # insert: row dicts, JSON properties stringified (README.md:138-156)
    rows = [
        {"ts": 1686176939445, "event": "page_load", "user_id": "user_a",
         "properties": json.dumps({"page_name": "Home"})},
        {"ts": 1676126229999, "event": "page_load", "user_id": "user_b",
         "properties": json.dumps({"page_name": "Home"})},
        {"ts": 1686176939666, "event": "page_load", "user_id": "user_a",
         "properties": json.dumps({"page_name": "Settings"})},
    ]
    table.insert(rows)
    first_commit_ms = get_log_file_info(table.snapshot().log_files[-1])[0]
    table.insert(
        [{"ts": 1686176949445, "event": "page_load", "user_id": "user_a",
          "properties": json.dumps({"page_name": "Home"})}]
    )

    # query: the canonical count-by-user-and-page with JSON extraction
    # (README.md:172-191) — plain Spark SQL over the snapshot view
    print("-- count by user_id, page --")
    table.sql(
        """
        select user_id, count(*) as cnt,
               get_json_object(properties, '$.page_name') as page
        from ice
        group by user_id, page
        order by cnt desc, user_id, page
        """
    ).show(truncate=False)

    # merge: compact small files partition by partition (README quick start)
    n = 0
    while table.merge() is not None:
        n += 1
    print(f"-- merged {n} partitions; alive files:",
          len(table.snapshot().alive_files()))

    # time travel: read the state as of the first commit (README.md:573-577)
    print("-- rows at first commit (time travel) --")
    print(table.read(at_ms=first_commit_ms).count(), "rows (now:",
          table.read().count(), ")")


if __name__ == "__main__":
    main()
