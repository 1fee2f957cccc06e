"""Custom-merge patterns — executable docs mirroring the reference's
examples (custom-merge-aggregation.py, custom-merge-replacing.py,
materialized-view.py in /root/reference/examples/).

Three tables, three merge behaviors:

1. **aggregate-on-merge** (AggregatingMergeTree): inserts seed cnt=1, merges
   re-aggregate partial sums, queries re-apply the same aggregate.
2. **replace-on-merge** (ReplacingMergeTree): merges keep only the latest
   row per key; queries re-apply the latest-wins rule across partitions.
3. **materialized view**: a second table double-written on every insert with
   its own merge aggregation.

Run: python examples/custom_merges.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.mv import DoubleWriter
from icedb_spark.session import get_spark

SPEC = PartitionSpec(fields=[PartitionField("d", "'2023-06-07'")])

ROWS = [
    {"user_id": "a", "event": "click", "ts": 100, "amount": 2.0},
    {"user_id": "a", "event": "view", "ts": 200, "amount": 1.0},
    {"user_id": "b", "event": "click", "ts": 150, "amount": 5.0},
    {"user_id": "a", "event": "click", "ts": 300, "amount": 7.0},
]


def aggregate_on_merge(spark):
    t = IceTable(
        spark, tempfile.mkdtemp(prefix="aggm-"), partition_spec=SPEC,
        custom_insert_query="select user_id, event, cast(1 as bigint) as cnt from _rows",
        custom_merge_query=(
            "select user_id, event, cast(sum(cnt) as bigint) as cnt "
            "from source_files group by user_id, event"
        ),
    )
    for r in ROWS:
        t.insert([r])  # one file per insert — the merge has work to do
    while t.merge() is not None:
        pass
    print("-- aggregate-on-merge: sum(cnt) by user (re-aggregated at query) --")
    t.sql("select user_id, sum(cnt) as cnt from ice group by user_id order by user_id").show()


def replace_on_merge(spark):
    t = IceTable(
        spark, tempfile.mkdtemp(prefix="repl-"), partition_spec=SPEC,
        custom_merge_query="""
            select user_id, _l.ts as ts, _l.event as event, _l.amount as amount
            from (select user_id,
                    max(named_struct('ts', ts, 'event', event, 'amount', amount)) as _l
                  from source_files group by user_id)
        """,
    )
    for r in ROWS:
        t.insert([r])
    while t.merge() is not None:
        pass
    print("-- replace-on-merge: latest row per user (argmax by ts) --")
    t.sql("""
        select user_id, max_by(event, ts) as event, max(ts) as ts from ice
        group by user_id order by user_id
    """).show()


def materialized_view(spark):
    base = IceTable(spark, tempfile.mkdtemp(prefix="base-"), partition_spec=SPEC)
    view = IceTable(
        spark, tempfile.mkdtemp(prefix="view-"), partition_spec=SPEC,
        custom_merge_query=(
            "select event, cast(sum(cnt) as bigint) as cnt "
            "from source_files group by event"
        ),
    )
    w = DoubleWriter(
        base, {"by_event": view},
        transforms={"by_event": lambda df: df.selectExpr("event", "cast(1 as bigint) as cnt")},
    )
    for r in ROWS:
        w.insert([r])
    w.merge_all()
    print("-- materialized view: event counts (double-written table) --")
    view.sql("select event, sum(cnt) as cnt from ice group by event order by event").show()


if __name__ == "__main__":
    spark = get_spark("icedb-spark-custom-merges")
    spark.sparkContext.setLogLevel("ERROR")
    aggregate_on_merge(spark)
    replace_on_merge(spark)
    materialized_view(spark)
