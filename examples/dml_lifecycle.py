"""Row-level DML lifecycle — DELETE / UPDATE / MERGE INTO / rollback.

The reference's deletion story is partition drops (`remove_partitions`)
and hand-written `rewrite_partition` SQL (/root/reference/icedb/icedb.py:
435-589); this engine adds SQL-semantics row DML on top of the same MVCC
log: every statement is copy-on-write over a predicate-pruned candidate
set with ONE atomic commit, and the log makes any of it reversible via
`rollback`.

Run: python examples/dml_lifecycle.py  (uses a temp dir; prints results)
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from icedb_spark import IceTable, PartitionField, PartitionSpec, get_log_file_info
from icedb_spark.session import get_spark


def show(title: str, df) -> None:
    print(f"\n-- {title}")
    df.orderBy("account_id").show(20, truncate=False)


def main() -> None:
    spark = get_spark("icedb-spark-dml")
    spark.sparkContext.setLogLevel("ERROR")

    table = IceTable(
        spark,
        tempfile.mkdtemp(prefix="dml-"),
        partition_spec=PartitionSpec(fields=[PartitionField("r", "region")]),
        sort_order=["account_id"],
        stats_columns=["account_id"],  # zone maps → keyed DML prunes files
    )
    table.insert(
        [
            {"account_id": i, "region": r, "balance": 100.0 * i, "status": "active"}
            for i, r in enumerate(
                ["eu", "eu", "us", "us", "apac", "apac"], start=1
            )
        ]
    )
    show("initial", table.read())
    checkpoint = get_log_file_info(table.snapshot().log_files[-1])[0]

    # DELETE: predicate prunes to the eu partition's file only; rows where
    # the predicate is NULL/false survive (SQL semantics)
    print("delete:", table.delete("region = 'eu' and balance < 150"))
    show("after delete", table.read())

    # UPDATE: assignment is cast back to the column type; updating the
    # partition-source column would migrate rows (here it does not)
    print("update:", table.update({"balance": "balance * 1.05"},
                                  "status = 'active' and region = 'us'"))
    show("after 5% us interest", table.read())

    # MERGE INTO: matched rows take the source's values, unmatched source
    # rows insert; a brand-new column evolves the schema in the same
    # atomic commit (untouched files read it back as NULL)
    updates = spark.createDataFrame(
        [
            {"account_id": 4, "region": "us", "balance": 0.0,
             "status": "closed", "closed_reason": "fraud"},
            {"account_id": 9, "region": "eu", "balance": 50.0,
             "status": "active", "closed_reason": None},
        ]
    )
    print("merge:", table.merge_into(updates, on="account_id",
                                     allow_new_columns=True))
    show("after merge (note schema-evolved closed_reason)", table.read())

    # rollback: one metadata-only commit restores the checkpoint; the
    # pre-rollback head stays time-travelable
    head = get_log_file_info(table.snapshot().log_files[-1])[0]
    print("rollback:", table.rollback(checkpoint))
    show("after rollback (initial state again)", table.read())
    print("pre-rollback head still readable:",
          table.read(at_ms=head).count(), "rows")

    # the same DML as SQL statements (the Delta-SQL surface)
    print(table.sql("DELETE FROM ice WHERE balance < 0").collect()[0])
    print(table.sql("UPDATE ice SET status = 'vip' WHERE balance > 500")
          .collect()[0])

    # merge-on-read delete: O(1) write, rows hidden at scan time; the
    # debt folds in at compaction and vacuum collects the set
    print("mor:", table.delete_where("status = 'closed'"))
    show("after merge-on-read delete (no file rewritten)", table.read())
    print("folded", table.apply_deletes(), "file(s);",
          "sets after vacuum:", end=" ")
    table.tombstone_cleanup(min_age_ms=0)
    print(table._mor_sets())


if __name__ == "__main__":
    main()
