"""Cross-table ACID transactions: move data between tables atomically.

The classic lakehouse gap: a pipeline that appends to `facts` and
updates `dims` has no way to make both visible together — a reader
between the two commits sees a torn state. `IceCatalog.transaction()`
closes it with object-store primitives only (no coordinator):

  * inserts are WAP-staged, DELETE/UPDATE are queued;
  * at commit, every participant's log commit carries the SAME instant
    and a txn tag in its filename;
  * ONE marker PUT flips the whole transaction visible everywhere.

Run: python examples/transactions.py  (uses temp dirs; prints states)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from icedb_spark import IceCatalog, IceTable, PartitionField, PartitionSpec


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("txn-example")
        .getOrCreate()
    )
    root = tempfile.mkdtemp(prefix="icetxn-")
    spec = PartitionSpec(fields=[PartitionField("b", "bucket")])

    orders = IceTable(spark, f"{root}/orders", partition_spec=spec,
                      sort_order=["order_id"])
    archive = IceTable(spark, f"{root}/archive", partition_spec=spec,
                       sort_order=["order_id"])
    cat = (
        IceCatalog(spark)
        .add("orders", orders)
        .add("archive", archive)
        .enable_transactions(f"{root}/_txn")
    )

    orders.insert([
        {"bucket": "b", "order_id": i, "status": "open" if i % 2 else "done"}
        for i in range(6)
    ])
    print("before:", cat.sql(
        "select (select count(*) from orders) as live,"
        " (select count(*) from archive) as archived"
    ).collect()[0].asDict())

    # Archive the finished orders: copy to `archive` AND delete from
    # `orders` — atomically. No reader ever sees the row in both tables
    # or in neither.
    done = orders.read().where("status = 'done'")
    with cat.transaction() as txn:
        txn.insert("archive", df=done)
        txn.delete("orders", "status = 'done'")
        mid = cat.sql(
            "select (select count(*) from orders) as live,"
            " (select count(*) from archive) as archived"
        ).collect()[0]
        print("mid-txn (unchanged):", mid.asDict())

    print("after:", cat.sql(
        "select (select count(*) from orders) as live,"
        " (select count(*) from archive) as archived"
    ).collect()[0].asDict())

    # CDC consumers bound their window with safe_watermark(): it stays
    # below any pending transaction, so the incremental loop never skips
    # one whose commit marker hasn't landed yet
    wm = orders.safe_watermark()
    print("CDC window to safe watermark:",
          orders.changes(0, wm).count(), "rows")

    # Housekeeping for transactions that died between intent and commit
    print("cleanup of crashed txns:", cat.txn_cleanup(min_age_ms=0))

    # Concurrency: commits validate FIRST-COMMITTER-WINS before their
    # marker PUT. A conflicting transaction (same file rewritten by a
    # peer since its snapshot) aborts with a full reclaim and raises
    # TxnConflictError — the retry loop every writer should wear:
    from icedb_spark.txn import TxnConflictError

    for attempt in range(5):
        try:
            with cat.transaction() as txn:
                txn.update("orders", {"status": "'audited'"},
                           "status = 'open'")
            break
        except TxnConflictError as e:
            # a peer won the race; re-run against the new state. If the
            # named peer never resolves it crashed mid-commit — run
            # cat.txn_cleanup() to reclaim it and unblock.
            print(f"conflict (attempt {attempt}): {e}; retrying")
    print("after audited update:", cat.sql(
        "select status, count(*) as n from orders group by status"
    ).collect())
    spark.stop()


if __name__ == "__main__":
    main()
