"""Event analytics on a streamed table: sessionization, event-time windows,
and as-of attribution.

Pipeline: a parquet file-drop is streamed into an IceTable (each micro-batch
one atomic commit), then the table's snapshot answers three temporal
questions the reference engine's SQL surface cannot express:

1. per-user sessions (30-min inactivity gap) — ``operators.sessionize``
2. daily event-time rollups — ``streaming.windowed_agg`` (same code path a
   live stream would use, with watermarked append emission)
3. purchase→click attribution — ``operators.asof_join`` (latest click
   at-or-before each purchase, per user)

Run: python examples/event_analytics.py  (uses temp dirs; prints results)
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.operators import asof_join, sessionize
from icedb_spark.session import get_spark
from icedb_spark.streaming import micro_batch_pipeline, windowed_agg
from icedb_spark.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("icedb-spark-event-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # --- 1. stream the raw events in (file-drop source, atomic commits) ---
    events = load_table(spark, SF_DIR, "events")
    src = tempfile.mkdtemp(prefix="ea-src-")
    events.repartition(2).write.mode("overwrite").parquet(src)

    table = IceTable(
        spark,
        tempfile.mkdtemp(prefix="ea-tbl-"),
        partition_spec=PartitionSpec(
            fields=[
                PartitionField(
                    "d",
                    "date_format(timestamp_micros(ts div 1000), 'yyyy-MM-dd')",
                )
            ]
        ),
        sort_order=["user_id", "ts"],
    )
    q = micro_batch_pipeline(
        table,
        src,
        schema=events.schema,
        checkpoint_dir=tempfile.mkdtemp(prefix="ea-ck-"),
        merge_every=1,
    )
    q.awaitTermination(120)
    snap = table.read().withColumn("ets", F.expr("timestamp_micros(ts div 1000)"))
    print(f"-- streamed {snap.count()} events into {table.path}")

    # --- 2. sessionize: 30-min gap, per-user session stats ---
    s = sessionize(
        snap.select("user_id", F.expr("ts div 1000").alias("us")),
        "user_id",
        "us",
        gap=1_800_000_000,
    )
    stats = (
        s.groupBy("user_id", "session_id")
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("sessions"), F.max("count").alias("longest"))
        .orderBy(F.desc("sessions"))
    )
    print("-- busiest users by session count --")
    stats.show(5)

    # --- 3. daily rollup via the streaming window operator (batch here) ---
    daily = windowed_agg(
        snap,
        "ets",
        "1 day",
        {"events": F.count("*"), "revenue": F.round(F.sum("value"), 2)},
        keys=("event_type",),
    )
    print("-- top daily buckets --")
    daily.orderBy(F.desc("events")).select(
        F.timestamp_micros(F.col("win_start_us")).alias("day"),
        "event_type",
        "events",
        "revenue",
    ).show(5)

    # --- 4. attribution: latest click at-or-before each purchase ---
    purchases = snap.where(F.col("event_type") == "purchase").select(
        "user_id", F.expr("ts div 1000").alias("p_us"), F.col("value").alias("amount")
    )
    clicks = (
        snap.where(F.col("event_type") == "click")
        .groupBy("user_id", F.expr("ts div 1000").alias("c_us"))
        .agg(F.max("value").alias("click_value"))
    )
    attributed = asof_join(purchases, clicks, ["user_id"], "p_us", "c_us")
    n_p, n_a = purchases.count(), attributed.count()
    print(f"-- {n_a}/{n_p} purchases attributed to a prior click")
    attributed.withColumn(
        "mins_since_click", F.round((F.col("p_us") - F.col("c_us")) / 60e6, 1)
    ).orderBy("mins_since_click").select(
        "user_id", "amount", "mins_since_click"
    ).show(5)


if __name__ == "__main__":
    main()
