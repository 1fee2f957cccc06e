"""SparkSession factory with the engine's recommended configuration.

These settings are the 100 TB defaults, not test conveniences:

* **AQE on** (+ skew-join handling): runtime re-planning fixes skewed
  partition keys and right-sizes shuffle partitions after each stage.
* **shuffle.partitions** sized to cores locally; on a cluster set it to
  2-3× total executor cores (AQE coalesces the excess).
* **maxPartitionBytes 128m**: scan tasks sized so a 100 TB table fans out to
  ~800k tasks rather than a few giant ones.
* **Arrow enabled**: every Python-adjacent path (applyInArrow writers,
  mapInPandas feature extractors) moves columnar batches, never rows.
* **nanosAsLong**: ns-precision parquet timestamps read as epoch-ns BIGINT
  (Spark has no ns timestamp type; truncating silently would lose data).
* **session timezone UTC**: timestamp arithmetic is reproducible across
  engines and clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "icedb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or cpus)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    )
    if master.startswith("local"):
        # local mode runs executors inside the driver JVM, whose 1g
        # default heap OOMs under many-core shuffles; harmless if a JVM
        # already exists (conf ignored) or on a real cluster (not local)
        b = b.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
