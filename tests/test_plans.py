"""Physical-plan assertions: the scale properties must hold, not just the
row values — pushdown, pruning, codegen, broadcast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec


@pytest.fixture()
def table(spark, tmp_path, sf_dir):
    t = IceTable(
        spark,
        str(tmp_path / "tbl"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("d", "date_format(timestamp_micros(ts div 1000), 'yyyy-MM-dd')")]
        ),
        sort_order=["event_type", "ts"],
    )
    t.insert(df=spark.read.parquet(f"{sf_dir}/events.parquet"))
    return t


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(table):
    df = table.read().where(F.col("event_type") == "click").select("user_id", "value")
    plan = _physical(df)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]" in plan
    # projection reaches the scan: only the 3 needed columns are read
    assert "ReadSchema: struct<event_type:string,user_id:bigint,value:double>" in plan
    assert "*(1)" in plan  # whole-stage codegen span covers filter+project


def test_partition_pruning_reduces_input_files(table):
    total = len(table.read().inputFiles())
    pruned = table.read(partition_values={"d": ("2024-01-01", "2024-01-03")})
    assert len(pruned.inputFiles()) < total
    assert len(pruned.inputFiles()) <= 3


def test_broadcast_join_chosen_for_small_dim(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    df = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    assert "BroadcastHashJoin" in _physical(df)


def test_insert_single_shuffle(spark, table):
    """The insert job is one shuffle (partition key) + arrow write — verify
    the plan of the manifest job contains exactly one exchange."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = table._prepare_batch(ev)
    from icedb_spark.table import _MANIFEST_SCHEMA, _PART_COL, _make_group_writer

    writer = _make_group_writer(table.path, table.sort_order, "snappy", 122_880)
    manifest = df.groupBy(_PART_COL).applyInArrow(writer, schema=_MANIFEST_SCHEMA)
    plan = _physical(manifest)
    assert plan.count("Exchange hashpartitioning") == 1
