"""Partition-spec evolution: a table re-opened with a NEW spec keeps old
files readable, places new files under the new layout, and pruning stays
correct across the mix (missing path fields are kept, not dropped)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec


def _spec(expr_name, expr):
    return PartitionSpec(fields=[PartitionField(expr_name, expr)])


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_spec_evolution_reads_and_prunes_across_both_layouts(spark, tmp_path):
    root = str(tmp_path / "t")
    t1 = IceTable(spark, root, partition_spec=_spec("k", "kind"), sort_order=["id"])
    t1.insert(rows=[{"id": 1, "kind": "a", "region": "eu"},
                    {"id": 2, "kind": "b", "region": "us"}])

    # re-open the same table with a DIFFERENT partition spec
    t2 = IceTable(spark, root, partition_spec=_spec("r", "region"), sort_order=["id"])
    t2.insert(rows=[{"id": 3, "kind": "a", "region": "eu"},
                    {"id": 4, "kind": "b", "region": "us"}])

    # full scan sees every row whatever wrote it
    assert _ids(t2.read()) == [1, 2, 3, 4]

    # pruning on the NEW field must KEEP old-spec files (they cannot prove
    # absence) and prune new-spec files normally
    eu = t2.read(partition_values={"r": "eu"})
    assert _ids(eu.where("region = 'eu'")) == [1, 3]
    files = t2.files_for(partition_values={"r": "eu"})
    parts = {m.partition() for m in files}
    assert "r=us" not in parts            # new-layout us file pruned
    assert any(p.startswith("k=") for p in parts)  # old files kept

    # pruning on the OLD field symmetric
    files_old = t2.files_for(partition_values={"k": "a"})
    parts_old = {m.partition() for m in files_old}
    assert "k=b" not in parts_old
    assert any(p.startswith("r=") for p in parts_old)

    # merge compacts per-partition within each layout without mixing paths
    while t2.merge(max_file_size=1 << 40, max_file_count=100) is not None:
        pass
    assert _ids(t2.read()) == [1, 2, 3, 4]


def test_unknown_partition_field_hint_keeps_everything(spark, tmp_path):
    t = IceTable(spark, str(tmp_path / "t2"),
                 partition_spec=_spec("k", "kind"), sort_order=["id"])
    t.insert(rows=[{"id": 1, "kind": "a"}])
    # a hint on a field no file carries is a no-op, not a wipe-out
    assert _ids(t.read(partition_values={"nope": "x"})) == [1]
