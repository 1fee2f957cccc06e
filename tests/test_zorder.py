"""Z-order layout: query results unchanged, but Parquet row-group min/max
stats become selective on EVERY z-ordered column (lexicographic sort gives
the trailing column no locality at all)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec

SPEC = PartitionSpec(fields=[PartitionField("p", "'all'")])


def _grid(spark, n=96):
    """Deterministic n×n grid: uniform in both dimensions."""
    return (
        spark.range(n * n)
        .select(
            F.col("id"),
            (F.col("id") % n).cast("double").alias("x"),
            (F.col("id") / n).cast("long").cast("double").alias("y"),
        )
    )


def _rowgroup_coverage(path: str, col: str) -> float:
    """Mean fraction of the column's full domain each row group spans
    (1.0 = every row group covers everything → zero pruning potential)."""
    f = pq.ParquetFile(path)
    idx = f.schema_arrow.names.index(col)
    spans, lo_all, hi_all = [], None, None
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        spans.append((st.min, st.max))
        lo_all = st.min if lo_all is None else min(lo_all, st.min)
        hi_all = st.max if hi_all is None else max(hi_all, st.max)
    domain = (hi_all - lo_all) or 1.0
    return sum((hi - lo) / domain for lo, hi in spans) / len(spans)


def _single_file(table: IceTable) -> str:
    files = table.snapshot().alive_files()
    assert len(files) == 1
    return table.storage.absolute(files[0].path)


@pytest.mark.parametrize("layout", ["lex", "zorder"])
def test_layouts_roundtrip(spark, tmp_path, layout):
    kw = (
        {"sort_order": ["x", "y"]}
        if layout == "lex"
        else {"zorder_by": ["x", "y"]}
    )
    t = IceTable(spark, str(tmp_path / layout), partition_spec=SPEC,
                 row_group_size=512, **kw)
    df = _grid(spark)
    t.insert(df=df)
    assert t.read().count() == df.count()
    assert sorted(t.read().columns) == ["id", "x", "y"]


def test_zorder_gives_both_columns_locality(spark, tmp_path):
    df = _grid(spark)
    lex = IceTable(spark, str(tmp_path / "lex"), partition_spec=SPEC,
                   sort_order=["x", "y"], row_group_size=512)
    zed = IceTable(spark, str(tmp_path / "zed"), partition_spec=SPEC,
                   zorder_by=["x", "y"], row_group_size=512)
    lex.insert(df=df)
    zed.insert(df=df)

    lex_y = _rowgroup_coverage(_single_file(lex), "y")
    z_x = _rowgroup_coverage(_single_file(zed), "x")
    z_y = _rowgroup_coverage(_single_file(zed), "y")

    # lexicographic (x, y): y has no locality — every row group spans ~the
    # whole y domain. Z-order: both dimensions land well under half.
    assert lex_y > 0.9, f"expected no y-locality under lex sort, got {lex_y}"
    assert z_x < 0.5, f"z-order x coverage too wide: {z_x}"
    assert z_y < 0.5, f"z-order y coverage too wide: {z_y}"


def test_zorder_survives_merge(spark, tmp_path):
    t = IceTable(spark, str(tmp_path / "tbl"), partition_spec=SPEC,
                 zorder_by=["x", "y"], row_group_size=512)
    df = _grid(spark)
    t.insert(df=df.where(F.col("id") % 2 == 0))
    t.insert(df=df.where(F.col("id") % 2 == 1))
    while t.merge(max_file_size=1 << 40, max_file_count=10) is not None:
        pass
    assert t.read().count() == df.count()
    # the merged file is re-z-ordered, not concatenated
    z_y = _rowgroup_coverage(_single_file(t), "y")
    assert z_y < 0.5, f"merged file lost z locality: {z_y}"


def test_zorder_range_splits_give_file_level_pruning(spark, tmp_path):
    """write_splits on a z-ordered table cuts the batch into contiguous
    z-ranges (not random shards), so FILE-level zone maps prune on both
    z columns: a narrow range on either x or y must skip files."""
    t = IceTable(spark, str(tmp_path / "zsplit"), partition_spec=SPEC,
                 zorder_by=["x", "y"], write_splits=8, row_group_size=512)
    t.insert(df=_grid(spark))
    files = t.snapshot().alive_files()
    assert len(files) > 4
    n = 96
    for col in ("x", "y"):
        kept = t.files_for(column_ranges={col: (0.0, n / 8.0)})
        assert 0 < len(kept) < len(files), (
            f"file-level zone maps must prune on {col}: "
            f"{len(kept)}/{len(files)}"
        )
    # correctness: the pruned union is still the whole corpus
    assert t.read().count() == n * n


def test_random_splits_still_used_without_zorder(spark, tmp_path):
    t = IceTable(spark, str(tmp_path / "rsplit"), partition_spec=SPEC,
                 sort_order=["x"], write_splits=4, row_group_size=512)
    t.insert(df=_grid(spark, n=32))
    files = t.snapshot().alive_files()
    assert len(files) == 4
    assert t.read().count() == 32 * 32
