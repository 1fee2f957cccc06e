"""Remaining SURVEY §2 scan-surface items: glob scans over the hive layout,
path-derived virtual columns, and row-id synthesis at merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec

SPEC = PartitionSpec(
    fields=[PartitionField("d", "date_format(timestamp_millis(ts), 'yyyy-MM-dd')")]
)


def _table(spark, tmp_path, **kw):
    t = IceTable(spark, str(tmp_path / "tbl"), partition_spec=SPEC,
                 sort_order=["ts"], **kw)
    day = 86_400_000
    rows = [
        {"ts": 1686_000_000_000 + (i % 3) * day, "event": f"e{i % 2}", "user_id": "u"}
        for i in range(12)
    ]
    t.insert(rows)
    return t


def test_glob_scan_matches_snapshot_after_cleanup(spark, tmp_path):
    """CH-style `s3('…/_data/**/*.parquet')` glob scans are only safe when no
    tombstoned files linger — i.e. after cleanup. Verify both contracts."""
    t = _table(spark, tmp_path)
    t.insert([{"ts": 1686_000_000_000, "event": "e0", "user_id": "u"}])
    while t.merge(max_file_size=1 << 40, max_file_count=100) is not None:
        pass
    # before cleanup the glob would double-count (tombstoned files on disk)
    glob_df = spark.read.parquet(f"{t.path}/_data")
    assert glob_df.count() > t.read().count()
    t.tombstone_cleanup(min_age_ms=0)
    glob_df = spark.read.parquet(f"{t.path}/_data")
    assert glob_df.count() == t.read().count() == 13
    # hive partition dirs surface as a virtual column in glob reads
    assert "d" in glob_df.columns


def test_path_derived_columns(spark, tmp_path):
    """`extract(_path, 'd=…')` pattern: regexp over input_file_name()."""
    t = _table(spark, tmp_path)
    df = t.read().select(
        "event",
        F.regexp_extract(F.input_file_name(), r"d=([^/]+)", 1).alias("d"),
    )
    days = {r["d"] for r in df.collect()}
    assert days == {"2023-06-05", "2023-06-06", "2023-06-07"}
    per_day = df.groupBy("d").count().collect()
    assert all(r["count"] == 4 for r in per_day)


def test_uuid_row_id_synthesis_at_merge(spark, tmp_path):
    """README.md:781 pattern: merge synthesizes a `_row_id` via uuid for
    later dedup; uniqueness is the contract."""
    t = _table(
        spark, tmp_path,
        custom_merge_query=(
            "select *, cast(uuid() as string) as _row_id from source_files"
        ),
    )
    t.insert([{"ts": 1686_000_000_000, "event": "e0", "user_id": "u"}])
    merged = 0
    while t.merge(max_file_size=1 << 40, max_file_count=100) is not None:
        merged += 1
    assert merged >= 1
    df = t.read()
    assert "_row_id" in df.columns
    # only the merged partition's rows carry ids (others were single-file
    # partitions with nothing to merge); pre-merge files read as null
    with_id = df.where(F.col("_row_id").isNotNull())
    assert with_id.count() == with_id.select("_row_id").distinct().count() == 5
    assert df.count() == 13


def test_sql_auto_projects_referenced_columns(spark, tmp_path):
    """sql(auto_prune) narrows the snapshot view to the columns the query
    text can reference (fallback-path projection), with the conservative
    escape hatches: bare star, backticks, NATURAL join keep full width;
    count(*) needs just one column."""
    from icedb_spark import IceTable, PartitionField, PartitionSpec

    t = IceTable(
        spark,
        str(tmp_path / "qp"),
        partition_spec=PartitionSpec(fields=[PartitionField("k", "kind")]),
        sort_order=["id"],
    )
    t.insert(
        rows=[
            {"id": i, "kind": "a", "v": float(i), "payload": "x" * 10}
            for i in range(20)
        ]
    )
    assert t._query_columns("select sum(v) from ice where id > 3") == [
        "id", "v"
    ]
    assert t._query_columns("select count(*) from ice") == ["id"]
    assert t._query_columns("select * from ice") is None
    assert t._query_columns("select `v` from ice") is None
    assert (
        t._query_columns("select v from ice natural join other") is None
    )
    # full-width reference set -> no projection needed
    assert t._query_columns("select id, kind, v, payload from ice") is None
    # end-to-end: results exact through the projected view
    got = t.sql("select sum(v) as s, count(*) as n from ice where id >= 10")
    row = got.collect()[0]
    assert (row["s"], row["n"]) == (sum(float(i) for i in range(10, 20)), 10)
    # the registered view is the projected one
    view_cols = spark.table("ice").columns
    assert set(view_cols) == {"id", "v"}


def test_datasource_columns_option_projects(spark, tmp_path):
    """format('icedb').option('columns', ...) narrows the declared
    schema (Spark has no Python-datasource column-pruning hook), flows
    into the executor read, and rejects unknown names."""
    import pytest as _pytest

    from icedb_spark import IceTable, PartitionField, PartitionSpec
    from icedb_spark.datasource import IceDataSource

    try:
        spark.dataSource.register(IceDataSource)
    except Exception:
        pass
    root = str(tmp_path / "dsp")
    t = IceTable(
        spark,
        root,
        partition_spec=PartitionSpec(fields=[PartitionField("k", "kind")]),
        sort_order=["id"],
    )
    t.insert(
        rows=[
            {"id": i, "kind": "a", "v": float(i), "payload": "x" * 10}
            for i in range(10)
        ]
    )
    df = (
        spark.read.format("icedb")
        .option("path", root)
        .option("columns", "id, v")
        .load()
    )
    assert set(df.columns) == {"id", "v"}
    assert sorted(r["id"] for r in df.collect()) == list(range(10))
    with _pytest.raises(Exception, match="unknown columns"):
        (
            spark.read.format("icedb")
            .option("path", root)
            .option("columns", "nope")
            .load()
            .collect()
        )
