"""Auto-derived file pruning: WHERE-clause predicates → partition /
zone-map / Bloom skipping with no explicit hint kwargs.

The contract under test is asymmetric: a derived hint must NEVER remove a
file that could match (wrong answers), while failing to derive a hint only
costs speed. So the unsound shapes (OR, NOT, joins, subqueries, function
calls, numeric partition ranges) must all yield nothing."""

from __future__ import annotations

import pytest

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.pruning import derive_scan_hints


# ------------------------------------------------------------- parser unit

def _hints(q, parts=None):
    return derive_scan_hints(q, "ice", parts or {"d": "d"})


def test_equality_predicate():
    h = _hints("select * from ice where d = '2024-01-02'")
    assert h["partition_values"] == {"d": "2024-01-02"}
    assert h["column_equals"] == {"d": "2024-01-02"}


def test_reversed_and_qualified_equality():
    h = _hints("select * from ice t where '2024-01-02' = t.d")
    assert h["partition_values"] == {"d": "2024-01-02"}
    h = _hints("select * from ice where ice.d = '2024-01-02'")
    assert h["partition_values"] == {"d": "2024-01-02"}


def test_between_and_inequalities_become_ranges():
    h = _hints("select * from ice where v between 10 and 20", parts={})
    assert h["column_ranges"] == {"v": (10, 20)}
    h = _hints("select * from ice where v >= 10 and v < 20", parts={})
    assert h["column_ranges"] == {"v": (10, 20)}  # strict < widens, sound
    h = _hints("select * from ice where 10 <= v", parts={})
    assert h["column_ranges"] == {"v": (10, None)}


def test_string_partition_range_but_not_numeric():
    h = _hints("select * from ice where d between '2024-01' and '2024-02'")
    assert h["partition_values"] == {"d": ("2024-01", "2024-02")}
    # numeric literals compare lexicographically in the path — must NOT
    # become a partition range (zone-map range is still fine)
    h = _hints("select * from ice where d between 5 and 11")
    assert "partition_values" not in h
    assert h["column_ranges"] == {"d": (5, 11)}


def test_in_membership():
    h = _hints("select * from ice where d in ('a', 'b')")
    assert h["partition_values"] == {"d": ["a", "b"]}


def test_conjunction_combines_kinds():
    h = _hints(
        "select count(*) from ice where d = '2024-01-02' and v between 1 and 5"
    )
    assert h["partition_values"] == {"d": "2024-01-02"}
    assert h["column_ranges"]["v"] == (1, 5)


@pytest.mark.parametrize(
    "q",
    [
        "select * from ice where d = '2024-01-02' or v = 1",   # OR
        "select * from ice where not (d = '2024-01-02')",      # NOT
        "select * from ice join other on ice.k = other.k where d = 'x'",
        "select * from ice, other where d = 'x'",              # comma join
        "select * from ice where v = (select max(v) from ice)",  # subquery
        "select * from other where d = 'x'",                   # wrong view
    ],
)
def test_unsound_shapes_yield_nothing(q):
    assert _hints(q) == {}


def test_unparseable_conjuncts_are_ignored_not_fatal():
    h = _hints("select * from ice where upper(d) = 'X' and v >= 3", parts={})
    assert h == {"column_ranges": {"v": (3, None)}}


def test_float_equality_never_prunes_partitions():
    h = _hints("select * from ice where d = 1.5")
    assert "partition_values" not in h


# --------------------------------------------------------------- end-to-end

@pytest.fixture()
def table(spark, tmp_path):
    t = IceTable(
        spark,
        str(tmp_path / "tbl"),
        partition_spec=PartitionSpec(fields=[PartitionField("d", "d")]),
        sort_order=["v"],
        stats_columns=["v"],
        bloom_columns=["u"],
    )
    for day in ("2024-01-01", "2024-01-02", "2024-01-03"):
        t.insert(
            [
                {"d": day, "v": i + (0 if day < "2024-01-03" else 100), "u": f"{day}:{i}"}
                for i in range(10)
            ]
        )
    return t


def test_sql_auto_prunes_partitions(table):
    assert len(table.files_for()) == 3
    out = table.sql("select count(*) as c from ice where d = '2024-01-02'")
    assert out.collect()[0]["c"] == 10
    # the derived hint reads one file, not three
    hints = derive_scan_hints(
        "select count(*) as c from ice where d = '2024-01-02'",
        "ice",
        table._identity_partition_cols(),
    )
    assert len(table.files_for(**hints)) == 1


def test_sql_auto_prunes_zone_maps(table):
    q = "select count(*) as c from ice where v between 100 and 200"
    assert table.sql(q).collect()[0]["c"] == 10
    hints = derive_scan_hints(q, "ice", table._identity_partition_cols())
    assert len(table.files_for(**hints)) == 1  # only the day-3 file overlaps


def test_sql_auto_prunes_bloom_equality(table):
    q = "select count(*) as c from ice where u = '2024-01-01:3'"
    assert table.sql(q).collect()[0]["c"] == 1
    hints = derive_scan_hints(q, "ice", table._identity_partition_cols())
    assert len(table.files_for(**hints)) == 1


def test_sql_explicit_hints_disable_auto(table):
    out = table.sql(
        "select count(*) as c from ice where d = '2024-01-02'",
        partition_values={"d": "2024-01-02"},
    )
    assert out.collect()[0]["c"] == 10


def test_sql_auto_prune_off(table):
    out = table.sql(
        "select count(*) as c from ice where d = '2024-01-02'", auto_prune=False
    )
    assert out.collect()[0]["c"] == 10


def test_sql_results_identical_with_and_without_pruning(table):
    """Soundness end-to-end: every query returns the same rows whether or
    not the derived hints are applied."""
    queries = [
        "select * from ice where d = '2024-01-02' order by v",
        "select * from ice where v between 3 and 102 order by d, v",
        "select * from ice where d >= '2024-01-02' and v < 105 order by d, v",
        "select * from ice where u = '2024-01-03:0'",
        "select * from ice where d in ('2024-01-01', '2024-01-03') order by d, v",
    ]
    for q in queries:
        pruned = [tuple(r) for r in table.sql(q).collect()]
        unpruned = [tuple(r) for r in table.sql(q, auto_prune=False).collect()]
        assert pruned == unpruned, q


def test_in_list_derives_column_in_hint():
    from icedb_spark.pruning import derive_scan_hints

    h = derive_scan_hints(
        "select * from ice where user_id in (7, 9, 11) and lang in ('en')",
        "ice", {},
    )
    assert h["column_in"] == {"user_id": [7, 9, 11], "lang": ["en"]}


def test_in_list_on_identity_partition_gets_both_hints():
    from icedb_spark.pruning import derive_scan_hints

    h = derive_scan_hints(
        "select * from ice where et in ('a', 'b')", "ice", {"et": "p_et"}
    )
    assert h["partition_values"] == {"p_et": ["a", "b"]}
    assert h["column_in"] == {"et": ["a", "b"]}


# ------------------------------------------------- transform pruning


def _month_table(spark, tmp_path):
    import datetime

    from icedb_spark import IceTable, PartitionField, PartitionSpec

    t = IceTable(
        spark,
        str(tmp_path / "months"),
        partition_spec=PartitionSpec(fields=[
            PartitionField("m", "date_format(timestamp_millis(ts), 'yyyy-MM')")
        ]),
        sort_order=["id"],
    )
    for mo in range(1, 7):
        ts = int(
            datetime.datetime(
                2024, mo, 15, tzinfo=datetime.timezone.utc
            ).timestamp() * 1000
        )
        t.insert(rows=[{"id": mo, "ts": ts, "v": float(mo)}])
    return t


def test_ts_range_prunes_month_partitions(spark, tmp_path):
    import datetime

    t = _month_table(spark, tmp_path)
    lo = int(datetime.datetime(2024, 2, 1, tzinfo=datetime.timezone.utc).timestamp() * 1000)
    hi = int(datetime.datetime(2024, 3, 20, tzinfo=datetime.timezone.utc).timestamp() * 1000)
    from icedb_spark.pruning import derive_scan_hints

    hints = derive_scan_hints(
        f"select id from ice where ts between {lo} and {hi}",
        "ice",
        t._identity_partition_cols(),
        t._transform_partition_cols(),
    )
    assert hints["partition_values"] == {"m": ("2024-02", "2024-03")}
    assert len(t.files_for(**hints)) == 2 < len(t.files_for())
    # end-to-end through sql(): pruned == unpruned results
    q = f"select id from ice where ts between {lo} and {hi} order by id"
    assert [r["id"] for r in t.sql(q).collect()] == [2, 3]
    assert [r["id"] for r in t.sql(q, auto_prune=False).collect()] == [2, 3]


def test_ts_equality_and_in_prune_months(spark, tmp_path):
    import datetime

    t = _month_table(spark, tmp_path)
    ts4 = int(datetime.datetime(2024, 4, 15, tzinfo=datetime.timezone.utc).timestamp() * 1000)
    ts1 = int(datetime.datetime(2024, 1, 15, tzinfo=datetime.timezone.utc).timestamp() * 1000)
    from icedb_spark.pruning import derive_scan_hints

    h_eq = derive_scan_hints(
        f"select * from ice where ts = {ts4}", "ice",
        {}, t._transform_partition_cols(),
    )
    assert h_eq["partition_values"] == {"m": "2024-04"}
    h_in = derive_scan_hints(
        f"select * from ice where ts in ({ts1}, {ts4})", "ice",
        {}, t._transform_partition_cols(),
    )
    assert h_in["partition_values"] == {"m": ["2024-01", "2024-04"]}


def test_non_monotonic_or_multi_column_transforms_skipped(spark, tmp_path):
    from icedb_spark import IceTable, PartitionField, PartitionSpec

    t = IceTable(
        spark,
        str(tmp_path / "nm"),
        partition_spec=PartitionSpec(fields=[
            # '-' inside the inner expression: 0 - ts flips order -> no hint
            PartitionField("m", "date_format(timestamp_millis(0 - ts), 'yyyy-MM')"),
            # two source columns -> no hint
            PartitionField("n", "date_format(timestamp_millis(ts + off), 'yyyy')"),
            # non-date_format partition field -> no hint
            PartitionField("k", "kind"),
        ]),
        sort_order=["id"],
    )
    assert t._transform_partition_cols() == {}
