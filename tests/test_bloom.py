"""Per-file Bloom filters and driver-side equality skipping.

The feature: writes with ``bloom_columns`` capture a per-column Bloom bitset
over each file's distinct values into the log marker's stats dict (reserved
``"~bloom"`` key — extra marker keys are ignored by the reference's reader),
and ``read(column_equals=...)`` / ``files_for(column_equals=...)`` skip files
whose filter proves a point lookup matches nothing. The complement to zone
maps for unclustered columns where min/max spans the whole domain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.table import (
    _bloom_may_contain,
    _compute_bloom,
    _stats_overlap,
)


def make_table(spark, path, **kw):
    kw.setdefault(
        "partition_spec", PartitionSpec(fields=[PartitionField("b", "bucket")])
    )
    kw.setdefault("sort_order", ["ts"])
    kw.setdefault("bloom_columns", ["user"])
    return IceTable(spark, str(path), **kw)


@pytest.fixture()
def table(spark, tmp_path):
    """Three files in one partition, disjoint user sets per file."""
    t = make_table(spark, tmp_path / "tbl", bloom_bits=2048)
    for lo in (0, 100, 200):
        rows = [
            {"bucket": "b1", "ts": lo + i, "user": f"u{lo + i}", "v": 1.0}
            for i in range(50)
        ]
        t.insert(rows)
    return t


def test_bloom_no_false_negatives(table):
    """Every present value must keep its file — Bloom pruning may have false
    positives, NEVER false negatives."""
    total = len(table.files_for())
    assert total == 3
    for u in ("u0", "u49", "u100", "u149", "u200", "u249"):
        kept = table.files_for(column_equals={"user": u})
        assert len(kept) >= 1
        rows = (
            table.read(column_equals={"user": u})
            .where(F.col("user") == u)
            .collect()
        )
        assert len(rows) == 1


def test_bloom_skips_absent_values(table):
    """A value in no file should prune (nearly) everything; at 50 distinct
    values per 2048-bit filter the false-positive rate is ~0."""
    kept = table.files_for(column_equals={"user": "nobody-here"})
    assert len(kept) == 0


def test_bloom_point_lookup_prunes_to_one_file(table):
    # each file holds a disjoint 50-user slice: the lookup must touch 1 file
    kept = table.files_for(column_equals={"user": "u120"})
    assert len(kept) == 1
    df = table.read(column_equals={"user": "u120"}).where(F.col("user") == "u120")
    assert df.count() == 1


def test_bloom_and_zone_map_compose(spark, tmp_path):
    """ts is clustered (zone map), user is not (bloom): an equality on an
    int column inside the zone range still passes through the bloom test."""
    t = make_table(spark, tmp_path / "t2", bloom_columns=["user", "ts"])
    t.insert([{"bucket": "b", "ts": i, "user": f"u{i}", "v": 0.0} for i in range(10)])
    t.insert([{"bucket": "b", "ts": 1000 + i, "user": f"w{i}", "v": 0.0} for i in range(10)])
    # zone map alone prunes ts=5 to file 1; bloom confirms
    assert len(t.files_for(column_equals={"ts": 5})) == 1
    # int value absent everywhere: zone map keeps file 1 (5 in [0,9] is
    # false for 500) -> actually 500 is outside both ranges, pruned by zones;
    # 7777 inside neither range
    assert len(t.files_for(column_equals={"ts": 7777})) == 0
    # string column, absent value with in-range-looking name
    assert len(t.files_for(column_equals={"user": "u999"})) == 0


def test_merge_carries_bloom(spark, tmp_path):
    t = make_table(spark, tmp_path / "t3")
    t.insert([{"bucket": "b", "ts": 1, "user": "a", "v": 0.0}])
    t.insert([{"bucket": "b", "ts": 2, "user": "b", "v": 0.0}])
    assert t.merge() is not None
    files = t.files_for()
    assert len(files) == 1
    st = files[0].stats
    assert st and "~bloom" in st and "user" in st["~bloom"]
    # merged filter covers both source files' values
    assert _bloom_may_contain(st, "user", "a")
    assert _bloom_may_contain(st, "user", "b")
    assert len(t.files_for(column_equals={"user": "zzz"})) == 0


def test_bloom_none_value_raises(table):
    with pytest.raises(ValueError):
        table.files_for(column_equals={"user": None})


def test_unsupported_types_always_kept(spark, tmp_path):
    """Float columns get no bloom; equality on them must not prune."""
    t = make_table(spark, tmp_path / "t4", bloom_columns=["v"])
    t.insert([{"bucket": "b", "ts": 1, "user": "a", "v": 1.5}])
    files = t.files_for()
    st = files[0].stats or {}
    assert "v" not in st.get("~bloom", {})
    assert len(t.files_for(column_equals={"v": 2.5})) == 1  # kept: no filter


def test_bloom_membership_unit():
    import pyarrow as pa

    data = pa.table({"c": ["x", "y", "z", None, "x"], "n": [1, 2, 3, 4, 5]})
    blooms = _compute_bloom(data, ["c", "n", "missing"], bits=1024, k=4)
    assert set(blooms) == {"c", "n"}
    st = {"~bloom": blooms}
    for v in ("x", "y", "z"):
        assert _bloom_may_contain(st, "c", v)
    for v in (1, 2, 3, 4, 5):
        assert _bloom_may_contain(st, "n", v)
    assert not _bloom_may_contain(st, "c", "absent-value-q")
    assert not _bloom_may_contain(st, "n", 999_999)
    # unknown column / malformed entries err on keep
    assert _bloom_may_contain(st, "other", "x")
    assert _bloom_may_contain({"~bloom": {"c": "garbage"}}, "c", "x")
    assert _bloom_may_contain({"~bloom": {"c": "9:%%%"}}, "c", "x")
    assert _bloom_may_contain(None, "c", "x")


def test_stats_overlap_ignores_bloom_key():
    # a range query against the reserved key's dict must not crash or prune
    st = {"ts": [0, 10], "~bloom": {"user": "4:AAAA"}}
    assert _stats_overlap(st, {"~bloom": (0, 1)})
    assert _stats_overlap(st, {"ts": (5, 6)})
    assert not _stats_overlap(st, {"ts": (11, 12)})


def test_bloom_config_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        make_table(spark, tmp_path / "x", bloom_bits=1001)  # not /8
    with pytest.raises(ValueError):
        make_table(spark, tmp_path / "y", bloom_k=5)


def test_bloom_property_never_false_negative():
    """Hypothesis: whatever values a file holds, every one of them passes
    the membership test afterwards (the one guarantee pruning relies on)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        ints=st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=40),
        strs=st.lists(st.text(max_size=30), max_size=40),
        bits=st.sampled_from([64, 256, 8192]),
        k=st.integers(min_value=1, max_value=4),
    )
    def check(ints, strs, bits, k):
        n = max(len(ints), len(strs), 1)
        data = pa.table(
            {
                "i": pa.array((ints + [None] * n)[:n], type=pa.int64()),
                "s": pa.array((strs + [None] * n)[:n], type=pa.string()),
            }
        )
        st_dict = {"~bloom": _compute_bloom(data, ["i", "s"], bits=bits, k=k)}
        for v in ints:
            assert _bloom_may_contain(st_dict, "i", v)
        for v in strs:
            assert _bloom_may_contain(st_dict, "s", v)

    check()
