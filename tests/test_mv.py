"""Materialized-view double-write tests (reference examples/materialized-view.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.mv import DoubleWriter


def test_mv_double_write_and_converge(spark, tmp_path):
    base = IceTable(
        spark,
        str(tmp_path / "base"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("d", "date_format(timestamp_millis(ts), 'yyyy-MM-dd')")]
        ),
        sort_order=["event", "ts"],
    )
    # view: per-user event counts, folded incrementally on merge
    mv = IceTable(
        spark,
        str(tmp_path / "mv"),
        partition_spec=PartitionSpec(fields=[PartitionField("u", "user_id")]),
        sort_order=["user_id"],
        custom_merge_query=(
            "select user_id, cast(sum(cnt) as bigint) as cnt, max(ts) as ts "
            "from source_files group by user_id"
        ),
    )
    w = DoubleWriter(
        base,
        {"counts": mv},
        transforms={
            "counts": lambda df: df.groupBy("user_id").agg(
                F.count("*").cast("long").alias("cnt"), F.max("ts").alias("ts")
            )
        },
    )

    rows = [
        {"ts": 1686000000000 + i, "event": "page_load", "user_id": ["a", "b", "a"][i % 3]}
        for i in range(9)
    ]
    for i in range(3):
        w.insert(rows[3 * i : 3 * i + 3])

    def view_counts():
        return {
            r["user_id"]: r["total"]
            for r in mv.read()
            .groupBy("user_id")
            .agg(F.sum("cnt").alias("total"))
            .collect()
        }

    truth = {
        r["user_id"]: r["c"]
        for r in base.read().groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    assert view_counts() == truth == {"a": 6, "b": 3}

    # merges fold the view's partial aggregates without changing the answer
    n = w.merge_all(max_file_count=100)
    assert n >= 1
    assert view_counts() == truth
    # the view physically converged to one row per user
    assert mv.read().count() == 2

def test_doublewriter_rows_path_applies_format_row(spark, tmp_path):
    """DoubleWriter.insert(rows=...) must honor the base table's format_row
    hook exactly like base.insert(rows=...) does."""
    from icedb_spark import IceTable, PartitionField, PartitionSpec
    from icedb_spark.mv import DoubleWriter

    spec = PartitionSpec(fields=[PartitionField("d", "'x'")])

    def fmt(row):
        row["tagged"] = "yes"
        return row

    base = IceTable(spark, str(tmp_path / "b"), partition_spec=spec,
                    sort_order=[], format_row=fmt)
    view = IceTable(spark, str(tmp_path / "v"), partition_spec=spec, sort_order=[])
    dw = DoubleWriter(base, {"v": view})
    dw.insert(rows=[{"k": 1}])
    assert base.read().collect()[0]["tagged"] == "yes"
    assert view.read().collect()[0]["tagged"] == "yes"


# ------------------------------------------------------- incremental view


def _ivm_pair(spark, tmp_path, name="ivm"):
    from icedb_spark.mv import IncrementalView

    base = IceTable(
        spark,
        str(tmp_path / f"{name}-base"),
        partition_spec=PartitionSpec(fields=[PartitionField("k", "kind")]),
        sort_order=["id"],
    )
    view = IceTable(
        spark,
        str(tmp_path / f"{name}-view"),
        partition_spec=PartitionSpec(fields=[PartitionField("k", "kind")]),
        sort_order=["kind"],
    )
    iv = IncrementalView(base, view, keys=["kind"], sums=["v"])
    # fold-on-merge keeps compaction read-invariant
    view.custom_merge_query = iv.merge_sql()
    return base, view, iv


def _rows(iv):
    return {
        r["kind"]: (r["cnt"], r["sum_v"])
        for r in iv.read().collect()
    }


def test_ivm_insert_delete_update_lifecycle(spark, tmp_path):
    base, view, iv = _ivm_pair(spark, tmp_path)
    base.insert(rows=[
        {"id": 1, "kind": "a", "v": 10.0},
        {"id": 2, "kind": "a", "v": 20.0},
        {"id": 3, "kind": "b", "v": 5.0},
    ])
    r = iv.refresh()
    assert r["delta_groups"] > 0
    assert _rows(iv) == {"a": (2, 30.0), "b": (1, 5.0)}

    # captured DML folds as signed deltas
    base.delete("id = 2", capture_changes=True)
    base.update({"v": "v + 1"}, "kind = 'b'", capture_changes=True)
    iv.refresh()
    assert _rows(iv) == {"a": (1, 10.0), "b": (1, 6.0)}

    # a group fully retracted disappears from read()
    base.delete("kind = 'a'", capture_changes=True)
    iv.refresh()
    assert _rows(iv) == {"b": (1, 6.0)}


def test_ivm_refresh_is_idempotent_and_no_op_on_empty_window(spark, tmp_path):
    base, view, iv = _ivm_pair(spark, tmp_path)
    base.insert(rows=[{"id": 1, "kind": "a", "v": 1.0}])
    r1 = iv.refresh()
    r2 = iv.refresh()  # nothing new
    assert r2["delta_groups"] == 0 and r2["since"] == r2["until"]
    assert r1["until"] == r2["since"]
    assert _rows(iv) == {"a": (1, 1.0)}


def test_ivm_replayed_window_cannot_double_apply(spark, tmp_path):
    """Simulate the crash-replay: a second refresh over the SAME window
    (cursor marker lost, tag present) must be a no-op because the tag
    names a committed view log."""
    base, view, iv = _ivm_pair(spark, tmp_path)
    base.insert(rows=[{"id": 1, "kind": "a", "v": 2.0}])
    iv.refresh()
    # wipe the convenience marker; the in-log tag must still win
    view.storage.delete(iv.CURSOR_KEY)
    r = iv.refresh()
    assert r["delta_groups"] == 0
    assert _rows(iv) == {"a": (1, 2.0)}


def test_ivm_merge_of_view_partials_is_read_invariant(spark, tmp_path):
    base, view, iv = _ivm_pair(spark, tmp_path)
    for i in range(4):
        base.insert(rows=[{"id": i, "kind": "a", "v": float(i)}])
        iv.refresh()
    base.delete("id = 0", capture_changes=True)
    iv.refresh()
    before = _rows(iv)
    n = 0
    while view.merge(max_file_size=1 << 40, max_file_count=100) is not None:
        n += 1
    assert n > 0
    assert _rows(iv) == before == {"a": (3, 6.0)}


def test_ivm_rejects_colliding_count_col(spark, tmp_path):
    import pytest
    from icedb_spark.mv import IncrementalView

    with pytest.raises(ValueError):
        IncrementalView(None, None, keys=["cnt"], sums=[], count_col="cnt")


def test_ivm_random_op_sequences_match_full_recompute(spark, tmp_path):
    """Seeded randomized soak: arbitrary insert/delete/update sequences
    with refreshes sprinkled anywhere must leave the view equal to
    re-aggregating the mutated base from scratch."""
    import random

    from pyspark.sql import functions as F

    for seed in (7, 23):
        base, view, iv = _ivm_pair(spark, tmp_path, name=f"soak{seed}")
        rng = random.Random(seed)
        next_id = 0
        for step in range(6):
            op = (
                "insert"
                if step == 0  # DML needs a schema to exist
                else rng.choice(["insert", "insert", "delete", "update"])
            )
            if op == "insert":
                rows = [
                    {
                        "id": (next_id := next_id + 1),
                        "kind": rng.choice("ab"),
                        "v": float(rng.randint(0, 9)),
                    }
                    for _ in range(rng.randint(1, 3))
                ]
                base.insert(rows=rows)
            elif op == "delete":
                base.delete(
                    f"id % 3 = {rng.randint(0, 2)}", capture_changes=True
                )
            else:
                base.update(
                    {"v": "v + 1"},
                    f"kind = '{rng.choice('ab')}'",
                    capture_changes=True,
                )
            if rng.random() < 0.5:
                iv.refresh()
        iv.refresh()
        got = {
            r["kind"]: (r["cnt"], r["sum_v"]) for r in iv.read().collect()
        }
        want = {
            r["kind"]: (r["cnt"], r["sum_v"])
            for r in base.read()
            .groupBy("kind")
            .agg(F.count("*").alias("cnt"), F.sum("v").alias("sum_v"))
            .collect()
        }
        assert got == want, f"seed {seed}: {got} != {want}"
