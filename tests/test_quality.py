"""CHECK constraints + quarantine split (quality gates on ingest)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icedb_spark import (
    ConstraintViolation,
    IceTable,
    PartitionField,
    PartitionSpec,
    split_valid,
    violation_counts,
)

RULES = {
    "non_negative": "v >= 0",
    "known_kind": "kind in ('a', 'b')",
}


def _mk(spark, tmp_path, name="t", **kw):
    return IceTable(
        spark,
        str(tmp_path / name),
        partition_spec=PartitionSpec(fields=[PartitionField("k", "kind")]),
        sort_order=["id"],
        **kw,
    )


def _batch(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", -5.0),       # violates non_negative
            (3, "z", 1.0),        # violates known_kind
            (4, "a", None),       # NULL passes (SQL CHECK semantics)
            (5, "z", -1.0),       # violates both
        ],
        "id long, kind string, v double",
    )


def test_fail_mode_aborts_whole_batch_with_counts(spark, tmp_path):
    t = _mk(spark, tmp_path, constraints=RULES)
    with pytest.raises(ConstraintViolation) as ei:
        t.insert(df=_batch(spark))
    assert ei.value.counts == {"non_negative": 2, "known_kind": 2}
    # atomic: nothing committed, no data files
    assert t.read().count() == 0
    assert t.snapshot().log_files == []


def test_drop_mode_filters_violators(spark, tmp_path):
    t = _mk(spark, tmp_path, constraints=RULES, constraint_mode="drop")
    t.insert(df=_batch(spark))
    assert sorted(r["id"] for r in t.read().collect()) == [1, 4]


def test_clean_batch_passes_fail_mode(spark, tmp_path):
    t = _mk(spark, tmp_path, constraints=RULES)
    t.insert(rows=[{"id": 1, "kind": "a", "v": 0.0}])
    assert t.read().count() == 1


def test_split_valid_quarantine_records_reasons(spark, tmp_path):
    valid, invalid = split_valid(_batch(spark), RULES)
    assert sorted(r["id"] for r in valid.collect()) == [1, 4]
    bad = {r["id"]: sorted(r["_violations"]) for r in invalid.collect()}
    assert bad == {
        2: ["non_negative"],
        3: ["known_kind"],
        5: ["known_kind", "non_negative"],
    }
    # quarantine side routes into its own table, reasons included
    q = _mk(spark, tmp_path, "quarantine")
    q.insert(df=invalid)
    assert q.read().count() == 3


def test_violation_counts_single_job_and_empty_rules(spark):
    assert violation_counts(_batch(spark), {}) == {}
    assert violation_counts(_batch(spark), RULES) == {
        "non_negative": 2,
        "known_kind": 2,
    }
    v, inv = split_valid(_batch(spark), {})
    assert v.count() == 5 and inv.count() == 0


def test_constraints_flow_through_streaming_rows_path(spark, tmp_path):
    # rows-ingest path enforces too (insert(rows=...))
    t = _mk(spark, tmp_path, constraints=RULES)
    with pytest.raises(ConstraintViolation):
        t.insert(rows=[{"id": 9, "kind": "a", "v": -3.0}])


def test_invalid_mode_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        _mk(spark, tmp_path, constraints=RULES, constraint_mode="quarantine")
