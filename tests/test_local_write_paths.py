"""Driver-local write fast paths for merges, DML rewrites and
estimate-gated inserts (optimization r13, extending the r12 small-batch
insert path).

A small merge/rewrite used to pay a shuffle stage + Python-worker round
trip for a write whose input bytes are KNOWN (merge: marker bytes;
rewrite_partition: the source file's bytes) or cheaply estimated (DML
rewrites, scan-backed inserts). The fast path collects via Arrow and runs
the SAME ``write_group`` closure on the driver. These tests pin the
"same": identical read-back values, marker stats, parquet physical
schema, single-file-per-partition layout, the size gate (env ceiling 0
forces the distributed writer), and the failure fallback.
"""

from __future__ import annotations

import datetime

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec

TS_SPEC = PartitionSpec(
    fields=[PartitionField("m", "date_format(ts, 'yyyy-MM')")]
)


def ts_rows(n=60):
    return [
        {
            "event_id": i,
            "ts": datetime.datetime(2023, 1 + (i % 3), 1 + (i % 27)),
            "event_type": "ab"[i % 2],
            "value": float(i) + 0.25,
        }
        for i in range(n)
    ]


def make(spark, tmp_path, name, **kw):
    return IceTable(
        spark,
        str(tmp_path / name),
        partition_spec=kw.pop("partition_spec", TS_SPEC),
        sort_order=kw.pop("sort_order", ["event_type", "ts"]),
        **kw,
    )


def _collect_sorted(t):
    df = t.read()
    return sorted(tuple(r) for r in df.select(sorted(df.columns)).collect())


def _drain_merge(t):
    merged = []
    while True:
        res = t.merge(max_file_size=1 << 40, max_file_count=100)
        if res is None:
            return merged
        merged.append(res)


def _two_insert_table(spark, tmp_path, name, monkeypatch=None, env=None):
    if monkeypatch is not None and env is not None:
        monkeypatch.setenv("SPARK_GRAFT_LOCAL_WRITE_BYTES", env)
    t = make(spark, tmp_path, name, bloom_columns=["event_type"])
    rows = ts_rows()
    t.insert(rows=rows[:30])
    t.insert(rows=rows[30:])
    return t


def test_local_merge_equals_distributed_merge(spark, tmp_path, monkeypatch):
    """The merged file must be identical (marker stats, physical parquet
    schema — timestamp conversion drift between toArrow and applyInArrow
    would show here — read-back values, one file per partition) whether
    the rewrite ran driver-local (default: input bytes under the ceiling)
    or distributed (ceiling forced to 0)."""
    fast = _two_insert_table(spark, tmp_path, "fast")
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_WRITE_BYTES", "0")
    slow = _two_insert_table(spark, tmp_path, "slow")
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_WRITE_BYTES")
    _drain_merge(fast)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_WRITE_BYTES", "0")
    _drain_merge(slow)
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_WRITE_BYTES")

    mf = {m.partition(): m for m in fast.snapshot().alive_files()}
    ms = {m.partition(): m for m in slow.snapshot().alive_files()}
    assert set(mf) == set(ms) and len(mf) == 3  # one merged file per month
    for p in mf:
        assert mf[p].stats == ms[p].stats, p
        sf = pq.read_schema(fast.storage.absolute(mf[p].path))
        ss = pq.read_schema(slow.storage.absolute(ms[p].path))
        assert sf == ss, p
    assert _collect_sorted(fast) == _collect_sorted(slow)


def test_local_merge_falls_back_on_collect_failure(spark, tmp_path, monkeypatch):
    """Any local-path failure must fall back to the distributed writer
    and still produce the merged file."""
    t = _two_insert_table(spark, tmp_path, "fb")
    from pyspark.sql import DataFrame

    def boom(self):
        raise RuntimeError("collect failed")

    monkeypatch.setattr(DataFrame, "toArrow", boom)
    merged = _drain_merge(t)
    assert merged, "merge must still happen via the distributed writer"
    by_part = {}
    for m in t.snapshot().alive_files():
        by_part[m.partition()] = by_part.get(m.partition(), 0) + 1
    assert all(n == 1 for n in by_part.values())


def test_estimate_gated_insert_matches_distributed(spark, tmp_path, monkeypatch):
    """A scan-backed df (lazy plan, no tag, not isLocal) whose optimizer
    estimate is under the ceiling must take the driver-local insert and
    produce identical files to the distributed writer."""
    src = make(spark, tmp_path, "src")
    src.insert(rows=ts_rows())
    batch = src.read()  # a parquet scan — estimable, tiny

    called = {"n": 0}
    orig = IceTable._write_batch_local

    def spy(self, df, writer):
        called["n"] += 1
        return orig(self, df, writer)

    monkeypatch.setattr(IceTable, "_write_batch_local", spy)
    fast = make(spark, tmp_path, "fast2", bloom_columns=["event_type"])
    mk_fast = fast.insert(df=batch)
    assert called["n"] == 1, "estimate gate must route through the local writer"

    monkeypatch.setenv("SPARK_GRAFT_LOCAL_WRITE_BYTES", "0")
    slow = make(spark, tmp_path, "slow2", bloom_columns=["event_type"])
    mk_slow = slow.insert(df=batch)
    assert called["n"] == 1, "ceiling 0 must keep the distributed writer"

    key = lambda m: m.path.rsplit("/", 1)[0]
    bf = {key(m): m for m in mk_fast}
    bs = {key(m): m for m in mk_slow}
    assert set(bf) == set(bs)
    for p in bf:
        assert bf[p].stats == bs[p].stats, p
    assert pq.read_schema(fast.storage.absolute(mk_fast[0].path)) == \
        pq.read_schema(slow.storage.absolute(mk_slow[0].path))
    assert _collect_sorted(fast) == _collect_sorted(slow)


def test_dml_rewrite_local_matches_distributed(spark, tmp_path, monkeypatch):
    """A small DELETE's rewrite (estimate-gated) must produce the same
    surviving rows, stats and physical schema on both paths."""
    fast = _two_insert_table(spark, tmp_path, "dfast")
    slow = _two_insert_table(spark, tmp_path, "dslow")
    fast.delete("event_type = 'a' and value > 10")
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_WRITE_BYTES", "0")
    slow.delete("event_type = 'a' and value > 10")
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_WRITE_BYTES")
    assert _collect_sorted(fast) == _collect_sorted(slow)
    mf = sorted(str(m.stats) for m in fast.snapshot().alive_files())
    ms = sorted(str(m.stats) for m in slow.snapshot().alive_files())
    assert mf == ms


def test_rewrite_partition_local_matches_distributed(spark, tmp_path, monkeypatch):
    """The GDPR per-file rewrite (gated on the source file's known bytes)
    must be path-equivalent too."""
    fast = _two_insert_table(spark, tmp_path, "rfast")
    slow = _two_insert_table(spark, tmp_path, "rslow")
    part = sorted({m.partition() for m in fast.snapshot().alive_files()})[0]
    q = "select * from _rows where event_id % 5 != 0"
    fast.rewrite_partition(part, q)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_WRITE_BYTES", "0")
    slow.rewrite_partition(part, q)
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_WRITE_BYTES")
    assert _collect_sorted(fast) == _collect_sorted(slow)
    mf = {m.path: m.stats for m in fast.snapshot().alive_files()}
    ms = {m.path: m.stats for m in slow.snapshot().alive_files()}
    assert sorted(mf.values(), key=str) == sorted(ms.values(), key=str)
