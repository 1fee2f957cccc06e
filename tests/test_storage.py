"""Storage backends: POSIX / memory:// / fsspec dispatch, transient-failure
retry (reference PUT policy, icedb/icedb.py:146-170), separate log/data
stores (icedb/icedb.py:75-78), and URI table roots end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icedb_spark import (
    FileMarker,
    IceLogIO,
    IceTable,
    MemoryStorage,
    PartitionField,
    PartitionSpec,
    Schema,
    Storage,
    retry_transient,
    storage_for,
)


class _Transient(Exception):
    def __init__(self, status_code):
        self.status_code = status_code


def test_retry_transient_succeeds_after_blips():
    calls = {"n": 0}
    sleeps = []

    def fn():
        calls["n"] += 1
        if calls["n"] < 3:
            raise _Transient(503)
        return "ok"

    assert retry_transient(fn, sleep=sleeps.append) == "ok"
    assert calls["n"] == 3
    # linear backoff: 0.3 * attempt
    assert sleeps == [pytest.approx(0.3), pytest.approx(0.6)]


def test_retry_transient_gives_up_after_attempts():
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        raise _Transient(429)

    with pytest.raises(_Transient):
        retry_transient(fn, sleep=lambda s: None)
    assert calls["n"] == 3


def test_retry_non_transient_raises_immediately():
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        raise _Transient(404)

    with pytest.raises(_Transient):
        retry_transient(fn, sleep=lambda s: None)
    assert calls["n"] == 1


def test_storage_for_dispatch(tmp_path):
    assert isinstance(storage_for(str(tmp_path)), Storage)
    assert isinstance(storage_for(f"file://{tmp_path}"), Storage)
    assert isinstance(storage_for("memory://bucket-a"), MemoryStorage)


@pytest.fixture(params=["posix", "memory"])
def any_storage(request, tmp_path):
    if request.param == "posix":
        return Storage(str(tmp_path))
    return MemoryStorage(f"t-{tmp_path.name}")


def test_storage_contract(any_storage):
    st = any_storage
    st.put("_log/1_a.jsonl", b"one")
    st.put("_log/2_b.jsonl", b"three")
    st.put("_data/p=1/f.parquet", b"dddd")
    assert st.get("_log/1_a.jsonl") == b"one"
    assert st.list("_log") == [("_log/1_a.jsonl", 3), ("_log/2_b.jsonl", 5)]
    assert st.exists("_data/p=1/f.parquet")
    assert st.size("_data/p=1/f.parquet") == 4
    st.delete("_log/1_a.jsonl")
    st.delete("_log/1_a.jsonl")  # idempotent
    assert st.list("_log") == [("_log/2_b.jsonl", 5)]
    assert not st.exists("_log/1_a.jsonl")


def test_log_roundtrip_on_memory_storage():
    st = MemoryStorage("log-roundtrip")
    io = IceLogIO()
    s = Schema({"a": "VARCHAR"})
    io.append(st, 1, s, [FileMarker("_data/f1.parquet", 1000, 1)], timestamp_ms=1000)
    io.append(st, 1, s, [FileMarker("_data/f2.parquet", 2000, 1)], timestamp_ms=2000)
    state = io.read_at_max_time(st)
    assert {m.path for m in state.alive_files()} == {
        "_data/f1.parquet",
        "_data/f2.parquet",
    }


SPEC = PartitionSpec(
    fields=[PartitionField("d", "date_format(timestamp_millis(ts), 'yyyy-MM-dd')")]
)


def _rows(n=4, base=1686_000_000_000):
    return [{"ts": base + i, "user_id": "u", "v": i} for i in range(n)]


def test_table_with_separate_memory_log_store(spark, tmp_path):
    """Data on POSIX, log on memory:// — the reference's split log/data
    clients, across two different backend TYPES."""
    t = IceTable(
        spark,
        str(tmp_path / "tbl"),
        partition_spec=SPEC,
        sort_order=["ts"],
        log_storage=MemoryStorage(f"log-{tmp_path.name}"),
    )
    t.insert(_rows())
    t.insert(_rows(base=1686_000_000_100))
    assert t.read().count() == 8
    while t.merge(max_file_size=1 << 40, max_file_count=100) is not None:
        pass
    assert t.read().count() == 8
    # no log bytes on the data store
    assert t.storage.list("_log") == []
    assert len(t.log_storage.list("_log")) >= 1


def test_table_with_file_uri_root(spark, tmp_path):
    """URI table root exercises the pyarrow.fs executor writer + URI reads
    (same code path an s3:// root takes)."""
    t = IceTable(
        spark,
        f"file://{tmp_path}/tbl",
        partition_spec=SPEC,
        sort_order=["ts"],
    )
    t.insert(_rows())
    assert t.read().count() == 4
    assert t.read().agg(F.sum("v")).collect()[0][0] == 6
    while t.merge(max_file_size=1 << 40, max_file_count=100) is not None:
        pass
    t.tombstone_cleanup(min_age_ms=0)
    assert t.read().count() == 4


def test_fsspec_storage_requires_fsspec():
    try:
        import fsspec  # noqa: F401
        pytest.skip("fsspec installed; gate does not apply")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="fsspec"):
        storage_for("s3://bucket/table")
