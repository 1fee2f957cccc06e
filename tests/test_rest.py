"""REST ingest/query wrapper (reference examples/api-flask.py:184-217):
buffered POST /insert + batcher flush, GET /query, /state, POST /flush."""

from __future__ import annotations

import json
import urllib.request

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.rest import IceRestServer, RowBatcher


def _mk(spark, tmp_path):
    return IceTable(
        spark, str(tmp_path / "rest_t"),
        partition_spec=PartitionSpec(fields=[PartitionField("k", "kind")]),
        sort_order=["id"],
    )


def _req(url, data=None, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_rest_insert_flush_query_state(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with IceRestServer(t, flush_interval_s=3600) as srv:  # manual flush
        base = f"http://127.0.0.1:{srv.port}"
        code, r = _req(
            f"{base}/insert",
            data=json.dumps({"id": 1, "kind": "a", "v": 1.5}).encode(),
            headers={"Content-Type": "application/json"},
        )
        assert (code, r) == (200, {"buffered": 1})
        code, r = _req(
            f"{base}/insert",
            data=json.dumps(
                [{"id": 2, "kind": "a", "v": 2.5},
                 {"id": 3, "kind": "b", "v": 3.5}]
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        assert (code, r) == (200, {"buffered": 2})
        code, r = _req(f"{base}/state")
        assert r["buffered_rows"] == 3 and r["alive_files"] == 0
        code, r = _req(f"{base}/flush", data=b"")
        assert code == 200 and r["files"] == 2  # one per partition
        code, r = _req(
            f"{base}/query?q=select+kind,+count(*)+as+cnt,+round(sum(v),+2)"
            "+as+sv+from+ice+group+by+kind+order+by+kind"
        )
        assert code == 200
        assert r["columns"] == ["kind", "cnt", "sv"]
        assert r["rows"] == [["a", 2, 4.0], ["b", 1, 3.5]]
        code, r = _req(f"{base}/state")
        assert r["buffered_rows"] == 0 and r["alive_files"] == 2

        # error shapes
        code, _ = _req(f"{base}/insert", data=b"[1, 2]",
                       headers={"Content-Type": "application/json"})
        assert code == 400
        code, _ = _req(f"{base}/insert", data=b"x",
                       headers={"Content-Type": "text/plain"})
        assert code == 415
        code, _ = _req(f"{base}/query")
        assert code == 400


def test_rest_batcher_row_threshold_and_exit_drain(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with IceRestServer(t, flush_interval_s=3600, flush_rows=2) as srv:
        base = f"http://127.0.0.1:{srv.port}"
        rows = [{"id": i, "kind": "a", "v": float(i)} for i in range(2)]
        _req(f"{base}/insert", data=json.dumps(rows).encode(),
             headers={"Content-Type": "application/json"})
        # threshold hit -> flushed inline, no manual /flush needed
        code, r = _req(f"{base}/state")
        assert r["buffered_rows"] == 0 and r["alive_files"] == 1
        _req(f"{base}/insert",
             data=json.dumps({"id": 9, "kind": "a", "v": 9.0}).encode(),
             headers={"Content-Type": "application/json"})
    # context exit drains the buffer (one more commit)
    assert t.read().count() == 3


def test_batcher_requeues_on_failure(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = RowBatcher(t, flush_interval_s=3600)
    b.add([{"id": 1, "kind": "a", "v": 1.0}])
    real_insert = t.insert
    calls = {"n": 0}

    def flaky(rows=None, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient storage error")
        return real_insert(rows, **kw)

    t.insert = flaky
    try:
        import pytest as _pt
        with _pt.raises(RuntimeError):
            b.flush()
        assert b.buffered() == 1  # rows kept for the next tick
        assert b.flush() == 1
        assert b.buffered() == 0
    finally:
        t.insert = real_insert
    assert t.read().count() == 1


def test_rest_bad_limit_is_400_not_dropped_connection(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.insert([{"id": 1, "kind": "a"}])
    with IceRestServer(t, flush_interval_s=3600) as srv:
        base = f"http://127.0.0.1:{srv.port}"
        code, r = _req(f"{base}/query?q=select+1+as+x&limit=abc")
        assert code == 400 and "limit" in r["error"]
        # and the handler thread survived to serve the next request
        code, r = _req(f"{base}/query?q=select+count(*)+as+c+from+ice")
        assert code == 200 and r["rows"][0][0] == 1
