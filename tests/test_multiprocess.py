"""Multi-writer concurrency across OS PROCESSES (separate JVMs, separate
log-writer ids): two inserters race a merger against one table.

Contract being verified (documented in README "Concurrency & locking"):

* concurrent INSERTS from different processes are lock-free safe — each
  commit is one atomic log-object PUT under a per-writer-unique name
  (host-pid), and the LWW fold merges them;
* ONE merger may run concurrently with inserts — a merge snapshots, then
  commits tombstones only for the files it actually rewrote, so inserts
  that land mid-merge simply stay in their own logs;
* merge-vs-merge DOES require an external exclusive lock (same as the
  reference, ARCHITECTURE.md:115-117) — not exercised here.

Invariants asserted after the dust settles: no lost rows, no duplicated
rows, every alive file present on disk, a final compaction preserves both.
"""

from __future__ import annotations

import os
import subprocess
import sys

from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec

_COMMON = """
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from icedb_spark import IceTable, PartitionField, PartitionSpec

path = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("mp-%s")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "1g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spec = PartitionSpec(fields=[
    PartitionField("d", "date_format(timestamp_millis(ts), 'yyyy-MM-dd')")
])
t = IceTable(spark, path, partition_spec=spec, sort_order=["ts"])
"""


INSERTER = _COMMON % "insert" + """
start, n = int(sys.argv[2]), int(sys.argv[3])
for i in range(n):
    k = start + i
    rows = [{"ts": 1686_000_000_000 + (k % 2) * 86_400_000 + k, "k": k}]
    t.insert(rows)
print("inserted", n, flush=True)
"""


MERGER = _COMMON % "merge" + """
passes = int(sys.argv[2])
merged = 0
for _ in range(passes):
    while t.merge(max_file_size=1 << 40, max_file_count=100) is not None:
        merged += 1
    time.sleep(0.5)
print("merged", merged, flush=True)
"""


def test_concurrent_processes_insert_and_merge(spark, tmp_path):
    path = str(tmp_path / "tbl")
    env = dict(os.environ)

    def run(script, *args):
        f = tmp_path / f"script{len(args)}{args[0] if args else ''}.py"
        f.write_text(script)
        return subprocess.Popen(
            [sys.executable, str(f), path, *map(str, args)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )

    n_each = 6
    procs = [
        run(INSERTER, 0, n_each),
        run(INSERTER, 100, n_each),
        run(MERGER, 6),
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out.decode(), err.decode()[-800:]))
    assert all(rc == 0 for rc, _o, _e in outs), outs

    spec = PartitionSpec(fields=[
        PartitionField("d", "date_format(timestamp_millis(ts), 'yyyy-MM-dd')")
    ])
    t = IceTable(spark, path, partition_spec=spec, sort_order=["ts"])
    expect = set(range(0, n_each)) | set(range(100, 100 + n_each))

    got = sorted(r["k"] for r in t.read().select("k").collect())
    assert got == sorted(expect)  # no loss, no duplication

    state = t.snapshot()
    for m in state.alive_files():
        assert os.path.exists(t.storage.absolute(m.path)), m.path

    # the post-race table still compacts to one file per partition
    t.merge_all()
    got2 = sorted(r["k"] for r in t.read().select("k").collect())
    assert got2 == got
    parts = {m.partition() for m in t.snapshot().alive_files()}
    assert len(parts) == len(t.snapshot().alive_files()) == 2


LOCKED_MERGER = _COMMON % "lockmerge" + """
from icedb_spark import file_lock_provider
t = IceTable(spark, path, partition_spec=spec, sort_order=["ts"],
             lock_provider=file_lock_provider(path + "/.maintenance.lock"))
passes = int(sys.argv[2])
merged = 0
for _ in range(passes):
    while t.merge(max_file_size=1 << 40, max_file_count=100) is not None:
        merged += 1
    time.sleep(0.25)
print("merged", merged, flush=True)
"""


def test_two_mergers_race_with_file_lock(spark, tmp_path):
    """merge-vs-merge requires an exclusive lock (reference
    ARCHITECTURE.md:115-117). With IceTable(lock_provider=
    file_lock_provider(...)), TWO merger processes racing one inserter
    must serialize: no lost rows, no duplicated rows (the unlocked
    failure mode is both mergers rewriting the same source files into
    two alive merged files), every alive file on disk."""
    path = str(tmp_path / "tbl")
    env = dict(os.environ)

    def run(script, tag, *args):
        f = tmp_path / f"script_{tag}.py"
        f.write_text(script)
        return subprocess.Popen(
            [sys.executable, str(f), path, *map(str, args)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )

    n_each = 8
    procs = [
        run(INSERTER, "ins", 0, n_each),
        run(LOCKED_MERGER, "m1", 5),
        run(LOCKED_MERGER, "m2", 5),
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out.decode(), err.decode()[-800:]))
    assert all(rc == 0 for rc, _o, _e in outs), outs

    spec = PartitionSpec(fields=[
        PartitionField("d", "date_format(timestamp_millis(ts), 'yyyy-MM-dd')")
    ])
    t = IceTable(spark, path, partition_spec=spec, sort_order=["ts"])
    got = sorted(r["k"] for r in t.read().select("k").collect())
    assert got == list(range(n_each))  # no loss, no duplication
    for m in t.snapshot().alive_files():
        assert os.path.exists(t.storage.absolute(m.path)), m.path


S3_LOCKED_MERGER = _COMMON % "s3lockmerge" + """
from icedb_spark import s3_lock_provider
endpoint = sys.argv[3]
t = IceTable(spark, path, partition_spec=spec, sort_order=["ts"],
             lock_provider=s3_lock_provider(
                 "locks", "tbl/.maintenance.lock",
                 endpoint_override=endpoint,
                 access_key="test", secret_key="test",
                 ttl_s=30.0, timeout_s=120.0, poll_s=0.1))
passes = int(sys.argv[2])
merged = 0
for _ in range(passes):
    while t.merge(max_file_size=1 << 40, max_file_count=100) is not None:
        merged += 1
    time.sleep(0.25)
print("merged", merged, flush=True)
"""


def test_two_mergers_race_with_s3_lock(spark, tmp_path):
    """The object-store-native variant of the two-merger race: the
    exclusive lock is an S3 conditional-write lease (PUT If-None-Match/
    If-Match CAS over the mini-S3 wire) instead of flock — the shape a
    pure-S3 deployment with no shared filesystem runs. Same invariant:
    two merger processes + one inserter, no lost rows, no duplicated
    rows, every alive file on disk."""
    from tests.mini_s3 import MiniS3Server

    path = str(tmp_path / "tbl")
    env = dict(os.environ)

    def run(script, tag, *args):
        f = tmp_path / f"script_{tag}.py"
        f.write_text(script)
        return subprocess.Popen(
            [sys.executable, str(f), path, *map(str, args)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )

    with MiniS3Server() as s3:
        from icedb_spark.locks import _SigV4S3

        _SigV4S3(s3.endpoint, "locks", "k", "s").request("PUT", "")
        n_each = 8
        procs = [
            run(INSERTER, "ins", 0, n_each),
            run(S3_LOCKED_MERGER, "m1", 5, s3.endpoint),
            run(S3_LOCKED_MERGER, "m2", 5, s3.endpoint),
        ]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out.decode(), err.decode()[-800:]))
        assert all(rc == 0 for rc, _o, _e in outs), outs
        # both mergers' leases released; the fencing high-water survives
        keys = s3.keys("locks")
        assert "tbl/.maintenance.lock" not in keys
        assert "tbl/.maintenance.lock.token" in keys

    spec = PartitionSpec(fields=[
        PartitionField("d", "date_format(timestamp_millis(ts), 'yyyy-MM-dd')")
    ])
    t = IceTable(spark, path, partition_spec=spec, sort_order=["ts"])
    got = sorted(r["k"] for r in t.read().select("k").collect())
    assert got == list(range(n_each))  # no loss, no duplication
    for m in t.snapshot().alive_files():
        assert os.path.exists(t.storage.absolute(m.path)), m.path


TXN_DELETER = """
import sys, time, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from icedb_spark import IceCatalog, IceTable, PartitionField, PartitionSpec
from icedb_spark.txn import TxnConflictError

path, txn_root, target, start_file = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
)
spark = (
    SparkSession.builder.master("local[2]")
    .appName("mp-txn-%d" % target)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "1g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spec = PartitionSpec(fields=[PartitionField("b", "bucket")])
t = IceTable(spark, path, partition_spec=spec, sort_order=["k"])
cat = IceCatalog(spark).add("facts", t).enable_transactions(txn_root)
# crude start barrier: both processes spin until the parent drops the flag
while not os.path.exists(start_file):
    time.sleep(0.05)
conflicts = 0
for attempt in range(12):
    try:
        with cat.transaction() as txn:
            txn.delete("facts", "k = %d" % target)
        print("committed after", conflicts, "conflicts", flush=True)
        sys.exit(0)
    except TxnConflictError:
        conflicts += 1
        time.sleep(0.3)
print("never committed", flush=True)
sys.exit(3)
"""


def test_two_process_txn_race_first_committer_wins(spark, tmp_path):
    """Two OS processes (separate JVMs) each run a catalog transaction
    CoW-deleting a different row of the SAME single data file, starting
    simultaneously. The commit protocol must resolve the race with
    first-committer-wins + retry: both processes eventually commit
    (the loser aborts cleanly and retries against the winner's state),
    the final table reflects BOTH deletes exactly once, and no
    transaction debris survives beyond the durable commit markers."""
    path = str(tmp_path / "tbl")
    txn_root = str(tmp_path / "_txn")
    spec = PartitionSpec(fields=[PartitionField("b", "bucket")])
    t = IceTable(spark, path, partition_spec=spec, sort_order=["k"])
    t.insert([{"bucket": "b", "k": i} for i in range(6)])  # ONE file

    env = dict(os.environ)
    start_file = str(tmp_path / "go")

    def run(tag, target):
        f = tmp_path / f"txn_{tag}.py"
        f.write_text(TXN_DELETER)
        return subprocess.Popen(
            [sys.executable, str(f), path, txn_root, str(target), start_file],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )

    procs = [run("a", 1), run("b", 2)]
    import time as _time

    _time.sleep(1.0)  # let both reach the barrier spin
    (tmp_path / "go").write_text("go")
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out.decode(), err.decode()[-800:]))
    assert all(rc == 0 for rc, _o, _e in outs), outs

    from icedb_spark import IceCatalog

    cat = (
        IceCatalog(spark)
        .add("facts", IceTable(spark, path, partition_spec=spec,
                               sort_order=["k"]))
        .enable_transactions(txn_root)
    )
    got = sorted(
        r["k"] for r in cat.sql("select k from facts").collect()
    )
    assert got == [0, 3, 4, 5], (got, outs)  # both deletes, no dups
    keys = [k for k, _ in cat._txn_store.list("", include_hidden=True)]
    assert sum(1 for k in keys if k.endswith(".commit.json")) == 2
    assert not any(k.endswith(".intent.json") for k in keys), keys
    assert not any(k.endswith(".rewrites.json") for k in keys), keys
