"""Model-based property test for snapshot tags: under RANDOM maintenance
(insert / merge / remove_partitions / zero-grace vacuum / tag / untag),
every live tag must keep reproducing EXACTLY the alive set recorded when
it was created — files included, nothing vacuumed out from under it
(invariant I5, the guarantee `tombstone_cleanup(protect_tags=True)`
sells). Dropping a tag releases its pins; other tags stay intact.

Same metadata-only harness as test_vacuum_properties (spark=None): insert
commits are simulated as exactly the put+append insert() performs; merge
uses the real `_commit_merge`; remove/vacuum/tag run verbatim.
"""

from __future__ import annotations

import os
import uuid

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from icedb_spark import FileMarker, IceTable, PartitionField, PartitionSpec, Schema
from icedb_spark.log import unique_ms

PARTS = ["p=a", "p=b"]
COLS = {"a": "VARCHAR"}

ops = st.lists(
    st.one_of(
        st.tuples(st.just("insert"), st.integers(0, 1), st.integers(1, 2)),
        st.tuples(st.just("merge"), st.integers(0, 1), st.just(0)),
        st.tuples(st.just("remove"), st.integers(0, 1), st.just(0)),
        st.tuples(st.just("vacuum"), st.just(0), st.just(0)),
        st.tuples(st.just("tag"), st.integers(0, 3), st.just(0)),
        st.tuples(st.just("untag"), st.integers(0, 3), st.just(0)),
    ),
    min_size=2,
    max_size=14,
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops)
# pinned: tag, supersede via merge, zero-grace vacuum — the exact flow
# protect_tags exists for
@example(ops=[("insert", 0, 2), ("tag", 0, 0), ("merge", 0, 0),
              ("vacuum", 0, 0)])
# pinned: second vacuum after the tag is dropped reclaims its pins
@example(ops=[("insert", 0, 2), ("tag", 0, 0), ("merge", 0, 0),
              ("vacuum", 0, 0), ("untag", 0, 0), ("vacuum", 0, 0)])
def test_tagged_snapshots_survive_random_maintenance(tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("tags"))
    t = IceTable(
        spark=None,
        path=root,
        partition_spec=PartitionSpec(fields=[PartitionField("p", "'a'")]),
        sort_order=[],
    )
    alive: set[str] = set()
    pinned: dict[str, set[str]] = {}  # tag name -> alive set at tag time

    def check():
        for name, snap in pinned.items():
            got = {m.path for m in t.snapshot(tag=name).alive_files()}
            assert got == snap, f"tag {name}: {got} != {snap}"
            for p in got:
                assert os.path.exists(t.storage.absolute(p)), (
                    f"tag {name} pins {p} but vacuum deleted it"
                )

    for op, a, b in ops:
        if op == "insert":
            part = PARTS[a]
            markers = []
            for _ in range(b):
                path = f"_data/{part}/{uuid.uuid4().hex}.parquet"
                t.storage.put(path, b"x")
                markers.append(FileMarker(path, unique_ms(), 1))
                alive.add(path)
            s = Schema()
            s.accumulate(list(COLS.keys()), list(COLS.values()))
            t.log_io.append(t.log_storage, 1, s, markers, timestamp_ms=unique_ms())
        elif op == "merge":
            part = PARTS[a]
            state = t.snapshot()
            acc = [m for m in state.alive_files() if m.partition() == part]
            if len(acc) < 2:
                continue
            newpath = f"_data/{part}/m-{uuid.uuid4().hex}.parquet"
            t.storage.put(newpath, b"m")
            t._commit_merge(state, [(part, acc, newpath, 1, COLS, None)])
            alive.difference_update(m.path for m in acc)
            alive.add(newpath)
        elif op == "remove":
            part = PARTS[a]
            t.remove_partitions(lambda ps, part=part: [p for p in ps if p == part])
            alive = {p for p in alive if not p.startswith(f"_data/{part}/")}
        elif op == "vacuum":
            t.tombstone_cleanup(min_age_ms=0)  # protect_tags default True
        elif op == "tag":
            if not alive:
                continue
            name = f"t{a}"
            t.tag(name, replace=True)
            pinned[name] = set(alive)
        elif op == "untag":
            name = f"t{a}"
            if name in pinned:
                t.delete_tag(name)
                del pinned[name]
        check()

    # after dropping every tag, a final vacuum may reclaim the pins, and
    # the CURRENT state must still be exactly the model
    for name in list(pinned):
        t.delete_tag(name)
    t.tombstone_cleanup(min_age_ms=0)
    got = {m.path for m in t.snapshot().alive_files()}
    assert got == alive
    for p in got:
        assert os.path.exists(t.storage.absolute(p))
