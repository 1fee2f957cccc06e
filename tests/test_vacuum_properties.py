"""Model-based property test for the MVCC bookkeeping: random sequences of
insert / merge / remove_partitions / vacuum, checked after every step
against a trivial alive-set model.

The real code under test is the log fold plus IceTable's metadata ops —
none of which launch Spark jobs: inserts are simulated as exactly the
commit insert() performs (data-file puts + one log append), merges call
the REAL `_commit_merge` bookkeeping with a fabricated rewrite result,
and remove_partitions / tombstone_cleanup run verbatim.

Invariants (the round-2 vacuum bugs each violated one):
  I1  fold's alive set == model's alive set (no loss, no resurrection)
  I2  every alive file exists on disk (vacuum never deletes live data)
  I3  vacuum with a huge min_age deletes no data files (grace)
  I4  rollback is atomic-or-refused: it either restores EXACTLY the
      recorded historical alive set, or raises (post-vacuum horizon /
      vacuumed files) leaving the state bit-identical — never a partial
      restore
"""

from __future__ import annotations

import os
import uuid

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from icedb_spark import FileMarker, IceTable, PartitionField, PartitionSpec, Schema
from icedb_spark.log import unique_ms

PARTS = ["p=a", "p=b", "p=c"]
COLS = {"a": "VARCHAR"}

ops = st.lists(
    st.one_of(
        st.tuples(st.just("insert"), st.integers(0, 2), st.integers(1, 2)),
        st.tuples(st.just("insertmulti"), st.integers(0, 2), st.integers(0, 2)),
        st.tuples(st.just("merge"), st.integers(0, 2), st.just(0)),
        st.tuples(st.just("remove"), st.integers(0, 2), st.just(0)),
        st.tuples(st.just("vacuum"), st.sampled_from([0, 3_600_000]), st.just(0)),
        st.tuples(st.just("rollback"), st.integers(0, 13), st.just(0)),
    ),
    min_size=1,
    max_size=14,
)


@settings(
    max_examples=80,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops)
# pinned regressions: the exact shapes of the round-2 vacuum bugs
@example(ops=[("insert", 0, 1), ("remove", 0, 0), ("vacuum", 0, 0)])
@example(ops=[("insertmulti", 0, 1), ("insert", 0, 1), ("merge", 0, 0),
              ("remove", 1, 0), ("vacuum", 0, 0)])
@example(ops=[("insert", 0, 1), ("insert", 0, 1), ("merge", 0, 0),
              ("insert", 0, 1), ("merge", 0, 0), ("vacuum", 3_600_000, 0),
              ("vacuum", 0, 0)])
def test_random_maintenance_sequences_hold_invariants(tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("vac"))
    t = IceTable(
        spark=None,
        path=root,
        partition_spec=PartitionSpec(fields=[PartitionField("p", "'a'")]),
        sort_order=[],
    )
    alive: set[str] = set()  # the model
    hist: list[tuple[int, set[str]]] = []  # (instant, alive set) history

    def check():
        state = t.snapshot()
        got = {m.path for m in state.alive_files()}
        assert got == alive, f"fold alive {got} != model {alive}"
        for p in got:
            assert os.path.exists(t.storage.absolute(p)), f"alive but missing: {p}"

    for op, a, b in ops:
        if op == "insertmulti":
            # ONE log whose markers span two partitions — the shape behind
            # both round-2 resurrection bugs (a surviving log that also
            # references files of a removed/merged partition)
            markers = []
            for part in {PARTS[a], PARTS[b]}:
                path = f"_data/{part}/{uuid.uuid4().hex}.parquet"
                t.storage.put(path, b"x")
                markers.append(FileMarker(path, unique_ms(), 1))
                alive.add(path)
            s2 = Schema()
            s2.accumulate(list(COLS.keys()), list(COLS.values()))
            t.log_io.append(t.log_storage, 1, s2, markers, timestamp_ms=unique_ms())
        elif op == "insert":
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
            _logs, deleted = t.tombstone_cleanup(min_age_ms=a)
            if a > 0:
                assert deleted == []  # I3: everything is younger than 1h
        elif op == "rollback":
            if not hist:
                continue
            at, snap = hist[a % len(hist)]
            try:
                t.rollback(at)
                alive = set(snap)  # I4: exact historical restore
            except RuntimeError:
                pass  # I4: refusal must leave state untouched (check())
        check()
        hist.append((unique_ms(), set(alive)))
