"""Property-based tests (hypothesis) for the log layer's core invariants:
the last-writer-wins fold against an oracle dict-model, and the schema
union. No Spark involved — pure Python, so hundreds of generated histories
run in seconds."""

from __future__ import annotations

import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from icedb_spark.log import (
    FileMarker,
    IceLogIO,
    Schema,
    SchemaConflictException,
    Storage,
    unique_ms,
)

PATHS = [f"_data/p=0/f{i}.parquet" for i in range(6)]

# one commit = a set of (path, tombstoned?) marker writes
commit_strategy = st.lists(
    st.tuples(st.sampled_from(PATHS), st.booleans()),
    min_size=1,
    max_size=4,
)
history_strategy = st.lists(commit_strategy, min_size=1, max_size=8)


@settings(max_examples=60, deadline=None)
@given(history_strategy)
def test_lww_fold_matches_dict_model(history):
    """Folding N log files must equal the naive model: replay commits in
    timestamp order, last write per path wins."""
    with tempfile.TemporaryDirectory() as d:
        storage = Storage(d)
        io = IceLogIO()
        model: dict[str, tuple] = {}
        keys = []
        for commit in history:
            ts = unique_ms()
            markers = []
            seen_in_commit = {}
            for path, dead in commit:
                m = FileMarker(path, ts, 100, ts if dead else None)
                seen_in_commit[path] = m  # within one log file: last line wins
                markers.append(m)
            key, _ = io.append(
                storage, 1, Schema({"a": "BIGINT"}), markers, timestamp_ms=ts
            )
            keys.append(key)
            for path, m in seen_in_commit.items():
                model[path] = (m.path, m.created_ms, m.tombstone)
        state = io.read_log_forward(storage, sorted(keys))
        got = {m.path: (m.path, m.created_ms, m.tombstone) for m in state.file_markers}
        assert got == model
        # alive set = model entries without tombstone
        alive = {m.path for m in state.alive_files()}
        assert alive == {p for p, (_, _, t) in model.items() if t is None}


@settings(max_examples=60, deadline=None)
@given(history_strategy)
def test_fold_is_prefix_consistent(history):
    """Time travel consistency: folding the first k logs equals the state a
    reader would have seen after commit k (no retroactive effects)."""
    with tempfile.TemporaryDirectory() as d:
        storage = Storage(d)
        io = IceLogIO()
        keys = []
        for commit in history:
            ts = unique_ms()
            markers = [
                FileMarker(path, ts, 100, ts if dead else None)
                for path, dead in commit
            ]
            key, _ = io.append(
                storage, 1, Schema({"a": "BIGINT"}), markers, timestamp_ms=ts
            )
            keys.append(key)
        keys.sort()
        running = {}
        for k in range(1, len(keys) + 1):
            state = io.read_log_forward(storage, keys[:k])
            _, _, fms, _ = io.read_log(storage, keys[k - 1])
            for m in fms:
                running[m.path] = (m.created_ms, m.tombstone)
            assert {
                m.path: (m.created_ms, m.tombstone) for m in state.file_markers
            } == running


types_strategy = st.sampled_from(["BIGINT", "VARCHAR", "DOUBLE", "BOOLEAN"])
batch_strategy = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d", "e"]), types_strategy, min_size=1, max_size=5
)


@settings(max_examples=100, deadline=None)
@given(st.lists(batch_strategy, min_size=1, max_size=6))
def test_schema_union_matches_model(batches):
    """Accumulating batches either equals the dict-union (when no column
    ever changes type) or raises SchemaConflictException exactly when the
    model sees a type change."""
    s = Schema()
    model: dict[str, str] = {}
    for batch in batches:
        conflict = any(c in model and model[c] != t for c, t in batch.items())
        if conflict:
            try:
                s.accumulate(list(batch.keys()), list(batch.values()))
            except SchemaConflictException:
                return  # correct: conflict detected; state after is unspecified
            raise AssertionError("model saw a conflict but Schema accepted it")
        s.accumulate(list(batch.keys()), list(batch.values()))
        model.update(batch)
    assert s.columns() == model


@settings(max_examples=60, deadline=None)
@given(history_strategy)
def test_log_roundtrip_preserves_markers(history):
    """append → read_log is lossless for every commit."""
    with tempfile.TemporaryDirectory() as d:
        storage = Storage(d)
        io = IceLogIO()
        for commit in history:
            ts = unique_ms()
            markers = [
                FileMarker(path, ts, 100, ts if dead else None)
                for path, dead in commit
            ]
            key, _ = io.append(
                storage, 1, Schema({"a": "BIGINT"}), markers, timestamp_ms=ts
            )
            _, _, got, _ = io.read_log(storage, key)
            assert [(m.path, m.created_ms, m.file_bytes, m.tombstone) for m in got] == [
                (m.path, m.created_ms, m.file_bytes, m.tombstone) for m in markers
            ]
