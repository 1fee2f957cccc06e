"""Model-based property test for the merge-on-read delete-set retention
contract (the ADVICE r3 medium finding): *time travel within the vacuum
grace window is exact* — a pending delete set must outlive every instant
at which some still-readable file needs it, however inserts, deletes,
folds, vacuums, and clock jumps interleave.

Same metadata-only style as test_vacuum_properties (no Spark jobs):
inserts are simulated as the exact commit insert() performs, delete sets
as the exact ``_deletes/<ts>.json`` PUT delete_where() performs, folds
via the REAL ``_commit_merge`` with the ``~mor`` stamp apply_deletes
records, and tombstone_cleanup runs verbatim. Time is a monkeypatched
``unique_ms`` counter so "set old / fold young" interleavings — the
resurrection hazard — are generated deterministically instead of with
sleeps.

Invariant (checked after every op): for every recorded instant T at
which the model says file f is alive and set s hides rows of f
(s.ts <= T, f created before s, fold-stamp < s.ts), if f still exists
on disk (i.e. T is still reconstructible), then s's artifact must still
exist and ``_mor_sets(T)`` must surface it. The pre-fix code violated
this whenever a vacuum ran with min_age between the set age and the
fold age.
"""

from __future__ import annotations

import json
import uuid

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

import icedb_spark.table as table_mod
from icedb_spark import FileMarker, IceTable, PartitionField, PartitionSpec, Schema

COLS = {"a": "VARCHAR"}

ops = st.lists(
    st.one_of(
        st.tuples(st.just("insert"), st.just(0)),
        st.tuples(st.just("delwhere"), st.just(0)),
        st.tuples(st.just("fold"), st.just(0)),
        st.tuples(st.just("advance"), st.integers(1, 3)),  # x 1000 ms
        st.tuples(st.just("vacuum"), st.sampled_from([0, 1_500, 3_600_000])),
    ),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops)
# the exact ADVICE shape: old set, fresh fold, vacuum with a grace
# between the two ages — the set must survive
@example(ops=[("insert", 0), ("delwhere", 0), ("advance", 3),
              ("fold", 0), ("vacuum", 1_500)])
# set + fold both aged out -> collected; later read exempt (file gone)
@example(ops=[("insert", 0), ("delwhere", 0), ("fold", 0),
              ("advance", 3), ("vacuum", 1_500), ("vacuum", 0)])
def test_mor_set_outlives_every_reconstructible_instant(
    tmp_path_factory, monkeypatch, ops
):
    clock = {"now": 1_000_000}

    def fake_unique_ms():
        clock["now"] += 1
        return clock["now"]

    monkeypatch.setattr(table_mod, "unique_ms", fake_unique_ms)

    root = str(tmp_path_factory.mktemp("morp"))
    t = IceTable(
        spark=None,
        path=root,
        partition_spec=PartitionSpec(fields=[PartitionField("p", "'a'")]),
        sort_order=[],
    )
    schema = Schema()
    schema.accumulate(list(COLS.keys()), list(COLS.values()))

    # model: file path -> created_ms/fold stamp; set ts -> predicate
    created: dict[str, int] = {}
    folded_stamp: dict[str, int] = {}
    sets: list[int] = []
    history: list[tuple[int, list[tuple[str, int]]]] = []  # (T, [(f, s)])

    def model_needs(T: int) -> list[tuple[str, int]]:
        state = t.snapshot(T)
        out = []
        for m in state.alive_files():
            for s in sets:
                if s <= T and m.created_ms < s and folded_stamp.get(m.path, 0) < s:
                    out.append((m.path, s))
        return out

    def check():
        for T, pairs in history:
            for f, s in pairs:
                if not t.storage.exists(f):
                    continue  # instant no longer reconstructible
                assert t.storage.exists(f"_deletes/{s}.json"), (
                    f"set {s} vacuumed while file {f} (alive at {T}) "
                    "still readable — deleted rows would resurrect"
                )
                assert s in [ts for ts, _p in t._mor_sets(T)]

    for op, arg in ops:
        if op == "insert":
            path = f"_data/p=a/{uuid.uuid4().hex}.parquet"
            t.storage.put(path, b"x")
            ts = fake_unique_ms()
            t.log_io.append(
                t.log_storage, 1, schema,
                [FileMarker(path, ts, 1)], timestamp_ms=ts,
            )
            created[path] = ts
        elif op == "delwhere":
            if not created:
                continue
            ts = fake_unique_ms()
            t.storage.put(
                f"_deletes/{ts}.json",
                json.dumps({"predicate": "true", "ts": ts}).encode(),
            )
            sets.append(ts)
        elif op == "fold":
            # apply_deletes' commit shape: every alive file some set
            # still applies to is rewritten with the ~mor stamp
            state = t.snapshot()
            acc = [
                m for m in state.alive_files()
                if any(t._mor_applies(m, s) for s in sets)
            ]
            if not acc:
                continue
            newpath = f"_data/p=a/f-{uuid.uuid4().hex}.parquet"
            t.storage.put(newpath, b"f")
            stamp = max(sets)
            t._commit_merge(
                state,
                [("p=a", acc, newpath, 1, COLS,
                  {t._MOR_STATS_KEY: stamp})],
            )
            folded_stamp[newpath] = stamp
            created[newpath] = clock["now"]
        elif op == "advance":
            clock["now"] += arg * 1_000
        elif op == "vacuum":
            t.tombstone_cleanup(min_age_ms=arg)
        now = clock["now"]
        history.append((now, model_needs(now)))
        check()


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
