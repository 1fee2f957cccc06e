"""Cross-engine wire-format parity, pinned by a committed golden fixture.

The log layer claims byte-level interchange with the reference's JSONL
format (``/root/reference/ARCHITECTURE.md:19-113``): metadata line
``{v, sch, f, t, tmb?}``, one accumulated-schema line, log-tombstone lines
``{p, t}``, file-marker lines ``{p, b, t, tmb?}`` (+ this engine's extra
``"st"`` stats key, which the reference's known-keys constructors simply
ignore). ``tests/fixtures/golden_log/`` holds log files authored in the
REFERENCE writer's serialization (its key order, its merge layout:
carried-forward alive markers, tombstoned merged markers, log tombstones)
— including an ``st``-bearing marker and a tagged ``_m`` filename, the two
extension points.

Two directions are pinned:

* read parity — this engine's fold over the fixture must produce the
  exact documented state (alive set, tombstones, schema union, strict-``<``
  time travel);
* write parity — a from-the-docs reader (reimplemented here from the
  ARCHITECTURE.md field spec alone, known keys only) must reconstruct the
  identical state from files THIS engine writes.

If either serialization drifts, these tests fail before any user hits the
incompatibility.
"""

from __future__ import annotations

import json
import os

from icedb_spark.log import (
    FileMarker,
    IceLogIO,
    LogTombstone,
    MemoryStorage,
    Schema,
    get_log_file_info,
)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden_log")


def _load_fixture_storage() -> MemoryStorage:
    st = MemoryStorage("golden-" + str(id(object())))
    for name in os.listdir(FIXTURE_DIR):
        with open(os.path.join(FIXTURE_DIR, name), "rb") as f:
            st.put(f"_log/{name}", f.read())
    return st


# ------------------------------------------------------------- read parity


def test_fold_reference_authored_log():
    st = _load_fixture_storage()
    io = IceLogIO()
    state = io.read_at_max_time(st)
    alive = {m.path: m for m in state.alive_files()}
    assert set(alive) == {
        "_data/d=2023-11-14/aaaa.parquet",
        "_data/d=2023-11-15/dddd.parquet",
    }
    # schema is the union across files, later lines included
    assert state.schema.columns() == {
        "user_id": "VARCHAR",
        "ts": "BIGINT",
        "v": "DOUBLE",
        "note": "VARCHAR",
    }
    # the extension key must survive the round trip
    assert alive["_data/d=2023-11-15/dddd.parquet"].stats == {"ts": [5, 9]}
    assert alive["_data/d=2023-11-15/dddd.parquet"].file_bytes == 4000
    # superseded originals are present but tombstoned
    tombstoned = {m.path for m in state.file_markers if not m.alive}
    assert tombstoned == {
        "_data/d=2023-11-15/bbbb.parquet",
        "_data/d=2023-11-15/cccc.parquet",
    }
    # log tombstones name both merged log files
    assert {t.path for t in state.log_tombstones} == {
        "_log/1700000000000_ref-writer-1.jsonl",
        "_log/1700000000500_ref-writer-2.jsonl",
    }


def test_time_travel_over_reference_log_is_strict_less_than():
    st = _load_fixture_storage()
    io = IceLogIO()
    # strictly BEFORE the second insert: only the first two files
    state = io.read_at_max_time(st, 1700000000500)
    assert {m.path for m in state.alive_files()} == {
        "_data/d=2023-11-14/aaaa.parquet",
        "_data/d=2023-11-15/bbbb.parquet",
    }
    # before the merge: all three inserts alive
    state = io.read_at_max_time(st, 1700000001000)
    assert {m.path for m in state.alive_files()} == {
        "_data/d=2023-11-14/aaaa.parquet",
        "_data/d=2023-11-15/bbbb.parquet",
        "_data/d=2023-11-15/cccc.parquet",
    }


def test_tagged_merge_filename_parses_like_reference():
    ts, merged = get_log_file_info("_log/1700000001000_m_ref-writer-1-tag-xyz.jsonl")
    assert (ts, merged) == (1700000001000, True)


# ------------------------------------------------------------ write parity


class _DocsReader:
    """A from-the-docs reimplementation of the reference reader: ONLY the
    fields ARCHITECTURE.md documents, positional layout from the metadata
    line. Unknown keys (like ``st``) are ignored, as the reference's
    known-keys constructors do (/root/reference/icedb/log.py:127-137)."""

    @staticmethod
    def read_log_file(raw: bytes):
        lines = [ln for ln in raw.decode().split("\n") if ln.strip()]
        meta = json.loads(lines[0])
        version, ts = meta["v"], meta["t"]
        schema = json.loads(lines[meta["sch"]])
        tombstones = []
        if "tmb" in meta and meta["tmb"] is not None:
            for ln in lines[meta["tmb"] : meta["f"]]:
                d = json.loads(ln)
                tombstones.append((d["p"], d["t"]))
        markers = []
        for ln in lines[meta["f"] :]:
            d = json.loads(ln)
            markers.append((d["p"], int(d["b"]), int(d["t"]), d.get("tmb")))
        return version, ts, schema, tombstones, markers

    @classmethod
    def fold(cls, storage) -> tuple[dict, dict]:
        """(alive files by path -> (bytes, created), schema union)."""
        schema: dict = {}
        markers: dict = {}
        for key, _sz in sorted(storage.list("_log")):
            _v, _ts, sch, _tmbs, fms = cls.read_log_file(storage.get(key))
            for col, typ in sch.items():
                schema.setdefault(col, typ)
            for p, b, t, tmb in fms:
                # last writer wins by path, as the docs' sequential read does
                markers[p] = (b, t, tmb)
        return (
            {p: (b, t) for p, (b, t, tmb) in markers.items() if tmb is None},
            schema,
        )


def test_docs_reader_consumes_this_engines_writes():
    """State written by THIS engine (insert + merge + stats + tag) must
    reconstruct identically under the documented format alone."""
    st = MemoryStorage("written-" + str(id(object())))
    io = IceLogIO()
    s1 = Schema({"user_id": "VARCHAR", "ts": "BIGINT", "v": "DOUBLE"})
    io.append(
        st, 2, s1,
        [
            FileMarker("_data/d=2023-11-14/aaaa.parquet", 1700000000000, 1111),
            FileMarker("_data/d=2023-11-15/bbbb.parquet", 1700000000000, 2222),
        ],
        timestamp_ms=1700000000000,
    )
    s2 = Schema(
        {"user_id": "VARCHAR", "ts": "BIGINT", "v": "DOUBLE", "note": "VARCHAR"}
    )
    io.append(
        st, 2, s2,
        [FileMarker("_data/d=2023-11-15/cccc.parquet", 1700000000500, 3333,
                    stats={"ts": [5, 9]})],
        timestamp_ms=1700000000500,
    )
    first_two = sorted(k for k, _ in st.list("_log"))
    io.append(
        st, 2, s2,
        [
            FileMarker("_data/d=2023-11-14/aaaa.parquet", 1700000000000, 1111),
            FileMarker("_data/d=2023-11-15/bbbb.parquet", 1700000000000, 2222,
                       tombstone=1700000001000),
            FileMarker("_data/d=2023-11-15/cccc.parquet", 1700000000500, 3333,
                       tombstone=1700000001000),
            FileMarker("_data/d=2023-11-15/dddd.parquet", 1700000001000, 4000,
                       stats={"ts": [5, 9]}),
        ],
        tombstones=[LogTombstone(k, 1700000001000) for k in first_two],
        merged=True,
        timestamp_ms=1700000001000,
        tag="xyz",
    )

    alive, schema = _DocsReader.fold(st)
    assert alive == {
        "_data/d=2023-11-14/aaaa.parquet": (1111, 1700000000000),
        "_data/d=2023-11-15/dddd.parquet": (4000, 1700000001000),
    }
    assert schema == {
        "user_id": "VARCHAR",
        "ts": "BIGINT",
        "v": "DOUBLE",
        "note": "VARCHAR",
    }


def test_fixture_and_written_state_agree():
    """The same operations folded from the golden fixture and from this
    engine's own writes yield the same semantic state — the two parity
    directions meet in the middle."""
    io = IceLogIO()
    golden = io.read_at_max_time(_load_fixture_storage())

    st = MemoryStorage("agree-" + str(id(object())))
    s2 = Schema(
        {"user_id": "VARCHAR", "ts": "BIGINT", "v": "DOUBLE", "note": "VARCHAR"}
    )
    io.append(
        st, 2, s2,
        [
            FileMarker("_data/d=2023-11-14/aaaa.parquet", 1700000000000, 1111),
            FileMarker("_data/d=2023-11-15/bbbb.parquet", 1700000000000, 2222,
                       tombstone=1700000001000),
            FileMarker("_data/d=2023-11-15/cccc.parquet", 1700000000500, 3333,
                       tombstone=1700000001000),
            FileMarker("_data/d=2023-11-15/dddd.parquet", 1700000001000, 4000,
                       stats={"ts": [5, 9]}),
        ],
        merged=True,
        timestamp_ms=1700000001000,
    )
    ours = io.read_at_max_time(st)

    def canon(state):
        return (
            sorted(
                (m.path, m.file_bytes, m.created_ms, m.tombstone, json.dumps(m.stats))
                for m in state.file_markers
            ),
            state.schema.columns(),
        )

    assert canon(golden) == canon(ours)
