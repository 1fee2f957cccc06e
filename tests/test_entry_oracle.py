"""Driver-mimic conformance: every ``queries()`` entry with an
``oracle_sql()`` entry must match the DuckDB oracle on the same parquet —
same row count, same column names, same values (columns compared sorted by
name, rows sorted by their full value tuple — the same normalization the
correctness gate applies before hashing).

Runs at sf0.001 so the whole sweep stays fast; the driver repeats it at
sf0.01.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

SF_DIR = "/root/testdata/sf0.001"


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        # strict: entries are bit-exact against their oracles (verified);
        # any representation drift is a real gate failure, so no tolerance
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def _normalize(cols: list[str], rows: list[tuple]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def _entry_names():
    import __spark_entry__ as entry

    return sorted(entry.queries().keys())


@pytest.mark.parametrize("name", _entry_names())
def test_entry_matches_oracle(spark, name):
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    df = qs[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = list(df.columns)

    if name not in oracles:
        # rows-only check (approximate/sketch entries)
        assert len(spark_rows) >= 0
        return

    con = _duck(SF_DIR)
    res = con.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    s_cols, s_vals = _normalize(spark_cols, spark_rows)
    d_cols, d_vals = _normalize(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_vals) == len(d_vals), (
        f"{name}: row count {len(s_vals)} vs oracle {len(d_vals)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_vals, d_vals) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} differing rows; first: {mismatches[0]}"
    )
