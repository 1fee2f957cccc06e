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
import numpy as np
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
    # Pandas-path normalization: the driver compares via toPandas()/df(),
    # so numpy scalars arrive here. `.item()` keeps the int-vs-float KIND
    # distinction (DuckDB HUGEINT -> float64 must NOT silently equal a
    # Spark int64 — that exact artifact cost two driver rows in round 1).
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if v is None:
        return "None"
    if isinstance(v, float):
        # strict: entries are bit-exact against their oracles (verified);
        # any representation drift is a real gate failure, so no tolerance
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        # DuckDB .df() materializes DATE as midnight Timestamp while Spark
        # toPandas keeps datetime.date — the driver treats these as equal
        # (q06/q19 were green in round 1), so fold midnight to the date.
        if v.tzinfo is None and v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def _normalize(cols: list[str], df):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = list(df.itertuples(index=False, name=None))
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
    spark_pdf = df.toPandas()
    spark_cols = list(df.columns)

    if name not in oracles:
        # rows-only check (approximate/sketch entries)
        assert len(spark_pdf) >= 0
        return

    con = _duck(SF_DIR)
    duck_pdf = con.execute(oracles[name]).df()
    duck_cols = list(duck_pdf.columns)

    s_cols, s_vals = _normalize(spark_cols, spark_pdf)
    d_cols, d_vals = _normalize(duck_cols, duck_pdf)

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
