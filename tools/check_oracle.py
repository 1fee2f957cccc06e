"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names and
order-insensitive values. Floats are compared exactly (the driver hashes
values) with a near-miss diagnostic when exact fails.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # DATE columns: Spark toPandas -> object(datetime.date), DuckDB .df()
        # -> datetime64 midnight. The driver treats those equal (q06/q19 green
        # in r1), so stringify both and fold the midnight suffix.
        if str(df[c].dtype).startswith("datetime64") or df[c].dtype == object:
            df[c] = df[c].astype(str).str.replace(" 00:00:00", "", regex=False)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    s, o = canon(sdf), canon(odf)
    if len(s) == len(o):
        for c in s.columns:
            sv, ov = s[c], o[c]
            # The driver hashes repr-style values, so int64 10 vs float64
            # 10.0 is a hard mismatch even when numerically equal (DuckDB
            # HUGEINT -> pandas float64 artifact). Catch dtype-kind drift.
            if sv.dtype.kind != ov.dtype.kind:
                problems.append(
                    f"col '{c}' dtype-kind mismatch spark={sv.dtype} oracle={ov.dtype}"
                )
                continue
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                import numpy as np

                exact = (
                    (sv.isna() & ov.isna()) | (sv == ov)
                ).all()
                if not exact:
                    close = np.allclose(
                        sv.fillna(0), ov.fillna(0), rtol=1e-9, atol=1e-9
                    ) and (sv.isna() == ov.isna()).all()
                    diffs = (sv != ov) & ~(sv.isna() & ov.isna())
                    idx = diffs[diffs].index[:3].tolist()
                    detail = [(c, i, sv[i], ov[i]) for i in idx]
                    problems.append(
                        f"float col '{c}' exact-mismatch (close={close}) e.g. {detail}"
                    )
            else:
                if not ((sv.isna() & ov.isna()) | (sv == ov)).all():
                    diffs = (sv != ov) & ~(sv.isna() & ov.isna())
                    idx = diffs[diffs].index[:3].tolist()
                    detail = [(i, sv[i], ov[i]) for i in idx]
                    problems.append(f"col '{c}' mismatch e.g. {detail}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duck_con(sf_dir)

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(sdf)}) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        status = "OK  " if not problems else "FAIL"
        print(f"{status} {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
        for p in problems:
            print(f"     - {p}")
        if problems:
            failed.append(name)

    print()
    if failed:
        print(f"{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
