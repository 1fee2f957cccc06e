"""Loaders for the driver-generated testdata parquet tables.

The repo's Spark/DuckDB oracle contract for the ``events`` table is built on
an epoch-ns BIGINT ``ts`` column: ``ts div 1000`` on the Spark side pairs with
``epoch_us(ts)`` on the DuckDB side. Different testdata generations store
``ts`` with different physical parquet types:

* ns-precision timestamps — Spark reads them as epoch-ns BIGINT under
  ``spark.sql.legacy.parquet.nanosAsLong`` (the contract holds natively);
* µs-precision timestamps — Spark reads a real TIMESTAMP_NTZ.

``load_table`` normalizes both generations to the same contract: ``events.ts``
is ALWAYS an epoch-ns BIGINT after loading. DuckDB sees TIMESTAMP in both
generations, so oracle SQL needs no per-generation branches.

The session timezone is pinned to UTC because DuckDB timestamps are
timezone-naive — under any other session zone, date_trunc/month/year bucket
differently and every time-based oracle mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

#: per-row compute-heavy tables that benefit from splitting the single
#: row-group scan across all cores (md5 shingling, cosine folds, media UDFs)
_SPLIT_DEFAULT = ("documents", "embeddings")


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` as epoch-ns BIGINT regardless of whether the
    parquet surfaced it as BIGINT (ns-timestamp generation under nanosAsLong)
    or TIMESTAMP/TIMESTAMP_NTZ (µs-timestamp generation).

    Requires the session timezone to be UTC so the NTZ→instant cast is
    identity (callers using :func:`load_table` get that for free).
    """
    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        df = df.withColumn(
            col,
            (F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000)).cast("long"),
        )
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, split: bool | None = None
) -> DataFrame:
    """Load one testdata table with the repo's canonical normalization.

    The testdata files are single-row-group parquet — Spark cannot split
    them, so without help every scan is ONE task. For the per-row
    compute-heavy tables a round-robin repartition costs a sub-MB shuffle and
    unlocks full-core parallelism — and models the many-split layout real
    tables have. The scan-agg tables skip it: their first exchange already
    parallelizes everything downstream of the (cheap) serial scan.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    if split is None:
        split = name in _SPLIT_DEFAULT
    if split:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_clustered_embeddings(
    spark: SparkSession,
    sf_dir: str,
    n_clusters: int = 16,
    spread: float = 0.15,
    dim: int = 64,
) -> DataFrame:
    """A mixture-of-Gaussians-style CLUSTERED embedding corpus, derived
    deterministically from the flat ``embeddings`` table (the driver's
    synthetic vectors are near-uniform on the sphere, where IVF codebook
    training cannot pay — recall tracks probed fraction when there is no
    structure to learn; see the s07 finding in COVERAGE.md).

    Construction is pure closed-form arithmetic so a SQL oracle can
    reproduce it bit-exactly: vector ``id`` belongs to cluster
    ``c = (id // 7) % n_clusters`` (blocks of 7, NOT a bijection on the
    first n_clusters ids — the lowest-id seed codebook must not get the
    clusters for free), the cluster center component is the exact
    rational ``((c*31 + i*17) % 13 - 6) / 6`` and the vector is
    ``round(center + spread * original[i], 3)``. With spread 0.15 the
    intra-cluster variation is ~6x smaller than the center spread —
    clearly clustered, not degenerate."""
    emb = load_table(spark, sf_dir, "embeddings")
    c = (F.floor(F.col("vec_id") / 7) % n_clusters).cast("long")
    vec = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x, i: F.round(
            ((c * 31 + i.cast("long") * 17) % 13 - 6) / 6.0
            + F.lit(spread) * x,
            3,
        ),
    )
    return emb.select("vec_id", vec.alias("embedding"))


# ---------------------------------------------------------------- sf1 tier
# Row counts per unit scale factor, calibrated to the driver's own
# generation (sf0.1 = lineitem 600k, orders 150k, events 100k, customer
# 15k, part 20k, supplier 1k, documents 5k, embeddings 2k).
_SF1_ROWS = {
    "lineitem": 6_000_000,
    "orders": 1_500_000,
    "events": 1_000_000,
    "customer": 150_000,
    "part": 200_000,
    "supplier": 10_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

_DOC_VOCAB = (
    "spark table column row value query scan filter group agg sort merge "
    "hash join key window stream batch part line order small big fast slow "
    "data vector cluster shard"
).split()


def generate_sf(out_dir: str, sf: float = 1.0, seed: int = 42) -> str:
    """Generate a bigger benchmark tier under the /root/testdata schema
    conventions (same tables, column names, physical types, value
    domains — see TESTDATA.md) so the scan-side baseline comparison has
    a measurable scale. Pure numpy + pyarrow on the driver: ~6 M-row
    lineitem in seconds, single parquet file per table (the loaders and
    the bench's footer-metadata row counter expect files, not
    directories). Deterministic for a given (sf, seed). Returns
    ``out_dir``. Idempotent: existing complete output is kept."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    _GEN_VERSION = "v2"  # bump when the layout changes (forces regen)
    done_marker = os.path.join(out_dir, "_COMPLETE")
    try:
        with open(done_marker) as f:
            if f.read().strip() == _GEN_VERSION:
                return out_dir
    except OSError:
        pass
    rng = np.random.default_rng(seed)
    k = sf / 1.0
    n = {t: max(1, int(c * k)) for t, c in _SF1_ROWS.items()}

    def write(name: str, table: pa.Table) -> None:
        # ~128k-row row groups: parquet splits at row-group granularity,
        # so pyarrow's default ~1M-row groups would cap a 6M-row scan at
        # 6 tasks — starving a 32-core executor (and the real cluster
        # this models). 47 groups on sf1 lineitem parallelizes fully.
        pq.write_table(
            table, os.path.join(out_dir, f"{name}.parquet"),
            compression="snappy", row_group_size=131_072,
        )

    # region / nation: fixed tiny dims (TPC-H-ish)
    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": [f"region_{i}" for i in range(5)],
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"nation_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc, ns, npart, no, nl = (
        n["customer"], n["supplier"], n["part"], n["orders"], n["lineitem"]
    )
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, nc), 2),
        "c_mktsegment": pa.array(
            np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                      "MACHINERY"])[rng.integers(0, 5, nc)]
        ),
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, ns), 2),
    }))
    brands = np.array([f"Brand#{i}{j}" for i in range(1, 6)
                       for j in range(1, 6)])
    types = np.array([f"{a} {b} {c}" for a in ("STANDARD", "SMALL", "LARGE")
                      for b in ("ANODIZED", "BRUSHED", "PLATED")
                      for c in ("TIN", "NICKEL", "BRASS")])
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(npart), pa.int64()),
        "p_name": [f"part {i} name" for i in range(npart)],
        "p_brand": pa.array(brands[rng.integers(0, len(brands), npart)]),
        "p_type": pa.array(types[rng.integers(0, len(types), npart)]),
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2100, npart), 2),
    }))

    day_us = 86_400_000_000
    o_epoch0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    o_dates = o_epoch0 + rng.integers(0, 2405, no) * day_us
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, no)]),
        "o_totalprice": np.round(rng.uniform(800, 500_000, no), 2),
        "o_orderdate": pa.array(o_dates, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])[rng.integers(0, 5, no)]),
    }))
    l_dates = o_epoch0 + rng.integers(0, 2500, nl) * day_us
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, no, nl), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, npart, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, nl), pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, nl), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, nl), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, nl), 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, nl)]),
        "l_shipdate": pa.array(l_dates, pa.timestamp("us")),
    }))

    ne = n["events"]
    e_epoch0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    write("events", pa.table({
        "event_id": pa.array(np.arange(ne), pa.int64()),
        "ts": pa.array(
            e_epoch0 + rng.integers(0, 30 * day_us, ne), pa.timestamp("us")
        ),
        "user_id": pa.array(rng.integers(0, max(1, ne // 67), ne), pa.int64()),
        "event_type": pa.array(
            np.array(["click", "view", "purchase", "signup",
                      "error"])[rng.integers(0, 5, ne)]),
        "value": np.round(rng.uniform(0, 560, ne), 2),
        "props": pa.array([f'{{"k": {v}}}' for v in rng.integers(0, 100, ne)]),
    }))

    nd = n["documents"]
    vocab = np.array(_DOC_VOCAB)
    lens = rng.integers(8, 60, nd)
    words = vocab[rng.integers(0, len(vocab), int(lens.sum()))]
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(words[pos:pos + ln]))
        pos += ln
    # planted near-duplicates (~5%) so dedup operators have real work
    for i in range(0, nd, 20):
        j = (i + 7) % nd
        texts[j] = texts[i] + " dup"
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": texts,
        "lang": pa.array(
            np.where(rng.uniform(size=nd) < 0.8, "en",
                     np.array(["de", "fr", "es"])[rng.integers(0, 3, nd)])
        ),
        "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    nv, dim = n["embeddings"], 64
    vecs = (rng.uniform(-0.5, 0.5, (nv, dim)) * 0.7).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, nv), pa.int32()),
    }))
    with open(done_marker, "w") as f:
        f.write(_GEN_VERSION)
    return out_dir
