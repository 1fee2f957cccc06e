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
