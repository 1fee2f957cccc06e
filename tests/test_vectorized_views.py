"""Focused tests for the r13 vectorized Arrow passes: lsh_view, the
Lloyd-trainer partial sums, and the exact-top-k pruner.

Each replaced a JVM expression tree whose Catalyst analysis dominated
small-corpus runtime; these tests pin the claim that made the swap
legal — BIT-IDENTICAL results, including the irregular rows (null
vectors, null elements, ragged lengths) that exercise the Python
fallback branch instead of the numpy fast path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icedb_spark.operators.similarity import (
    _as_double,
    _norm,
    _train_codebook,
    _training_view,
    cosine_topk,
    lsh_bucket,
    lsh_view,
)


def _jvm_view(df, dim, n_planes):
    """The pre-r13 JVM shape lsh_view must match bit-for-bit."""
    return df.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("cv"),
        lsh_bucket(F.col("embedding"), dim, n_planes).alias("bucket"),
    ).withColumn("cn", _norm(F.col("cv"))).select(
        "neighbor_id", "cv", "cn", "bucket"
    )


def _rows(df):
    return sorted(
        (r[0], tuple(r[1]) if r[1] is not None else None, r[2], r[3])
        for r in df.collect()
    )


def test_lsh_view_matches_jvm_folds(spark):
    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.round(F.sin(F.col("id") * 0.7 + i), 5).cast("float"),
        ).alias("embedding"),
    )
    got = lsh_view(emb, "vec_id", "embedding", 8, 5, "neighbor_id").select(
        "neighbor_id", "cv", "cn", "bucket"
    )
    assert _rows(got) == _rows(_jvm_view(emb, 8, 5))


def test_lsh_view_irregular_rows_match_jvm_null_semantics(spark):
    """Null vector -> bucket 0 + null norm; null element -> bucket 0 +
    null norm; ragged length -> bucket 0 but a real norm. These rows
    take the per-row Python fallback — it must equal the JVM fold."""
    rows = [
        (1, [1.0, -2.0, 3.0, -4.0]),
        (2, None),
        (3, [1.0, None, 3.0, -4.0]),
        (4, [1.0, 2.0]),              # ragged: shorter than dim
        (5, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),  # ragged: longer
        (6, [0.0, 0.0, 0.0, 0.0]),    # zero norm
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = lsh_view(emb, "vec_id", "embedding", 4, 3, "neighbor_id").select(
        "neighbor_id", "cv", "cn", "bucket"
    )
    assert _rows(got) == _rows(_jvm_view(emb, 4, 3))


def test_trainer_centroids_stay_on_integer_grid(spark):
    """The numpy partial-sum close-out must keep the trainer's defining
    property: every centroid coordinate is produced by the exact
    integer-division formula, i.e. lands on the 1e-4 grid (the
    bit-identity vs the former 64-column aggregate was A/B-proven in
    the round; this pins the construction against future drift)."""
    rows = [(i, [float((i * 7 + j) % 5 - 2) / 4 for j in range(4)])
            for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = _training_view(emb, "vec_id", "embedding")
    cents = _train_codebook(v, dim=4, n_centroids=3, iters=2)
    got = sorted((r[0], tuple(r[1])) for r in cents.collect())
    # closed-form check of one property: every centroid coordinate is a
    # 4-decimal grid point (the integer-division construction)
    for _, cv in got:
        for x in cv:
            assert abs(x * 10000 - round(x * 10000)) < 1e-9
    assert len(got) >= 1


def test_cosine_topk_prune_paths_identical(spark):
    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.round(F.cos(F.col("id") * 0.31 + i * 0.5), 5)
            .cast("float"),
        ).alias("embedding"),
    )
    qs = emb.where(F.col("vec_id") % 30 == 0)
    a = sorted(map(tuple, cosine_topk(emb, qs, k=4, prune=False).collect()))
    # force the pruner on despite the tiny estimate gate by monkeypatching
    # the env ceiling to 0 bytes
    import os

    os.environ["SPARK_GRAFT_TOPK_PRUNE_BYTES"] = "0"
    try:
        b = sorted(map(tuple, cosine_topk(emb, qs, k=4).collect()))
    finally:
        del os.environ["SPARK_GRAFT_TOPK_PRUNE_BYTES"]
    assert a == b


def test_cosine_topk_prune_handles_null_and_ragged_vectors(spark):
    rows = [(i, [float((i * 3 + j) % 7 - 3) for j in range(6)])
            for i in range(60)]
    rows += [(100, None), (101, [1.0, None, 2.0, 3.0, 4.0, 5.0]),
             (102, [1.0, 2.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.where(F.col("vec_id") % 20 == 0)
    a = sorted(map(tuple, cosine_topk(emb, qs, k=3, prune=False).collect()))
    import os

    os.environ["SPARK_GRAFT_TOPK_PRUNE_BYTES"] = "0"
    try:
        b = sorted(map(tuple, cosine_topk(emb, qs, k=3).collect()))
    finally:
        del os.environ["SPARK_GRAFT_TOPK_PRUNE_BYTES"]
    assert a == b
