"""Skew-mitigation helpers: results must be identical to the unsalted
equivalents, and the plans must show the salt actually entering the
shuffle keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from icedb_spark.operators import salted_agg, salted_join


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(o, "l_orderkey").groupBy("o_orderpriority").count()
    salted = (
        salted_join(li, o, on=["l_orderkey"], buckets=8)
        .groupBy("o_orderpriority")
        .count()
    )
    assert _rows(salted) == _rows(plain)


def test_salted_join_shuffles_on_key_and_salt(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    # force a shuffle join so the salt's effect on partitioning is visible
    plan = _physical(
        salted_join(li.hint("merge"), o, on=["l_orderkey"], buckets=8)
    )
    assert "__ice_salt" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c"), F.round(F.sum("value"), 2).alias("s")
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        {"c": F.count(F.lit(1)), "s": F.sum("value")},
        {"c": F.sum("c"), "s": F.round(F.sum("s"), 2)},
        buckets=8,
    )
    p, s = dict(), dict()
    for r in plain.collect():
        p[r["event_type"]] = (r["c"], round(r["s"], 1))
    for r in salted.collect():
        s[r["event_type"]] = (r["c"], round(r["s"], 1))
    assert p == s


def test_salted_agg_is_two_phase(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    salted = salted_agg(
        ev,
        ["event_type"],
        {"c": F.count(F.lit(1))},
        {"c": F.sum("c")},
        buckets=8,
    )
    plan = _physical(salted)
    # phase 1 shuffles on (key, salt), phase 2 on key alone
    assert plan.count("Exchange hashpartitioning") == 2
    assert "__ice_salt" in plan


def test_lsh_topk_broadcasts_queries(spark, sf_dir):
    from icedb_spark.operators import cosine_topk_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") % 50 == 0)
    plan = _physical(cosine_topk_lsh(emb, q, dim=64, k=5, n_planes=6))
    # the corpus side must never shuffle for the join: queries are broadcast
    assert "BroadcastHashJoin" in plan
