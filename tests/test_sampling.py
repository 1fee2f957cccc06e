"""Deterministic sampling / splitting operators.

Key properties under test: determinism across invocations (hash-derived,
not RNG), correct rate behavior, split-interval exhaustiveness and
stability, duplicate keys moving together, and DuckDB reproducing the
exact member sets via the shared md5 hash (the cross-engine contract that
makes the gate oracles possible).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from icedb_spark.operators.sampling import (
    assign_splits,
    fraction_sql,
    hash_sample,
    stratified_sample,
    top_k_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_hash_sample_is_deterministic_and_rate_bounded(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, "doc_id").select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.3, "doc_id").select("doc_id").collect()}
    assert a == b
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # loose: uniformity, not exactness
    # a smaller rate yields a SUBSET (nested samples — same hash, lower cut)
    small = {r["doc_id"] for r in hash_sample(docs, 0.1, "doc_id").select("doc_id").collect()}
    assert small < a


def test_hash_sample_matches_duckdb(docs):
    got = sorted(
        r["doc_id"] for r in hash_sample(docs, 0.25, "doc_id", seed=7).select("doc_id").collect()
    )
    frac = fraction_sql("cast(doc_id as varchar)", 7)
    want = [
        r[0]
        for r in duckdb.sql(
            "select doc_id from read_parquet('/root/testdata/sf0.001/documents.parquet') "
            f"where {frac} < 0.25 order by doc_id"
        ).fetchall()
    ]
    assert got == want


def test_hash_sample_duplicate_keys_move_together(spark):
    df = spark.createDataFrame(
        [(i % 10, j) for i in range(100) for j in range(2)], ["k", "v"]
    )
    kept = hash_sample(df, 0.5, "k").groupBy("k").count().collect()
    assert all(r["count"] == 20 for r in kept)  # a key keeps all its rows


def test_stratified_rates_and_default(docs):
    out = stratified_sample(
        docs, {"en": 1.0, "de": 0.0}, strata_col="lang", key_col="doc_id",
        default_rate=0.5,
    )
    by_lang = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    src = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert by_lang.get("en") == src.get("en")  # rate 1.0 keeps everything
    assert "de" not in by_lang  # rate 0.0 drops everything
    for lang, n in src.items():
        if lang in ("en", "de"):
            continue
        assert 0.2 * n < by_lang.get(lang, 0) < 0.8 * n


def test_stratified_rejects_bad_rates(docs):
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": 1.5}, "lang", "doc_id")
    with pytest.raises(ValueError):
        hash_sample(docs, -0.1, "doc_id")


def test_assign_splits_partitions_everything_stably(docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_splits(docs, w, "doc_id")
    counts = {r["split"]: r["cnt"] for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # exhaustive: every row gets a split
    assert set(counts) == set(w)
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # stability: the same doc lands in the same split on a second run
    a = {(r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect()}
    b = {
        (r["doc_id"], r["split"])
        for r in assign_splits(docs, w, "doc_id").select("doc_id", "split").collect()
    }
    assert a == b


def test_assign_splits_weights_must_sum_to_one(docs):
    with pytest.raises(ValueError):
        assign_splits(docs, {"train": 0.8, "test": 0.1}, "doc_id")


def test_top_k_sample_is_uniform_k_and_stable(docs):
    k = 37
    a = [r["doc_id"] for r in top_k_sample(docs, k, "doc_id").select("doc_id").collect()]
    assert len(a) == k and len(set(a)) == k
    b = [r["doc_id"] for r in top_k_sample(docs, k, "doc_id").select("doc_id").collect()]
    assert sorted(a) == sorted(b)
    # nested property: top-k ⊂ top-2k (same hash order)
    c = [r["doc_id"] for r in top_k_sample(docs, 2 * k, "doc_id").select("doc_id").collect()]
    assert set(a) < set(c)


def test_top_k_plans_as_take_ordered_not_full_sort(docs):
    plan = top_k_sample(docs, 10, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_mixture_sample_targets_and_binding_stratum(spark):
    from icedb_spark.operators import mixture_sample

    rows = (
        [{"doc_id": i, "lang": "en"} for i in range(400)]
        + [{"doc_id": 1000 + i, "lang": "de"} for i in range(50)]
        + [{"doc_id": 2000 + i, "lang": "zh"} for i in range(100)]
    )
    df = spark.createDataFrame(rows)
    # target 1:1 — de (50 rows vs en's 400) is binding: keep ALL de,
    # downsample en to ~50; zh unlisted → dropped entirely
    out = mixture_sample(df, {"en": 1.0, "de": 1.0}, "lang", "doc_id")
    counts = {r["lang"]: r["cnt"] for r in
              out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert counts.get("zh") is None
    assert counts["de"] == 50          # binding stratum: rate exactly 1.0
    assert 25 <= counts["en"] <= 80    # ~50 in expectation (hash variance)
    # deterministic: same call → same member set
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               mixture_sample(df, {"en": 1.0, "de": 1.0}, "lang",
                              "doc_id").collect())
    assert a == b


def test_mixture_sample_validation(spark):
    from icedb_spark.operators import mixture_sample

    df = spark.createDataFrame([{"doc_id": 1, "lang": "en"}])
    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample(df, {}, "lang", "doc_id")
    with pytest.raises(ValueError, match="must be > 0"):
        mixture_sample(df, {"en": 0.0}, "lang", "doc_id")
    # all listed strata absent → empty result, not an error
    assert mixture_sample(df, {"xx": 1.0}, "lang", "doc_id").count() == 0


# ------------------------------------------------------- shuffle shard


def test_shuffle_shard_is_permutation_and_deterministic(spark):
    from icedb_spark.operators import shuffle_shard

    df = spark.range(0, 200).withColumnRenamed("id", "k")
    out = shuffle_shard(df, "k", n_shards=4, seed=1)
    rows = out.collect()
    # every row assigned, positions within a shard are 0..n-1 dense
    assert len(rows) == 200
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # deterministic across partitionings
    again = {
        (r["k"]): (r["shard"], r["pos"])
        for r in shuffle_shard(df.repartition(13), "k", 4, seed=1).collect()
    }
    first = {r["k"]: (r["shard"], r["pos"]) for r in rows}
    assert first == again
    # a different seed produces a different permutation
    other = {
        r["k"]: (r["shard"], r["pos"])
        for r in shuffle_shard(df, "k", 4, seed=2).collect()
    }
    assert other != first


def test_shuffle_shard_validates(spark):
    import pytest
    from icedb_spark.operators import shuffle_shard

    with pytest.raises(ValueError):
        shuffle_shard(spark.range(1), "id", 0)


# ------------------------------------------------------- alpha sampling


def test_alpha_sample_rebalances_toward_uniform(spark):
    from icedb_spark.operators import alpha_sample

    rows = (
        [(i, "big") for i in range(900)]
        + [(i + 1000, "small") for i in range(100)]
        + [(2000, None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = alpha_sample(df, 0.5, "lang", "doc_id").groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    # targets ∝ sqrt(n): 30:10 -> 'small' keeps ALL 100 (binding stratum),
    # 'big' downsamples to ~300; NULL strata dropped
    assert got["small"] == 100
    assert 200 <= got["big"] <= 400
    assert None not in got
    # alpha=1 is the identity mixture (natural proportions -> keep all)
    full = alpha_sample(df, 1.0, "lang", "doc_id")
    assert full.count() == 1000

    import pytest as _pt

    with _pt.raises(ValueError):
        alpha_sample(df, 1.5, "lang", "doc_id")


def test_weighted_sample_matches_duckdb_exactly(docs):
    from icedb_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_sql,
    )

    got = [
        r["doc_id"]
        for r in weighted_sample(docs, 50, "n_chars", "doc_id", seed=11)
        .select("doc_id")
        .orderBy("doc_id")
        .collect()
    ]
    want = sorted(
        r[0]
        for r in duckdb.sql(
            weighted_sample_sql(
                50,
                "n_chars",
                "cast(doc_id as varchar)",
                seed=11,
                table=(
                    "read_parquet("
                    "'/root/testdata/sf0.001/documents.parquet')"
                ),
                cols="doc_id",
            )
        ).fetchall()
    )
    assert got == want


def test_weighted_sample_follows_weights(spark):
    from icedb_spark.operators.sampling import weighted_sample

    # 500 light rows (w=1) vs 500 heavy rows (w=50): a 200-row A-ES
    # draw must be dominated by the heavy group
    rows = [(i, 1) for i in range(500)] + [(1000 + i, 50) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_sample(df, 200, "w", "doc_id").collect()
    assert len(out) == 200
    heavy = sum(1 for r in out if r["doc_id"] >= 1000)
    assert heavy > 160  # E[heavy] ≈ 196; far from uniform's 100


def test_weighted_sample_guards_weights_and_k(spark):
    from icedb_spark.operators.sampling import weighted_sample

    rows = [(1, 5), (2, 0), (3, -4), (4, None), (5, 7)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    got = {r["doc_id"] for r in weighted_sample(df, 10, "w", "doc_id").collect()}
    assert got == {1, 5}  # zero/negative/NULL weights can never win

    import pytest as _pt

    with _pt.raises(ValueError):
        weighted_sample(df, 0, "w", "doc_id")


def test_weighted_sample_plans_as_take_ordered(docs):
    from icedb_spark.operators.sampling import weighted_sample

    plan = (
        weighted_sample(docs, 10, "n_chars", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_token_budget_sample_fills_budgets(spark):
    from icedb_spark.operators.sampling import token_budget_sample

    rows = [(i, "a" if i % 3 else "b", 10 + i % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, src string, toks int")
    out = token_budget_sample(
        df, {"a": 500, "b": 120}, "src", "toks", "doc_id"
    )
    got = out.groupBy("src").agg(
        F.sum("toks").alias("t"), F.max("toks").alias("m"),
        F.count("*").alias("c"),
    ).collect()
    by = {r["src"]: r for r in got}
    # greedy fill: total before the last doc is under budget, so the
    # kept total overshoots by at most one document
    assert 500 <= by["a"]["t"] < 500 + by["a"]["m"] or by["a"]["t"] < 500
    assert by["b"]["t"] < 120 + by["b"]["m"]
    assert by["a"]["c"] >= 1 and by["b"]["c"] >= 1
    # nested: a bigger budget keeps a superset (same hash order)
    small = {r["doc_id"] for r in out.collect()}
    big = {
        r["doc_id"]
        for r in token_budget_sample(
            df, {"a": 900, "b": 300}, "src", "toks", "doc_id"
        ).collect()
    }
    assert small < big
    # budget exceeding the stratum total keeps everything
    all_a = token_budget_sample(df, {"a": 10**9}, "src", "toks", "doc_id")
    assert all_a.where("src = 'a'").count() == df.where("src = 'a'").count()


def test_token_budget_sample_default_and_nulls(spark):
    import pytest as _pt

    from icedb_spark.operators.sampling import token_budget_sample

    rows = [(1, "x", 50), (2, "x", 50), (3, None, 40), (4, None, 40)]
    df = spark.createDataFrame(rows, "doc_id long, src string, toks int")
    # default 0: unlisted and NULL strata are dropped entirely
    assert token_budget_sample(df, {}, "src", "toks", "doc_id").count() == 0
    # a positive default funds NULL strata too (grouped together)
    got = token_budget_sample(
        df, {}, "src", "toks", "doc_id", default_budget=60
    )
    assert got.where("src is null").count() >= 1
    with _pt.raises(ValueError):
        token_budget_sample(df, {"x": -1}, "src", "toks", "doc_id")


def test_token_budget_sample_matches_duckdb(docs):
    from icedb_spark.operators.sampling import (
        token_budget_sample,
        token_budget_sample_sql,
    )

    budgets = {"en": 3000, "de": 1000}
    got = sorted(
        r["doc_id"]
        for r in token_budget_sample(
            docs, budgets, "lang", "n_chars", "doc_id",
            default_budget=500, seed=3,
        ).select("doc_id").collect()
    )
    want = sorted(
        r[0]
        for r in duckdb.sql(
            token_budget_sample_sql(
                budgets, "lang", "n_chars", "cast(doc_id as varchar)",
                default_budget=500, seed=3,
                table="read_parquet('/root/testdata/sf0.001/documents.parquet')",
                cols="doc_id",
            )
        ).fetchall()
    )
    assert got == want
