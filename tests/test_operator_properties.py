"""Property tests for the round-6 operator changes: the salted two-level
top-k in semantic_coverage_sample must be BIT-IDENTICAL to the full
per-cell ranking for arbitrary corpora/budgets/salt counts (the de-skew
must never change selection), and bm25_score must equal a pure-Python
recompute for arbitrary small corpora and queries.

Few examples by design: unlike the metadata-only property suites, every
example here runs real Spark jobs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _vec(rnd, dim):
    return [round(rnd.uniform(-1.0, 1.0), 3) or 0.001 for _ in range(dim)]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10**6),
    n=st.integers(5, 60),
    per_cell=st.integers(1, 6),
    salt=st.integers(1, 7),
    n_clusters=st.integers(1, 4),
)
def test_salted_coverage_equals_full_ranking(
    spark, seed, n, per_cell, salt, n_clusters
):
    import random

    from icedb_spark.operators import semantic_coverage_sample

    rnd = random.Random(seed)
    dim = 4
    rows = [(i, _vec(rnd, dim)) for i in range(n)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    kw = dict(dim=dim, n_clusters=n_clusters, iters=1)
    got = sorted(
        map(
            tuple,
            semantic_coverage_sample(
                emb, per_cell=per_cell, salt=salt, **kw
            ).collect(),
        )
    )
    full = semantic_coverage_sample(emb, per_cell=n + 1, **kw).collect()
    expect = sorted(
        tuple(r) for r in full if r["cell_rank"] <= per_cell
    )
    assert got == expect


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10**6),
    n=st.integers(2, 30),
    qlen=st.integers(1, 5),
)
def test_bm25_equals_bruteforce(spark, seed, n, qlen):
    import random

    from icedb_spark.operators import bm25_score

    rnd = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = {
        i: " ".join(
            rnd.choice(vocab) for _ in range(rnd.randint(1, 12))
        )
        for i in range(n)
    }
    query = " ".join(rnd.choice(vocab) for _ in range(qlen))
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in bm25_score(df, query, top_k=n + 5).collect()
    ]

    toks = {i: t.split() for i, t in texts.items()}
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75
    q = sorted(set(query.split()))
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in q}
    expect = []
    for i, v in toks.items():
        s, hits = 0.0, 0
        for t in q:
            tf = v.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log(
                1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            )
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(v) / avgdl)
            )
        if hits:
            expect.append((i, round(s, 6), hits))
    expect.sort(key=lambda r: (-r[1], r[0]))
    assert got == expect
