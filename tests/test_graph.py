"""Connected components / transitive dedup clustering.

The pair detectors emit edges; actual keep-one dedup needs the transitive
closure. These tests pin the canonical labeling (min node id per
component), the convergence behavior (pointer jumping => few rounds even
on chain graphs), and the cluster/keeper contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icedb_spark.operators import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a string, id_b string")


def _labels(df):
    return {r["node"]: r["comp"] for r in df.collect()}


def test_chain_collapses_to_min(spark):
    # d-c, c-b, b-a: transitive chain, min label 'a' must reach every node
    cc = connected_components(_edges(spark, [("d", "c"), ("c", "b"), ("b", "a")]))
    assert _labels(cc) == {"a": "a", "b": "a", "c": "a", "d": "a"}
    cc.unpersist()


def test_disjoint_components_stay_apart(spark):
    cc = connected_components(
        _edges(spark, [("b", "a"), ("x", "y"), ("y", "z")])
    )
    assert _labels(cc) == {"a": "a", "b": "a", "x": "x", "y": "x", "z": "x"}
    cc.unpersist()


def test_star_and_triangle(spark):
    # star around 'm' plus a cycle — cycles must not loop forever
    cc = connected_components(
        _edges(
            spark,
            [("m", "s1"), ("m", "s2"), ("m", "s3"), ("p", "q"), ("q", "r"), ("r", "p")],
        )
    )
    lab = _labels(cc)
    assert {lab[n] for n in ("m", "s1", "s2", "s3")} == {"m"}
    assert {lab[n] for n in ("p", "q", "r")} == {"p"}
    cc.unpersist()


def test_empty_edges(spark):
    cc = connected_components(_edges(spark, []))
    assert cc.count() == 0
    cc.unpersist()


def test_long_chain_converges_in_log_rounds(spark):
    # 64-node chain: one-hop propagation alone needs ~63 rounds; pointer
    # jumping must finish within max_iter=12 (~log2(64)+slack)
    nodes = [f"n{i:03d}" for i in range(64)]
    pairs = list(zip(nodes[1:], nodes[:-1]))
    cc = connected_components(
        _edges(spark, pairs), max_iter=12, small_graph_threshold=0
    )
    lab = _labels(cc)
    assert set(lab.values()) == {"n000"}
    assert len(lab) == 64
    cc.unpersist()


def test_non_convergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _edges(spark, [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(63)]),
            max_iter=2,
            checkpoint_every=0,
            small_graph_threshold=0,
        )


def test_dedup_clusters_contract(spark):
    # {a,b,c} transitively + {x,y}: keeper = min id, sizes correct,
    # untouched docs absent
    out = dedup_clusters(
        _edges(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert set(rows) == {"a", "b", "c", "x", "y"}
    for d in ("a", "b", "c"):
        assert rows[d]["cluster_id"] == "a"
        assert rows[d]["cluster_size"] == 3
    for d in ("x", "y"):
        assert rows[d]["cluster_id"] == "x"
        assert rows[d]["cluster_size"] == 2
    assert [d for d, r in rows.items() if r["is_keeper"]] == ["a", "x"] or {
        d for d, r in rows.items() if r["is_keeper"]
    } == {"a", "x"}


def test_anti_join_dedups_corpus(spark):
    # the documented keep-one policy: corpus minus non-keepers
    corpus = spark.createDataFrame(
        [(d,) for d in ("a", "b", "c", "x", "y", "lone")], "doc_id string"
    )
    clusters = dedup_clusters(_edges(spark, [("a", "b"), ("b", "c"), ("x", "y")]))
    drop = clusters.where(~F.col("is_keeper")).select("doc_id")
    kept = corpus.join(drop, "doc_id", "left_anti")
    assert {r["doc_id"] for r in kept.collect()} == {"a", "x", "lone"}


def test_small_graph_fastpath_matches_distributed(spark):
    """The driver-side union-find short-circuit must produce bit-identical
    labels to the distributed hash-to-min iteration on the same graph
    (chain + triangle + star + singleton edge, string AND int ids)."""
    pairs = (
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(20)]
        + [("t1", "t2"), ("t2", "t3"), ("t3", "t1")]
        + [("hub", s) for s in ("s1", "s2", "s3")]
        + [("z9", "z8")]
    )
    fast = _labels(connected_components(_edges(spark, pairs)))
    dist = _labels(
        connected_components(_edges(spark, pairs), small_graph_threshold=0)
    )
    assert fast == dist

    ints = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (7, 7)], "id_a long, id_b long"
    )
    fast_i = _labels(connected_components(ints))
    dist_i = _labels(connected_components(ints, small_graph_threshold=0))
    assert fast_i == dist_i == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 7: 7}


def test_small_graph_threshold_probe_is_bounded(spark):
    """A graph just over the threshold takes the distributed path (the
    probe counts at most threshold+1 rows, never the whole graph)."""
    pairs = [(f"a{i}", f"b{i}") for i in range(6)]
    cc = connected_components(_edges(spark, pairs), small_graph_threshold=5)
    lab = _labels(cc)
    assert len(lab) == 12 and len(set(lab.values())) == 6
    cc.unpersist()
