"""Distributed connected components and transitive duplicate clustering.

Pair detectors (:func:`~icedb_spark.operators.dedup.minhash_lsh_pairs`,
:func:`~icedb_spark.operators.dedup.ngram_jaccard_pairs`, SimHash, embedding
LSH) emit EDGES: ``a`` is a near-duplicate of ``b``. Actual deduplication
needs the transitive closure — if a~b and b~c, all three are one duplicate
CLUSTER and exactly one survives, even when a and c were never compared.
That closure is a connected-components computation over the pair graph.

Scale design:

* **Hash-to-min + pointer jumping.** Each iteration propagates the minimum
  component id one hop along edges (a shuffle join keyed by node) and then
  SHORT-CIRCUITS through the current labels (``comp(v) ← comp(comp(v))``,
  a self-join on the label table). Plain one-hop propagation needs
  O(diameter) rounds; the jump collapses chains so convergence is
  O(log diameter) rounds — a 1M-link chain resolves in ~20 rounds, not 1M.
* **Per-round cost is bounded**: one edge-by-label join (shuffle keyed by
  node id) + one label self-join + one scalar aggregate for the
  convergence test. No collect of nodes or edges to the driver — the only
  driver-side value per round is one summed fingerprint.
* **Convergence by fingerprint, confirmed exactly**: per round the only
  driver-side value is ``sum(xxhash64(comp))`` (type-agnostic — node ids
  may be strings; summed as decimal(38,0) so no overflow at any node
  count). An unchanged fingerprint is *necessary* for convergence but a
  hash-sum could collide, so the one round whose fingerprint matches runs
  an exact changed-rows check before declaring the fixpoint — the
  per-round cost stays one aggregate, and the exact join runs once.
* **Lineage control**: labels persist each round (previous round
  unpersisted), and every few rounds ``localCheckpoint`` truncates the
  growing iterative plan so analysis cost stays flat. ``localCheckpoint``
  trades executor-loss recovery for speed — at cluster scale with flaky
  executors, point ``spark.sparkContext.setCheckpointDir`` at durable
  storage and pass ``reliable_checkpoint=True``.

The duplicate-pair use case has tiny diameters (near-dup chains are short),
so typical runs converge in 2-3 rounds; the pointer jumping is insurance
against adversarial chain-shaped corpora (e.g. boilerplate with a sliding
date), not the common case.

Reference parity: the reference engine has no graph operator; this supports
the training-data dedup pipeline (SURVEY §2 LLM-pipeline extensions).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["connected_components", "dedup_clusters", "pick_canonical"]


def _union_find_labels(pairs: list[tuple]) -> dict:
    """Exact min-id component labels via union-find with path compression —
    the driver-side fast path for provably-small edge lists."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    roots: dict = {}
    for x in parent:
        roots.setdefault(find(x), []).append(x)
    labels: dict = {}
    for members in roots.values():
        lo = min(members)
        for m in members:
            labels[m] = lo
    return labels


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    checkpoint_every: int = 5,
    reliable_checkpoint: bool = False,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns ``(node, component)`` — one row per distinct node, where
    ``component`` is the MINIMUM node id in the node's component (a
    deterministic canonical label any engine reproduces).

    When the (deduplicated) edge list is at most ``small_graph_threshold``
    rows, components are solved with a driver-side union-find instead of
    the iterative shuffle rounds: the collect is explicitly bounded (1M
    edges ≈ tens of MB), exact, and replaces ~4 shuffles × O(log diameter)
    rounds with one pass — near-dup pair graphs are tiny relative to their
    corpus, so in practice this is the common path even at 100 TB corpus
    scale, while a genuinely huge graph (cross-corpus entity resolution)
    still takes the distributed iteration. Pass ``0`` to force the
    distributed path. Labels are identical between the two paths
    (property-tested).

    The result is materialized (the fixpoint must be found either way)
    and returned persisted; callers own the unpersist.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if small_graph_threshold:
        # limit(k+1) bounds the probe itself — never a full count of a
        # graph we are not going to collect
        probe = e.limit(small_graph_threshold + 1).count()
        if probe <= small_graph_threshold:
            try:
                pairs = [(r["u"], r["v"]) for r in e.collect()]
                labels = _union_find_labels(pairs)
                node_t = e.schema["u"].dataType
                out_schema = T.StructType([
                    T.StructField("node", node_t, True),
                    T.StructField("comp", node_t, True),
                ])
                out = edges.sparkSession.createDataFrame(
                    sorted(labels.items()), out_schema
                ).persist(StorageLevel.MEMORY_AND_DISK)
                out.count()
                return out
            finally:
                e.unpersist()
    labels = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def fingerprint(lb: DataFrame) -> object:
        row = lb.agg(
            F.sum(F.xxhash64("comp").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        return (row["s"], row["n"])

    fp = fingerprint(labels)
    for it in range(max_iter):
        # one-hop propagation: min component id over {self} ∪ neighbors
        nbr_min = (
            e.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("nmin"))
            .withColumnRenamed("u", "node")
        )
        hop = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                "comp"
            ),
        )
        # pointer jump: comp(v) ← comp(comp(v)) through the PRE-hop labels
        # (comp values are always node ids, so the join key always resolves)
        jumped = (
            hop.join(
                labels.select(
                    F.col("node").alias("comp"), F.col("comp").alias("jmp")
                ),
                "comp",
                "left",
            )
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("jmp"), F.col("comp"))).alias(
                    "comp"
                ),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            if reliable_checkpoint:
                jumped = jumped.checkpoint(eager=False)
            else:
                jumped = jumped.localCheckpoint(eager=False)
        jumped = jumped.persist(StorageLevel.MEMORY_AND_DISK)
        new_fp = fingerprint(jumped)  # also materializes this round
        converged = False
        if new_fp == fp:
            # hash-sum equality is necessary, not sufficient — confirm with
            # an exact changed-rows probe (runs once, at the fixpoint)
            converged = (
                jumped.withColumnRenamed("comp", "c2")
                .join(labels, "node")
                .where(F.col("c2") != F.col("comp"))
                .limit(1)
                .count()
                == 0
            )
        labels.unpersist()
        labels = jumped
        if converged:
            break
        fp = new_fp
    else:
        # release the caches before surfacing — an exception path must not
        # pin executor memory for the life of the application
        labels.unpersist()
        e.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    e.unpersist()
    return labels


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Transitive duplicate clusters from a near-duplicate pair list.

    Output: ``(doc_id, cluster_id, cluster_size, is_keeper)`` — one row per
    document that appears in some pair. ``cluster_id`` is the minimum
    doc_id of the transitive cluster, ``is_keeper`` marks that canonical
    survivor (the standard keep-one policy: anti-join the corpus against
    the non-keepers to dedup). Documents in no pair are untouched by
    definition and are not emitted.
    """
    comp = connected_components(pairs, src=id_a, dst=id_b)
    sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    out = (
        comp.join(sizes, "comp")
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("comp")).alias("is_keeper"),
        )
        # materialize the (small) cluster table, then release the internal
        # label cache — callers have no handle to it, and without this every
        # invocation in a long-lived driver pins one labels DataFrame
        # forever. The RESULT stays persisted; its lifetime is caller-owned
        # (unpersist or clearCache between corpora, as documented in dedup).
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out.count()
    comp.unpersist()
    return out


def pick_canonical(
    pairs: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Quality-aware keep-one selection: for each transitive duplicate
    cluster, keep the member with the highest ``score_col`` (ties break to
    the lowest id) — the policy real training-data pipelines want, where
    the SURVIVOR of a dup cluster should be its best-quality copy, not an
    arbitrary one. ``dedup_clusters``' own ``is_keeper`` (min-id) is the
    score-free special case.

    Output: ``(doc_id, cluster_id, cluster_size, score, is_keeper)`` — one
    row per document that appears in some pair. Scale shape: the cluster
    table is O(docs-in-pairs) — tiny relative to the corpus — so the
    per-cluster ``row_number`` window shuffles only that; the corpus-sized
    work stays inside the pair detector.
    """
    from pyspark.sql import Window

    clusters = dedup_clusters(pairs, id_a, id_b).drop("is_keeper")
    joined = clusters.join(
        scores.select(
            F.col(id_col).alias("doc_id"), F.col(score_col).alias("score")
        ),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return joined.withColumn("is_keeper", F.row_number().over(w) == 1)
