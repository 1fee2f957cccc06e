"""Persisted ANN index lifecycle: train → commit → search → append →
compact → byte-code (PQ) variant.

The 100 TB embedding reality is "the index is a TABLE, not a frame":
built once, searched per query batch with I/O that tracks nprobe (never
index size), appended as new vectors arrive, compacted like any other
table, and — at real scale — stored as PQ byte codes (~32 bytes/vector)
instead of full vectors (~512). This example wires the round-10/11
operators into that loop as executable documentation; every step's
equality claim is value-gated in ``__spark_entry__`` (s09–s12):

1. **Train** a codebook in-engine (deterministic integer-grid k-means,
   ``_train_codebook`` via ``cosine_topk_ivf_trained``'s machinery) or
   take the seed policy (``ivf_codebook_rows``) — both persist to a
   tiny quantizer IceTable (C × dim doubles: broadcast territory).
2. **Commit inverted lists**: ``ivf_index_rows`` assigns each vector to
   its nearest cell (one broadcast + map-side argmax — the corpus never
   shuffles for assignment) and the insert's partition-by-cell write IS
   the index layout (cell Bloom + zone maps on top).
3. **Search** through ``cosine_topk_against_index_table``: probe cells
   rank against the read-back codebook, and the index is read through
   ``column_in={"cell": probed}`` file skipping.
4. **Append** a new batch against the FROZEN codebook — one more
   commit; results equal a from-scratch rebuild (the s11 gate).
5. **Compact** with ``optimize`` — search results are invariant.
6. **PQ variant**: ``pq_subcodebook_rows`` + ``ivfpq_index_rows`` store
   byte codes packed into one bigint per vector;
   ``cosine_topk_pq_against_index_table`` scores by ADC against the
   persisted sub-codebooks and exact-reranks the shortlist (s12 gate).

Run: python examples/ann_index.py
"""

from __future__ import annotations

import random
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.operators import (
    cosine_topk_against_index_table,
    cosine_topk_pq_against_index_table,
    ivf_codebook_rows,
    ivf_index_rows,
    ivfpq_index_rows,
    pq_subcodebook_rows,
)
from icedb_spark.session import get_spark

spark = get_spark("ann-index-example", master="local[4]")

DIM = 16
rnd = random.Random(11)


def vectors(lo: int, hi: int):
    rows = []
    for i in range(lo, hi):
        axis = i % 4
        v = [rnd.uniform(-0.05, 0.05) for _ in range(DIM)]
        v[axis * (DIM // 4)] += 1.0  # four loose clusters
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


batch_a = vectors(0, 200)
batch_b = vectors(200, 300)
queries = batch_a.where(F.col("vec_id") % 40 == 0)

code_root = tempfile.mkdtemp(prefix="ann-code-")
idx_root = tempfile.mkdtemp(prefix="ann-idx-")

# 1) quantizer table — codebook FROZEN on the first batch
code_t = IceTable(
    spark,
    code_root,
    partition_spec=PartitionSpec(fields=[PartitionField("p", "'all'")]),
    sort_order=["cid"],
)
code_t.insert(df=ivf_codebook_rows(batch_a, n_centroids=8))
codebook = code_t.read()

# 2) inverted lists, partitioned by cell with a cell Bloom
idx_t = IceTable(
    spark,
    idx_root,
    partition_spec=PartitionSpec(fields=[PartitionField("cell", "cell")]),
    sort_order=["vec_id"],
    bloom_columns=["cell"],
)
idx_t.insert(df=ivf_index_rows(batch_a, codebook))

# 3) pruned search: files read track nprobe, not index size
hits = cosine_topk_against_index_table(
    queries, idx_t, codebook, nprobe=2, k=3
)
print("after batch A:", hits.count(), "neighbor rows")
print("index files:", len(idx_t.files_for()))

# 4) append batch B against the SAME frozen codebook — one commit
idx_t.insert(df=ivf_index_rows(batch_b, codebook))
hits_ab = cosine_topk_against_index_table(
    queries, idx_t, codebook, nprobe=2, k=3
)
print("after append:", hits_ab.count(), "neighbor rows;",
      len(idx_t.files_for()), "files")

# 5) compact — results invariant (ice02's claim applied to the index)
before = sorted(map(tuple, hits_ab.collect()))
idx_t.optimize(max_file_size=1 << 40, max_file_count=10_000)
after = sorted(map(tuple, cosine_topk_against_index_table(
    queries, idx_t, codebook, nprobe=2, k=3
).collect()))
assert before == after, "compaction must not change search results"
print("post-compaction search identical;", len(idx_t.files_for()), "files")

# 6) PQ byte-code layout: ~32 bytes/vector instead of dim doubles
sub_root = tempfile.mkdtemp(prefix="ann-sub-")
pq_root = tempfile.mkdtemp(prefix="ann-pq-")
sub_t = IceTable(
    spark,
    sub_root,
    partition_spec=PartitionSpec(fields=[PartitionField("p", "'all'")]),
    sort_order=["s", "j"],
)
sub_t.insert(df=pq_subcodebook_rows(batch_a, dim=DIM, m_sub=4, k_sub=8))
subcodebook = sub_t.read()
pq_t = IceTable(
    spark,
    pq_root,
    partition_spec=PartitionSpec(fields=[PartitionField("cell", "cell")]),
    sort_order=["vec_id"],
    bloom_columns=["cell"],
)
corpus = batch_a.unionByName(batch_b)
pq_t.insert(df=ivfpq_index_rows(corpus, codebook, subcodebook,
                                dim=DIM, m_sub=4))
vec_bytes = sum(m.file_bytes for m in idx_t.files_for())
pq_bytes = sum(m.file_bytes for m in pq_t.files_for())
print(f"on-disk: full-vector {vec_bytes} B vs byte-code {pq_bytes} B "
      f"({vec_bytes / max(1, pq_bytes):.1f}x)")
pq_hits = cosine_topk_pq_against_index_table(
    queries, pq_t, codebook, subcodebook, dim=DIM, m_sub=4,
    nprobe=2, k=3, rerank=10, vectors=corpus,
)
print("PQ+rerank search:", pq_hits.count(), "neighbor rows")
