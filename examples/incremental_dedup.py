"""Incremental corpus dedup: persisted indexes + per-batch joins.

The 100 TB ingestion reality is "dedup this new batch against everything
ever seen", not "re-dedup the whole corpus". This example wires the
round-7 operators into that loop as executable documentation — all
THREE dedup families run incrementally against persisted icedb tables:

1. A **MinHash signature index** (partitioned by band) accumulates
   ``minhash_index_rows`` for every ingested document — kept or
   dropped, 16 longs per doc, so near-dups of anything previously seen
   are always caught; each batch runs ``dedup_against_index`` (one
   (band, bh) equi-join; verdicts equal a full-corpus recompute on the
   union — the d13 gate proves this against a from-scratch oracle).
2. A **k-gram digest index** gates exact-substring spans incrementally
   (``substring_index_rows`` + ``duplicated_spans_against_index`` —
   8 bytes per distinct k-gram, presence = an earlier keeper exists).
3. An **embedding LSH index** would gate semantic near-dups the same
   way (``embedding_index_rows`` + ``embedding_dedup_against_index``)
   — same loop, bucket-keyed join; omitted here only because the toy
   corpus has no embeddings.
4. A final ``drop_duplicated_spans`` pass shows batch-global span
   removal with per-doc accounting.

Run: python examples/incremental_dedup.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.operators import (
    dedup_against_index_table,
    drop_duplicated_spans,
    duplicated_spans_against_index_table,
    minhash_index_rows,
    substring_index_rows,
)
from icedb_spark.session import get_spark

spark = get_spark("incremental-dedup-example", master="local[4]")

root = tempfile.mkdtemp(prefix="inc-dedup-")
corpus = IceTable(
    spark,
    f"{root}/corpus",
    partition_spec=PartitionSpec(fields=[PartitionField("src", "source")]),
    sort_order=["doc_id"],
)
index = IceTable(
    spark,
    f"{root}/sig_index",
    partition_spec=PartitionSpec(fields=[PartitionField("band", "band")]),
    sort_order=["bh"],
    # Bloom filters on bh make the per-batch index read prunable: a
    # batch only collides with rows in ITS OWN buckets, so the read
    # below passes the batch's bh set and skips unrelated index files
    bloom_columns=["bh"],
)

BATCHES = [
    [
        (1, "the quick brown fox jumps over the lazy dog by the river"),
        (2, "completely different content about spark shuffles and joins"),
        (3, "the quick brown fox jumps over the lazy dog by the river"),
    ],
    [
        (11, "completely different content about spark shuffles and joins"),
        (12, "fresh second-batch text with parquet row groups and footers"),
        (13, "novel text this pipeline has never seen before anywhere"),
    ],
]

for n, rows in enumerate(BATCHES, 1):
    batch = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).withColumn("source", F.lit(f"batch{n}"))
    # dedup_against_index_table = the pruned index read built in: only
    # files that may hold one of the BATCH's band buckets are scanned
    # (Bloom/zone-map hints; the (band, bh) join afterwards is exact),
    # and an empty index short-circuits to the in-batch rule.
    # persist_band_rows=False in a batch loop: the default cache is for
    # one-shot calls; a loop would accumulate one registered cache per
    # batch for the session's lifetime (the sibling _against_index
    # functions take the same opt-out)
    verdicts = dedup_against_index_table(
        batch, index, persist_band_rows=False
    )
    kept = batch.join(
        verdicts.where(~F.col("is_dup")).select("doc_id"), "doc_id"
    )
    corpus.insert(df=kept)
    # ALL signatures go to the index (dropped docs included) so future
    # near-dups of anything seen are caught
    index.insert(df=minhash_index_rows(batch))
    print(f"batch {n}: kept {kept.count()}/{len(rows)}")
    verdicts.orderBy("doc_id").show(truncate=False)

print("corpus after both batches:")
corpus.read().select("doc_id", "source").orderBy("doc_id").show()

print("exact-substring pass (8-token spans, keep-first removal):")
drop_duplicated_spans(corpus.read(), k=8).orderBy("doc_id").show(
    truncate=False
)

# the span family runs incrementally too: persist the corpus's distinct
# 8-gram digests, then gate a late batch that re-sends indexed content
span_idx = IceTable(
    spark,
    f"{root}/span_index",
    partition_spec=PartitionSpec(
        fields=[PartitionField("b", "cast(pmod(dig, 4) as int)")]
    ),
    sort_order=["dig"],
    bloom_columns=["dig"],
)
span_idx.insert(df=substring_index_rows(corpus.read(), k=8))
late = spark.createDataFrame(
    [
        (31, "intro words then the quick brown fox jumps over the lazy "
             "dog by the river and an outro"),
        (32, "wholly original closing text with no eight token overlap "
             "at all anywhere"),
    ],
    "doc_id long, text string",
)
print("late batch vs the persisted span index (doc 31 contains an")
print("11-token span already ingested; doc 32 is clean):")
duplicated_spans_against_index_table(
    late, span_idx, k=8, persist_positions=False
).orderBy("doc_id").show(truncate=False)

spark.stop()
