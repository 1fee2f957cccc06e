"""Data governance on one table: quality gates in, named snapshots out.

The workflow a training-data platform actually runs:

1. CHECK constraints gate ingest (bad rows quarantined WITH their
   violated-rule list, clean rows committed atomically),
2. an aggregate view maintained INCREMENTALLY from the change feed (no
   re-aggregation of the base, deletes retract exactly),
3. a release is pinned with a snapshot TAG — vacuum refuses to touch
   anything the tag still needs, so the corpus a model trained on stays
   byte-reproducible until the tag is dropped.

Run: python examples/governance.py  (temp dir; prints each step)
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from icedb_spark import (
    ConstraintViolation,
    IceTable,
    PartitionField,
    PartitionSpec,
    split_valid,
)
from icedb_spark.mv import IncrementalView
from icedb_spark.session import get_spark

RULES = {
    "score_in_range": "score between 0 and 1",
    "known_source": "source in ('crawl', 'books', 'code')",
}


def main() -> None:
    spark = get_spark("icedb-spark-governance")
    root = tempfile.mkdtemp(prefix="ice-gov-")

    docs = IceTable(
        spark, f"{root}/docs",
        partition_spec=PartitionSpec(fields=[PartitionField("s", "source")]),
        sort_order=["doc_id"],
        constraints=RULES, constraint_mode="fail",
    )
    quarantine = IceTable(
        spark, f"{root}/quarantine",
        partition_spec=PartitionSpec(fields=[PartitionField("s", "source")]),
        sort_order=["doc_id"],
    )

    batch = spark.createDataFrame(
        [(1, "crawl", 0.9), (2, "books", 0.7), (3, "spam", 0.4),
         (4, "crawl", 1.7), (5, "code", 0.6)],
        "doc_id long, source string, score double",
    )

    # -- 1. fail mode rejects the whole batch atomically, with counts
    try:
        docs.insert(df=batch)
    except ConstraintViolation as e:
        print(f"rejected: {e.counts}")

    # quarantine flow: good rows commit, bad rows held with reasons
    good, bad = split_valid(batch, RULES)
    docs.insert(df=good)
    quarantine.insert(df=bad)
    print("\n-- quarantined (with reasons)")
    quarantine.read().select("doc_id", "source", "_violations").show()

    # -- 2. incremental MV: per-source counts/score sums from the feed
    stats = IceTable(
        spark, f"{root}/stats",
        partition_spec=PartitionSpec(fields=[PartitionField("s", "source")]),
        sort_order=["source"],
    )
    iv = IncrementalView(docs, stats, keys=["source"], sums=["score"])
    stats.custom_merge_query = iv.merge_sql()
    iv.refresh()
    print("-- view after first refresh")
    iv.read().show()

    docs.delete("score < 0.65", capture_changes=True)
    iv.refresh()   # folds ONLY the delete's retractions
    print("-- view after captured delete (code source retracted)")
    iv.read().show()

    # -- 3. pin the release; vacuum cannot break it
    docs.tag("release-2026-08")
    docs.insert(rows=[{"doc_id": 9, "source": "books", "score": 0.8}])
    while docs.merge(max_file_size=1 << 40, max_file_count=100):
        pass
    docs.tombstone_cleanup(min_age_ms=0)   # protect_tags=True by default
    pinned = docs.read(tag="release-2026-08")
    print(f"-- tagged snapshot still intact after vacuum: {pinned.count()} rows")
    assert pinned.count() == 2  # docs 1, 2 (doc 5 was deleted pre-tag)

    docs.delete_tag("release-2026-08")
    logs, data = docs.tombstone_cleanup(min_age_ms=0)
    print(f"tag dropped -> vacuum reclaimed {len(data)} data file(s)")


if __name__ == "__main__":
    main()
