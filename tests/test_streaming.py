"""Structured Streaming ingestion tests (file-drop → IceTable commits)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.streaming import micro_batch_pipeline
from icedb_spark.testdata import load_table


def _wait(q):
    q.awaitTermination(120)


def test_stream_insert_availablenow(spark, tmp_path, sf_dir):
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    events = load_table(spark, sf_dir, "events")
    # drop two "files" into the watched directory
    events.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="append"
    )
    events.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )

    t = IceTable(
        spark,
        str(tmp_path / "tbl"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("d", "date_format(timestamp_micros(ts div 1000), 'yyyy-MM-dd')")]
        ),
        sort_order=["ts"],
    )
    q = micro_batch_pipeline(
        t,
        src,
        schema=events.schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        merge_every=1,
    )
    _wait(q)
    assert t.read().count() == events.count()
    # availableNow processed everything in one batch; merge ran after it
    state = t.snapshot()
    parts = {m.partition() for m in state.alive_files()}
    assert len(parts) == len(state.alive_files())  # merged: one file per partition

    # restart with no new data: checkpoint + replay-dedup ⇒ no double insert
    q2 = micro_batch_pipeline(
        t, src, schema=events.schema, checkpoint_dir=str(tmp_path / "ckpt")
    )
    _wait(q2)
    assert t.read().count() == events.count()

def test_replay_dedup_survives_lost_marker(spark, tmp_path, sf_dir):
    """Exactly-once under the crash window: the batch id is embedded in the
    committed log file name (atomic with the commit), so a replay with the
    side marker LOST (crash between commit and marker write) still skips."""
    import shutil

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    events = load_table(spark, sf_dir, "events")
    events.coalesce(1).write.parquet(src, mode="append")

    t = IceTable(
        spark,
        str(tmp_path / "tbl"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("d", "date_format(timestamp_micros(ts div 1000), 'yyyy-MM-dd')")]
        ),
        sort_order=["ts"],
    )
    q = micro_batch_pipeline(
        t, src, schema=events.schema, checkpoint_dir=str(tmp_path / "ckpt"),
        stream_id="streamA",
    )
    _wait(q)
    n = events.count()
    assert t.read().count() == n

    # simulate the disaster: marker cache gone AND checkpoint rebuilt (so
    # Spark re-delivers batch 0); the stream keeps its logical identity
    shutil.rmtree(os.path.join(t.path, "_stream_batches"))
    q2 = micro_batch_pipeline(
        t, src, schema=events.schema, checkpoint_dir=str(tmp_path / "ckpt2"),
        stream_id="streamA",
    )
    _wait(q2)
    assert t.read().count() == n  # authoritative log-tag check skipped it

    # a DIFFERENT logical stream into the same table must NOT be deduped
    # against streamA's tags even though its batch ids collide
    src2 = str(tmp_path / "incoming2")
    os.makedirs(src2)
    extra = events.limit(7)
    extra.coalesce(1).write.parquet(src2, mode="append")
    q3 = micro_batch_pipeline(
        t, src2, schema=events.schema, checkpoint_dir=str(tmp_path / "ckpt3"),
        stream_id="streamB",
    )
    _wait(q3)
    assert t.read().count() == n + 7


def test_stream_row_dedup_within_watermark(spark, tmp_path, sf_dir):
    """An at-least-once source (the same rows delivered in two files) must
    land exactly once when dedup_keys + watermark are set. maxFilesPerTrigger
    forces the two deliveries into SEPARATE micro-batches, so the duplicates
    in batch 2 are dropped by the cross-batch state store, not by in-batch
    dedup; the delay exceeds the data's whole event-time span so no
    genuinely-new row is ever dropped as late."""
    from icedb_spark.streaming import stream_insert

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.timestamp_micros((F.col("ts") / 1000).cast("long")).alias("ev_ts"),
        "event_type",
        "value",
    )
    # two deliveries of the SAME rows (plus a disjoint second half)
    first = events.where(F.col("event_id") % 2 == 0)
    first.coalesce(1).write.parquet(src, mode="append")
    first.unionByName(events.where(F.col("event_id") % 2 == 1)).coalesce(
        1
    ).write.parquet(src, mode="append")

    t = IceTable(
        spark,
        str(tmp_path / "tbl"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("d", "date_format(ev_ts, 'yyyy-MM-dd')")]
        ),
        sort_order=["event_id"],
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)  # one delivery per micro-batch
        .parquet(src)
    )
    q = stream_insert(
        t,
        stream,
        str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
        dedup_keys=["event_id"],
        watermark=("ev_ts", "2400 hours"),
    )
    _wait(q)
    total = events.count()
    got = t.read()
    assert got.count() == total
    assert got.select("event_id").distinct().count() == total
    # the state store really saw two batches: the table carries >= 2 commits
    assert len(t.snapshot().log_files) >= 2


def test_stream_upsert_cdc_apply(spark, tmp_path):
    """foreachBatch-MERGE CDC apply: a change stream with several versions
    per key compacts to the last version per batch (order_by), upserts
    atomically, and a replayed restart cannot double-apply."""
    from icedb_spark.streaming import stream_upsert

    t = IceTable(
        spark,
        str(tmp_path / "tbl"),
        partition_spec=PartitionSpec(fields=[PartitionField("b", "bucket")]),
        sort_order=["id"],
        stats_columns=["id"],
    )
    t.insert([{"id": i, "bucket": "x", "v": 0.0, "ver": 0} for i in (1, 2, 3)])

    src = str(tmp_path / "changes")
    os.makedirs(src)
    changes = spark.createDataFrame(
        [
            # two versions of key 2 in one batch: ver=2 must win
            {"id": 2, "bucket": "x", "v": 10.0, "ver": 1},
            {"id": 2, "bucket": "x", "v": 20.0, "ver": 2},
            {"id": 9, "bucket": "y", "v": 9.0, "ver": 1},  # brand-new key
        ]
    )
    changes.coalesce(1).write.parquet(src, mode="append")

    stream = spark.readStream.schema(changes.schema).parquet(src)
    q = stream_upsert(
        t, stream, str(tmp_path / "ckpt"), on="id", order_by="ver",
    )
    _wait(q)
    got = {r["id"]: (r["v"], r["ver"]) for r in t.read().collect()}
    assert got == {1: (0.0, 0), 2: (20.0, 2), 3: (0.0, 0), 9: (9.0, 1)}

    # restart on the same checkpoint: replay dedup, nothing re-applied
    logs = len(t.snapshot().log_files)
    q2 = stream_upsert(
        t,
        spark.readStream.schema(changes.schema).parquet(src),
        str(tmp_path / "ckpt"),
        on="id",
        order_by="ver",
    )
    _wait(q2)
    assert len(t.snapshot().log_files) == logs
    got2 = {r["id"]: (r["v"], r["ver"]) for r in t.read().collect()}
    assert got2 == got


def test_stream_upsert_delete_stream(spark, tmp_path):
    """A deletion stream: when_matched='delete', when_not_matched=None."""
    from icedb_spark.streaming import stream_upsert

    t = IceTable(
        spark,
        str(tmp_path / "tbl"),
        partition_spec=PartitionSpec(fields=[PartitionField("b", "bucket")]),
        sort_order=["id"],
    )
    t.insert([{"id": i, "bucket": "x", "v": 1.0} for i in (1, 2, 3, 4)])

    src = str(tmp_path / "dels")
    os.makedirs(src)
    spark.createDataFrame(
        [{"id": 2, "bucket": "x", "v": 0.0}, {"id": 4, "bucket": "x", "v": 0.0}]
    ).coalesce(1).write.parquet(src, mode="append")

    q = stream_upsert(
        t,
        spark.readStream.schema(t.spark_schema()).parquet(src),
        str(tmp_path / "ckpt"),
        on="id",
        when_matched="delete",
        when_not_matched=None,
    )
    _wait(q)
    assert sorted(r["id"] for r in t.read().collect()) == [1, 3]


def test_stream_near_dedup_gates_batches(spark, tmp_path):
    """Two micro-batches through the signature-index gate: batch-2 docs
    that near-duplicate batch-1 (or smaller-id batch-2) content are
    dropped; the index accumulates EVERY seen signature (kept or not)."""
    from icedb_spark.operators import minhash_index_rows  # noqa: F401
    from icedb_spark.streaming import stream_insert_near_dedup

    t = IceTable(
        spark,
        str(tmp_path / "corpus"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("b", "cast(doc_id % 2 as int)")]
        ),
        sort_order=["doc_id"],
    )
    ti = IceTable(
        spark,
        str(tmp_path / "sigidx"),
        partition_spec=PartitionSpec(fields=[PartitionField("band", "band")]),
        sort_order=["bh"],
    )
    b1 = [
        (1, "the quick brown fox jumps over the lazy dog by the river"),
        (2, "completely different content about spark shuffles and joins"),
        (3, "the quick brown fox jumps over the lazy dog by the river"),
    ]
    b2 = [
        (11, "completely different content about spark shuffles and joins"),
        (12, "fresh second-batch text with parquet row groups and footers"),
        (13, "fresh second-batch text with parquet row groups and footers"),
        (14, "novel text never seen before anywhere in this corpus today"),
    ]
    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    from __spark_entry__ import _stamp_new_files

    stamped: set = set()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        src, mode="append"
    )
    _stamp_new_files(src, stamped, 1_000_000_000.0)
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        src, mode="append"
    )
    _stamp_new_files(src, stamped, 1_000_000_060.0)
    stream = (
        spark.readStream.schema(spark.createDataFrame(b1, schema).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_insert_near_dedup(
        t, stream, str(tmp_path / "ck"), index_table=ti,
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)
    got = sorted(r["doc_id"] for r in t.read().select("doc_id").collect())
    # 3 dups 1 (in-batch), 11 dups 2 (cross-batch via index), 13 dups 12
    assert got == [1, 2, 12, 14]
    # index holds ALL 7 docs x 4 bands
    assert ti.read().count() == 7 * 4
    # a later stream with FRESH ids re-sending already-seen content is
    # fully gated by the persisted index (near-dups of DROPPED docs
    # included: 22's mate 3 never reached the corpus, its signature did)
    b3 = [
        (21, "the quick brown fox jumps over the lazy dog by the river"),
        (22, "fresh second-batch text with parquet row groups and footers"),
        (23, "genuinely new content in the third stream only right here"),
    ]
    src3 = str(tmp_path / "src3")
    spark.createDataFrame(b3, schema).coalesce(1).write.parquet(
        src3, mode="append"
    )
    q2 = stream_insert_near_dedup(
        t,
        (
            spark.readStream.schema(
                spark.createDataFrame(b3, schema).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src3)
        ),
        str(tmp_path / "ck2"),
        index_table=ti,
        trigger={"availableNow": True},
    )
    q2.awaitTermination(300)
    got2 = sorted(r["doc_id"] for r in t.read().select("doc_id").collect())
    assert got2 == [1, 2, 12, 14, 23]
    assert ti.read().count() == 10 * 4  # signatures of every seen doc


def test_near_dedup_index_scan_prunes_files(spark, tmp_path):
    """The pruned per-batch index scan (VERDICT r7 #4) reads a STRICT
    subset of index files — only those that may hold one of the batch's
    own (band, bh) buckets, proven by the bh Bloom filters — and the
    verdicts from the pruned read are identical to a full-index read."""
    from icedb_spark.operators import dedup_against_index, minhash_index_rows

    idx_t = IceTable(
        spark,
        str(tmp_path / "sigidx"),
        partition_spec=PartitionSpec(fields=[PartitionField("band", "band")]),
        sort_order=["bh"],
        bloom_columns=["bh"],
    )
    schema = "doc_id long, text string"
    fam_a = spark.createDataFrame(
        [
            (i, f"alpha corpus text number {i} about rivers and foxes")
            for i in range(1, 9)
        ]
        + [(9, "the quick brown fox jumps over the lazy dog by the river")],
        schema,
    )
    fam_b = spark.createDataFrame(
        [
            (i, f"beta corpus text number {i} on shuffles joins and parquet")
            for i in range(11, 20)
        ],
        schema,
    )
    # two inserts -> two files per band partition, disjoint bucket sets
    idx_t.insert(df=minhash_index_rows(fam_a))
    idx_t.insert(df=minhash_index_rows(fam_b))
    total = len(idx_t.files_for())
    assert total == 8  # 4 bands x 2 inserts

    # the batch near-duplicates family A only: its buckets exist in the
    # first insert's files, so the second insert's files must prune away
    batch = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog by the river"),
            (102, "wholly new content shared with neither corpus family"),
        ],
        schema,
    )
    bhs = sorted(
        r["bh"]
        for r in minhash_index_rows(batch).select("bh").distinct().collect()
    )
    kept = idx_t.files_for(column_in={"bh": bhs})
    assert 0 < len(kept) < total, (len(kept), total)

    def verdicts(idx_rows):
        return {
            r["doc_id"]: (r["is_dup"], r["dup_of"])
            for r in dedup_against_index(
                batch, idx_rows, persist_band_rows=False
            ).collect()
        }

    full = verdicts(idx_t.read())
    pruned = verdicts(idx_t.read(column_in={"bh": bhs}))
    assert pruned == full
    assert pruned[101] == (True, 9)
    assert pruned[102] == (False, None)

    # the convenience wrapper (pruned read built in) agrees too, and
    # short-circuits against a never-written index
    from icedb_spark.operators import dedup_against_index_table

    wrapped = {
        r["doc_id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_against_index_table(
            batch, idx_t, persist_band_rows=False
        ).collect()
    }
    assert wrapped == full
    empty_t = IceTable(
        spark,
        str(tmp_path / "emptyidx"),
        partition_spec=PartitionSpec(fields=[PartitionField("band", "band")]),
        sort_order=["bh"],
    )
    solo = {
        r["doc_id"]: r["is_dup"]
        for r in dedup_against_index_table(
            batch, empty_t, persist_band_rows=False
        ).collect()
    }
    assert solo == {101: False, 102: False}  # in-batch rule only


def test_span_and_embedding_index_table_wrappers(spark, tmp_path):
    """The pruned-read wrappers for the other two dedup families agree
    with full-index reads and prune where the probe set allows it."""
    from icedb_spark.operators import (
        duplicated_spans_against_index,
        duplicated_spans_against_index_table,
        embedding_dedup_against_index,
        embedding_dedup_against_index_table,
        embedding_index_rows,
        substring_index_rows,
    )

    # --- span family: digest index with blooms
    span_t = IceTable(
        spark,
        str(tmp_path / "spanidx"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("b", "cast(pmod(dig, 2) as int)")]
        ),
        sort_order=["dig"],
        bloom_columns=["dig"],
    )
    corpus = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    span_t.insert(df=substring_index_rows(corpus, k=4))
    late = spark.createDataFrame(
        [(31, "zz one two three four five yy"),
         (32, "wholly new words with no overlap here at all")],
        "doc_id long, text string",
    )
    full = {
        tuple(r)
        for r in duplicated_spans_against_index(
            late, span_t.read(), k=4, persist_positions=False
        ).collect()
    }
    wrapped = {
        tuple(r)
        for r in duplicated_spans_against_index_table(
            late, span_t, k=4, persist_positions=False
        ).collect()
    }
    assert wrapped == full and any(r[0] == 31 for r in wrapped)

    # --- embedding family: bucket index
    emb_t = IceTable(
        spark,
        str(tmp_path / "embidx"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("b", "cast(pmod(bucket, 2) as int)")]
        ),
        sort_order=["bucket"],
        bloom_columns=["bucket"],
    )
    old = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    emb_t.insert(df=embedding_index_rows(old, dim=4))
    newb = spark.createDataFrame(
        [(11, [1.0, 0.0, 0.0, 0.0]), (12, [0.0, 0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    e_full = {
        r["vec_id"]: (r["is_dup"], r["dup_of"])
        for r in embedding_dedup_against_index(
            newb, emb_t.read(), dim=4, persist_batch_rows=False
        ).collect()
    }
    e_wrapped = {
        r["vec_id"]: (r["is_dup"], r["dup_of"])
        for r in embedding_dedup_against_index_table(
            newb, emb_t, dim=4, persist_batch_rows=False
        ).collect()
    }
    assert e_wrapped == e_full
    assert e_wrapped[11] == (True, 1) and e_wrapped[12] == (False, None)


def test_span_wrapper_short_circuits_empty_digest_batch(spark, tmp_path):
    """ADVICE r8: a batch where every doc is shorter than k tokens has
    NO shingle digests — nothing can match, so the wrapper must not
    touch the (live) index at all, let alone full-scan it."""
    from icedb_spark.operators import (
        duplicated_spans_against_index_table,
        substring_index_rows,
    )

    span_t = IceTable(
        spark,
        str(tmp_path / "spanidx2"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("b", "cast(pmod(dig, 2) as int)")]
        ),
        sort_order=["dig"],
        bloom_columns=["dig"],
    )
    corpus = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    span_t.insert(df=substring_index_rows(corpus, k=4))
    assert span_t.snapshot().alive_files()  # the index IS live

    reads = []
    real_read = span_t.read

    def spying_read(*a, **kw):
        reads.append(kw)
        return real_read(*a, **kw)

    span_t.read = spying_read
    short = spark.createDataFrame(
        [(41, "too short"), (42, "three tokens only")],
        "doc_id long, text string",
    )
    out = duplicated_spans_against_index_table(
        short, span_t, k=4, persist_positions=False
    ).collect()
    assert out == []  # no spans possible
    assert reads == []  # and the index scan never ran


def test_stream_index_vectors_matches_batch_rebuild(spark, tmp_path, sf_dir):
    """Streaming ANN index maintenance (the s11 append contract driven
    by foreachBatch): vectors arrive as file drops, each micro-batch
    appends frozen-codebook inverted-list rows in one commit, and the
    persisted-index search over the streamed index equals (a) a batch
    rebuild of the same index and (b) the plain IVF recompute — then a
    checkpoint restart with no new data double-inserts nothing, and a
    compaction pass leaves search results invariant."""
    from icedb_spark.operators import (
        cosine_topk_against_index_table,
        cosine_topk_ivf,
        ivf_codebook_rows,
        ivf_index_rows,
    )
    from icedb_spark.streaming import stream_index_vectors
    from icedb_spark.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    src = str(tmp_path / "vec_incoming")
    os.makedirs(src)
    # codebook frozen on the FIRST batch's vectors (train once, assign
    # forever); both batches land as separate files = separate batches
    batch_a = emb.where(F.col("vec_id") % 2 == 0)
    batch_b = emb.where(F.col("vec_id") % 2 == 1)
    batch_a.coalesce(1).write.parquet(src, mode="append")
    batch_b.coalesce(1).write.parquet(src, mode="append")
    code = ivf_codebook_rows(batch_a, n_centroids=8)

    t = IceTable(
        spark,
        str(tmp_path / "annidx"),
        partition_spec=PartitionSpec(fields=[PartitionField("cell", "cell")]),
        sort_order=["vec_id"],
        bloom_columns=["cell"],
    )
    q = stream_index_vectors(
        t,
        # one file per micro-batch, so the two drops become TWO commits
        # (availableNow honors maxFilesPerTrigger as batch splitting)
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
        code,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _wait(q)
    assert t.read().count() == emb.count()

    qs = emb.where(F.col("vec_id") % 25 == 0)

    def search():
        return sorted(map(tuple, cosine_topk_against_index_table(
            qs, t, code, nprobe=2, k=3, persist_probe_rows=False
        ).collect()))

    got = search()
    # (a) equals a batch rebuild of the same index rows
    want_rows = sorted(map(tuple, ivf_index_rows(emb, code)
                           .select("vec_id", "cell").collect()))
    got_rows = sorted(map(tuple, t.read()
                          .select("vec_id", "cell").collect()))
    assert got_rows == want_rows
    # (b) equals the recompute-everything IVF with the same codebook —
    # cosine_topk_ivf derives its own lowest-id codebook over the FULL
    # corpus, which differs from the frozen batch-A codebook, so
    # compare against the explicit-codebook path instead
    direct = sorted(map(tuple, cosine_topk_against_index_table(
        qs, t, code, nprobe=2, k=3, persist_probe_rows=False,
        max_pruning_keys=0,  # forced full scan: pruning-independent
    ).collect()))
    assert got == direct
    # restart with no new data: replay dedup, no double insert
    q2 = stream_index_vectors(
        t,
        spark.readStream.schema(emb.schema).parquet(src),
        code,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _wait(q2)
    assert t.read().count() == emb.count()
    # compaction invariance
    files_before = len(t.files_for())
    t.optimize(max_file_size=1 << 40, max_file_count=10_000)
    assert len(t.files_for()) < files_before
    assert search() == got
