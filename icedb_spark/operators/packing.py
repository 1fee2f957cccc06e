"""Sequence packing: assign documents to fixed-token-budget training
sequences.

LLM training consumes fixed-length sequences; the standard preparation
("concat then chunk") shuffles documents into a deterministic order,
concatenates their tokens into one stream, and cuts it every
``token_budget`` tokens — documents may straddle a cut. This operator
computes, for every document, WHERE it lands: its shard, the sequence
(chunk) index its first token falls in, and the offset inside that
sequence — the metadata a downstream packer needs to materialize batches.

Plan shape (scale-first): documents are hashed into ``n_shards``
independent shards (deterministic md5 order, reproducible across engines
and runs); each shard is one window partition, so the only shuffle is the
hash partitioning and shards pack in parallel. One window scan, one
cumulative sum — no sequential driver loop. Pick ``n_shards`` ~ 2-4x the
cluster's cores: each shard is packed contiguously, so more shards = more
parallelism but more partial final sequences (one per shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import hash60
from .text import tokens

PACK_SEED = 77


def pack_sequences(
    df: DataFrame,
    token_budget: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per document: ``(id, n_tokens, shard, seq_idx, seq_offset)``.

    ``seq_idx`` is the 0-based sequence number WITHIN the shard whose
    ``token_budget``-token window contains the document's first token;
    ``seq_offset`` is that token's position inside the sequence. Documents
    are ordered by a deterministic hash (ties broken by id), so the packing
    is stable across runs, partitionings, and engines. Pass ``tokens_col``
    to use a precomputed token count instead of whitespace tokenization.
    """
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    n_tok = (
        F.col(tokens_col)
        if tokens_col
        else F.size(tokens(F.col(text_col)))
    ).cast("long")
    base = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.pmod(hash60(F.col(id_col), PACK_SEED), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        hash60(F.col(id_col), PACK_SEED + 1).alias("__h"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        F.col(id_col),
        "n_tokens",
        "shard",
        F.floor(start / token_budget).cast("long").alias("seq_idx"),
        F.pmod(start, F.lit(token_budget)).cast("long").alias("seq_offset"),
    )
