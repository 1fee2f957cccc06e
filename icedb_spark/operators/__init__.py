"""Large-scale training-data pipeline operators.

Everything here is expressed with built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no Python row loops. Hashing is md5-derived and
deterministic, so results are reproducible across engines and runs.
"""

from .dedup import (
    auto_n_planes,
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
    exact_duplicates,
    lsh_bucket_stats,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_pairs,
)
from .graph import connected_components, dedup_clusters, pick_canonical
from .multimodal import (
    AV_HEADER_SCHEMA,
    decode_av_headers,
    parse_av_header,
    HEADER_SCHEMA,
    MEDIA_SCHEMA,
    decode_image_headers,
    extract_features,
    parse_image_header,
    sample_frames,
    synthetic_media,
)
from .sampling import (
    mixture_sample,
    assign_splits,
    hash_sample,
    shuffle_shard,
    stratified_sample,
    top_k_sample,
)
from .decontam import decontaminate, shingle_set
from .packing import pack_sequences
from .similarity import (
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_ivfpq,
    cosine_topk_lsh,
    cosine_topk_multiprobe,
)
from .skew import salted_agg, salted_join
from .temporal import asof_join, range_join, sessionize
from .text import (
    PII_PATTERNS,
    chunk_documents,
    doc_fingerprint,
    language_id,
    line_dedup,
    ngram_col,
    pii_stats,
    repetition_stats,
    text_quality,
    token_stats,
    tokens,
    vocab_topk,
)

__all__ = [
    "HEADER_SCHEMA",
    "AV_HEADER_SCHEMA",
    "decode_av_headers",
    "parse_av_header",
    "MEDIA_SCHEMA",
    "assign_splits",
    "hash_sample",
    "mixture_sample",
    "shuffle_shard",
    "stratified_sample",
    "top_k_sample",
    "decode_image_headers",
    "parse_image_header",
    "asof_join",
    "cosine_topk",
    "connected_components",
    "cosine_topk_ivf",
    "cosine_topk_ivfpq",
    "cosine_topk_lsh",
    "cosine_topk_multiprobe",
    "dedup_clusters",
    "pick_canonical",
    "chunk_documents",
    "extract_features",
    "sample_frames",
    "synthetic_media",
    "doc_fingerprint",
    "auto_n_planes",
    "embedding_dup_pairs",
    "embedding_dup_pairs_lsh",
    "lsh_bucket_stats",
    "exact_duplicates",
    "language_id",
    "line_dedup",
    "minhash_lsh_pairs",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "range_join",
    "salted_agg",
    "salted_join",
    "sessionize",
    "shingles",
    "simhash",
    "simhash_pairs",
    "PII_PATTERNS",
    "decontaminate",
    "ngram_col",
    "pii_stats",
    "repetition_stats",
    "pack_sequences",
    "shingle_set",
    "text_quality",
    "token_stats",
    "tokens",
    "vocab_topk",
]
