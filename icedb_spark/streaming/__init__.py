from .ingest import (
    micro_batch_pipeline,
    stream_index_vectors,
    stream_insert,
    stream_insert_near_dedup,
    stream_upsert,
)
from .windows import (
    budget_admission,
    session_agg,
    stateful_sessionize,
    stream_interval_join,
    windowed_agg,
)

__all__ = [
    "stream_index_vectors",
    "stream_insert",
    "stream_insert_near_dedup",
    "stream_upsert",
    "micro_batch_pipeline",
    "budget_admission",
    "session_agg",
    "stateful_sessionize",
    "stream_interval_join",
    "windowed_agg",
]
