from .ingest import stream_insert, stream_upsert, micro_batch_pipeline
from .windows import session_agg, stateful_sessionize, windowed_agg

__all__ = [
    "stream_insert",
    "stream_upsert",
    "micro_batch_pipeline",
    "session_agg",
    "stateful_sessionize",
    "windowed_agg",
]
