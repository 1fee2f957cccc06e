from .ingest import stream_insert, micro_batch_pipeline

__all__ = ["stream_insert", "micro_batch_pipeline"]
