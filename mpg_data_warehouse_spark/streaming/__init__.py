"""Structured Streaming surface: incremental forms of the engine's
event queries (watermarked rollups, bounded-state dedup, session
windows, idempotent foreachBatch append)."""

from mpg_data_warehouse_spark.streaming.events import (
    dedup_stream,
    hourly_rollup_stream,
    idempotent_append_stream,
    read_events_stream,
    sessionize_stream,
)

__all__ = [
    "dedup_stream",
    "hourly_rollup_stream",
    "idempotent_append_stream",
    "read_events_stream",
    "sessionize_stream",
]
