from searchengine_spark.streaming.events import (
    read_events_stream,
    sessionize_stream,
    sessionize_stream_ooo,
    windowed_counts_stream,
)
from searchengine_spark.streaming.ingest import append_turns, stream_transcripts

__all__ = [
    "append_turns",
    "stream_transcripts",
    "read_events_stream",
    "sessionize_stream",
    "sessionize_stream_ooo",
    "windowed_counts_stream",
]
