from searchengine_spark.streaming.ingest import append_turns, stream_transcripts

__all__ = ["append_turns", "stream_transcripts"]
