"""spark-submit entry point: Structured-Streaming late-data ingestion.

    spark-submit --py-files se.zip scripts/stream_ingest.py \
        --input /path/incoming_transcripts_dir --warehouse /path/warehouse \
        --checkpoint /path/ckpt [--continuous]

Watches a transcript parquet directory and appends new turns into an
existing index (partition-scoped writes; re-delivered keys dropped). By
default runs with trigger(availableNow) — process the backlog, then exit
(batch-incremental catch-up); --continuous keeps listening.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--parallelism", type=int, default=32)
    ap.add_argument("--continuous", action="store_true")
    args = ap.parse_args()

    from searchengine_spark.config import EngineConfig
    from searchengine_spark.session import get_spark
    from searchengine_spark.streaming.ingest import stream_transcripts

    spark = get_spark(app_name="stream_ingest")
    q = stream_transcripts(
        spark,
        args.input,
        args.warehouse,
        args.checkpoint,
        EngineConfig(parallelism=args.parallelism),
        available_now=not args.continuous,
    )
    q.awaitTermination()
    print(
        json.dumps(
            {"stream": "stopped", "lastProgress": q.lastProgress}, default=str
        )
    )


if __name__ == "__main__":
    main()
