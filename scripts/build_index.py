"""spark-submit entry point: build (or resume) the full index.

    spark-submit --master <master> --py-files se.zip scripts/build_index.py \
        --input /path/transcripts_parquet --warehouse /path/warehouse \
        [--parallelism 32] [--no-resume]

The input must have the transcript schema (conv_id string, turn_idx int,
role string, text string, tool string, ts timestamp) — BASELINE.json
input_hint. With an Iceberg catalog configured (SEARCHENGINE_ICEBERG_CATALOG
+ spark.sql.catalog.* conf), --input may be a table identifier instead.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--parallelism", type=int, default=32)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from searchengine_spark.config import EngineConfig
    from searchengine_spark.engine import SearchEngine
    from searchengine_spark.session import get_spark
    from searchengine_spark.sources.transcripts import TRANSCRIPTS_SCHEMA

    spark = get_spark(app_name="build_index")
    if "/" in args.input or args.input.endswith(".parquet"):
        transcripts = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(args.input)
    else:
        transcripts = spark.read.table(args.input)
    eng = SearchEngine(
        spark, args.warehouse, EngineConfig(parallelism=args.parallelism)
    )
    res = eng.build(transcripts, resume=not args.no_resume)
    print(
        json.dumps(
            {
                "run_id": res.run_id,
                "n_docs": res.n_docs,
                "avgdl": round(res.avgdl, 3),
                "stages_run": res.stages_run,
                "stages_skipped": res.stages_skipped,
                "metrics": {k: round(v, 3) for k, v in res.metrics.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
