"""spark-submit entry point: serve one top-k query from a built index.

    spark-submit --py-files se.zip scripts/search.py \
        --warehouse /path/warehouse --query "spark data" \
        [--mode reference|bm25] [--site conv00] [--offset 0] [--limit 20] \
        [--snippets --transcripts /path/transcripts_parquet]

Prints the reference-shaped SearchResponse JSON
(dto/SearchResponse.java:13-20).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--mode", default="reference", choices=["reference", "bm25"])
    ap.add_argument("--site", default=None)
    ap.add_argument("--offset", type=int, default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--snippets", action="store_true")
    ap.add_argument("--transcripts", default=None)
    args = ap.parse_args()

    from searchengine_spark.engine import SearchEngine
    from searchengine_spark.session import get_spark
    from searchengine_spark.sources.transcripts import TRANSCRIPTS_SCHEMA

    spark = get_spark(app_name="search")
    eng = SearchEngine(spark, args.warehouse)
    if args.transcripts:
        eng._transcripts = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(
            args.transcripts
        )
    resp = eng.search_response(
        args.query,
        site=args.site,
        offset=args.offset,
        limit=args.limit,
        mode=args.mode,
    )
    print(json.dumps(resp, ensure_ascii=False))


if __name__ == "__main__":
    main()
