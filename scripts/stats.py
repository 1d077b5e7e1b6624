"""spark-submit entry point: the statistics endpoint (M5).

    spark-submit --py-files se.zip scripts/stats.py --warehouse /path/warehouse

Prints the StatisticsResponse-shaped JSON
(dto/StatisticsResponse.java:11-16), computed as DataFrame aggregates over
the documents/terms tables.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    args = ap.parse_args()

    from searchengine_spark.engine import SearchEngine
    from searchengine_spark.session import get_spark

    spark = get_spark(app_name="stats")
    eng = SearchEngine(spark, args.warehouse)
    print(json.dumps(eng.statistics(), ensure_ascii=False))


if __name__ == "__main__":
    main()
