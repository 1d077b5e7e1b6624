"""Statistics endpoint as DataFrame aggregates (SURVEY §2.4 M5).

Reproduces ``GET /api/statistics`` (``services/impl/StatisticsServiceImpl
.java:32-73``; response shape ``dto/StatisticsResponse.java:11-16``):
per site the page count and lemma count, totals summed, and the quirk
``total.indexing = (lemmas > 0)`` (:52). "Site" = corpus grouping,
"page" = indexed turn, "lemma" = distinct term on the site (SURVEY §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def statistics(documents: DataFrame, terms: DataFrame) -> dict:
    pages = documents.groupBy("site").agg(F.count("*").alias("pages"))
    lemmas = terms.groupBy("site").agg(F.countDistinct("term").alias("lemmas"))
    per_site = (
        pages.join(lemmas, "site", "left")
        .fillna(0, subset=["lemmas"])
        .orderBy("site")
        .collect()
    )
    detailed = [
        {"site": r["site"], "pages": int(r["pages"]), "lemmas": int(r["lemmas"])}
        for r in per_site
    ]
    total_lemmas = sum(d["lemmas"] for d in detailed)
    return {
        "result": True,
        "statistics": {
            "total": {
                "sites": len(detailed),
                "pages": sum(d["pages"] for d in detailed),
                "lemmas": total_lemmas,
                # quirk kept deliberately: StatisticsServiceImpl.java:52
                "indexing": total_lemmas > 0,
            },
            "detailed": detailed,
        },
    }


def statistics_df(documents: DataFrame, terms: DataFrame) -> DataFrame:
    """Same aggregates as a DataFrame (per-site rows), for SQL-oracle checks."""
    pages = documents.groupBy("site").agg(F.count("*").alias("pages"))
    lemmas = terms.groupBy("site").agg(F.countDistinct("term").alias("lemmas"))
    return pages.join(lemmas, "site", "left").fillna(0, subset=["lemmas"])
