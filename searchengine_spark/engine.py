"""SearchEngine facade: the reference's four REST entry points as one class.

Maps the reference API surface (SURVEY §3) onto the Spark engine:

- ``GET /api/startIndexing``  → :meth:`SearchEngine.build`
  (``services/impl/IndexingServiceImpl.java:32-50``; "already running" guard
  becomes checkpoint/resume — reruns skip committed stages)
- ``GET /api/search``         → :meth:`SearchEngine.search`
  (``controllers/ApiController.java:54-68``)
- ``GET /api/statistics``     → :meth:`SearchEngine.statistics`
  (``controllers/ApiController.java:25-29``)
- ``POST /api/indexPage``     → :meth:`SearchEngine.reindex_turn`
  (``controllers/ApiController.java:45-52``)

Response shapes mirror the reference DTOs (``dto/SearchResponse.java:13-20``,
``dto/search/DetailedSearchItem.java:10-24``): search returns
``{result, count, data:[{site, siteName, uri, title, snippet, relevance}]}``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from searchengine_spark.config import EngineConfig
from searchengine_spark.operators.search import BlockSearcher, EmptySearchQueryError
from searchengine_spark.plans.build_index import BuildResult, build_index
from searchengine_spark.plans.incremental import reindex_turn as _reindex
from searchengine_spark.plans.stats import statistics as _statistics
from searchengine_spark.sources.catalog import TableCatalog

__all__ = ["SearchEngine", "EmptySearchQueryError"]


class SearchEngine:
    def __init__(self, spark: SparkSession, warehouse: str, cfg: EngineConfig | None = None):
        self.spark = spark
        self.warehouse = warehouse
        self.cfg = cfg or EngineConfig()
        self.catalog = TableCatalog(spark, warehouse)
        self._searcher: BlockSearcher | None = None
        self._transcripts: DataFrame | None = None

    # ---- /api/startIndexing -------------------------------------------------
    def build(self, transcripts: DataFrame, resume: bool = True) -> BuildResult:
        self._transcripts = transcripts
        res = build_index(self.spark, transcripts, self.warehouse, self.cfg, resume=resume)
        self._searcher = None  # tables changed; reload lazily
        return res

    # ---- searcher lifecycle --------------------------------------------------
    @property
    def searcher(self) -> BlockSearcher:
        if self._searcher is None:
            cat = self.catalog
            meta = {r["key"]: r["value"] for r in cat.read("index_meta").collect()}
            site_ids = {
                r["site"]: int(r["sid"]) for r in cat.read("sites").collect()
            }
            self._searcher = BlockSearcher(
                blocks=cat.read("postings"),
                documents=cat.read("documents"),
                terms=cat.read("terms"),
                cfg=self.cfg,
                transcripts=self._transcripts,
                shard_size=int(meta["shard_size"]),
                site_ids=site_ids,
                term_buckets=int(meta["term_buckets"])
                if "term_buckets" in meta
                else None,
            )
        return self._searcher

    # ---- /api/search ---------------------------------------------------------
    def search(
        self,
        query: str,
        site: str | None = None,
        offset: int | None = None,
        limit: int | None = None,
        mode: str = "reference",
        with_snippets: bool = False,
        exact_count: bool = False,
    ):
        """Returns (page: pandas DataFrame, total candidate count). BM25
        default is full block-max WAND (exact top-k ranking, lower-bound
        count); ``exact_count=True`` opts into the exact disjunctive count
        at the cost of decoding every query term's postings."""
        return self.searcher.search(
            query, site=site, offset=offset, limit=limit, mode=mode,
            with_snippets=with_snippets, exact_count=exact_count,
        )

    def search_response(self, query: str, **kw) -> dict:
        """SearchResponse-shaped dict (dto/SearchResponse.java:13-20)."""
        try:
            page, count = self.search(query, with_snippets=True, **kw)
        except EmptySearchQueryError:
            return {"result": False, "error": "Задан пустой поисковый запрос"}
        data = [
            {
                "site": r["site"],
                "siteName": r["site"],
                "uri": f"{r['conv_id']}/{r['turn_idx']}",
                "title": r.get("title", f"{r['conv_id']}#{r['turn_idx']}"),
                "snippet": r.get("snippet", ""),
                "relevance": float(r["relevance"]),
            }
            for _, r in page.iterrows()
        ]
        return {"result": True, "count": int(count), "data": data}

    # ---- /api/statistics -------------------------------------------------------
    def statistics(self) -> dict:
        cat = self.catalog
        state = cat.read("build_state") if cat.exists("build_state") else None
        return _statistics(cat.read("documents"), cat.read("terms"), state)

    # ---- POST /api/indexPage ----------------------------------------------------
    def reindex_turn(self, conv_id: str, turn_idx: int, text: str) -> int:
        doc_id = _reindex(self.spark, self.warehouse, conv_id, turn_idx, text, self.cfg)
        self._searcher = None
        return doc_id

    # ---- streaming / bulk late-data append --------------------------------------
    def append_turns(self, transcripts: DataFrame) -> int:
        """Append a batch of NEW turns (late data; already-indexed keys are
        dropped). Partition-scoped writes only — see streaming/ingest.py."""
        from searchengine_spark.streaming.ingest import append_turns as _append

        n = _append(self.spark, self.warehouse, transcripts, self.cfg)
        if n:
            self._searcher = None
        return n
