"""Pure-pandas oracle re-implementing the reference search semantics.

The reference has no tests (no ``src/test`` dir, no test deps in ``pom.xml``
— SURVEY §5), so this oracle IS the correctness bar: a deliberately naive,
line-for-line transcription of the semantics extracted from
/root/reference/src/main/java/searchengine (citations inline below). It
shares the engine's tokenizer/lemmatizer (searchengine_spark.functions
.lemmatize) — rank-identity of the Spark engine is defined against this.

Scoring modes (SURVEY §2.3 scoring note):
- ``reference``: conjunctive AND retrieval, score = Σ tf over query lemmas,
  max-normalized (SearchServiceImpl.java:107-159); per-site AND gate
  (:55-58,82-98); deterministic tiebreak (score DESC, conv_id, turn_idx)
  replacing the reference's unstable HashMap order (:161-167).
- ``bm25``: disjunctive Robertson/Sparck-Jones BM25, k1=1.2, b=0.75, global
  idf, doc length = post-filter lemma count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from searchengine_spark.config import BM25Params
from searchengine_spark.functions.lemmatize import lemma_counts, query_lemmas
from searchengine_spark.sources.transcripts import site_of_conv


class EmptySearchQueryError(ValueError):
    """Analog of EmptySearchQueryException → HTTP 400
    (SearchServiceImpl.java:42-45)."""


@dataclass
class OracleEngine:
    bm25: BM25Params = field(default_factory=BM25Params)

    # built state
    documents: pd.DataFrame | None = None  # doc_id conv_id turn_idx site doc_len
    postings: pd.DataFrame | None = None   # term doc_id tf
    terms: pd.DataFrame | None = None      # term site df cf
    n_docs: int = 0
    avgdl: float = 0.0

    # ------------------------------------------------------------------ build
    def build(self, transcripts: pd.DataFrame) -> "OracleEngine":
        # T7 eligibility: non-empty text (PageIndexer.java:65-67)
        elig = transcripts[transcripts["text"].notna() & (transcripts["text"] != "")]
        elig = elig.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
            drop=True
        )
        counts = elig["text"].map(lemma_counts)

        docs = pd.DataFrame(
            {
                "doc_id": range(len(elig)),  # dense id in (conv_id, turn_idx) order
                "conv_id": elig["conv_id"].values,
                "turn_idx": elig["turn_idx"].values,
                "site": elig["conv_id"].map(site_of_conv).values,
                "doc_len": [sum(c.values()) for c in counts],
            }
        )
        rows = [
            (term, doc_id, tf)
            for doc_id, c in zip(docs["doc_id"], counts)
            for term, tf in c.items()
        ]
        post = pd.DataFrame(rows, columns=["term", "doc_id", "tf"])
        post = post.merge(docs[["doc_id", "site"]], on="doc_id")
        terms = (
            post.groupby(["term", "site"], as_index=False)
            .agg(df=("doc_id", "nunique"), cf=("tf", "sum"))
        )
        self.documents, self.postings, self.terms = docs, post, terms
        self.n_docs = len(docs)
        self.avgdl = float(docs["doc_len"].mean()) if len(docs) else 0.0
        return self

    # ----------------------------------------------------------------- search
    def search(
        self,
        query: str,
        site: str | None = None,
        offset: int = 0,
        limit: int = 20,
        mode: str = "reference",
    ) -> tuple[pd.DataFrame, int]:
        """Return (page of results, total candidate count pre-pagination —
        SearchServiceImpl.java:190-195)."""
        lemmas = query_lemmas(query)
        if not lemmas:
            raise EmptySearchQueryError("empty query after lemmatization")
        if mode == "reference":
            cand = self._reference_candidates(lemmas, site)
        elif mode == "bm25":
            cand = self._bm25_candidates(lemmas, site)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        count = len(cand)
        if count == 0:
            empty = pd.DataFrame(
                columns=["doc_id", "conv_id", "turn_idx", "site", "score", "relevance"]
            )
            return empty, 0
        if mode == "reference":
            # relative relevance = score / global max (SearchServiceImpl.java:154-159)
            cand["relevance"] = cand["score"] / cand["score"].max()
        else:
            cand["relevance"] = cand["score"]
        cand = cand.merge(self.documents, on="doc_id")
        # rank by score rounded to 9 decimals (same as the engine) so that
        # mathematically-equal scores order identically regardless of float
        # accumulation order (SURVEY §7 float-equality risk)
        cand["_key"] = cand["score"].round(9)
        cand = cand.sort_values(
            ["_key", "conv_id", "turn_idx"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        page = cand.iloc[offset : offset + limit].reset_index(drop=True)
        return (
            page[["doc_id", "conv_id", "turn_idx", "site", "score", "relevance"]],
            count,
        )

    def _reference_candidates(
        self, lemmas: set[str], site: str | None
    ) -> pd.DataFrame:
        """Per-site conjunctive Σtf (SearchServiceImpl.java:55-152)."""
        sites = (
            [site]
            if site is not None
            else sorted(self.documents["site"].unique())
        )
        frames = []
        for s in sites:
            t = self.terms[self.terms["site"] == s]
            present = set(t[t["term"].isin(lemmas)]["term"])
            if present != lemmas:  # AND gate :56-58 — site missing a lemma → skip
                continue
            p = self.postings[
                (self.postings["site"] == s) & (self.postings["term"].isin(lemmas))
            ]
            g = p.groupby("doc_id").agg(n=("term", "nunique"), score=("tf", "sum"))
            g = g[g["n"] == len(lemmas)].reset_index()[["doc_id", "score"]]
            frames.append(g)
        if not frames:
            return pd.DataFrame(columns=["doc_id", "score"])
        return pd.concat(frames, ignore_index=True)  # union :146-152

    def _bm25_candidates(self, lemmas: set[str], site: str | None) -> pd.DataFrame:
        """Disjunctive BM25; idf global over the whole corpus (site filter
        restricts candidates, not statistics)."""
        df_global = (
            self.postings[self.postings["term"].isin(lemmas)]
            .groupby("term")["doc_id"]
            .nunique()
        )
        p = self.postings[self.postings["term"].isin(lemmas)]
        if site is not None:
            p = p[p["site"] == site]
        if p.empty:
            return pd.DataFrame(columns=["doc_id", "score"])
        p = p.merge(self.documents[["doc_id", "doc_len"]], on="doc_id")
        k1, b = self.bm25.k1, self.bm25.b
        idf = p["term"].map(lambda t: self.bm25.idf(self.n_docs, int(df_global[t])))
        denom = p["tf"] + k1 * (1 - b + b * p["doc_len"] / self.avgdl)
        p = p.assign(part=idf * p["tf"] * (k1 + 1) / denom)
        return p.groupby("doc_id", as_index=False).agg(score=("part", "sum"))

    # ------------------------------------------------------------- statistics
    def statistics(self) -> dict:
        """The reference's /api/statistics payload
        (StatisticsServiceImpl.java:32-73; shape dto/StatisticsResponse.java:11-16),
        incl. the ``indexing = lemmas > 0`` quirk (:52)."""
        per_site = (
            self.documents.groupby("site")
            .agg(pages=("doc_id", "count"))
            .join(self.terms.groupby("site").agg(lemmas=("term", "nunique")))
            .fillna(0)
            .astype(int)
        )
        detailed = [
            {"site": s, "pages": int(r["pages"]), "lemmas": int(r["lemmas"])}
            for s, r in per_site.iterrows()
        ]
        total_lemmas = int(per_site["lemmas"].sum())
        return {
            "result": True,
            "statistics": {
                "total": {
                    "sites": int(len(per_site)),
                    "pages": int(per_site["pages"].sum()),
                    "lemmas": total_lemmas,
                    "indexing": total_lemmas > 0,
                },
                "detailed": detailed,
            },
        }
