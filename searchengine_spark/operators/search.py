"""Query path: AND-gate → rarest-first → block-max WAND kernel → top-k.

Reference search contract (SURVEY §2.3, ``services/impl/SearchServiceImpl
.java:41-195``): dedup query lemmas; per-site AND gate (:55-58,82-98);
rarest-term-first intersection (:100-105); Σtf scoring (:107-144);
max-normalize (:154-159); sort + offset/limit (:161-167, defaults
``controllers/ApiController.java:59-64``); total candidate count (:190-195).
Tiebreak is deterministic here — (score DESC, doc_id ASC), where doc_id order
== (conv_id, turn_idx) order — replacing the reference's unstable HashMap
iteration order.

Two interchangeable physical paths:

- :func:`naive_search` — pure DataFrame ops over the *uncompressed* flat
  postings (broadcast term filter → hash agg gate → sum(tf)/BM25 →
  TakeOrderedAndProject). Kept as the always-on differential cross-check
  (SURVEY §7.6) and as the plan Catalyst fully optimizes on its own.
- :class:`BlockSearcher` — the target design: scan only the query terms'
  compressed blocks (parquet min/max pruning on the term-sorted table),
  one ``applyInPandas`` kernel per doc-range shard doing block-max WAND
  (bm25) / early-exit intersection (reference), per-shard top-K heaps,
  driver merge of ≤ shards×K rows (SURVEY §4.3.4).

Rank determinism across float addition orders: both this module and the
pandas oracle rank by ``round(score, SCORE_DECIMALS)`` (then doc order), so
mathematically-equal scores order identically regardless of accumulation
order (SURVEY §7 float-equality risk).
"""

from __future__ import annotations

import threading
from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from searchengine_spark.config import BM25Params, EngineConfig
from searchengine_spark.functions.codec import varint_decode
from searchengine_spark.functions.lemmatize import query_lemmas
from searchengine_spark.functions.snippets import make_snippet, make_title

#: reserved pseudo-terms whose blocks carry per-doc forward data co-sharded
#: with real postings, so the kernel never joins the corpus-wide documents
#: table: doc lengths (BM25 norm) and dense site ids (site-scoped search).
#: '#'-prefixed names cannot collide with real lemmas (letters only) and
#: avoid NUL bytes, which the Arrow grouped-map path mishandles (observed:
#: rows with \x00 in a string column are dropped by applyInPandas).
DOCLEN_TERM = "#doc_len"
SITE_TERM = "#site"

SCORE_DECIMALS = 9

KERNEL_SCHEMA = "shard long, doc_id long, score double, cand long"


#: per-searcher memo bound: a long-lived serving process under an
#: adversarial query stream (millions of distinct cold terms) keeps the
#: driver-side memos at O(cap), not O(distinct terms ever queried)
MEMO_CAP = 65_536


class _LRUCache(OrderedDict):
    """Bounded dict memo: reads refresh recency, inserts past ``cap`` evict
    the least-recently-used entries. Individual ops are GIL-atomic enough
    for the async-warm thread that shares the mtf memo (same posture as the
    plain dict it replaces — the lock guards the inflight set, not the
    memo)."""

    def __init__(self, cap: int = MEMO_CAP):
        super().__init__()
        self.cap = cap

    def __getitem__(self, k):
        v = super().__getitem__(k)
        self.move_to_end(k)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        self.move_to_end(k)
        while len(self) > self.cap:
            self.popitem(last=False)

    def update(self, other):  # route bulk inserts through the eviction path
        for k, v in other.items():
            self[k] = v


class EmptySearchQueryError(ValueError):
    """Analog of EmptySearchQueryException → 400 (SearchServiceImpl.java:42-45)."""


# --------------------------------------------------------------------------
# Naive DataFrame path (differential baseline; Catalyst-optimized end to end)
# --------------------------------------------------------------------------
def naive_search(
    flat: DataFrame,
    documents: DataFrame,
    query: str,
    site: str | None = None,
    offset: int = 0,
    limit: int = 20,
    mode: str = "reference",
    n_docs: int | None = None,
    avgdl: float | None = None,
    cfg: EngineConfig | None = None,
) -> tuple[pd.DataFrame, int]:
    """Pure-DataFrame search over flat postings (term, doc_id, site, doc_len,
    tf). Returns (result page as pandas, total candidate count)."""
    cfg = cfg or EngineConfig()
    lemmas = query_lemmas(query)
    if not lemmas:
        raise EmptySearchQueryError(query)
    terms = sorted(lemmas)
    p = flat.filter(F.col("term").isin(terms))
    if mode == "reference":
        scoped = p.filter(F.col("site") == site) if site is not None else p
        cand = (
            scoped.groupBy("doc_id")
            .agg(
                F.count("*").alias("_nterms"),
                F.sum(F.col("tf").cast("double")).alias("score"),
            )
            .filter(F.col("_nterms") == len(terms))
            .drop("_nterms")
        )
        w = Window.partitionBy()
        cand = cand.withColumn("relevance", F.col("score") / F.max("score").over(w))
    elif mode == "bm25":
        k1, b = cfg.bm25.k1, cfg.bm25.b
        gstats = p.groupBy("term").agg(F.count("*").alias("df_g"))
        scoped = p.filter(F.col("site") == site) if site is not None else p
        scored = scoped.join(F.broadcast(gstats), "term").withColumn(
            "part",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df_g") + F.lit(0.5))
                / (F.col("df_g") + F.lit(0.5))
            )
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.lit(avgdl))
            ),
        )
        cand = scored.groupBy("doc_id").agg(F.sum("part").alias("score"))
        cand = cand.withColumn("relevance", F.col("score"))
    else:
        raise ValueError(mode)

    count = cand.count()
    page = (
        cand.join(documents.select("doc_id", "conv_id", "turn_idx", "site"), "doc_id")
        .orderBy(
            F.round(F.col("score"), SCORE_DECIMALS).desc(),
            F.col("conv_id"),
            F.col("turn_idx"),
        )
        .limit(offset + limit)
        .toPandas()
        .iloc[offset : offset + limit]
        .reset_index(drop=True)
    )
    return page[["doc_id", "conv_id", "turn_idx", "site", "score", "relevance"]], count


# --------------------------------------------------------------------------
# Block-max WAND path over compressed posting blocks
# --------------------------------------------------------------------------
def _decode_block_rows(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Decode a set of same-term block rows (sorted by block_id/min_doc) into
    (doc_ids, tfs) numpy arrays."""
    ids, tfs = [], []
    for gaps, tf_bytes in zip(pdf["doc_gaps"], pdf["tfs"]):
        g = varint_decode(bytes(gaps)).astype(np.int64)
        ids.append(np.cumsum(g))
        tfs.append(varint_decode(bytes(tf_bytes)).astype(np.int64))
    if not ids:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ids), np.concatenate(tfs)


#: slack subtracted from a shared θ before it prunes: scores are ranked by
#: round(score, 9), so a doc strictly below θ by > 1e-9 provably rounds
#: below it (|round(x)−x| ≤ 0.5e-9 each side) and can never tie-win
THETA_GUARD = 1e-9


def make_shard_kernel(
    terms: list[str],
    mode: str,
    k: int,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    allowed_site_ids: list[int] | None,
    exact_count: bool = False,
    theta_init: float = -np.inf,
):
    """Build the per-shard applyInPandas kernel.

    Input group: all block rows of the query terms (+ DOCLEN_TERM for bm25,
    + SITE_TERM when site-filtered) in one doc-range shard. Output: per-shard
    top-k (doc_id, exact score) plus the shard's candidate count (same value
    on every emitted row; a count-only shard emits one doc_id=-1 sentinel
    row the driver drops after summing counts).

    ``theta_init`` is a cross-shard score threshold (two-pass WAND): a
    lower bound on the GLOBAL top-k'th score, measured on the densest shard
    and broadcast into the rest. Docs provably below it are skipped without
    scoring — the surviving ranking is still exact because only
    can't-reach-top-k work is elided (same soundness argument as the
    per-shard θ, applied from the first term instead of after k local
    candidates accumulate).
    """

    def topk_rows(
        shard: int,
        ids: np.ndarray,
        scores: np.ndarray,
        cand_override: int | None = None,
    ) -> pd.DataFrame:
        cand = len(ids) if cand_override is None else cand_override
        if len(ids) == 0:
            if not cand:
                return pd.DataFrame(
                    columns=["shard", "doc_id", "score", "cand"]
                ).astype(
                    {"shard": np.int64, "doc_id": np.int64, "score": np.float64, "cand": np.int64}
                )
            # every candidate pruned by θ, but the exact count survives:
            # sentinel row carries it (driver filters doc_id < 0 after
            # summing per-shard counts)
            return pd.DataFrame(
                {
                    "shard": [np.int64(shard)],
                    "doc_id": [np.int64(-1)],
                    "score": [-np.inf],
                    "cand": [np.int64(cand)],
                }
            )
        # rank by rounded score desc, then doc_id asc (== conv/turn order)
        key = np.round(scores, SCORE_DECIMALS)
        order = np.lexsort((ids, -key))[:k]
        return pd.DataFrame(
            {
                "shard": np.int64(shard),
                "doc_id": ids[order],
                "score": scores[order],
                "cand": np.int64(cand),
            }
        )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        by_term = {t: g.sort_values("min_doc") for t, g in pdf.groupby("term")}

        site_filter = None
        if allowed_site_ids is not None:
            site_rows = by_term.pop(SITE_TERM, None)
            if site_rows is None:
                raise RuntimeError(f"site blocks missing from shard {shard}")
            s_ids, s_vals = _decode_block_rows(site_rows)
            allowed = np.asarray(allowed_site_ids, dtype=np.int64)

            def site_filter(ids: np.ndarray, vals: np.ndarray):
                mask = np.isin(s_vals[np.searchsorted(s_ids, ids)], allowed)
                return ids[mask], vals[mask]

        if mode == "reference":
            # conjunctive: every term must appear in this shard
            if any(t not in by_term for t in terms):
                return topk_rows(shard, np.empty(0, np.int64), np.empty(0))
            # rarest-first (Q2 analog, SearchServiceImpl.java:100-105) using
            # in-shard posting counts from block metadata
            order = sorted(terms, key=lambda t: (int(by_term[t]["count"].sum()), t))
            first = by_term[order[0]]
            # seed-block pruning (metadata-only, before any decode): a doc
            # in the conjunction lies in some block of EVERY term, so a seed
            # block whose [min_doc, max_doc] range overlaps no block of some
            # other term cannot contribute — drop it. Per other term the
            # check is two sorted lookups over its block ranges (blocks are
            # min_doc-sorted; prefix-max of max_doc makes "any earlier block
            # reaches into [a, b]" O(log nblocks) per seed block). Pays off
            # when terms' doc ranges are patchy (hot seed, gappy others).
            if len(order) > 1 and len(first) > 0:
                smin = first["min_doc"].to_numpy(np.int64)
                smax = first["max_doc"].to_numpy(np.int64)
                mask = np.ones(len(first), dtype=bool)
                for t in order[1:]:
                    g = by_term[t]
                    tmin = g["min_doc"].to_numpy(np.int64)
                    pref = np.maximum.accumulate(
                        g["max_doc"].to_numpy(np.int64)
                    )
                    idx = np.searchsorted(tmin, smax, side="right")
                    ok = idx > 0
                    ok[ok] = pref[idx[ok] - 1] >= smin[ok]
                    mask &= ok
                    if not mask.any():
                        break
                if not mask.all():
                    first = first[mask]
            ids, tfs = _decode_block_rows(first)
            if site_filter is not None:  # mask the seed; intersections stay ⊆
                ids, tfs = site_filter(ids, tfs)
            scores = tfs.astype(np.float64)
            for t in order[1:]:
                if ids.size == 0:  # early exit (SearchServiceImpl.java:117-119)
                    break
                g = by_term[t]
                # block skipping: only decode blocks overlapping the current
                # candidate doc range
                lo, hi = int(ids[0]), int(ids[-1])
                g = g[(g["max_doc"] >= lo) & (g["min_doc"] <= hi)]
                t_ids, t_tfs = _decode_block_rows(g)
                common, ia, ib = np.intersect1d(
                    ids, t_ids, assume_unique=True, return_indices=True
                )
                scores = scores[ia] + t_tfs[ib]
                ids = common
            return topk_rows(shard, ids, scores)

        # ---- bm25: disjunctive with block-max WAND-style pruning ----
        dl_rows = by_term.pop(DOCLEN_TERM, None)
        present = [t for t in terms if t in by_term]
        if not present:
            return topk_rows(shard, np.empty(0, np.int64), np.empty(0))
        if dl_rows is None:
            raise RuntimeError("doc_len blocks missing from shard %d" % shard)
        dl_ids, dl_lens = _decode_block_rows(dl_rows)

        def bm25_scores(t: str, ids: np.ndarray, tfs: np.ndarray) -> np.ndarray:
            pos = np.searchsorted(dl_ids, ids)
            dl = dl_lens[pos]
            tf = tfs.astype(np.float64)
            return idf[t] * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

        # Per-term upper bound in this shard, from immutable block_max_tf and
        # the *current* idf: score ≤ idf·tf·(k1+1)/(tf + k1·(1−b)) (the dl→0
        # limit). Unlike the stored block_max_score, this stays a sound bound
        # after incremental updates shift avgdl/idf (M1, plans/incremental.py).
        def term_ub(t: str) -> float:
            mtf = float(by_term[t]["block_max_tf"].max())
            return idf[t] * mtf * (k1 + 1.0) / (mtf + k1 * (1.0 - b))

        if len(present) == 1 and not (exact_count and site_filter is not None):
            # ---- single-term fast path: block-max early stop ----
            # One term ⇒ a doc's total score is exactly its contribution
            # here, so per-BLOCK upper bounds prune soundly: decode blocks
            # in descending block-UB order and stop as soon as the next
            # block's UB falls below θ (local kth, seeded by theta_init).
            # The exact candidate count is the metadata `count` sum — a doc
            # appears in exactly one block per (term, shard) — so a hot
            # term's count costs ZERO decodes (site-scoped exact counts
            # still take the generic path: metadata counts aren't
            # site-filtered).
            t = present[0]
            g = by_term[t]
            n_cand = int(g["count"].sum()) if exact_count else None
            bmt = g["block_max_tf"].to_numpy(np.float64)
            bub = idf[t] * bmt * (k1 + 1.0) / (bmt + k1 * (1.0 - b))
            border = np.argsort(-bub, kind="stable")
            theta = theta_init
            ids_l: list[np.ndarray] = []
            sc_l: list[np.ndarray] = []
            # θ lives on a BOUNDED top-k score buffer, and blocks decode in
            # UB-ordered CHUNKS: per-chunk vectorized decode + one bounded
            # partition keeps a no-early-stop worst case (hot term, uniform
            # block UBs) at full-decode cost — the r4 per-block loop was
            # O(blocks² · blocksize) from re-partitioning an ever-growing
            # score array and measured 16 s on a df≈3.5M term (RUN_1v4)
            topk_sc = np.empty(0, np.float64)
            CHUNK = 256  # blocks (~32k postings): decode amortized, stop
            # granularity stays fine (hot shards hold thousands of blocks)
            for c0 in range(0, len(border), CHUNK):
                chunk = border[c0 : c0 + CHUNK]
                # bub is descending along border: drop the chunk tail below
                # θ; if nothing survives, no later chunk can reach θ either
                chunk = chunk[bub[chunk] >= theta - THETA_GUARD]
                if chunk.size == 0:
                    break
                b_ids, b_tfs = _decode_block_rows(g.iloc[chunk])
                if site_filter is not None:
                    b_ids, b_tfs = site_filter(b_ids, b_tfs)
                    if b_ids.size == 0:
                        continue
                b_sc = bm25_scores(t, b_ids, b_tfs)
                ids_l.append(b_ids)
                sc_l.append(b_sc)
                cand_sc = np.concatenate([topk_sc, b_sc])
                if cand_sc.size >= k:
                    cut = np.partition(cand_sc, cand_sc.size - k)[
                        cand_sc.size - k :
                    ]
                    topk_sc = cut
                    theta = max(theta, float(cut[0] if k else -np.inf))
                else:
                    topk_sc = cand_sc
            ids = np.concatenate(ids_l) if ids_l else np.empty(0, np.int64)
            scores = np.concatenate(sc_l) if sc_l else np.empty(0)
            return topk_rows(shard, ids, scores, cand_override=n_cand)

        if exact_count:
            # decode doc-id lists once upfront: gives the exact disjunctive
            # candidate count (SearchResponse.count analog); WAND pruning
            # below then skips *scoring* (dl gather + arithmetic) for docs
            # that provably can't reach the top-k
            decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            for t in present:
                t_ids, t_tfs = _decode_block_rows(by_term[t])
                if site_filter is not None:
                    t_ids, t_tfs = site_filter(t_ids, t_tfs)
                decoded[t] = (t_ids, t_tfs)
            n_cand = len(np.unique(np.concatenate([decoded[t][0] for t in present])))
        else:
            decoded = None
            n_cand = None  # lower-bounded by len(acc) at the end

        ubs = {t: term_ub(t) for t in present}
        order = sorted(present, key=lambda t: (-ubs[t], t))
        acc = pd.Series(dtype=np.float64)  # doc_id → partial score
        for i, t in enumerate(order):
            remaining_ub = sum(ubs[o] for o in order[i:])
            theta = (
                max(
                    theta_init,
                    float(np.partition(acc.to_numpy(), len(acc) - k)[len(acc) - k]),
                )
                if len(acc) >= k
                else theta_init
            )
            # with a cross-shard theta_init, pruning is sound even before k
            # local candidates exist (an unseen doc's partial is 0, so its
            # total is ≤ remaining_ub)
            prune = remaining_ub < theta - THETA_GUARD and (
                len(acc) > 0 or theta_init > -np.inf
            )
            if decoded is not None:
                t_ids, t_tfs = decoded[t]
                if prune:
                    c_ids = acc.index.to_numpy(np.int64)  # sorted (pd index)
                    keep = np.isin(t_ids, c_ids, assume_unique=True)
                    t_ids, t_tfs = t_ids[keep], t_tfs[keep]
            elif prune:
                # WAND prune: no unseen doc can reach top-k; only complete the
                # scores of existing candidates → decode only blocks
                # overlapping them
                g = by_term[t]
                c_ids = acc.index.to_numpy(np.int64)
                starts = np.searchsorted(c_ids, g["min_doc"].to_numpy(np.int64))
                ends = np.searchsorted(
                    c_ids, g["max_doc"].to_numpy(np.int64), side="right"
                )
                g = g[ends > starts]
                t_ids, t_tfs = _decode_block_rows(g)
                keep = np.isin(t_ids, c_ids, assume_unique=True)
                t_ids, t_tfs = t_ids[keep], t_tfs[keep]
            else:
                t_ids, t_tfs = _decode_block_rows(by_term[t])
                if site_filter is not None:
                    t_ids, t_tfs = site_filter(t_ids, t_tfs)
            if t_ids.size == 0:
                continue
            part = pd.Series(bm25_scores(t, t_ids, t_tfs), index=t_ids)
            acc = part.add(acc, fill_value=0.0) if len(acc) else part
            acc = acc.sort_index()
        ids = acc.index.to_numpy(np.int64)
        return topk_rows(
            shard, ids, acc.to_numpy(np.float64),
            cand_override=n_cand,
        )

    return kernel


class BlockSearcher:
    """Serve top-k queries from the compressed index tables.

    Driver-side state is tiny and loaded once: corpus stats (n_docs, avgdl),
    per-site doc-id ranges (sites are contiguous in doc-id space because
    doc_ids are assigned in (conv_id, turn_idx) order and site is a conv_id
    prefix — SURVEY §1.4), and nothing per-term.
    """

    def __init__(
        self,
        blocks: DataFrame,
        documents: DataFrame,
        terms: DataFrame,
        cfg: EngineConfig | None = None,
        transcripts: DataFrame | None = None,
        shard_size: int | None = None,
        site_ids: dict[str, int] | None = None,
        term_buckets: int | None = None,
        n_docs: int | None = None,
        avgdl: float | None = None,
        site_ranges: dict[str, tuple[int, int]] | None = None,
    ):
        self.blocks = blocks
        self.documents = documents
        self.terms = terms
        self.cfg = cfg or EngineConfig()
        self.transcripts = transcripts
        # bucket count of the term-partitioned tables (index_meta): lets the
        # term-stats lookup prune to the query terms' partitions
        self.term_buckets = term_buckets if "bucket" in terms.columns else None
        # corpus stats + per-site ranges come from index_meta / the sites
        # table when built through the engine (searcher init then runs ZERO
        # corpus-sized jobs); the aggregation fallback serves ad-hoc
        # construction in tests
        if n_docs is not None and avgdl is not None:
            self.n_docs, self.avgdl = int(n_docs), float(avgdl)
        else:
            row = documents.agg(
                F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
            ).collect()[0]
            self.n_docs, self.avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
        # per-site doc-id [min, max] — a sound SUPERSET bound for shard-scan
        # pruning even after incremental appends (exact filtering is the
        # kernel's SITE_TERM job, not this)
        if site_ranges is not None:
            self.site_ranges = dict(site_ranges)
        else:
            self.site_ranges = {
                r["site"]: (int(r["lo"]), int(r["hi"]))
                for r in documents.groupBy("site")
                .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
                .collect()
            }
        # stable mapping from the build-time `sites` table when provided
        # (incrementally-added sites append ids; sorted-derive is only the
        # fallback for ad-hoc construction in tests)
        self.site_ids = site_ids or {
            s: i for i, s in enumerate(sorted(self.site_ranges))
        }
        # the build-time shard geometry (index_meta) must win over one
        # re-derived from n_docs — doc-range shards are physical layout
        self.shard_size = shard_size or self.cfg.shard_size(self.n_docs)
        # driver-side memo of term stats: (term) → list of per-site rows.
        # Each query only ever touches its own lemmas, so this stays tiny
        # even with a 10^8-term vocabulary; it removes one terms-table scan
        # job per repeated term (invalidated by reloading the searcher,
        # which incremental updates do). LRU-bounded at MEMO_CAP so an
        # adversarial stream of distinct cold terms can't grow a serving
        # process without bound.
        self._term_stats_cache: dict[str, list] = _LRUCache()
        # per-term {shard: max block_max_tf} memo for two-pass WAND: sized
        # O(shards) per distinct query term, shared across queries (the
        # hot-term case the threshold sharing targets). Warmed ASYNC on
        # first sight of a term (see _shard_ubs_if_cached). Same LRU bound.
        self._shard_mtf_cache: dict[str, dict[int, float]] = _LRUCache()
        self._mtf_lock = threading.Lock()
        self._mtf_inflight: set[str] = set()

    # -- query planning (driver side, analog of SearchServiceImpl.java:48-105)
    def _plan(self, query: str, site: str | None, mode: str):
        lemmas = query_lemmas(query)
        if not lemmas:
            raise EmptySearchQueryError(query)
        tl = sorted(lemmas)
        missing = [t for t in tl if t not in self._term_stats_cache]
        if missing:
            scan = self.terms
            if self.term_buckets:
                # partition pruning: a term lives in exactly one bucket dir
                from searchengine_spark.operators.postings import term_bucket_py

                bks = sorted(
                    {term_bucket_py(t, self.term_buckets) for t in missing}
                )
                scan = scan.filter(F.col("bucket").isin(bks))
            fetched = (
                scan.filter(F.col("term").isin(missing))
                .select("term", "site", "df")
                .collect()
            )
            for t in missing:
                self._term_stats_cache[t] = []
            for r in fetched:
                self._term_stats_cache[r["term"]].append(r)
        per_site: dict[str, set[str]] = {}
        idf: dict[str, float] = {}
        for t in tl:
            df_global = 0
            for r in self._term_stats_cache[t]:
                per_site.setdefault(r["site"], set()).add(r["term"])
                df_global += int(r["df"])
            # idf is computed at QUERY time from (Σ_site df == global df,
            # current n_docs) — never trusted from a stored column, so
            # incremental updates (which shift n_docs/df) need no idf
            # rewrite anywhere (plans/incremental.py M1 discipline)
            if df_global:
                idf[t] = BM25Params.idf(self.n_docs, df_global)
        sites = [site] if site is not None else sorted(self.site_ranges)
        if mode == "reference":
            # per-site conjunctive gate (SearchServiceImpl.java:55-58):
            # early-exit site skipping; conjunctive semantics make the gate
            # redundant for correctness (an ungated site's docs cannot contain
            # every lemma) but it prunes the scan to the gated doc ranges
            gated = [s for s in sites if per_site.get(s, set()) >= lemmas]
        else:
            gated = [s for s in sites if per_site.get(s)]
        # kernel-side doc filtering is only *required* when a site filter
        # restricts candidates beyond what the scoring semantics imply
        allowed_site_ids = (
            sorted(self.site_ids[s] for s in gated) if site is not None else None
        )
        # shard-scan pruning uses the gated sites' doc ranges either way
        scan_ranges = sorted(self.site_ranges[s] for s in gated)
        return tl, idf, gated, allowed_site_ids, scan_ranges

    def _fetch_mtf(self, terms: list[str]) -> None:
        """One metadata job: max block_max_tf per (term, shard) for
        ``terms``, into the memo. Whole-term dicts are assigned atomically
        (GIL), so a concurrent reader sees a term fully or not at all."""
        fetched = (
            self.blocks.filter(F.col("term").isin(terms))
            .groupBy("term", "shard")
            .agg(F.max("block_max_tf").alias("mtf"))
            .collect()
        )
        built: dict[str, dict[int, float]] = {t: {} for t in terms}
        for r in fetched:
            built[r["term"]][int(r["shard"])] = float(r["mtf"])
        self._shard_mtf_cache.update(built)

    def _warm_mtf_async(self, terms: list[str]) -> None:
        def run() -> None:
            try:
                self._fetch_mtf(terms)
            except Exception:
                pass  # next cold query retries; serving never depends on it
            finally:
                with self._mtf_lock:
                    self._mtf_inflight.difference_update(terms)

        threading.Thread(target=run, name="wand-ub-warm", daemon=True).start()

    def _shard_ubs_if_cached(
        self,
        tl: list[str],
        idf: dict[str, float],
        shard_bounds: tuple[int, int] | None,
    ) -> dict[int, float] | None:
        """Cache-only UB lookup with ASYNC warming. A cold term set must
        not serialize the block-metadata round-trip into its own critical
        path (measured 0.5-1.4 s per query on a 3.9M-turn index — more
        than two-pass ever saves): on a miss the fetch is submitted on a
        background thread, THIS query runs one-pass, and the repeat/hot
        queries two-pass targets find the memo warm. Returns None while
        cold. ``_shard_ubs`` stays the synchronous variant (tests /
        explicit warm-up)."""
        missing = [t for t in tl if t not in self._shard_mtf_cache]
        if not missing:
            return self._shard_ubs(tl, idf, shard_bounds)
        with self._mtf_lock:
            to_fetch = [t for t in missing if t not in self._mtf_inflight]
            self._mtf_inflight.update(to_fetch)
        if to_fetch:
            self._warm_mtf_async(to_fetch)
        return None

    def _two_pass_possible(self) -> bool:
        """Driver-only pre-gate: if the WHOLE index has fewer shards than
        the engagement floor, two-pass can never pay here — skip even the
        async warm (no thread, no metadata job, ever)."""
        cfg = self.cfg
        n_shards = max(hi for _, hi in self.site_ranges.values()) // self.shard_size + 1 if self.site_ranges else 0
        par = max(1, self.blocks.sparkSession.sparkContext.defaultParallelism)
        return n_shards >= max(
            cfg.wand_min_shards, int(np.ceil(cfg.wand_shards_per_core * par))
        )

    def _shard_ubs(
        self,
        tl: list[str],
        idf: dict[str, float],
        shard_bounds: tuple[int, int] | None,
    ) -> dict[int, float]:
        """{shard: Σ per-term upper bound} from block metadata only (max
        block_max_tf per (term, shard) — small columns, term-pruned scan,
        no posting decode). Memoized per term, so repeated/hot queries pay
        zero metadata jobs. The UB uses the same dl→0 bound as the kernel's
        term_ub, with the CURRENT idf — sound across incremental updates."""
        missing = [t for t in tl if t not in self._shard_mtf_cache]
        if missing:
            self._fetch_mtf(missing)
        k1, b = self.cfg.bm25.k1, self.cfg.bm25.b
        ubs: dict[int, float] = {}
        for t in tl:
            w = idf.get(t)
            if not w:
                continue
            for s, mtf in self._shard_mtf_cache[t].items():
                if shard_bounds is not None and not (
                    shard_bounds[0] <= s <= shard_bounds[1]
                ):
                    continue
                ubs[s] = ubs.get(s, 0.0) + w * mtf * (k1 + 1.0) / (
                    mtf + k1 * (1.0 - b)
                )
        return ubs

    def _two_pass_pays(self, shard_ub: dict[int, float]) -> bool:
        """Driver-side engagement heuristic for two-pass WAND (metadata
        only, zero jobs). Pass 1 serializes one shard ahead of the rest, so
        it must buy back ≥ one task-wave of skipped shards: require both
        enough shards per parallel slot AND visible UB skew (a shard is
        skippable only when its UB falls below θ, and θ sits well under the
        max shard UB — near-uniform UBs can never prune). Measured r4: on a
        uniform fixture (16 shards, 4 cores, zero-skew UBs) unconditional
        two-pass cost +35% hot-term latency; see config.wand_* docs."""
        cfg = self.cfg
        n = len(shard_ub)
        par = max(1, self.blocks.sparkSession.sparkContext.defaultParallelism)
        min_shards = max(
            cfg.wand_min_shards, int(np.ceil(cfg.wand_shards_per_core * par))
        )
        if n < min_shards:
            return False
        ub_max = max(shard_ub.values())
        prunable = sum(
            1 for u in shard_ub.values() if u < cfg.wand_skew_gate * ub_max
        )
        return prunable >= np.ceil(cfg.wand_skew_min_frac * n)

    def _search_two_pass(
        self, blocks: DataFrame, shard_ub: dict[int, float], mk_kernel, k: int,
        exact_count: bool,
    ) -> pd.DataFrame:
        """Two-pass cross-shard WAND: run the highest-UB shard first, take
        its k-th score as a global-θ lower bound, then (a) skip whole shards
        whose UB can't reach θ (when no exact count is owed — their docs
        provably miss the top-k) and (b) seed the remaining kernels with θ
        so they prune from the first term instead of warming a local θ."""
        seed = max(shard_ub, key=lambda s: (shard_ub[s], -s))
        rows1 = (
            blocks.filter(F.col("shard") == seed)
            .groupBy("shard")
            .applyInPandas(mk_kernel(), KERNEL_SCHEMA)
            .toPandas()
        )
        real = rows1[rows1["doc_id"] >= 0]
        theta = -np.inf
        if len(real) >= k:
            sc = real["score"].to_numpy(np.float64)
            theta = float(np.partition(sc, len(sc) - k)[len(sc) - k]) - THETA_GUARD
        others = [s for s in shard_ub if s != seed]
        if not exact_count and theta > -np.inf:
            others = [s for s in others if shard_ub[s] >= theta]
        if not others:
            return rows1
        rows2 = (
            blocks.filter(F.col("shard").isin(others))
            .groupBy("shard")
            .applyInPandas(mk_kernel(theta), KERNEL_SCHEMA)
            .toPandas()
        )
        return pd.concat([rows1, rows2], ignore_index=True)

    def search(
        self,
        query: str,
        site: str | None = None,
        offset: int | None = None,
        limit: int | None = None,
        mode: str = "reference",
        with_snippets: bool = False,
        exact_count: bool = False,
    ) -> tuple[pd.DataFrame, int]:
        """The DEFAULT BM25 path is full block-max WAND: the kernel skips
        decoding blocks that provably can't affect the top-k, so hot-term
        latency stays sub-linear in df (the ranking is still EXACT — WAND
        pruning only skips docs that cannot reach the top-k). The returned
        count is then a lower bound — the Elasticsearch
        ``track_total_hits=false`` trade-off; pass ``exact_count=True`` to
        decode every term's doc-id lists upfront and get the exact
        disjunctive candidate count (SearchResponse.count parity). Reference
        mode counts are always exact (conjunctive intersection)."""
        cfg = self.cfg
        offset = cfg.default_offset if offset is None else offset
        limit = cfg.default_limit if limit is None else limit
        tl, idf, gated, allowed_site_ids, scan_ranges = self._plan(query, site, mode)
        empty = pd.DataFrame(
            columns=["doc_id", "conv_id", "turn_idx", "site", "score", "relevance"]
        )
        if not gated:
            return empty, 0
        k = offset + limit
        scan_terms = list(tl)
        if mode == "bm25":
            scan_terms.append(DOCLEN_TERM)
        if allowed_site_ids is not None:
            scan_terms.append(SITE_TERM)
        blocks = self.blocks.filter(F.col("term").isin(scan_terms))
        shard_bounds = None
        if len(gated) < len(self.site_ranges):
            lo = min(r[0] for r in scan_ranges) // self.shard_size
            hi = max(r[1] for r in scan_ranges) // self.shard_size
            shard_bounds = (lo, hi)
            blocks = blocks.filter(F.col("shard").between(lo, hi))

        def mk_kernel(theta_init: float = -np.inf):
            return make_shard_kernel(
                tl, mode, k, idf, cfg.bm25.k1, cfg.bm25.b, self.avgdl,
                allowed_site_ids, exact_count=exact_count,
                theta_init=theta_init,
            )

        shard_ub = None
        if mode == "bm25" and cfg.wand_two_pass and self._two_pass_possible():
            shard_ub = self._shard_ubs_if_cached(tl, idf, shard_bounds)
        if shard_ub and self._two_pass_pays(shard_ub):
            rows = self._search_two_pass(
                blocks, shard_ub, mk_kernel, k, exact_count
            )
        else:
            rows = (
                blocks.groupBy("shard")
                .applyInPandas(mk_kernel(), KERNEL_SCHEMA)
                .toPandas()
            )
        count = (
            int(rows.drop_duplicates("shard")["cand"].sum()) if len(rows) else 0
        )
        rows = rows[rows["doc_id"] >= 0]  # drop count-only sentinel rows
        if rows.empty:
            return empty, count
        rows = rows.copy()
        rows["_key"] = rows["score"].round(SCORE_DECIMALS)
        rows = rows.sort_values(["_key", "doc_id"], ascending=[False, True], kind="mergesort")
        page = rows.iloc[offset : offset + limit].copy()
        if mode == "reference":
            max_score = float(rows["score"].max())
            page["relevance"] = page["score"] / max_score
        else:
            page["relevance"] = page["score"]
        meta = (
            self.documents.filter(
                F.col("doc_id").isin([int(d) for d in page["doc_id"]])
            )
            .select("doc_id", "conv_id", "turn_idx", "site")
            .toPandas()
        )
        out = page.merge(meta, on="doc_id")[
            ["doc_id", "conv_id", "turn_idx", "site", "score", "relevance"]
        ]
        out = out.sort_values(
            ["relevance", "conv_id", "turn_idx"], ascending=[False, True, True],
            kind="mergesort",
        ).reset_index(drop=True)
        if with_snippets:
            out = self._attach_snippets(out, set(tl))
        return out, count

    def _attach_snippets(self, page: pd.DataFrame, lemmas: set[str]) -> pd.DataFrame:
        """P1–P3 on ≤limit rows: join text back for the final page only (the
        late-materialization rule — never carry `text` through a shuffle)."""
        if self.transcripts is None or page.empty:
            page["title"] = [
                make_title(c, int(t)) for c, t in zip(page["conv_id"], page["turn_idx"])
            ]
            page["snippet"] = ""
            return page
        keys = [(c, int(t)) for c, t in zip(page["conv_id"], page["turn_idx"])]
        texts = {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in self.transcripts.filter(
                F.col("conv_id").isin([c for c, _ in keys])
                & F.col("turn_idx").isin([t for _, t in keys])
            )
            .select("conv_id", "turn_idx", "text")
            .collect()
        }
        page["title"] = [make_title(c, t) for c, t in keys]
        page["snippet"] = [
            make_snippet(texts.get((c, t), ""), lemmas) for c, t in keys
        ]
        return page
