"""Index-build operators: lemmatize → tf → term stats → compressed blocks.

Spark-first re-expression of the reference's indexing dataflow
(``indexing/PageIndexer.java:89-109`` accumulate tf/df into concurrent maps;
``indexing/IndexingThread.java:127-149`` bulk flush). The concurrent-map
accumulation becomes in-UDF tf maps + hash aggregation for df; the
``search_index`` posting-row table (``model/Index.java:14-40``) becomes
delta+varint block columns built inside ``applyInPandas`` (SURVEY §4.3.2).

Scale notes (10^12 turns):
- tf is counted INSIDE the lemmatizer UDF (per-doc ``map<term,tf>``), so no
  per-occurrence row ever crosses a shuffle — the tf agg stage is gone;
  ``site``/``doc_len`` ride along as functionally-dependent columns.
- block encoding groups by doc-range ``shard`` (= doc_id // docs_per_shard):
  group COUNT equals the shard count (vocabulary-independent) and group SIZE
  is bounded by docs_per_shard × avg doc len, uniform by construction. A
  df≈N stopword term is automatically split into contiguous, independently
  sorted+compressed doc ranges (explicit skew handling — no group is ever
  O(df)); shards are doc-range aligned across terms, which is exactly what
  the query kernel partitions on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.config import EngineConfig
from searchengine_spark.functions.codec import varint_encode
from searchengine_spark.functions.lemmatize import lemma_counts_udf

BLOCKS_SCHEMA = (
    "term string, shard long, block_id int, min_doc long, max_doc long, "
    "count int, block_max_tf int, block_max_score double, "
    "doc_gaps binary, tfs binary"
)


def site_id_map(documents: DataFrame) -> dict[str, int]:
    """Dense site → id mapping: sorted site names. Deterministic, shared by
    the build (SITE_TERM encoding) and the searcher (site filter planning)."""
    sites = sorted(r["site"] for r in documents.select("site").distinct().collect())
    return {s: i for i, s in enumerate(sites)}


def lemmatize_transcripts(transcripts: DataFrame) -> DataFrame:
    """Eligibility filter (T7, ``PageIndexer.java:65-67``) + site derivation
    (SURVEY §1.4) + vectorized lemmatization with in-UDF tf counting (T1–T6)
    + doc_len (BM25 length norm; the reference has none — SURVEY §2.3
    scoring note). Emitting ``map<term,tf>`` per doc instead of a lemma list
    means tf aggregation needs NO shuffle downstream."""
    eligible = transcripts.filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    return (
        eligible.withColumn("site", F.split("conv_id", "-").getItem(0))
        .withColumn("counts", lemma_counts_udf()(F.col("text")))
        .withColumn(
            "doc_len",
            F.aggregate(
                F.map_values("counts"), F.lit(0), lambda acc, x: acc + x
            ),
        )
    )


def flat_postings(rows_with_ids: DataFrame) -> DataFrame:
    """Uncompressed postings ``(term, doc_id, site, doc_len, tf)`` — the
    direct analog of one ``search_index`` row (``model/Index.java:14-40``).
    T6 tf counting (``LemmaSearcherImpl.java:25,73-74``) already happened
    inside the lemmatizer UDF and the maps were exploded pre-shuffle, so
    this is a pure filter+project; rows are unique on (doc_id, term) by
    construction. The null-term rows are explode_outer's placeholders for
    eligible docs with zero lemmas (they live in `documents` only)."""
    return (
        rows_with_ids.filter(F.col("term").isNotNull())
        .select("doc_id", "site", "doc_len", "term", F.col("tf").cast("long"))
    )


def term_stats(flat: DataFrame, n_docs: int) -> tuple[DataFrame, DataFrame]:
    """(per-site terms table, global term stats with idf).

    terms(term, site, df, cf, idf): analog of the ``lemma`` table —
    df = pages-on-site containing the lemma (``model/Lemma.java:14-37``,
    increment logic ``PageIndexer.java:92-98``). ``flat`` is unique on
    (doc_id, term), so df is a plain count, no countDistinct shuffle.
    idf is corpus-global (Lucene-style, see ``BM25Params.idf``).
    """
    global_stats = flat.groupBy("term").agg(
        F.count("*").alias("df_global"), F.sum("tf").alias("cf_global")
    ).withColumn(
        "idf",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df_global") + F.lit(0.5))
            / (F.col("df_global") + F.lit(0.5))
        ),
    )
    per_site = (
        flat.groupBy("term", "site")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
        .join(global_stats.select("term", "idf"), "term")
    )
    return per_site, global_stats


def encode_posting_blocks(
    flat: DataFrame,
    n_docs: int,
    avgdl: float,
    global_stats: DataFrame,
    cfg: EngineConfig,
    documents: DataFrame | None = None,
    site_ids: dict[str, int] | None = None,
) -> DataFrame:
    """flat postings → compressed block table (BLOCKS_SCHEMA).

    Each output row is one block of ≤``cfg.block_size`` postings of one
    ``(term, shard)``: doc-id gaps delta+varint encoded, tfs varint encoded,
    with (min_doc, max_doc, block_max_tf, block_max_score) metadata for
    block-max WAND pruning (SURVEY §4.3.2/§4.3.4). block_max_score is the
    BM25 upper bound of any posting in the block (uses true per-doc lengths).

    When ``documents`` is given, two forward structures are encoded into the
    same table under reserved pseudo-terms, co-sharded with real postings so
    the query kernel never joins the 10^12-row documents table:
    - ``DOCLEN_TERM``: (doc_id → doc_len) for BM25 length normalization;
    - ``SITE_TERM``: (doc_id → dense site id) for exact site-scoped search
      (``SearchServiceImpl.java:51-54``) under any doc-id layout, including
      after incremental appends (no contiguity assumption).
    """
    from searchengine_spark.operators.search import DOCLEN_TERM, SITE_TERM

    shard_size = cfg.shard_size(n_docs)
    k1, b = cfg.bm25.k1, cfg.bm25.b
    block_size = cfg.block_size

    scored = (
        flat.join(global_stats.select("term", "idf"), "term")
        .withColumn("shard", (F.col("doc_id") / F.lit(shard_size)).cast("long"))
        .withColumn(
            "score",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.lit(avgdl))
            ),
        )
        .select("term", "shard", "doc_id", "tf", "score")
    )
    if documents is not None:
        doclen_rows = documents.select(
            F.lit(DOCLEN_TERM).alias("term"),
            (F.col("doc_id") / F.lit(shard_size)).cast("long").alias("shard"),
            "doc_id",
            F.col("doc_len").cast("long").alias("tf"),
            F.lit(0.0).alias("score"),
        )
        # site_ids must be the CORPUS-WIDE mapping — when re-encoding a shard
        # subset (plans/incremental.py) the caller passes the global one
        sids = site_ids if site_ids is not None else site_id_map(documents)
        spark = documents.sparkSession
        sid_df = F.broadcast(
            spark.createDataFrame(sorted(sids.items()), "site string, _sid long")
        )
        site_rows = documents.join(sid_df, "site").select(
            F.lit(SITE_TERM).alias("term"),
            (F.col("doc_id") / F.lit(shard_size)).cast("long").alias("shard"),
            "doc_id",
            F.col("_sid").alias("tf"),
            F.lit(0.0).alias("score"),
        )
        scored = scored.unionByName(doclen_rows).unionByName(site_rows)

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        # One group = ONE doc-range shard holding ALL its terms' postings.
        # Grouping by shard alone (not (term, shard)) keeps the pandas-group
        # count equal to the shard count — independent of vocabulary size —
        # while group SIZE stays bounded by docs_per_shard × avg doc len
        # (doc ranges are uniform; skewed terms are still split across
        # shards). Grouping by (term, shard) created |vocab|·|shards| tiny
        # groups whose per-group Arrow overhead dominated the build and got
        # WORSE with more cores (more shards → more groups).
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        shard = int(pdf["shard"].iloc[0])
        terms = pdf["term"].to_numpy(object)
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        scores = pdf["score"].to_numpy(np.float64)
        # term-run boundaries (terms sorted → runs are contiguous)
        change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(terms)]))
        rows = []
        for s0, s1 in zip(starts, ends):
            term = terms[s0]
            for b0 in range(s0, s1, block_size):
                b1 = min(b0 + block_size, s1)
                d = doc_ids[b0:b1]
                t = tfs[b0:b1]
                s = scores[b0:b1]
                gaps = np.empty_like(d)
                gaps[0] = d[0]
                np.subtract(d[1:], d[:-1], out=gaps[1:])
                rows.append(
                    (
                        term,
                        shard,
                        (b0 - s0) // block_size,
                        int(d[0]),
                        int(d[-1]),
                        int(b1 - b0),
                        int(t.max()),
                        float(s.max()),
                        varint_encode(gaps),
                        varint_encode(t),
                    )
                )
        return pd.DataFrame(
            rows,
            columns=[
                "term", "shard", "block_id", "min_doc", "max_doc", "count",
                "block_max_tf", "block_max_score", "doc_gaps", "tfs",
            ],
        )

    return scored.groupBy("shard").applyInPandas(encode, BLOCKS_SCHEMA)
