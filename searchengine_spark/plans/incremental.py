"""Single-turn incremental (re-)index — the M1 upsert (SURVEY §2.4).

Reference behavior (``IndexingThread.addIndexingPage``,
``indexing/IndexingThread.java:199-224``): if the page exists, delete its
postings and decrement affected lemma dfs (:250-263); re-lemmatize; merge
lemma dfs (:265-276); append postings. This is the reference's only "late
data" handling — a synchronous row-level upsert, not streaming (SURVEY §1.4).

Spark-first translation with scale-honest cost bounds:
- postings_flat / documents: row-level delete+insert (Iceberg ``MERGE INTO``
  semantics; the parquet backend rewrites via temp-swap).
- terms / terms_global: df/cf recomputed ONLY for the affected terms (scan
  pruned by the term-sorted layout); the idf column is refreshed for all
  terms because N changed — an O(vocab) map-only job, no shuffle.
- postings blocks: only the affected ``(term, shard)`` groups are re-encoded
  — the doc's shard × (old ∪ new terms + the doc_len/site pseudo-terms).
  Other blocks keep their (now approximate) block_max_score; the query
  kernel's pruning bound is derived from immutable block_max_tf + current
  idf, so pruning stays sound under drift (operators/search.py).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from searchengine_spark.config import EngineConfig
from searchengine_spark.functions.lemmatize import lemma_counts
from searchengine_spark.operators.postings import encode_posting_blocks
from searchengine_spark.operators.search import DOCLEN_TERM, SITE_TERM
from searchengine_spark.plans.build_index import _append_state
from searchengine_spark.sources.catalog import TableCatalog
from searchengine_spark.sources.transcripts import site_of_conv


def reindex_turn(
    spark: SparkSession,
    warehouse: str,
    conv_id: str,
    turn_idx: int,
    text: str,
    cfg: EngineConfig | None = None,
) -> int:
    """Insert or replace one turn's index entries. Returns its doc_id."""
    cfg = cfg or EngineConfig()
    cat = TableCatalog(spark, warehouse)
    t0 = time.time()
    docs = cat.read("documents")
    site = site_of_conv(conv_id)

    existing = docs.filter(
        (F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx)
    ).collect()
    if existing:
        doc_id = int(existing[0]["doc_id"])
    else:
        doc_id = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1

    counts = lemma_counts(text)
    doc_len = sum(counts.values())
    new_terms = set(counts)

    flat = cat.read("postings_flat")
    old_terms = {
        r["term"] for r in flat.filter(F.col("doc_id") == doc_id).select("term").collect()
    }
    affected = sorted(old_terms | new_terms)

    # --- postings_flat: delete + insert (MERGE INTO analog) -----------------
    new_rows = spark.createDataFrame(
        [(t, doc_id, site, doc_len, c) for t, c in counts.items()],
        "term string, doc_id long, site string, doc_len int, tf long",
    )
    flat2 = flat.filter(F.col("doc_id") != doc_id).unionByName(new_rows)
    cat.replace(flat2, "postings_flat", sort_by=["term", "doc_id"])

    # --- documents: upsert row ----------------------------------------------
    new_doc = spark.createDataFrame(
        [(doc_id, conv_id, turn_idx, site, doc_len)],
        "doc_id long, conv_id string, turn_idx int, site string, doc_len int",
    )
    docs2 = docs.filter(F.col("doc_id") != doc_id).unionByName(new_doc)
    cat.replace(docs2, "documents", sort_by=["doc_id"])
    documents = cat.read("documents")
    row = documents.agg(F.count("*").alias("n"), F.avg("doc_len").alias("a")).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["a"])

    # --- terms: recompute affected terms' df/cf; refresh idf everywhere -----
    flat = cat.read("postings_flat")
    aff_flat = flat.filter(F.col("term").isin(affected))
    g_aff = aff_flat.groupBy("term").agg(
        F.count("*").alias("df_global"), F.sum("tf").alias("cf_global")
    )
    g_old = cat.read("terms_global")
    g_rest = g_old.filter(~F.col("term").isin(affected)).select(
        "term", "df_global", "cf_global", "term_id"
    )
    # preserve the persistent term dictionary: existing terms KEEP their
    # term_id; brand-new terms (bounded by one doc's vocabulary) get
    # max_id+1… appends — ids never shift, so already-encoded blocks in
    # other shards stay consistent with the dictionary.
    old_ids = {
        r["term"]: int(r["term_id"])
        for r in g_old.filter(F.col("term").isin(affected))
        .select("term", "term_id")
        .collect()
    }
    next_id = int(
        g_old.agg(F.max("term_id").alias("m")).collect()[0]["m"] or -1
    ) + 1
    for t in affected:
        if t not in old_ids:
            old_ids[t] = next_id
            next_id += 1
    id_df = spark.createDataFrame(
        sorted(old_ids.items()), "term string, term_id long"
    )
    idf_expr = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df_global") + F.lit(0.5))
        / (F.col("df_global") + F.lit(0.5))
    )
    g_new = g_rest.unionByName(g_aff.join(id_df, "term")).withColumn(
        "idf", idf_expr
    )
    cat.replace(g_new, "terms_global", sort_by=["term"])

    s_aff = aff_flat.groupBy("term", "site").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    s_rest = cat.read("terms").filter(~F.col("term").isin(affected)).select(
        "term", "site", "df", "cf"
    )
    # NOTE: unaffected terms' stored idf goes stale here (n_docs may have
    # changed) and that is fine — the searcher computes idf at query time
    # from (df, n_docs); terms_global.idf is a build-time snapshot only.
    terms_new = s_rest.unionByName(s_aff)
    cat.replace(terms_new, "terms", sort_by=["term"])

    # --- posting blocks: re-encode affected (term, shard) groups ------------
    # shard geometry is frozen at build time (index_meta), never re-derived
    meta = {r["key"]: r["value"] for r in cat.read("index_meta").collect()}
    shard_size = int(meta["shard_size"])
    shard = doc_id // shard_size
    re_terms = affected + [DOCLEN_TERM, SITE_TERM]
    blocks = cat.read("postings")
    keep = blocks.filter(
        ~(F.col("term").isin(re_terms) & (F.col("shard") == shard))
    )
    lo, hi = shard * shard_size, (shard + 1) * shard_size
    shard_docs = documents.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )
    re_flat = cat.read("postings_flat").filter(
        F.col("term").isin(affected)
        & (F.col("doc_id") >= lo)
        & (F.col("doc_id") < hi)
    )
    import dataclasses

    cfg_frozen = dataclasses.replace(cfg, docs_per_shard=shard_size)
    sids = {r["site"]: int(r["sid"]) for r in cat.read("sites").collect()}
    if site not in sids:  # new sites append ids — existing ids never shift
        sids[site] = max(sids.values(), default=-1) + 1
        cat.replace(
            spark.createDataFrame(sorted(sids.items()), "site string, sid long")
            .coalesce(1),
            "sites",
        )
    re_blocks = encode_posting_blocks(
        re_flat, n_docs, avgdl, cat.read("terms_global"), cfg_frozen,
        documents=shard_docs, site_ids=sids,
    )
    cat.replace(keep.unionByName(re_blocks), "postings", sort_by=["term", "shard"])

    _append_state(
        cat,
        [("incremental", int(doc_id), "DONE", len(counts), conv_id, t0, time.time(), "", "")],
    )
    return doc_id
