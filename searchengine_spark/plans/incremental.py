"""Single-turn incremental (re-)index — the M1 upsert (SURVEY §2.4).

Reference behavior (``IndexingThread.addIndexingPage``,
``indexing/IndexingThread.java:199-224``): if the page exists, delete its
postings and decrement affected lemma dfs (:250-263); re-lemmatize; merge
lemma dfs (:265-276); append postings. This is the reference's only "late
data" handling — a synchronous row-level upsert, not streaming (SURVEY §1.4).

Spark-first translation with scale-honest cost bounds — every write below is
PARTITION-scoped (``catalog.replace_partitions`` = Iceberg
``overwritePartitions``), never a table rewrite:

- ``postings_flat`` (partitioned by term-hash bucket): rewrite only the
  buckets of the affected (old ∪ new) terms;
- ``documents`` (partitioned by doc-range shard): rewrite the doc's shard;
- ``terms`` / ``terms_global`` (partitioned by term bucket): recompute
  df/cf for the affected terms, rewrite their buckets. idf is NOT refreshed
  anywhere — the searcher computes idf at query time from (df, n_docs), so
  the stored idf column is a build-time snapshot and may go stale freely;
- ``postings`` blocks (partitioned by shard): re-encode the affected
  ``(term, shard)`` groups — the doc's shard × (old ∪ new terms + the
  doc_len/site pseudo-terms) — and rewrite that ONE shard partition. Other
  blocks keep their (now approximate) block_max_score; the query kernel's
  pruning bound is derived from immutable block_max_tf + current idf, so
  pruning stays sound under drift (operators/search.py).

Untouched partition files are byte-identical after an upsert
(``test_incremental_partition_stability``).
"""

from __future__ import annotations

import dataclasses
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from searchengine_spark.config import EngineConfig
from searchengine_spark.functions.lemmatize import lemma_counts
from searchengine_spark.operators.postings import (
    encode_posting_blocks,
    idf_col,
    term_bucket_col,
    term_bucket_py,
)
from searchengine_spark.operators.search import DOCLEN_TERM, SITE_TERM
from searchengine_spark.plans.build_index import _append_state
from searchengine_spark.sources.catalog import TableCatalog, tiny_df
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

    # frozen physical geometry (index_meta): shard size and bucket count are
    # layout, never re-derived from drifting corpus stats
    meta = {r["key"]: r["value"] for r in cat.read("index_meta").collect()}
    shard_size = int(meta["shard_size"])
    nb = int(meta.get("term_buckets", cfg.n_term_buckets()))

    existing = docs.filter(
        (F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx)
    ).collect()
    if existing:
        doc_id = int(existing[0]["doc_id"])
    else:
        doc_id = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    dshard = doc_id // shard_size

    counts = lemma_counts(text)
    doc_len = sum(counts.values())
    new_terms = set(counts)

    flat = cat.read("postings_flat")
    old_terms = {
        r["term"]
        for r in flat.filter(F.col("doc_id") == doc_id).select("term").collect()
    }
    affected = sorted(old_terms | new_terms)
    abuckets = sorted({term_bucket_py(t, nb) for t in affected})

    # --- postings_flat: rewrite ONLY the affected term buckets --------------
    new_rows = tiny_df(
        spark,
        [(t, doc_id, site, doc_len, c) for t, c in counts.items()],
        "term string, doc_id long, site string, doc_len int, tf long",
    ).withColumn("bucket", term_bucket_col(F.col("term"), nb))
    keep_rows = flat.filter(
        F.col("bucket").isin(abuckets) & (F.col("doc_id") != doc_id)
    )
    cat.replace_partitions(
        keep_rows.unionByName(new_rows),
        "postings_flat",
        "bucket",
        abuckets,
        sort_by=["term", "doc_id"],
    )

    # --- documents: rewrite the doc's shard partition -----------------------
    new_doc = tiny_df(
        spark,
        [(doc_id, conv_id, turn_idx, site, doc_len, dshard)],
        "doc_id long, conv_id string, turn_idx int, site string, "
        "doc_len int, shard long",
    )
    keep_docs = docs.filter(
        (F.col("shard") == dshard) & (F.col("doc_id") != doc_id)
    ).select("doc_id", "conv_id", "turn_idx", "site", "doc_len", "shard")
    cat.replace_partitions(
        keep_docs.unionByName(new_doc),
        "documents",
        "shard",
        [dshard],
        sort_by=["doc_id"],
    )
    documents = cat.read("documents")
    row = documents.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("a")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["a"])

    # --- terms / terms_global: recompute affected terms, rewrite buckets ----
    flat = cat.read("postings_flat")
    aff_flat = flat.filter(
        F.col("bucket").isin(abuckets) & F.col("term").isin(affected)
    )
    g_aff = aff_flat.groupBy("term").agg(
        F.count("*").alias("df_global"), F.sum("tf").alias("cf_global")
    )
    g_old = cat.read("terms_global")
    # preserve the persistent term dictionary: existing terms KEEP their
    # term_id; brand-new terms (bounded by one doc's vocabulary) get
    # max_id+1… appends — ids never shift, so already-encoded blocks in
    # other shards stay consistent with the dictionary.
    old_ids = {
        r["term"]: int(r["term_id"])
        for r in g_old.filter(
            F.col("bucket").isin(abuckets) & F.col("term").isin(affected)
        )
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
    id_df = tiny_df(
        spark, sorted(old_ids.items()), "term string, term_id long"
    )
    g_keep = g_old.filter(
        F.col("bucket").isin(abuckets) & ~F.col("term").isin(affected)
    ).select("term", "df_global", "cf_global", "idf", "term_id", "bucket")
    g_new = (
        g_aff.join(id_df, "term")
        .withColumn("idf", idf_col(F.col("df_global"), n_docs))
        .withColumn("bucket", term_bucket_col(F.col("term"), nb))
        .select("term", "df_global", "cf_global", "idf", "term_id", "bucket")
    )
    cat.replace_partitions(
        g_keep.unionByName(g_new), "terms_global", "bucket", abuckets,
        sort_by=["term"],
    )

    s_aff = aff_flat.groupBy("term", "site").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    ).withColumn("bucket", term_bucket_col(F.col("term"), nb))
    s_keep = cat.read("terms").filter(
        F.col("bucket").isin(abuckets) & ~F.col("term").isin(affected)
    ).select("term", "site", "df", "cf", "bucket")
    cat.replace_partitions(
        s_keep.unionByName(s_aff.select("term", "site", "df", "cf", "bucket")),
        "terms",
        "bucket",
        abuckets,
        sort_by=["term"],
    )

    # --- posting blocks: re-encode affected groups, rewrite ONE shard -------
    re_terms = affected + [DOCLEN_TERM, SITE_TERM]
    blocks = cat.read("postings")
    keep_blocks = blocks.filter(
        (F.col("shard") == dshard) & ~F.col("term").isin(re_terms)
    ).select(
        "term", "block_id", "min_doc", "max_doc", "count",
        "block_max_tf", "block_max_score", "doc_gaps", "tfs",
        F.col("shard").cast("long").alias("shard"),
    )
    lo, hi = dshard * shard_size, (dshard + 1) * shard_size
    shard_docs = documents.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )
    re_flat = cat.read("postings_flat").filter(
        F.col("bucket").isin(abuckets)
        & F.col("term").isin(affected)
        & (F.col("doc_id") >= lo)
        & (F.col("doc_id") < hi)
    )
    cfg_frozen = dataclasses.replace(cfg, docs_per_shard=shard_size)
    sids = {r["site"]: int(r["sid"]) for r in cat.read("sites").collect()}
    if site not in sids:  # new sites append ids — existing ids never shift
        sids[site] = max(sids.values(), default=-1) + 1
        cat.replace(
            tiny_df(spark, sorted(sids.items()), "site string, sid long"),
            "sites",
        )
    re_blocks = encode_posting_blocks(
        re_flat, n_docs, avgdl, cat.read("terms_global"), cfg_frozen,
        documents=shard_docs, site_ids=sids,
    )
    cat.replace_partitions(
        keep_blocks.unionByName(re_blocks),
        "postings",
        "shard",
        [dshard],
        sort_by=["term"],
    )

    _append_state(
        cat,
        [("incremental", int(doc_id), "DONE", len(counts), conv_id, t0, time.time(), "", "")],
    )
    return doc_id
