"""Structured-Streaming ingestion: late-arriving transcript turns → index.

The reference's only late-data path is the synchronous single-page upsert
(``POST /api/indexPage``, ``indexing/IndexingThread.java:199-224``); at
10^12-turn scale late data arrives as FILES, so this module wires the same
append semantics into Structured Streaming: ``readStream`` over a transcript
directory → ``foreachBatch`` → :func:`append_turns` (exactly-once per batch
via the streaming checkpoint + the idempotent left-anti dedup against the
documents table).

Cost shape per micro-batch — O(batch), independent of corpus size:
- new doc ids continue from max(doc_id), ABOVE every already-encoded id, so
  the batch's posting blocks APPEND after the existing (term, shard) blocks
  (disjoint doc ranges; the query kernel merges blocks by min_doc) — no
  existing block file is read or rewritten;
- ``postings_flat`` / ``documents`` take pure file APPENDS into their
  partition directories;
- ``terms`` / ``terms_global`` rewrite only the batch vocabulary's buckets
  (vocabulary-sized);
- every existing file of every table is untouched (append-only + bucket
  replaces).

``trigger(availableNow=True)`` gives batch-incremental catch-up runs; a
continuous trigger serves a live feed. Watermarks/stateful operators are
unnecessary — ingestion is append-only keyed by (conv_id, turn_idx); input
rows that duplicate an already-indexed key are DROPPED (the upsert path for
changed text is ``reindex_turn``).
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.config import EngineConfig
from searchengine_spark.operators.doc_ids import assign_doc_ids
from searchengine_spark.operators.postings import (
    encode_posting_blocks,
    flat_postings,
    idf_col,
    lemmatize_transcripts,
    term_bucket_col,
    term_bucket_py,
)
from searchengine_spark.operators.search import DOCLEN_TERM, SITE_TERM
from searchengine_spark.sources.catalog import TableCatalog, tiny_df
from searchengine_spark.sources.transcripts import TRANSCRIPTS_SCHEMA


def append_turns(
    spark: SparkSession,
    warehouse: str,
    transcripts: DataFrame,
    cfg: EngineConfig | None = None,
) -> int:
    """Append a batch of NEW turns to an existing index; returns the number
    of documents added. Turns whose (conv_id, turn_idx) already exist are
    dropped (idempotent re-delivery; use ``reindex_turn`` to change text).
    """
    cfg = cfg or EngineConfig()
    cat = TableCatalog(spark, warehouse)
    meta = {r["key"]: r["value"] for r in cat.read("index_meta").collect()}
    shard_size = int(meta["shard_size"])
    nb = int(meta.get("term_buckets", cfg.n_term_buckets()))

    docs = cat.read("documents")
    base_id = int(docs.agg(F.max("doc_id")).collect()[0][0] or -1) + 1

    lemmed = lemmatize_transcripts(transcripts)
    new_docs_keys = lemmed.select(
        "conv_id", "turn_idx", "site", "doc_len"
    ).join(
        docs.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti"
    )
    ids = assign_doc_ids(
        new_docs_keys, parallelism=cfg.parallelism, expect_unique=True
    ).withColumn("doc_id", F.col("doc_id") + F.lit(base_id))
    # PIN the assignment before any write: its lineage anti-joins the
    # documents table, and appending to that table invalidates the cached
    # plan (Spark refreshes caches on insert-into-path) — a re-execution
    # would then anti-join against the already-appended rows and silently
    # drop the batch from the posting writes. localCheckpoint truncates the
    # lineage to materialized partitions.
    ids = ids.localCheckpoint(eager=True)
    n_new = ids.count()
    if n_new == 0:
        return 0

    # --- documents: pure file append into the tail shard partitions --------
    docs_new = ids.select(
        "doc_id", "conv_id", "turn_idx", "site", "doc_len"
    ).withColumn("shard", (F.col("doc_id") / F.lit(shard_size)).cast("long"))
    cat.write(docs_new, "documents", mode="append", partition_by=["shard"],
              sort_by=["doc_id"])

    # --- postings_flat: append the batch's posting rows ---------------------
    rows = lemmed.select(
        "conv_id", "turn_idx", "site", "doc_len",
        F.explode("counts").alias("term", "tf"),
    ).join(F.broadcast(ids.select("conv_id", "turn_idx", "doc_id")),
           ["conv_id", "turn_idx"])
    flat_new = flat_postings(rows).withColumn(
        "bucket", term_bucket_col(F.col("term"), nb)
    )
    cat.write(flat_new, "postings_flat", mode="append",
              partition_by=["bucket"], sort_by=["term", "doc_id"])

    # --- terms / terms_global: rewrite the batch vocabulary's buckets -------
    # affected terms come from the BATCH's own lemma maps (micro-batch
    # sized) — never from scanning the corpus-wide flat table (doc_id is
    # not its partition key, so that join could not prune anything)
    flat = cat.read("postings_flat")
    affected = sorted(
        r["term"]
        for r in lemmed.join(
            F.broadcast(ids.select("conv_id", "turn_idx")),
            ["conv_id", "turn_idx"],
        )
        .select(F.explode(F.map_keys("counts")).alias("term"))
        .distinct()
        .collect()
    )
    abuckets = sorted({term_bucket_py(t, nb) for t in affected})
    documents = cat.read("documents")
    row = documents.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("a")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["a"])

    aff_flat = flat.filter(
        F.col("bucket").isin(abuckets) & F.col("term").isin(affected)
    )
    g_old = cat.read("terms_global")
    old_ids = {
        r["term"]: int(r["term_id"])
        for r in g_old.filter(
            F.col("bucket").isin(abuckets) & F.col("term").isin(affected)
        ).select("term", "term_id").collect()
    }
    next_id = int(g_old.agg(F.max("term_id")).collect()[0][0] or -1) + 1
    for t in affected:
        if t not in old_ids:
            old_ids[t] = next_id
            next_id += 1
    id_df = tiny_df(
        spark, sorted(old_ids.items()), "term string, term_id long"
    )
    g_aff = aff_flat.groupBy("term").agg(
        F.count("*").alias("df_global"), F.sum("tf").alias("cf_global")
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

    # --- posting blocks: encode the BATCH's postings, APPEND after the ------
    # existing blocks. Every new doc_id is ABOVE every already-encoded
    # doc_id (ids are max+1… appends), so the new blocks' doc ranges are
    # disjoint from and after all existing (term, shard) blocks — the query
    # kernel concatenates blocks in min_doc order, which stays a sorted
    # posting list. Existing block FILES are never read or rewritten; the
    # only corpus-sized state touched is a partition-PRUNED metadata read
    # of the touched shards' (term, block_id) pairs for id continuation.
    # Micro-batch cost is therefore O(batch), independent of corpus size.
    # (Repeated small appends leave ≤1 under-filled block per term per
    # batch — a background compaction = reindex of the shard via
    # replace_partitions squashes them; the kernel is count-agnostic.)
    new_shards = sorted(
        r["shard"]
        for r in docs_new.select(
            (F.col("doc_id") / F.lit(shard_size)).cast("long").alias("shard")
        ).distinct().collect()
    )
    sids = {r["site"]: int(r["sid"]) for r in cat.read("sites").collect()}
    new_sites = sorted(
        set(r["site"] for r in ids.select("site").distinct().collect()) - set(sids)
    )
    if new_sites:  # ids append — existing ids never shift
        for s in new_sites:
            sids[s] = max(sids.values(), default=-1) + 1
        cat.replace(
            tiny_df(spark, sorted(sids.items()), "site string, sid long"),
            "sites",
        )
    cfg_frozen = dataclasses.replace(cfg, docs_per_shard=shard_size)
    batch_flat = flat_new.drop("bucket")
    new_blocks = encode_posting_blocks(
        batch_flat, n_docs, avgdl, cat.read("terms_global"), cfg_frozen,
        documents=docs_new.select("doc_id", "conv_id", "turn_idx", "site", "doc_len"),
        site_ids=sids,
    )
    existing_ids = (
        cat.read("postings")
        .filter(F.col("shard").isin(new_shards))  # partition-pruned
        .groupBy("term", F.col("shard").cast("long").alias("shard"))
        .agg(F.max("block_id").alias("_max_bid"))
    )
    appended = (
        new_blocks.join(existing_ids, ["term", "shard"], "left")
        .withColumn(
            "block_id",
            F.col("block_id") + F.coalesce(F.col("_max_bid") + 1, F.lit(0)),
        )
        .drop("_max_bid")
    )
    cat.write(
        appended, "postings", mode="append", partition_by=["shard"],
        sort_by=["term"],
    )

    return int(n_new)


def stream_transcripts(
    spark: SparkSession,
    input_path: str,
    warehouse: str,
    checkpoint: str,
    cfg: EngineConfig | None = None,
    available_now: bool = True,
):
    """``readStream`` over a transcript parquet directory → foreachBatch
    append into the index. Returns the StreamingQuery (caller awaits it).

    ``available_now=True`` processes everything currently in the directory
    then stops (incremental catch-up); ``False`` keeps listening with the
    default micro-batch trigger. The checkpoint dir gives exactly-once file
    tracking across restarts (M3's resume semantics for the stream)."""
    cfg = cfg or EngineConfig()
    src = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_path)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        append_turns(spark, warehouse, batch_df, cfg)

    writer = src.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
