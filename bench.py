"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the engine pipeline (index build over the documents corpus,
then reference/BM25 top-k through the compressed block path) + the heavier
analysis operators. Query latencies are medians of ``QUERY_REPS`` warm runs;
p95 of the per-run samples is reported under extras.

Scaling-efficiency evidence (BASELINE.md): run `python bench_scaling.py`,
which executes the same build at local[8] vs local[32] on the same input
and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# ---------------------------------------------------------------------------
# Host-drift sentinels: two PINNED operations that never change with engine
# code — a fixed arithmetic job (CPU-bound, no IO) and a fixed parquet
# scan+agg over the input dir (IO+decode-bound). Their quiet-box medians are
# recorded below; a bench run re-times them and reports
# host_drift = median(measured / baseline), so a degraded box (round-3's
# unattributable 24% regression: unchanged operators measured 2-4x slower)
# self-identifies instead of poisoning the headline. extras carries both the
# raw sentinel seconds and the drift factor; value_normalized = value/drift.
# ---------------------------------------------------------------------------
SENTINEL_BASELINE = {  # quiet-box medians, local[32], recorded 2026-08-17 (r4)
    "range_agg": 0.19,
    "scan_agg": 0.29,
}


def _sentinels(spark, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    out: dict[str, float] = {}
    t0 = time.time()
    spark.range(64_000_000).selectExpr("sum(id * 2 + 1) as s").collect()
    out["range_agg"] = time.time() - t0
    t0 = time.time()
    (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .agg(F.count("*"), F.sum(F.length("text")))
        .collect()
    )
    out["scan_agg"] = time.time() - t0
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    from searchengine_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    import __spark_entry__ as entrymod
    from searchengine_spark.analysis import ann, dedup, textstats

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn, reps: int = 1) -> None:
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 4)
        if reps > 1:
            qs = sorted(samples)
            extras[f"{name}_p95"] = round(qs[min(len(qs) - 1, int(0.95 * len(qs)))], 4)

    # ---- host-drift sentinels (pre-pipeline: 2 warmup + 3 timed) ----------
    _sentinels(spark, sf_dir)  # warm JVM/codegen/page cache once
    sentinel_samples = [_sentinels(spark, sf_dir) for _ in range(3)]

    # ---- index build (cold): documents corpus → compressed block index ----
    t0 = time.time()
    eng = entrymod._engine(spark, sf_dir)
    build_s = time.time() - t0
    timings["build_index"] = round(build_s, 4)
    n_docs = eng.searcher.n_docs
    extras["build_turns_per_sec"] = round(n_docs / max(build_s, 1e-9), 2)

    # ---- query serving through the block path -----------------------------
    REPS = 5
    timed(
        "search_ref",
        lambda: eng.search(" ".join(entrymod.REF_QUERY_TERMS), mode="reference"),
        reps=REPS,
    )
    # search_bm25 = the pruned serving path (block-max WAND, lower-bound
    # count, exact_count=False opt-in); search_bm25_exact = the public-API
    # default (exact candidate count, full decode of query-term postings)
    timed(
        "search_bm25",
        lambda: eng.search(
            " ".join(entrymod.BM25_QUERY_TERMS), mode="bm25", exact_count=False
        ),
        reps=REPS,
    )
    timed(
        "search_bm25_exact",
        lambda: eng.search(
            " ".join(entrymod.BM25_QUERY_TERMS), mode="bm25", exact_count=True
        ),
        reps=REPS,
    )

    docs = entrymod._documents(spark, sf_dir)
    emb = entrymod._embeddings(spark, sf_dir)

    # ---- analysis operators (count() forces full execution) ---------------
    timed("dedup_exact", lambda: dedup.exact_duplicates(docs).count())
    timed("minhash_sig", lambda: dedup.minhash_signatures(docs).count())
    timed("simhash", lambda: dedup.simhash(docs).count())
    timed("fingerprint", lambda: textstats.fingerprint(docs).count())
    timed("token_stats", lambda: textstats.token_stats(docs).count())
    timed("lang_id", lambda: textstats.lang_id(docs).count())
    timed(
        "ann_topk",
        lambda: ann.cosine_topk(emb, entrymod.ANN_PROBES, dim=entrymod.EMBED_DIM).count(),
    )
    timed(
        "embed_neardup",
        lambda: ann.lsh_bucket_pairs(
            emb, threshold=entrymod.EMBED_TAU, n_bits=entrymod.ENTRY_LSH_BITS
        ).count(),
    )
    # IVF is benched in its SERVED shape (r4): quantizer training + corpus
    # assignment happen once in ann_ivf_build (what r3's ann_ivf re-ran per
    # call); ann_ivf_serve is the per-query cost — a partition-pruned list
    # scan against the persisted index, the 100-TB serving path.
    timed(
        "ann_ivf_build",
        lambda: ann.build_ivf_index(
            emb, eng.catalog, n_centroids=entrymod.IVF_CENTROIDS
        ),
    )
    timed(
        "ann_ivf_serve",
        lambda: ann.ivf_topk_indexed(
            emb, eng.catalog, entrymod.ANN_PROBES, nprobe=entrymod.IVF_NPROBE
        ).count(),
        reps=3,
    )

    # ---- host-drift sentinels (post-pipeline: 2 more timed samples) --------
    sentinel_samples += [_sentinels(spark, sf_dir) for _ in range(2)]
    drifts = []
    for key, base in SENTINEL_BASELINE.items():
        med = statistics.median(s[key] for s in sentinel_samples)
        extras[f"sentinel_{key}"] = round(med, 4)
        drifts.append(med / base)
    host_drift = round(statistics.median(drifts), 3)
    extras["host_drift"] = host_drift

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline pipeline seconds (index build + block-path search + analysis ops)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "cpus": cpus,
        "n_docs": n_docs,
        "extras": extras,
        # headline scaled by the sentinel drift factor: what a quiet box
        # would have measured (>1 drift = this box is slower than baseline)
        "value_normalized": round(total / max(host_drift, 1e-9), 4),
    }
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
