"""Child benchmark job: build the full index over a transcript fixture and
time it. Launched by bench_scaling.py via spark-submit at two parallelism
levels (the sandbox stand-in for N vs 4N executors — BASELINE.md).

Usage: spark-submit --py-files se.zip scripts/bench_build.py \
           <cores> <fixture_parquet> <warehouse> <out_json> [--queries]
"""

from __future__ import annotations

import json
import statistics
import sys
import time


def _sentinel(spark) -> float:
    """Pinned host-speed probe (median of 3): a fixed single-partition
    range-sum. One partition → one core regardless of local[N], so the number
    is comparable ACROSS the pair's children; the ratio hi/lo is the relative
    host throttle between the two runs (round-3's order-flip study showed the
    second child of a pair runs on a credit-throttled box — this makes that
    bias measurable instead of inferred)."""
    samples = []
    for i in range(4):  # first run warms codegen; drop it
        t0 = time.time()
        spark.range(16_000_000, numPartitions=1).selectExpr(
            "sum(id * 2 + 1) as s"
        ).collect()
        if i:
            samples.append(time.time() - t0)
    return statistics.median(samples)


def _par_sentinel() -> float | None:
    """Pinned PARALLEL host probe (median of 3 after warmup): 4 simultaneous
    subprocesses of calibrate_box.py's fixed bandwidth-bound workload —
    independent of this child's local[N], so the cross-child ratio measures
    the box's MULTI-CORE capacity drift, the resource a 1-thread probe
    misses (round 4 showed single-thread sentinels over-correct a 32-way
    pipeline under burst throttle)."""
    import os
    import subprocess

    cal = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "calibrate_box.py")
    if not os.path.exists(cal):
        return None
    try:
        samples = []
        for i in range(4):
            out = subprocess.run(
                [sys.executable, cal, "--one", "4"],
                capture_output=True, text=True, timeout=300, check=True,
            )
            if i:  # drop the cold first run
                samples.append(float(out.stdout.strip()))
        return statistics.median(samples)
    except Exception:
        return None


def main() -> None:
    cores = int(sys.argv[1])
    fixture_parquet = sys.argv[2]
    warehouse = sys.argv[3]
    out_json = sys.argv[4]
    run_queries = "--queries" in sys.argv[5:]
    # --skip-build: reuse an already-built warehouse and only time queries —
    # used to re-measure latency after a search-path change without paying a
    # full rebuild (the index bytes are unaffected by query-side code)
    skip_build = "--skip-build" in sys.argv[5:]

    from searchengine_spark.config import EngineConfig
    from searchengine_spark.engine import SearchEngine
    from searchengine_spark.session import get_spark
    from searchengine_spark.sources.transcripts import TRANSCRIPTS_SCHEMA

    import os

    # SPARK_MASTER may point at a real cluster (spark://...) — the round-5
    # standalone-cluster pair, where <cores> counts single-core executor
    # JVMs instead of local-mode threads; default stays local[cores].
    #
    # SE_TASKS_PER_SLOT: tasks per executor slot (Spark's standard cluster
    # sizing is 2-3 tasks/core so faster executors steal work and a straggler
    # costs a task, not a stage — with 1 task/slot a 4-executor stage has
    # ZERO rebalance slack and any one executor's jitter is a full-stage
    # tail). Default 1 preserves comparability with earlier recorded runs.
    tasks_per_slot = int(os.environ.get("SE_TASKS_PER_SLOT", "1"))
    par = cores * tasks_per_slot
    spark = get_spark(
        app_name=f"bench_build_{cores}",
        master=os.environ.get("SPARK_MASTER", f"local[{cores}]"),
        shuffle_partitions=par,
    )
    transcripts = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(fixture_parquet)
    # SE_DOCS_PER_SHARD pins the index geometry (shard count is a property
    # of the DATA on a real deployment, not of the cluster size) so the N-
    # and 4N-executor children build byte-identical indexes and differ only
    # in compute resources; unset → per-child derived geometry (pre-r5).
    dps = os.environ.get("SE_DOCS_PER_SHARD")
    # broadcast gate follows the engine default unless explicitly
    # overridden: the old pinned 20M here bypassed config.py's 4M
    # OOM-safety gate and broadcast a ~1.5 GB hash relation into 2 GiB
    # executors on the 15.5M-doc fixture (bench4 at 3.9M docs broadcasts
    # either way, so recorded pairs stay comparable)
    extra = {}
    if "SE_BCAST_MAX" in os.environ:
        extra["broadcast_ids_max"] = int(os.environ["SE_BCAST_MAX"])
    cfg = EngineConfig(
        parallelism=par,
        docs_per_shard=int(dps) if dps else None,
        **extra,
    )
    eng = SearchEngine(spark, warehouse, cfg)

    sent_pre = _sentinel(spark)
    par_pre = _par_sentinel()
    if skip_build:
        out = {
            "cores": cores,
            "sentinel_s": round(sent_pre, 4),
            "sentinel_par4_s": round(par_pre, 4) if par_pre else None,
            "skip_build": True,
        }
    else:
        t0 = time.time()
        res = eng.build(transcripts, resume=False)
        build_s = time.time() - t0
        sent_post = _sentinel(spark)
        par_post = _par_sentinel()
        par_both = [p for p in (par_pre, par_post) if p]

        out = {
            "cores": cores,
            "parallelism": par,
            "docs_per_shard": int(dps) if dps else None,
            "sentinel_s": round(statistics.median([sent_pre, sent_post]), 4),
            "sentinel_pre_s": round(sent_pre, 4),
            "sentinel_post_s": round(sent_post, 4),
            "sentinel_par4_s": (
                round(statistics.median(par_both), 4) if par_both else None
            ),
            "sentinel_par4_pre_s": round(par_pre, 4) if par_pre else None,
            "sentinel_par4_post_s": round(par_post, 4) if par_post else None,
            "n_docs": res.n_docs,
            "build_seconds": round(build_s, 2),
            "turns_per_sec": round(res.n_docs / build_s, 2),
            "postings_per_sec": round(
                res.metrics.get("postings.rows", 0) / build_s, 2
            ),
            "partition_skew": round(res.metrics.get("postings.partition_skew", 0), 3),
            "stage_seconds": {
                k.split(".")[0]: round(v, 2)
                for k, v in res.metrics.items()
                if k.endswith(".seconds")
            },
        }

    if run_queries:
        from searchengine_spark.queryset import REFERENCE_QUERIES
        from searchengine_spark.operators.search import EmptySearchQueryError

        # warm up JVM codegen / python workers once so the timed numbers
        # reflect the stated "warm index" condition, not first-job compile
        try:
            eng.search("hotalpha", mode="bm25")
        except Exception:
            pass
        lat: dict[str, dict[str, float]] = {}
        for mode in ["reference", "bm25"]:
            samples = []
            per_q = {}
            for q in REFERENCE_QUERIES:
                try:
                    t0 = time.time()
                    eng.search(q, mode=mode)
                    dt = time.time() - t0
                except EmptySearchQueryError:
                    continue
                samples.append(dt)
                per_q[q] = round(dt, 4)
            samples.sort()
            lat[mode] = {
                "p50_s": round(statistics.median(samples), 4),
                "p95_s": round(samples[min(len(samples) - 1, int(0.95 * len(samples)))], 4),
                "queries": per_q,
            }
        out["query_latency"] = lat

    with open(out_json, "w") as f:
        json.dump(out, f)
    print("BENCH_CHILD_DONE", json.dumps(out))


if __name__ == "__main__":
    main()
