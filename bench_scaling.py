"""Scaling-efficiency benchmark (BASELINE.md / north_rule evidence).

The north rule requires ≥0.8 throughput scaling efficiency between N and 4N
executors. No real cluster exists in this sandbox, so (per BASELINE.md) the
same spark-submit job runs at two parallelism levels on the same synthetic
transcript fixture, and efficiency = (throughput_4N / throughput_N) / 4.

Default pair is local[2] vs local[8] (N=2): the box's ~32 vCPUs share one
memory bus and one disk, and measured throughput saturates around 8-10
concurrent cores — local[16]/local[32] measure that saturation, not the
engine's scaling (a real 4N-executor cluster brings 4N× memory bandwidth
and disks). BENCH/BASELINE.md records the full 1..32-core sweep.

Steps:
1. generate (once, seeded) the fixture → parquet cache (multi-row-group!);
2. package searchengine_spark as a zip;
3. spark-submit --py-files se.zip scripts/bench_build.py at N and 4N cores
   (fresh warehouse each, cold build; JVM memory = 2 GiB × cores);
4. write BENCH/BASELINE.md with throughput, efficiency, query p50/p95.

Usage: python bench_scaling.py [--fixture bench|bench4|small] [--cores 2,8]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.environ.get("SE_BENCH_CACHE", "/tmp/se_bench_cache")


def ensure_fixture(name: str) -> str:
    path = os.path.join(CACHE, f"transcripts_{name}.parquet")
    if not os.path.exists(path):
        os.makedirs(CACHE, exist_ok=True)
        print(f"generating fixture {name!r} (seeded, one-time)...", flush=True)
        from searchengine_spark.sources.transcripts import generate_transcripts

        t0 = time.time()
        pdf = generate_transcripts(name)
        # many row groups, not one: Spark splits parquet by row group — a
        # single-row-group file would run every downstream task on one core
        # no matter the cluster size (real tables have many files anyway)
        pdf.to_parquet(path + ".tmp", index=False, row_group_size=65536)
        os.rename(path + ".tmp", path)
        print(f"  {len(pdf)} turns in {time.time() - t0:.0f}s → {path}", flush=True)
    return path


def make_zip() -> str:
    zpath = os.path.join(tempfile.mkdtemp(prefix="se_zip_"), "se.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "searchengine_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_child(
    cores: int,
    fixture_path: str,
    zip_path: str,
    queries: bool,
    cluster_url: str | None = None,
) -> dict:
    wh = tempfile.mkdtemp(prefix=f"se_bench_wh{cores}_")
    out_json = os.path.join(wh, "result.json")
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    # memory scales with cores (2 GiB/core): a real 4N-executor cluster
    # brings 4× the aggregate memory, so the single-JVM stand-in must too —
    # otherwise per-task memory shrinks with "cluster size" and the
    # comparison measures GC pressure, not scaling
    mem = os.environ.get("SPARK_DRIVER_MEMORY", f"{2 * cores}g")
    if cluster_url:
        # REAL multi-executor run (round 5): <cores> single-core 2 GiB
        # executor JVMs on a localhost standalone cluster — the faithful
        # shape of the north rule's "N and 4N executors" (each executor is
        # its own JVM with its own heap/GC, shuffle crosses process
        # boundaries); the driver gets a fixed 4g on both sides so only
        # the executor count varies across the pair
        master = cluster_url
        cmd = [
            spark_submit,
            "--master", cluster_url,
            "--driver-memory", os.environ.get("SPARK_DRIVER_MEMORY", "4g"),
            "--executor-cores", "1",
            "--executor-memory", "2g",
            "--total-executor-cores", str(cores),
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "bench_build.py"),
            str(cores), fixture_path, wh, out_json,
        ] + (["--queries"] if queries else [])
        print(f"→ {cores} executors @ {cluster_url}: "
              f"{' '.join(cmd[-6:])}", flush=True)
    else:
        master = f"local[{cores}]"
        cmd = [
            spark_submit,
            "--master", master,
            "--driver-memory", mem,
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "bench_build.py"),
            str(cores), fixture_path, wh, out_json,
        ] + (["--queries"] if queries else [])
        print(f"→ local[{cores}]: {' '.join(cmd[-6:])}", flush=True)
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=3600,
        env={**os.environ, "SPARK_MASTER": master,
             "PYSPARK_PYTHON": sys.executable},
    )
    if proc.returncode != 0 or not os.path.exists(out_json):
        sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-5000:])
        raise RuntimeError(f"child at {cores} cores failed")
    with open(out_json) as f:
        res = json.load(f)
    res["wall_seconds"] = round(time.time() - t0, 1)
    shutil.rmtree(wh, ignore_errors=True)
    return res


def run_children_concurrent(
    cores: int, n: int, fixture_path: str, zip_path: str
) -> list[dict]:
    """n SIMULTANEOUS, fully independent local[cores] children.

    Zero coordination between them (separate JVMs, separate warehouses,
    same read-only fixture): whatever efficiency they achieve versus n×
    a lone child is the BOX's own capacity for n copies of this exact
    workload — an upper bound on any engine's n-way scaling here.
    """
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    mem = os.environ.get("SPARK_DRIVER_MEMORY", f"{2 * cores}g")
    procs = []
    for i in range(n):
        wh = tempfile.mkdtemp(prefix=f"se_bench_quad{i}_")
        out_json = os.path.join(wh, "result.json")
        cmd = [
            spark_submit,
            "--master", f"local[{cores}]",
            "--driver-memory", mem,
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "bench_build.py"),
            str(cores), fixture_path, wh, out_json,
        ]
        procs.append((
            subprocess.Popen(
                cmd, cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True,
                env={**os.environ, "SPARK_MASTER": f"local[{cores}]"},
            ),
            wh, out_json,
        ))
    print(f"→ {n} simultaneous local[{cores}] children", flush=True)
    results = []
    for p, wh, out_json in procs:
        out, err = p.communicate(timeout=5400)
        if p.returncode != 0 or not os.path.exists(out_json):
            sys.stderr.write(out[-2000:] + "\n" + err[-4000:])
            raise RuntimeError("concurrent child failed")
        with open(out_json) as f:
            results.append(json.load(f))
        shutil.rmtree(wh, ignore_errors=True)
    return results


def quad_ceiling(fixture: str, fixture_path: str, zip_path: str) -> None:
    """Box-ceiling experiment (round-5 scaling evidence).

    Phase 1: one lone local[1] build (tp_single).
    Phase 2: four simultaneous, fully-independent local[1] builds of the
    same fixture (aggregate throughput Σ tp_i while all four run).

    box_ceiling_eff = Σtp_quad / (4 · tp_single). No shuffle, no shared
    JVM, no engine coordination exists between the four copies, so this
    ratio is what the BOX can deliver for 4× this workload — the ceiling
    any 1→4-core measurement of the engine (which DOES coordinate) can
    reach. Engine-relative efficiency = eff_pair / box_ceiling_eff.
    """
    single = run_child(1, fixture_path, zip_path, queries=False)
    quad = run_children_concurrent(1, 4, fixture_path, zip_path)
    tp1 = single["turns_per_sec"]
    tps = sorted(r["turns_per_sec"] for r in quad)
    agg = round(sum(tps), 2)
    ceiling = round(agg / (4 * tp1), 3)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# Box-ceiling experiment: 4 independent single-core builds

Phase 1 — lone `local[1]` build of `{fixture}`:
**{tp1} turns/s** (build {single['build_seconds']} s; par4 sentinel
pre/post {single.get('sentinel_par4_pre_s')}/{single.get('sentinel_par4_post_s')} s).

Phase 2 — FOUR simultaneous, fully-independent `local[1]` builds of the
same fixture (separate JVMs/warehouses, zero coordination, started
together; run immediately after phase 1):

| child | build s | turns/s |
|---|---|---|
""" + "\n".join(
        f"| {i} | {r['build_seconds']} | {r['turns_per_sec']} |"
        for i, r in enumerate(quad)
    ) + f"""

Aggregate throughput while all four ran: **{agg} turns/s**.

**box_ceiling_eff = Σtp_quad / (4 · tp_single) = {ceiling}**

There is no shuffle, no shared state, and no engine coordination between
the four phase-2 copies — the only shared resources are the host's memory
bus, LLC, and disk. This ratio is therefore the box's OWN capacity for 4×
this exact workload, and an upper bound on any 1→4-core scaling
efficiency measurable for it here. (Quad-phase per-child sentinels time a
16-way probe storm and are not comparable to lone-child sentinels.)

Raw child outputs:

```json
{json.dumps({'single': single, 'quad': quad}, indent=2)}
```
"""
    out_md = os.path.join(REPO, "BENCH", f"RUN_quad_ceiling_{fixture}.md")
    with open(out_md, "w") as f:
        f.write(md)
    print(json.dumps({
        "tp_single": tp1,
        "tp_quad_children": tps,
        "tp_quad_aggregate": agg,
        "box_ceiling_eff": ceiling,
        "report": out_md,
    }))


def ensure_cluster(worker_cores: int) -> str:
    """Start (or reuse) a localhost standalone master + worker.

    Returns the master URL. The worker offers ``worker_cores`` cores and
    2 GiB per core + 4 GiB slack, so a --total-executor-cores pair up to
    that size schedules immediately. Reused if port 7077 already answers.
    """
    import socket

    url = "spark://127.0.0.1:7077"
    with socket.socket() as s:
        s.settimeout(1.0)
        if s.connect_ex(("127.0.0.1", 7077)) == 0:
            return url
    spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
    env = {**os.environ, "SPARK_HOME": spark_home}
    subprocess.run(
        [os.path.join(spark_home, "sbin", "start-master.sh"),
         "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8089"],
        check=True, env=env, capture_output=True, text=True,
    )
    time.sleep(6)
    subprocess.run(
        [os.path.join(spark_home, "sbin", "start-worker.sh"),
         url, "--host", "127.0.0.1", "--cores", str(worker_cores),
         "--memory", f"{2 * worker_cores + 4}g", "--webui-port", "8090"],
        check=True, env=env, capture_output=True, text=True,
    )
    time.sleep(6)
    return url


def run_sequence(
    seq: list[int], fixture: str, fixture_path: str, zip_path: str,
    cluster_url: str | None, tag: str,
) -> None:
    """Back-to-back children in the given core order (e.g. 1,4,4,1 — an
    ABBA block: the forward pair from positions 0-1, the reverse pair from
    2-3; the geomean of an order-flipped pair cancels first-order host
    drift, and medians over all children of a size damp outliers)."""
    results = []
    for i, c in enumerate(seq):
        print(f"--- seq child {i + 1}/{len(seq)}: {c} executors ---", flush=True)
        r = run_child(c, fixture_path, zip_path, queries=False,
                      cluster_url=cluster_url)
        r["seq_pos"] = i
        results.append(r)
        print(json.dumps({k: r.get(k) for k in (
            "cores", "build_seconds", "turns_per_sec",
            "sentinel_par4_s", "parallelism")}), flush=True)

    by_cores: dict[int, list[float]] = {}
    for r in results:
        by_cores.setdefault(r["cores"], []).append(r["turns_per_sec"])
    import statistics as st
    med = {c: st.median(v) for c, v in by_cores.items()}
    lo, hi = min(med), max(med)
    eff_med = (med[hi] / med[lo]) / (hi / lo)
    # adjacent lo→hi / hi→lo pairs + their geomean
    pairs = []
    for a, b in zip(results, results[1:]):
        ca, cb = a["cores"], b["cores"]
        if ca != cb:
            e = (b["turns_per_sec"] / a["turns_per_sec"]) / (cb / ca)
            if cb < ca:
                e = 1.0 / e
            pairs.append({"order": f"{ca}->{cb}", "eff": round(e, 3)})
    geo = None
    if pairs:
        p = 1.0
        for x in pairs:
            p *= x["eff"]
        geo = round(p ** (1.0 / len(pairs)), 3)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = {
        "fixture": fixture,
        "cluster": bool(cluster_url),
        "tasks_per_slot": os.environ.get("SE_TASKS_PER_SLOT"),
        "docs_per_shard": os.environ.get("SE_DOCS_PER_SHARD"),
        "sequence": seq,
        "median_tp": {str(c): round(v, 2) for c, v in med.items()},
        "efficiency_of_medians": round(eff_med, 3),
        "adjacent_pairs": pairs,
        "pairs_geomean": geo,
        "children": results,
    }
    out_path = os.path.join(REPO, "BENCH", f"SEQ_{fixture}_{tag}.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in (
        "median_tp", "efficiency_of_medians", "adjacent_pairs",
        "pairs_geomean")}) + f"\nreport: {out_path}", flush=True)


def main() -> None:
    fixture = "bench"
    if "--fixture" in sys.argv:
        fixture = sys.argv[sys.argv.index("--fixture") + 1]
    if "--tasks-per-slot" in sys.argv:
        os.environ["SE_TASKS_PER_SLOT"] = (
            sys.argv[sys.argv.index("--tasks-per-slot") + 1])
    if "--docs-per-shard" in sys.argv:
        os.environ["SE_DOCS_PER_SHARD"] = (
            sys.argv[sys.argv.index("--docs-per-shard") + 1])
    # N=1 vs 4N=4 is the headline pair: it stays below this box's ~8-10-core
    # memory/disk saturation knee (BENCH/BASELINE.md), so it estimates the
    # real N→4N executor scale-up where each executor brings its own
    # bandwidth; run --cores 2,8 for the saturation-regime secondary pair
    lo, hi = 1, 4
    if "--cores" in sys.argv:
        lo, hi = (int(x) for x in sys.argv[sys.argv.index("--cores") + 1].split(","))
    fixture_path = ensure_fixture(fixture)
    zip_path = make_zip()

    if "--quad" in sys.argv:
        quad_ceiling(fixture, fixture_path, zip_path)
        return

    if "--seq" in sys.argv:
        seq = [int(x) for x in
               sys.argv[sys.argv.index("--seq") + 1].split(",")]
        tag = "cluster" if "--cluster" in sys.argv else "local"
        if "--tag" in sys.argv:
            tag = sys.argv[sys.argv.index("--tag") + 1]
        cluster_url = (ensure_cluster(max(seq))
                       if "--cluster" in sys.argv else None)
        run_sequence(seq, fixture, fixture_path, zip_path, cluster_url, tag)
        return

    cluster_url = None
    if "--cluster" in sys.argv:
        cluster_url = ensure_cluster(max(lo, hi))

    r8 = run_child(lo, fixture_path, zip_path, queries=False,
                   cluster_url=cluster_url)
    r32 = run_child(hi, fixture_path, zip_path, queries=True,
                    cluster_url=cluster_url)

    tp8, tp32 = r8["turns_per_sec"], r32["turns_per_sec"]
    eff = (tp32 / tp8) / (hi / lo)
    # canonicalize: a reversed invocation (--cores 4,1) measures the
    # downscale ratio, whose N→4N upscale efficiency is the reciprocal —
    # report THAT, so forward and reverse runs print comparable numbers
    # (RUN_4v1_bench4_cluster.md predates this and carries an erratum)
    if lo > hi:
        eff = 1.0 / eff
    # Per-child host-speed sentinels: the hi/lo time ratio is the relative
    # host throttle between the two runs. If the 4N child ran on a box f×
    # slower than the N child's, its quiet-box throughput would be ~f×
    # higher, so eff_drift_adj = eff_raw · f. r5 adds a PARALLEL pinned
    # sentinel (4 simultaneous subprocesses of a fixed bandwidth-bound
    # workload, independent of local[N]) — it sees the shared-bus capacity
    # a 1-thread probe misses, so it is preferred for the drift gate; the
    # serial sentinel stays for continuity. Old result JSONs lack the
    # fields → fall back gracefully.
    sent_lo = r8.get("sentinel_s")
    sent_hi = r32.get("sentinel_s")
    serial_drift = round(sent_hi / sent_lo, 3) if sent_lo and sent_hi else None
    par_lo = r8.get("sentinel_par4_s")
    par_hi = r32.get("sentinel_par4_s")
    par_drift = round(par_hi / par_lo, 3) if par_lo and par_hi else None
    pair_drift = par_drift if par_drift is not None else serial_drift
    # drift d = sentinel(second child)/sentinel(first): the SECOND child's
    # box slowness. Correcting the second child's tp by d moves the upscale
    # efficiency UP when the second child is the 4N side (forward order)
    # and DOWN when it is the N side (reversed order, eff inverted above).
    eff_adj = None
    if pair_drift:
        eff_adj = round(
            eff / pair_drift if lo > hi else eff * pair_drift, 3)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lat = r32.get("query_latency", {})
    md = f"""# BENCH/BASELINE.md — measured numbers

Fixture: `{fixture}` ({r8['n_docs']} indexed turns, seeded synthetic
transcript corpus per FIXTURES.md). Same input, same job
(`spark-submit --py-files se.zip scripts/bench_build.py`), two parallelism
levels — the sandbox substitution for N vs 4N executors (BASELINE.md).

## Index-build throughput & scaling

| cores | build s | turns/sec | postings/sec | partition skew (max/mean) |
|---|---|---|---|---|
| {r8['cores']} (N) | {r8['build_seconds']} | {tp8} | {r8['postings_per_sec']} | {r8['partition_skew']} |
| {r32['cores']} (4N) | {r32['build_seconds']} | {tp32} | {r32['postings_per_sec']} | {r32['partition_skew']} |

**Scaling efficiency (N→4N) = (tp_4N/tp_N)/4 = {eff:.3f}** (target ≥ 0.8)

Per-child host sentinels — serial (pinned 1-core range-sum):
N {r8.get('sentinel_s', 'n/a')} s, 4N {r32.get('sentinel_s', 'n/a')} s
(ratio {serial_drift}); PARALLEL (pinned 4-process bandwidth-bound probe,
independent of local[N] — the drift gate): N {par_lo or 'n/a'} s,
4N {par_hi or 'n/a'} s → pair drift {pair_drift};
**drift-adjusted efficiency = {eff_adj}**.

Stage breakdown (seconds): N cores {json.dumps(r8['stage_seconds'])}; 4N
cores {json.dumps(r32['stage_seconds'])}.

## Query latency (4N cores, warm index, reference query set, k=20)

| mode | p50 s | p95 s |
|---|---|---|
| reference (conjunctive Σtf) | {lat.get('reference', {}).get('p50_s', 'n/a')} | {lat.get('reference', {}).get('p95_s', 'n/a')} |
| bm25 (block-max WAND) | {lat.get('bm25', {}).get('p50_s', 'n/a')} | {lat.get('bm25', {}).get('p95_s', 'n/a')} |

Raw child outputs:

```json
{json.dumps({'cores8': r8, 'cores32': r32}, indent=2)}
```
"""
    if cluster_url:
        md = md.replace(
            "two parallelism\nlevels — the sandbox substitution for",
            "a REAL localhost standalone cluster —\nsingle-core 2 GiB "
            "executor JVMs, real cross-process shuffle — at two\n"
            "executor counts, the faithful shape of",
        )
    # BASELINE.md is the curated analysis (multiple pairs + saturation
    # context); raw per-run reports go to their own file
    suffix = "_cluster" if cluster_url else ""
    out_md = os.path.join(REPO, "BENCH", f"RUN_{lo}v{hi}_{fixture}{suffix}.md")
    with open(out_md, "w") as f:
        f.write(md)
    print(json.dumps({
        "cluster": bool(cluster_url),
        "efficiency": round(eff, 3),
        "pair_drift": pair_drift,
        "pair_drift_serial": serial_drift,
        "efficiency_drift_adjusted": eff_adj,
        "turns_per_sec_8": tp8,
        "turns_per_sec_32": tp32,
        "report": out_md,
    }))


if __name__ == "__main__":
    main()
