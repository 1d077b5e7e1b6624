"""Pure-CPU+memory parallel box calibration (VERDICT r4 #3).

Measures what the BOX can do, independent of Spark and of the engine: k
simultaneous subprocesses each run the SAME fixed numpy workload (memory-
bandwidth-dominated elementwise passes over a ~190 MB array — the same
resource profile as a shuffle/scan pipeline). On ideal hardware the wall
time is k-invariant (independent processes, enough cores); the measured
ratio t(k)/t(1) is the box's own parallel slowdown, i.e. the CEILING any
engine's k-core scaling efficiency can reach here:

    box_parallel_eff(k) = t(1) / t(k)        (1.0 = no contention)

Two consumers:
- ``python scripts/calibrate_box.py`` sweeps k ∈ {1, 2, 4, 8} (median of
  3) and prints one JSON line — the written calibration for BENCH.
- ``--one K`` runs a single k=K measurement and prints the seconds — the
  per-child PINNED PARALLEL SENTINEL used by scripts/bench_build.py.
  Unlike the 1-thread range-sum sentinel (which round 4 showed
  over-corrects a multi-core pipeline under burst throttle), this probe
  exercises the shared memory bus the way the build does, and because it
  spawns its own subprocesses it uses the same resources in every child
  regardless of the child's local[N] setting — so the cross-child ratio
  is a like-for-like host-drift measure.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time

PASS_ELEMS = 24_000_000  # 192 MB of float64: bandwidth-dominated
PASSES = 6
ALU_ELEMS = 200_000      # 1.6 MB: cache-resident, ALU-dominated
ALU_PASSES = 900


def _worker(mode: str) -> None:
    import numpy as np

    if mode == "alu":
        x = np.arange(ALU_ELEMS, dtype=np.float64)
        s = 0.0
        for _ in range(ALU_PASSES):
            x = x * 1.0000001 + 1.0
            s += float(x[::4096].sum())
    else:
        x = np.arange(PASS_ELEMS, dtype=np.float64)
        s = 0.0
        for _ in range(PASSES):
            x *= 1.0000001
            x += 1.0
            s += float(x[::4096].sum())
    # consume s so the work can't be elided
    sys.exit(0 if s == s else 1)


def timed_parallel(k: int, mode: str = "mem") -> float:
    """Wall seconds for k SIMULTANEOUS copies of the fixed workload."""
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--inner-worker", mode]
        )
        for _ in range(k)
    ]
    codes = [p.wait() for p in procs]
    if any(codes):
        raise RuntimeError(f"calibration worker failed: {codes}")
    return time.time() - t0


def main() -> None:
    if "--inner-worker" in sys.argv:
        i = sys.argv.index("--inner-worker")
        _worker(sys.argv[i + 1] if len(sys.argv) > i + 1 else "mem")
        return
    if "--one" in sys.argv:
        k = int(sys.argv[sys.argv.index("--one") + 1])
        print(round(timed_parallel(k), 4))
        return
    if "--paired" in sys.argv:
        # INTERLEAVED k_lo/k_hi pairs: per-pair efficiency t(lo)/t(hi)
        # cancels minute-scale host drift that sequential sweeps alias
        # into the ratio; the median of per-pair effs is the headline.
        k_lo, k_hi = (
            int(x) for x in sys.argv[sys.argv.index("--paired") + 1].split(",")
        )
        mode = "mem"
        if "--mode" in sys.argv:
            mode = sys.argv[sys.argv.index("--mode") + 1]
        n = 9
        if "--reps" in sys.argv:
            n = int(sys.argv[sys.argv.index("--reps") + 1])
        timed_parallel(k_lo, mode)
        timed_parallel(k_hi, mode)  # warm both shapes
        pairs = []
        for _ in range(n):
            t_lo = timed_parallel(k_lo, mode)
            t_hi = timed_parallel(k_hi, mode)
            pairs.append((round(t_lo, 3), round(t_hi, 3),
                          round(t_lo / t_hi, 3)))
        effs = sorted(p[2] for p in pairs)
        print(json.dumps({
            "mode": mode, "k_lo": k_lo, "k_hi": k_hi, "pairs": pairs,
            "eff_median": effs[len(effs) // 2],
            "eff_min": effs[0], "eff_max": effs[-1],
        }))
        return
    ks = [1, 2, 4, 8]
    if "--ks" in sys.argv:
        ks = [int(x) for x in sys.argv[sys.argv.index("--ks") + 1].split(",")]
    modes = ["mem", "alu"]
    if "--mode" in sys.argv:
        modes = [sys.argv[sys.argv.index("--mode") + 1]]
    reps = 5
    out = {"elems": PASS_ELEMS, "passes": PASSES, "reps": reps}
    for mode in modes:
        res = {}
        t1 = None
        for k in ks:
            # first run per k is consistently 2-4× slow (page-cache /
            # frequency-ramp cold start — measured): warm up and discard it
            timed_parallel(k, mode)
            ts = [timed_parallel(k, mode) for _ in range(reps)]
            med = statistics.median(ts)
            if k == ks[0]:
                t1 = med
            res[str(k)] = {
                "wall_s": round(med, 3),
                "samples": [round(t, 3) for t in ts],
                "box_parallel_eff": round(t1 / med, 3),
            }
        out[mode] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
