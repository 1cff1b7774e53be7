"""A/B: does pre-faulted memory defeat the host's page-fault-cost storm?

Context (BENCH/r5h/session.log, 2026-08-18 ~11:00-14:40 UTC): v4
cluster-executor pairs are probe-green but grade 0.45-0.65 because
random slices burn 20-45 s of system time; live thread sampling
(storm_sampler.py) showed the stime inside executor *task* threads,
and a direct probe measured anonymous-page fault cost at 2.6-3.3 us
(~15-30x normal) — the hypervisor's fault path oscillates. A
MAP_POPULATE probe showed pre-faulted pages stay cheap to re-touch.

Hypothesis: the engine's fault RATE is the exposure. Fresh executor
JVMs grow their heaps mid-slice (G1 commits pages lazily and uncommits
at concurrent cycles), and pyspark workers' Arrow/numpy buffers are
mmap'd and munmap'd per batch (glibc mmap threshold), so every batch
re-faults hundreds of MB. Pre-touching the heap at startup (outside
the measured window) and pinning worker allocations to a non-trimming
brk heap removes almost all measured-window faults.

B config (via BENCH_SPARK_CONF / executorEnv):
  spark.executor.memory=3g + -Xms3g -XX:+AlwaysPreTouch  (heap fully
    faulted at executor launch, never uncommitted)
  MALLOC_TRIM_THRESHOLD_=-1, MALLOC_MMAP_THRESHOLD_=1073741824,
    MALLOC_MMAP_MAX_=0  (worker glibc: big Arrow/numpy buffers come
    from a brk heap that is never trimmed -> pages fault once per
    worker lifetime, not once per batch)
  ARROW_DEFAULT_MEMORY_POOL=system  (route Arrow through that glibc
    heap instead of bundled jemalloc's madvise(DONTNEED) churn)

Usage: python BENCH/ab_pretouch.py [rounds]   (default 2 -> ABAB)
Appends one JSON line per slice to BENCH/r5h/ab_pretouch.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import run_scaling as rs  # noqa: E402

OUT = os.path.join(HERE, "r5h", "ab_pretouch.jsonl")

B_CONF = ";".join([
    "spark.executor.memory=3g",
    "spark.executor.extraJavaOptions=-Xms3g -XX:+AlwaysPreTouch",
    "spark.executorEnv.MALLOC_TRIM_THRESHOLD_=-1",
    "spark.executorEnv.MALLOC_MMAP_THRESHOLD_=1073741824",
    "spark.executorEnv.MALLOC_MMAP_MAX_=0",
    "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=system",
])


def fault_cost_us() -> float:
    """Current per-fault cost: touch 64 MB of fresh anon pages."""
    import mmap
    import resource
    n = 64 * 1024 * 1024
    t0 = time.time()
    r0 = resource.getrusage(resource.RUSAGE_SELF)
    m = mmap.mmap(-1, n)
    for i in range(0, n, 4096):
        m[i] = 1
    dt = time.time() - t0
    faults = resource.getrusage(resource.RUSAGE_SELF).ru_minflt - r0.ru_minflt
    m.close()
    return round(1e6 * dt / max(faults, 1), 3)


def one(arm: str) -> dict:
    if arm == "B":
        os.environ["BENCH_SPARK_CONF"] = B_CONF
    else:
        os.environ.pop("BENCH_SPARK_CONF", None)
    fc0 = fault_cost_us()
    t0 = time.time()
    try:
        seg = rs.run_slice(4, steady=8_000_000, warm=8_000_000, cluster=True)
    except Exception as e:  # noqa: BLE001
        seg = {"error": f"{type(e).__name__}: {e}"}
    rec = {
        "t": int(time.time()), "arm": arm, "fault_us_before": fc0,
        "fault_us_after": fault_cost_us(), "wall_total_s": round(time.time() - t0, 1),
        "seg": seg,
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec[k] for k in ("arm", "fault_us_before", "fault_us_after")}
                     | {"eps": seg.get("eps"), "stime": (seg.get("diag") or {}).get("stime_s"),
                        "wall": seg.get("wall_s"), "cpu": seg.get("cpu_s")}), flush=True)
    return rec


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for _ in range(rounds):
        one("A")
        one("B")


if __name__ == "__main__":
    main()
