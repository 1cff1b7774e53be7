"""Round-5c diagnostic experiments — run AFTER the v2 session finishes.

Three questions, each answered by direct measurement (records land in
BENCH/r5c/experiments.jsonl; nothing here is a graded pair):

E1  Does prepared-statement batching (stable_seq_range) remove the
    per-batch JIT burn? Slice at 1 and 4 cores with BENCH_STABLE_PLAN
    on vs off; compare jit_ms inside the steady window and eps.

E2  Is the ~20-25% per-event CPU inflation at local[4] intra-JVM or
    hardware? Four CONCURRENT single-core bench JVMs, each pinned to
    its own CPU with its own table (embarrassing parallelism — an
    upper bound for 4-way hardware scaling). If aggregate ≈ 4× the
    solo 1-core rate, the memory bus is NOT the limit and the
    inflation lives inside the shared executor JVM; separate-process
    executors (E3) should then recover it.

E3  Does the engine scale across real executor PROCESSES? One job on
    local-cluster[1,1,6144] vs local-cluster[4,1,6144] — separate
    executor JVMs, the actual topology of the north rule's "N vs 4N
    executors". Wall + CPU throughput at both.

Usage: python BENCH/r5c_experiments.py [e1|e2|e3|all]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(HERE, "r5c")
LOG = os.path.join(OUT, "experiments.jsonl")

spec = importlib.util.spec_from_file_location("rs", os.path.join(HERE, "run_scaling.py"))
rs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rs)

STEADY = 2_000_000
WARM = 500_000


def log(rec: dict) -> None:
    os.makedirs(OUT, exist_ok=True)
    rec = {"t": round(time.time()), **rec}
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def slice_env(stable: bool) -> dict:
    return {
        **os.environ,
        "BENCH_EVENTS": str(WARM + STEADY),
        "BENCH_BATCH": str(WARM),
        "BENCH_WARMUP": str(WARM),
        "BENCH_KEYS": str(rs.N_KEYS),
        "BENCH_CONTENT_REPEAT": str(rs.CONTENT_REPEAT),
        "BENCH_BUCKETS": str(rs.N_BUCKETS),
        "BENCH_SKIP_QUERIES": "1",
        "BENCH_SLICE": "1",
        "BENCH_STABLE_PLAN": "1" if stable else "0",
        "TMPDIR": "/dev/shm",
        "SPARK_LOCAL_DIRS": "/dev/shm",
    }


def run_one(cpu_list: str, cores: int, stable: bool, master: str | None = None) -> dict:
    env = slice_env(stable)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    if master:
        env["BENCH_MASTER"] = master
    cmd = ["taskset", "-c", cpu_list, sys.executable, os.path.join(REPO, "bench.py")]
    t0 = time.time()
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1800)
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        return {"error": (out.stderr or "")[-2000:], "wall_total": round(time.time() - t0, 1)}
    rec = json.loads(lines[-1])
    seg = rec["segments_detail"][0]
    return {
        "cpu_list": cpu_list, "cores": cores, "stable": stable,
        "master": master or f"local[{cores}]",
        "events": seg["events"], "wall_s": seg["wall_s"], "cpu_s": seg["cpu_s"],
        "eps": seg["eps"], "eps_cpu": seg["eps_cpu"],
        "gc_ms": seg["diag"].get("gc_ms"), "jit_ms": seg["diag"].get("jit_ms"),
        "stime_s": seg["diag"].get("stime_s"),
    }


def e1() -> None:
    for stable in (False, True):
        for cpu_list, cores in (("0", 1), ("0-3", 4)):
            probe = rs.machine_probe()
            r = run_one(cpu_list, cores, stable)
            log({"exp": "e1", "probe": probe, **r})


def e2() -> None:
    probe = rs.machine_probe()
    # solo reference first
    solo = run_one("0", 1, True)
    log({"exp": "e2_solo", "probe": probe, **solo})
    procs = []
    t0 = time.time()
    for cpu in range(4):
        env = slice_env(True)
        env["SPARK_GRAFT_CPUS"] = "1"
        cmd = ["taskset", "-c", str(cpu), sys.executable, os.path.join(REPO, "bench.py")]
        procs.append(subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.DEVNULL, text=True))
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
        if lines:
            seg = json.loads(lines[-1])["segments_detail"][0]
            results.append({"eps": seg["eps"], "wall_s": seg["wall_s"],
                            "cpu_s": seg["cpu_s"], "jit_ms": seg["diag"].get("jit_ms")})
    agg = sum(r["eps"] for r in results) if results else None
    log({"exp": "e2_concurrent4x1", "wall_total": round(time.time() - t0, 1),
         "per_proc": results, "aggregate_eps": agg,
         "solo_eps": solo.get("eps"),
         "hw_scaling_4x": round(agg / (4 * solo["eps"]), 3) if agg and solo.get("eps") else None})


def e3() -> None:
    for n, cpu_list in ((1, "0"), (4, "0-3")):
        probe = rs.machine_probe()
        r = run_one(cpu_list, n, True, master=f"local-cluster[{n},1,6144]")
        log({"exp": "e3", "n_executors": n, "probe": probe, **r})


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("e1", "all"):
        e1()
    if which in ("e2", "all"):
        e2()
    if which in ("e3", "all"):
        e3()
