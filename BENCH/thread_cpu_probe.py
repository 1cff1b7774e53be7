"""Per-thread CPU attribution for a bench slice: sample every JVM/python
thread's utime+stime (by thread name) at the start and end of the steady
window, print the top burners. Answers: which threads consume the ~25%
per-event CPU inflation at 4-way parallelism that four independent
single-core pipelines (E2) do not show?

Usage: python BENCH/thread_cpu_probe.py <cores> [steady_events]
Runs bench.py itself (slice mode) in a taskset-pinned subprocess and
samples its whole process tree around the steady window by watching for
the warm-up batch's completion in run.json... simpler: sample the tree
at 1 Hz for the whole run and report the per-thread-name deltas over the
final 60% of samples (the steady window dominates the tail).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLK = os.sysconf("SC_CLK_TCK")


def tree_pids(root: int) -> list[int]:
    out, stack = [], [root]
    children = defaultdict(list)
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat", "rb") as f:
                data = f.read()
        except OSError:
            continue
        rp = data.rfind(b")")
        ppid = int(data[rp + 2:].split()[1])
        children[ppid].append(int(pid))
    while stack:
        p = stack.pop()
        out.append(p)
        stack.extend(children.get(p, []))
    return out


def sample(root: int) -> dict[str, float]:
    """thread-name -> cumulative cpu seconds over the process tree."""
    acc: dict[str, float] = defaultdict(float)
    for pid in tree_pids(root):
        tdir = f"/proc/{pid}/task"
        try:
            tids = os.listdir(tdir)
        except OSError:
            continue
        for tid in tids:
            try:
                with open(f"{tdir}/{tid}/stat", "rb") as f:
                    data = f.read()
            except OSError:
                continue
            lp = data.find(b"(")
            rp = data.rfind(b")")
            name = data[lp + 1:rp].decode(errors="replace")
            fields = data[rp + 2:].split()
            acc[name] += (int(fields[11]) + int(fields[12])) / CLK
    return dict(acc)


def group(name: str) -> str:
    import re
    n = re.sub(r"\d+", "N", name)
    return n


def main() -> None:
    cores = int(sys.argv[1])
    steady = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    warm = 2_000_000
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cores),
        "BENCH_EVENTS": str(warm + steady),
        "BENCH_BATCH": str(warm),
        "BENCH_WARMUP": str(warm),
        "BENCH_KEYS": "1000000",
        "BENCH_CONTENT_REPEAT": "16",
        "BENCH_BUCKETS": "16",
        "BENCH_SKIP_QUERIES": "1",
        "BENCH_SLICE": "1",
        "TMPDIR": "/dev/shm",
        "SPARK_LOCAL_DIRS": "/dev/shm",
    }
    cpu_list = f"0-{cores-1}" if cores > 1 else "0"
    p = subprocess.Popen(
        ["taskset", "-c", cpu_list, sys.executable, os.path.join(REPO, "bench.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    samples = []
    while p.poll() is None:
        samples.append((time.time(), sample(p.pid)))
        time.sleep(1.0)
    out, _ = p.communicate()
    rec = json.loads([ln for ln in out.strip().splitlines() if ln.startswith("{")][-1])
    seg = rec["segments_detail"][0]
    total_wall = samples[-1][0] - samples[0][0]
    # steady window = the LAST seg["wall_s"] seconds before the process
    # printed its line; approximate with samples in that span
    t_end = samples[-1][0]
    t_start = t_end - seg["wall_s"]
    s0 = min(samples, key=lambda s: abs(s[0] - t_start))[1]
    s1 = samples[-1][1]
    deltas: dict[str, float] = defaultdict(float)
    for name, v in s1.items():
        deltas[group(name)] += v - s0.get(name, 0.0)
    top = sorted(deltas.items(), key=lambda kv: -kv[1])
    print(json.dumps({
        "cores": cores, "steady_eps": seg["eps"], "steady_wall": seg["wall_s"],
        "steady_cpu": seg["cpu_s"], "cpu_per_M": round(seg["cpu_s"] / (seg["events"]/1e6), 2),
        "total_wall": round(total_wall, 1),
        "top_threads": [(n, round(v, 2)) for n, v in top if v > 0.3],
    }, indent=1))


if __name__ == "__main__":
    main()
