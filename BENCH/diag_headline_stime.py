"""Why do multi-batch headline segments carry 8-14 s of system time
when single-batch pair slices (same 8M-event shape, same cluster
topology) read 2-7 s?

Hypothesis (from the pre-touch A/B, BENCH/ab_pretouch.py): the host
charges an "expensive fault" cost once a process tree's total
first-touch footprint passes some threshold. A headline run writes
~5 GB of MoR deltas + shuffle to tmpfs PER 8M-event batch; by steady
segment 2 (batch 3) the tree has faulted 15+ GB and every new tmpfs
page costs more kernel time, while throughput is barely dented
(segments agree within 4%: headline-attempt-1787110248 reads
284.0k/273.1k/279.0k with stimes 8.2/13.5/11.8).

Experiment, pure python — no Spark, no JVM, one pinned core, so the
effect cannot be GC/shuffle/scheduling: write N sequential 2 GiB files
to a fresh tmpfs dir and record per-file (wall, utime, stime) and
/proc/vmstat pgfault deltas. If stime/GiB grows with cumulative
occupancy at zero host load, the headline's later-segment stime excess
is the host's fault-cost curve on accumulated tmpfs — a
measurement-box artifact (a deployment's sink is an object store, not
the compute node's RAM) — and not a kernel-preemption storm.

A control on ext4 (same writes to /root/tmp) separates tmpfs
page-allocation cost from generic buffered-write cost.

Usage: python BENCH/diag_headline_stime.py [n_files] [gib_per_file]
Writes BENCH/diag_headline_stime.json.
"""
from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import tempfile
import time

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
GIB = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
CHUNK = 8 * 1024 * 1024
HERE = os.path.dirname(os.path.abspath(__file__))


def vmstat() -> dict:
    out = {}
    with open("/proc/vmstat") as f:
        for line in f:
            k, v = line.split()
            if k in ("pgfault", "pgmajfault", "thp_fault_alloc",
                     "nr_shmem", "pgalloc_normal"):
                out[k] = int(v)
    return out


def cpu_self() -> tuple[float, float]:
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime, r.ru_stime


def run_series(root: str, label: str) -> list[dict]:
    os.makedirs(root, exist_ok=True)
    buf = os.urandom(CHUNK)  # incompressible, reused — write cost only
    recs = []
    per_file = int(GIB * 1024 ** 3)
    for i in range(N_FILES):
        path = os.path.join(root, f"f{i}")
        u0, s0 = cpu_self()
        v0 = vmstat()
        t0 = time.time()
        with open(path, "wb") as f:
            written = 0
            while written < per_file:
                f.write(buf)
                written += CHUNK
        dt = time.time() - t0
        u1, s1 = cpu_self()
        v1 = vmstat()
        recs.append({
            "label": label, "file": i,
            "cumulative_gib": round((i + 1) * GIB, 1),
            "wall_s": round(dt, 3),
            "utime_s": round(u1 - u0, 3),
            "stime_s": round(s1 - s0, 3),
            "stime_per_gib": round((s1 - s0) / GIB, 3),
            "vmstat_delta": {k: v1[k] - v0.get(k, 0) for k in v1},
        })
        print(json.dumps(recs[-1]), flush=True)
    return recs


def main() -> None:
    os.sched_setaffinity(0, {0})
    out = {"n_files": N_FILES, "gib_per_file": GIB, "series": []}
    tmpfs = tempfile.mkdtemp(prefix="stime_diag_", dir="/dev/shm")
    disk = tempfile.mkdtemp(prefix="stime_diag_", dir="/root")
    try:
        out["series"] += run_series(tmpfs, "tmpfs")
        out["series"] += run_series(disk, "ext4")
    finally:
        shutil.rmtree(tmpfs, ignore_errors=True)
        shutil.rmtree(disk, ignore_errors=True)
    with open(os.path.join(HERE, "diag_headline_stime.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
