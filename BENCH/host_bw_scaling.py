"""Measure THIS HOST's resource-scaling physics from 1 to 4 pinned cores.

The scaling gate (north rule: >=0.8 efficiency from N to 4N executors)
is evidenced in this sandbox by pinned 1-core vs 4-core legs on ONE box.
A real 4N-executor cluster multiplies every resource 4x: cores, memory
bandwidth, LLC, page cache. A single box multiplies only cores — shared
bandwidth is divided, not multiplied. This experiment measures the two
bounding kernels:

  compute_4v1   pure cache-resident compute (no bandwidth): aggregate
                throughput of 4 pinned single-core processes vs 1.
                Ideal 4.0. This is the bound a REAL 4x cluster offers
                for every resource.
  membw_4v1     pure streaming memory bandwidth: aggregate GB/s of 4
                pinned concurrent stream-copy processes vs 1 process.
                Ideal 4.0 on a cluster; on one box it is whatever the
                memory controller + hypervisor grant.

Any real workload's achievable 1->4-core WALL scaling on this box lies
between membw_4v1/4 and compute_4v1/4, weighted by how bandwidth-bound
it is. The replay pipeline moves ~600 B of content per event through
generation, one shuffle, two Arrow crossings and a parquet write — it is
partially bandwidth-bound BY NECESSITY, so its on-box ceiling is strictly
below compute_4v1/4. The same pipeline on 4 separate executors keeps the
compute bound, because each executor brings its own memory controller.

Protocol: R rounds (default 5); each round measures 1-proc sustained
stream bandwidth (best of three 1 s windows after a warm window — this
host lifts a bandwidth throttle ~1-2 s after demand onset, see
machine_probe in run_scaling.py) then 4-proc concurrent aggregate, then
one compute grant sample. Medians across rounds reported; all raw
samples kept. Output: BENCH/host_bw_scaling.json + one JSON line.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from run_scaling import cpu_grant_probe  # noqa: E402

MB = 1024 * 1024


def _stream_worker(cpu: int, seconds: float, q) -> None:
    import numpy as np

    try:
        os.sched_setaffinity(0, {cpu})
    except OSError:
        pass
    buf = np.ones(32 * MB // 8)
    buf.copy()  # first-touch + allocator warm-up
    # warm window: ride out the demand-onset throttle
    t0 = time.time()
    while time.time() - t0 < 1.0:
        buf.copy()
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        copied = 0
        while time.time() - t0 < seconds:
            b2 = buf.copy()  # noqa: F841
            copied += 2 * buf.nbytes  # read+write
        best = max(best, copied / (time.time() - t0) / 1e9)
    q.put(best)


def stream_bw(n_procs: int, seconds: float = 1.0) -> float:
    """Aggregate sustained GB/s of n pinned concurrent stream-copiers."""
    q = mp.Queue()
    ps = [
        mp.Process(target=_stream_worker, args=(i, seconds, q))
        for i in range(n_procs)
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in range(n_procs))


def main() -> None:
    rounds = int(os.environ.get("BW_ROUNDS", "5"))
    recs = []
    for i in range(rounds):
        one = stream_bw(1)
        four = stream_bw(4)
        grant = cpu_grant_probe()
        recs.append(
            {
                "bw_1proc_gbps": round(one, 2),
                "bw_4proc_aggregate_gbps": round(four, 2),
                "bw_4v1": round(four / max(one, 1e-9), 2),
                "compute_4v1": grant,
            }
        )
        time.sleep(2)
    med = lambda k: statistics.median(r[k] for r in recs)  # noqa: E731
    out = {
        "t": int(time.time()),
        "rounds": recs,
        "bw_1proc_gbps": round(med("bw_1proc_gbps"), 2),
        "bw_4proc_aggregate_gbps": round(med("bw_4proc_aggregate_gbps"), 2),
        "bw_4v1": round(med("bw_4v1"), 2),
        "compute_4v1": round(med("compute_4v1"), 2),
        "bw_scaling_efficiency": round(med("bw_4v1") / 4, 3),
        "compute_scaling_efficiency": round(med("compute_4v1") / 4, 3),
    }
    with open(os.path.join(HERE, "host_bw_scaling.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
