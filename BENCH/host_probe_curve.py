"""Controlled host-throttle characterization.

Question: is the sub-4.0 cpu-grant we measure after benchmark legs a
property of our software, or of the host? Method: apply a PURE
cache-resident counting load (no Spark, no I/O, no memory bandwidth —
nothing our engine could influence) on 4 pinned cores for T seconds,
then immediately probe cpu-grant 4v1; rest 60 s between trials. If the
grant falls with T under a load that does no work but count, the host
is throttling sustained multi-core CPU itself (credit-style), and no
measurement window longer than the credit horizon can show 4 cores'
cycles regardless of the software under test.

Usage: python BENCH/host_probe_curve.py [out.json]
"""

from __future__ import annotations

import importlib.util
import json
import multiprocessing as mp
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location("rs", os.path.join(HERE, "run_scaling.py"))
rs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rs)


def _burn(cpu: int, seconds: float) -> None:
    try:
        os.sched_setaffinity(0, {cpu})
    except OSError:
        pass
    t_end = time.time() + seconds
    n = 0
    while time.time() < t_end:
        for _ in range(100_000):
            n += 1


def sustained_load(cores: int, seconds: float) -> None:
    ps = [mp.Process(target=_burn, args=(i, seconds)) for i in range(cores)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "host_probe_curve.json"
    )
    trials = []
    for load_s in (0, 30, 60, 120, 240):
        time.sleep(60)  # recovery window before each trial
        pre = rs.cpu_grant_probe()
        if load_s:
            sustained_load(4, load_s)
        post = rs.cpu_grant_probe()
        rec = {
            "load_seconds": load_s,
            "grant_before_load": pre,
            "grant_after_load": post,
            "ts": time.time(),
        }
        trials.append(rec)
        print(json.dumps(rec), flush=True)
    with open(out_path, "w") as f:
        json.dump({"trials": trials, "note": __doc__.strip()}, f)


if __name__ == "__main__":
    main()
