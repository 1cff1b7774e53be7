"""Thread-level storm witness: while a slice runs, sample every live
thread's (utime, stime) deltas plus per-core sys%, and print the top
kernel-time accumulators with their comm names. Identifies WHICH
subsystem (netty shuffle, tmpfs write, GC, python worker, kworker)
burns system time during a 4-executor storm.

Usage: python BENCH/storm_sampler.py [seconds] [interval]
Prints one JSON line per interval: top-8 threads by stime delta.
"""
from __future__ import annotations

import json
import os
import sys
import time


def snap_threads() -> dict[tuple[int, int], tuple[str, int, int]]:
    out = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
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
            rp = data.rfind(b")")
            comm = data[data.find(b"(") + 1:rp].decode(errors="replace")
            fields = data[rp + 2:].split()
            out[(int(pid), int(tid))] = (comm, int(fields[11]), int(fields[12]))
    return out


def snap_cores(n: int = 6) -> dict[int, list[int]]:
    out = {}
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu") and line[3:4].isdigit():
                p = line.split()
                c = int(p[0][3:])
                if c < n:
                    out[c] = [int(x) for x in p[1:9]]
    return out


def main() -> None:
    total = float(sys.argv[1]) if len(sys.argv) > 1 else 60
    dt = float(sys.argv[2]) if len(sys.argv) > 2 else 5
    clk = os.sysconf("SC_CLK_TCK")
    t_end = time.time() + total
    a_t, a_c = snap_threads(), snap_cores()
    while time.time() < t_end:
        time.sleep(dt)
        b_t, b_c = snap_threads(), snap_cores()
        deltas = []
        for key, (comm, ut, st) in b_t.items():
            if key in a_t:
                du = (ut - a_t[key][1]) / clk
                ds = (st - a_t[key][2]) / clk
                if du + ds > 0.05:
                    deltas.append((ds, du, key[0], key[1], comm))
        deltas.sort(reverse=True)
        cores = {}
        for c in b_c:
            d = [y - x for x, y in zip(a_c[c], b_c[c])]
            tot = max(sum(d), 1)
            cores[c] = {
                "us": round(100 * d[0] / tot),
                "sy": round(100 * d[2] / tot),
                "st": round(100 * d[7] / tot),
            }
        print(json.dumps({
            "t": round(time.time()),
            "cores": cores,
            "top_stime": [
                {"pid": p, "tid": t, "comm": c,
                 "stime_s": round(s, 2), "utime_s": round(u, 2)}
                for s, u, p, t, c in deltas[:8]
            ],
        }), flush=True)
        a_t, a_c = b_t, b_c


if __name__ == "__main__":
    main()
