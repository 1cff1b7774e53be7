"""Reproduce + diagnose the intermittent 4-core slice collapse.

BENCH/r5 pairs show ~1-in-5 4-core slices burning 4-9x the normal CPU
(260 CPU-s vs ~30 for the identical deterministic 2M-event batch).
Wall-clock steal would NOT inflate utime+stime, so either the JVM is
genuinely doing more work (GC thrash / JIT storm / interpreter fallback)
or the host charges jiffies while running our instructions slowly
(hyperthread-sibling contention or frequency throttling — invisible to
steal accounting). bench.py now records per-segment utime/stime split,
JVM GC+JIT time, and per-pinned-CPU /proc/stat deltas; this harness
loops 4-core slices back-to-back and dumps the diagnostics so a
collapsed slice can be attributed.

Usage: python BENCH/diag_collapse.py [n_slices] [cores]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location("rs", os.path.join(HERE, "run_scaling.py"))
rs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rs)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
OUT = os.path.join(HERE, "r5", "diag_collapse.jsonl")


def main() -> None:
    for i in range(N):
        t0 = time.time()
        seg = rs.run_slice(CORES)
        rec = {
            "t": round(time.time()),
            "i": i,
            "cores": CORES,
            "eps": seg["eps"],
            "wall_s": seg["wall_s"],
            "cpu_s": seg["cpu_s"],
            "slice_total_s": round(time.time() - t0, 1),
            "diag": seg.get("diag"),
        }
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        d = seg.get("diag") or {}
        print(
            f"[{i}] eps={seg['eps']:.0f} wall={seg['wall_s']:.1f} "
            f"cpu={seg['cpu_s']:.1f} ut={d.get('utime_s')} st={d.get('stime_s')} "
            f"gc_ms={d.get('gc_ms')} jit_ms={d.get('jit_ms')}",
            flush=True,
        )


if __name__ == "__main__":
    main()
