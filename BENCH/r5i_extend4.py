"""Third pairs-only extension of the v4.1 session (protocol and
grading are r5i_session.py VERBATIM — this only sequences its
gated_warmed_pair with alternating leg order). The headline is banked
(BENCH/headline_r5j.json, 253.3k ev/s); this extension exists solely
to widen the green-pair pool under the identical pre-registered gate.
Sampling plan, fixed before launch: run N pairs (or until the budget
expires), record EVERY launched pair, recompose BENCH/BASELINE.md
from the full pool afterwards — no post-hoc subsetting.

Usage: python BENCH/r5i_extend4.py [n_pairs] [spacing_s]
"""
from __future__ import annotations

import importlib.util
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location(
    "r5i", os.path.join(HERE, "r5i_session.py"))
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SPACING = float(sys.argv[2]) if len(sys.argv) > 2 else 180.0

for i in range(N):
    t0 = time.time()
    order = "high_first" if i % 2 == 0 else "low_first"
    try:
        p = m.gated_warmed_pair(order)
    except Exception as e:
        m.log({"kind": "pair", "error": f"{type(e).__name__}: {e}",
               "ext": True})
        p = None
    if p is not None and p.get("skipped"):
        m.log({"kind": "pair", "skipped": True, "ext": True})
    elif p is not None:
        sts = [s.get("diag", {}).get("stime_s") for s in p["slices_raw"]]
        m.log({"kind": "pair", "ext": True, "green": p["green"],
               "green_probes": p.get("green_probes"),
               "storm_witnessed": p.get("storm_witnessed"),
               "eff_median": p["efficiency_median"],
               "eff_cpu_median": p["efficiency_cpu_median"],
               "eff_sum": p["efficiency"], "order": p.get("order"),
               "low_med": p["low_level"]["eps_median"],
               "high_med": p["high_level"]["eps_median"],
               "slice_stimes": sts,
               "grants": (p["probe_before"]["cpu_grant_4v1"],
                          (p.get("probe_mid") or {}).get("cpu_grant_4v1"),
                          p["probe_after"]["cpu_grant_4v1"])})
    dt = time.time() - t0
    if i < N - 1 and dt < SPACING:
        time.sleep(SPACING - dt)
m.log({"kind": "extension4_end"})
