"""Second extension of the v4.1 session: interleave headline attempts
(until one banks green+stable+storm-free at >= the 240k target) with
more gated pairs, all under the identical pre-registered protocol
(r5i_session.py verbatim — this only sequences its try_headline /
gated_warmed_pair). Every launched attempt is recorded.

Usage: python BENCH/r5i_extend2.py [n_attempts] [spacing_s]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 6
SPACING = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0

pair_i = 0
for i in range(N):
    t0 = time.time()
    # Headline first and then every 3rd attempt while unbanked;
    # otherwise pairs with alternating leg order.
    if m.banked_headline_eps() < m.HEADLINE_TARGET_EPS and i % 3 == 0:
        m.try_headline()
    else:
        order = "high_first" if pair_i % 2 == 0 else "low_first"
        pair_i += 1
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
