"""Round-6 prospective validation of the v4.2 headline storm marker
(VERDICT r5 item 4): run independent headline sessions under v4.2
AS-IS — criterion imported VERBATIM from r5j_session.py, no amendment —
in separate windows, and record EVERY attempt (nothing banked, nothing
dropped). The marker is validated if the green attempts land in the
r5 class (240–270k ev/s steady on this host's calm windows) with
spread ≤ 1.25 and no storm-free refusals.

Usage: python BENCH/r6_headline_validate.py [n_attempts] [spacing_s]
Records: BENCH/r6_headline/headline-attempt-*.json + session.log
"""

from __future__ import annotations

import importlib.util
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

_spec = importlib.util.spec_from_file_location(
    "r5j", os.path.join(HERE, "r5j_session.py")
)
r5j = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(r5j)

# redirect records to the r6 validation dir; point the "banked" file at
# a throwaway path so validation attempts never touch the r5 artifact
r5j.OUTDIR = os.path.join(HERE, "r6_headline")
r5j.HEADLINE = os.path.join(HERE, "r6_headline", "banked_best.json")


def main() -> None:
    import time

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spacing = float(sys.argv[2]) if len(sys.argv) > 2 else 300.0
    os.makedirs(r5j.OUTDIR, exist_ok=True)
    r5j.log(
        {
            "kind": "r6_validation_start",
            "protocol": "v4.2 AS-IS (r5j verbatim, no amendment)",
            "attempts_planned": n,
        }
    )
    for i in range(n):
        t0 = time.time()
        r5j.try_headline_v42()
        dt = time.time() - t0
        if i < n - 1 and dt < spacing:
            time.sleep(spacing - dt)
    r5j.log({"kind": "r6_validation_end"})


if __name__ == "__main__":
    main()
