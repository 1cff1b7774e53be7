"""Recompute the scaling-gate pool statistics from EVERY committed
pair record (BENCH/r5h/pair-*.json + BENCH/r5i/pair-*.json), the same
grading the round-5 verdict recomputed independently: a pair is GREEN
iff its probes are green and no storm was witnessed in its slices;
the gate statistic is the median of green pairs' efficiency_median.

Usage: python BENCH/pool_stats_r06.py
Prints a JSON summary (also the bootstrap 90% CI of the green median,
10k resamples, deterministic seed).
"""

from __future__ import annotations

import glob
import json
import os
import random
import statistics

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    pairs = []
    for d in ("r5h", "r5i"):
        for p in sorted(glob.glob(os.path.join(HERE, d, "pair-*.json"))):
            with open(p) as f:
                rec = json.load(f)
            rec["_file"] = os.path.relpath(p, HERE)
            pairs.append(rec)
    # p["green"] is the session's own grade: green_probes AND
    # pair_storm_witnessed (slices witnessed storm-FREE) — the same
    # conjunction the r5 verdict recomputed independently.
    greens = [p for p in pairs if p.get("green")]
    effs = sorted(p["efficiency_median"] for p in greens)
    eff_cpu = sorted(
        p["efficiency_cpu_median"] for p in greens if "efficiency_cpu_median" in p
    )
    med = statistics.median(effs) if effs else None
    rng = random.Random(42)
    boots = []
    for _ in range(10000):
        sample = [effs[rng.randrange(len(effs))] for _ in effs]
        boots.append(statistics.median(sample))
    boots.sort()
    ci = (boots[int(0.05 * len(boots))], boots[int(0.95 * len(boots))])
    print(
        json.dumps(
            {
                "pairs_launched": len(pairs),
                "pairs_green": len(greens),
                "green_median_eff": round(med, 4) if med else None,
                "green_median_eff_cpu": (
                    round(statistics.median(eff_cpu), 4) if eff_cpu else None
                ),
                "green_effs": [round(e, 3) for e in effs],
                "bootstrap90_ci": [round(ci[0], 4), round(ci[1], 4)],
                "green_files": [p["_file"] for p in greens],
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
