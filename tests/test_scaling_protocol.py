"""Pure-function tests for the scaling-evidence protocol in
BENCH/run_scaling.py (no Spark, no subprocesses — the measurement
machinery's *logic* is what these pin: gate-band evaluation, own-stamp
green grading, within-pair slice agreement).

The protocol's criteria are pre-registered; these tests keep them from
drifting silently (a gate that re-grades old records with a newer
threshold, or a spread criterion that starts ignoring a level, would
invalidate the composed evidence without failing any engine test).
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_RS = os.path.join(os.path.dirname(__file__), "..", "BENCH", "run_scaling.py")


@pytest.fixture(scope="module")
def rs():
    # pin a concrete band the way the session drivers do (the module
    # defaults GATE_GRANT_HI to +inf until a calibration sets it)
    env = {"BENCH_GATE_GRANT_LO": "3.16", "BENCH_GATE_GRANT_HI": "4.93"}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        spec = importlib.util.spec_from_file_location("rs_under_test", _RS)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return mod


def _pair(rs, probes, gate=None, slices=None):
    p = {
        "probe_before": probes[0],
        "probe_mid": probes[1] if len(probes) > 2 else None,
        "probe_after": probes[-1],
        "low_cores": 1,
        "high_cores": 4,
    }
    if gate is not None:
        p["gate"] = gate
    if slices is not None:
        p["slices_raw"] = slices
    return p


def probe(grant, bw=6.0):
    return {"cpu_grant_4v1": grant, "membw_gbps": bw}


def test_probe_ok_is_a_band_not_a_floor(rs):
    lo, hi = rs.GATE_GRANT, rs.GATE_GRANT_HI
    assert rs.probe_ok(probe((lo + hi) / 2))
    # below the band: the 4-process side is being starved
    assert not rs.probe_ok(probe(lo - 0.01))
    # ABOVE the band: a co-tenant is suppressing the 1-process baseline,
    # which fabricates super-linear pairs (prelude pair at eff 1.069)
    assert not rs.probe_ok(probe(hi + 0.01))
    # membw below gate fails regardless of grant
    assert not rs.probe_ok(probe((lo + hi) / 2, bw=rs.GATE_MEMBW - 1))


def test_pair_green_judges_against_own_stamp(rs):
    # a record stamped with a WIDER gate than today's must stay green
    # (composing never re-grades old records with a newer threshold)
    wide = {"grant": 1.0, "grant_hi": 99.0, "membw_gbps": 0.5}
    p = _pair(rs, [probe(0.9 + 1.0)] * 3, gate=wide)
    assert rs.pair_green(p)
    # and one stamped with a NARROWER gate must stay non-green even if
    # today's band would pass it
    narrow = {"grant": 4.4, "grant_hi": 4.5, "membw_gbps": 5.0}
    p2 = _pair(rs, [probe(4.0)] * 3, gate=narrow)
    assert not rs.pair_green(p2)


def test_pair_green_requires_every_bracketing_probe(rs):
    gate = {"grant": 3.0, "grant_hi": 5.0, "membw_gbps": 5.0}
    good, bad = probe(4.0), probe(2.0)
    assert rs.pair_green(_pair(rs, [good, good, good], gate=gate))
    for probes in ([bad, good, good], [good, bad, good], [good, good, bad]):
        assert not rs.pair_green(_pair(rs, probes, gate=gate))


def test_pre_stamp_records_fall_back_to_floor_semantics(rs):
    # round-4 records carry {"grant": 4.0, "membw_gbps": 5.0} with no
    # grant_hi: they were graded by a floor, and must keep grading that
    # way (no upper bound materializes retroactively)
    old = {"grant": 4.0, "membw_gbps": 5.0}
    p = _pair(rs, [probe(7.0)] * 3, gate=old)
    assert rs.pair_green(p)


def test_slice_spreads_and_self_witness(rs):
    def sl(cores, eps):
        return {"cores": cores, "eps": eps}

    p = _pair(
        rs,
        [probe(4.0)] * 3,
        slices=[sl(1, 60_000), sl(4, 200_000), sl(4, 210_000), sl(1, 62_000)],
    )
    spreads = rs.pair_slice_spreads(p)
    assert spreads[1] == pytest.approx(62_000 / 60_000, abs=1e-3)
    assert spreads[4] == pytest.approx(210_000 / 200_000, abs=1e-3)
    assert rs.pair_self_witnessed(p)
    # one collapsed 4-core slice breaks the witness (spread > 1.25)
    p["slices_raw"][1]["eps"] = 50_000
    assert not rs.pair_self_witnessed(p)


def test_wall_matched_pair_routes_per_level_windows(rs, monkeypatch):
    """v3.2: interleaved_pair must hand each level ITS OWN warm/steady
    window sizes (wall-matched events), keep the counterbalanced ABBAAB
    slice order, and record the per-level maps in the pair record —
    silent fallback to equal-event windows would reintroduce the regime
    mismatch the amendment exists to remove."""
    calls = []

    def fake_run_slice(cores, steady, warm, batch=None, cluster=False):
        calls.append((cores, steady, warm))
        eps = 80_000.0 if cores == 1 else 250_000.0
        events = steady
        return {
            "cores": cores, "events": events,
            "wall_s": events / eps, "cpu_s": events / eps * cores,
            "eps": eps, "diag": {},
        }

    monkeypatch.setattr(rs, "run_slice", fake_run_slice)
    monkeypatch.setattr(rs, "machine_probe", lambda: {"cpu_grant_4v1": 4.0, "membw_gbps": 6.0})
    monkeypatch.setattr(rs.time, "sleep", lambda s: None)
    monkeypatch.setattr(rs.os, "sync", lambda: None)

    steady_by = {1: 4_000_000, 4: 12_000_000}
    warm_by = {1: 2_000_000, 4: 8_000_000}
    p = rs.interleaved_pair(
        1, 4, slices_per_level=3, order="low_first",
        steady_by_cores=steady_by, warm_by_cores=warm_by,
    )
    # every slice got its level's windows
    for cores, steady, warm in calls:
        assert steady == steady_by[cores]
        assert warm == warm_by[cores]
    # counterbalanced ABBAAB, low level first
    assert [c for c, _, _ in calls] == [1, 4, 4, 1, 1, 4]
    # the record carries the per-level maps (recomputability)
    assert p["slice_steady_events"] == {"1": 4_000_000, "4": 12_000_000}
    assert p["slice_warm_events"] == {"1": 2_000_000, "4": 8_000_000}
    # efficiency math unchanged by unequal event counts (rates ratio)
    assert p["efficiency_median"] == pytest.approx((250_000 / 80_000) / 4, abs=1e-3)


def test_storm_witness_splits_clean_from_stormed_slices(rs):
    """v3.3: green requires each level's median to rest on >= 2
    storm-free slices; storm-free = steady stime <= max(5 s, 10% of the
    slice's CPU-seconds). Thresholds are protocol constants — a drift
    here would re-grade recorded pairs."""
    def sl(cores, stime, cpu=30.0):
        return {"cores": cores, "eps": 100_000.0, "cpu_s": cpu,
                "diag": {"stime_s": stime}}

    # clean pinned slices: 1-3 s stime
    assert rs.slice_storm_free(sl(4, 1.5))
    # the 5 s floor, not the 10% fraction, governs small windows
    assert rs.slice_storm_free(sl(4, 4.9, cpu=20.0))
    assert not rs.slice_storm_free(sl(4, 12.7, cpu=60.0))
    # big windows: the 10% fraction governs
    assert rs.slice_storm_free(sl(4, 28.0, cpu=300.0))
    # records without diagnostics are not retroactively condemned
    assert rs.slice_storm_free({"cores": 4, "eps": 1.0, "diag": {}})

    clean, storm = sl(4, 1.3), sl(4, 292.7)
    base = {"low_cores": 1, "high_cores": 4}
    # two clean 4-core slices out-vote one storm -> witnessed
    p = {**base, "slices_raw": [sl(1, 1.2), sl(1, 1.1), sl(1, 1.0),
                                clean, dict(clean), storm]}
    assert rs.pair_storm_witnessed(p)
    # all three 4-core slices stormed (the r5f pair-1787039956 shape)
    p = {**base, "slices_raw": [sl(1, 1.2), sl(1, 1.1), sl(1, 1.0),
                                dict(storm), dict(storm), dict(storm)]}
    assert not rs.pair_storm_witnessed(p)
