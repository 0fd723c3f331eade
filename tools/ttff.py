#!/usr/bin/env python3
"""TTFF (time-to-first-fix) system-test harness.

Reference parity: src/tests/system-tests/ttff.cc:300-399,423-506 — repeated
cold/warm/hot start runs against a capture, reporting mean/min/max/stdev
with a per-attempt cap (max_measurement_duration, default 90 s).

Start modes (control_thread.cc / TcpCmdInterface semantics):
  cold — nothing known: acquire, track, decode full ephemeris (3 subframes)
  warm — a-priori position + time: assisted acquisition Doppler gating
  hot  — warm + broadcast ephemerides pre-loaded: PVT fixes as soon as
         telemetry TOW-syncs (no subframe collection wait)

Usage: python tools/ttff.py [--runs N] [--mode cold|warm|hot|all]
       [--duration S] [--fs HZ] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = pathlib.Path("/tmp/gnss_sdr_tpu_testcache")


def build_capture(fs: float, duration: float, seed_doppler: float = 0.0):
    """Deterministic multi-satellite capture + truth (cached on disk)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gnss_sdr_1_tpu.codes import gps_l1ca_code
    from gnss_sdr_1_tpu.constants import GPS_L1_CA
    from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
    from gnss_sdr_1_tpu.siggen.generator import generate_baseband
    from gnss_sdr_1_tpu.siggen.scenario import build_scenario

    rx_ecef = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    prns = [1, 2, 3, 4, 5]
    scen = build_scenario(rx_ecef, prns, t0_tow=345601.25,
                          duration_s=duration, cn0_dbhz=47.0,
                          subframe_cycle=(1, 2, 3))
    CACHE.mkdir(exist_ok=True)
    key = CACHE / f"ttff_{fs:.0f}_{duration:.0f}_v1.npy"
    if key.exists():
        x = np.load(key)
    else:
        x = generate_baseband(GPS_L1_CA, scen.sats,
                              {p: gps_l1ca_code(p) for p in prns},
                              fs, duration, noise=True)
        np.save(key, x)
    return scen, x, prns


def measure_ttff(scen, x, prns, fs: float, mode: str,
                 chunk_s: float = 1.0, cap_s: float = 90.0,
                 run_idx: int = 0) -> float | None:
    """One start attempt: process chunk-by-chunk until the first valid fix.
    Returns TTFF in signal seconds, or None if no fix within the capture
    (the reference reports failed attempts separately)."""
    from gnss_sdr_1_tpu.runtime import Receiver, ReceiverConfig

    rx = Receiver(ReceiverConfig(fs_hz=fs, n_channels=len(prns),
                                 prn_search=tuple(prns)))
    if mode in ("warm", "hot"):
        rx.set_assistance(scen.ephemerides, scen.rx_ecef, scen.t0_tow)
    if mode == "hot":
        rx.load_ephemerides(scen.ephemerides)
    # vary the start point per run so attempts are independent samples
    # (ttff.cc re-runs the whole receiver against the source)
    offset = int(run_idx * 0.1 * fs)
    chunk = int(chunk_s * fs)
    nmax = rx.trk.cfg.epoch_samples_max
    pos = offset
    while pos + chunk + nmax <= len(x) and (pos - offset) / fs < cap_s:
        rx.process(x[pos : pos + chunk + nmax])
        if rx.solutions:
            # first-fix time: the RX-clock sample of the first observables
            # epoch (the fix epoch), counted from this attempt's start —
            # bounded by the end of the chunk that produced it
            t_fix = (pos - offset + chunk) / fs
            if rx.rx_tow_sample is not None:
                t_fix = min(t_fix, rx.rx_tow_sample / fs)
            return t_fix
        pos += chunk
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--mode", default="all",
                    choices=["cold", "warm", "hot", "all"])
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--fs", type=float, default=2.046e6)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    scen, x, prns = build_capture(args.fs, args.duration)
    modes = ["cold", "warm", "hot"] if args.mode == "all" else [args.mode]
    report = {}
    for mode in modes:
        vals = []
        fails = 0
        for k in range(args.runs):
            t0 = time.time()
            ttff = measure_ttff(scen, x, prns, args.fs, mode, run_idx=k)
            wall = time.time() - t0
            if ttff is None:
                fails += 1
                print(f"{mode} run {k}: NO FIX (wall {wall:.1f}s)")
            else:
                vals.append(ttff)
                print(f"{mode} run {k}: TTFF {ttff:.2f} s "
                      f"(wall {wall:.1f}s)")
        if vals:
            report[mode] = {
                "mean_s": float(np.mean(vals)),
                "min_s": float(np.min(vals)),
                "max_s": float(np.max(vals)),
                "stdev_s": float(np.std(vals)),
                "n": len(vals), "failed": fails,
            }
            print(f"{mode}: mean {report[mode]['mean_s']:.2f} "
                  f"min {report[mode]['min_s']:.2f} "
                  f"max {report[mode]['max_s']:.2f} "
                  f"sigma {report[mode]['stdev_s']:.2f} s "
                  f"({fails} failed)")
    if args.json:
        print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
