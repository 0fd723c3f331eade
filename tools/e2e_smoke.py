#!/usr/bin/env python3
"""End-to-end smoke run: synthetic constellation -> full receiver -> position.

The position_test.cc analogue (SURVEY.md §4.7) on the synthetic scenario.
Run: python tools/e2e_smoke.py [--platform cpu]
"""

import argparse
import logging
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--fs", type=float, default=2.046e6)
    ap.add_argument("--duration", type=float, default=24.0)
    ap.add_argument("--cn0", type=float, default=47.0)
    ap.add_argument("--nsats", type=int, default=6)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    from gnss_sdr_1_tpu.codes import gps_l1ca_code
    from gnss_sdr_1_tpu.constants import GPS_L1_CA
    from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
    from gnss_sdr_1_tpu.runtime import Receiver, ReceiverConfig
    from gnss_sdr_1_tpu.siggen.generator import generate_baseband
    from gnss_sdr_1_tpu.siggen.scenario import build_scenario

    rx_ecef = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    prns = list(range(1, 1 + args.nsats))
    t0 = time.time()
    scen = build_scenario(rx_ecef, prns, t0_tow=345601.25,
                          duration_s=args.duration, cn0_dbhz=args.cn0,
                          subframe_cycle=(1, 2, 3))
    print(f"scenario built in {time.time()-t0:.1f}s")
    for p in prns:
        print(f"  PRN {p}: delay {scen.truth[p]['delay_s']*1e3:.3f} ms, "
              f"doppler {scen.truth[p]['doppler_hz']:+.1f} Hz, "
              f"rate {scen.truth[p]['doppler_rate_hz_s']:+.2f} Hz/s")

    t0 = time.time()
    x = generate_baseband(GPS_L1_CA, scen.sats,
                          {p: gps_l1ca_code(p) for p in prns},
                          args.fs, args.duration, noise=True)
    print(f"signal generated in {time.time()-t0:.1f}s ({len(x)} samples)")

    cfg = ReceiverConfig(fs_hz=args.fs, n_channels=args.nsats,
                         prn_search=tuple(prns))
    rx = Receiver(cfg)
    t0 = time.time()
    sols = rx.process(x)
    dt = time.time() - t0
    print(f"receiver processed {args.duration:.0f}s of signal in {dt:.1f}s "
          f"(RTF {args.duration/dt:.1f}x)")
    print(f"solutions: {len(sols)}")
    if sols:
        errs = np.array([s.rx_ecef_m - rx_ecef for s in sols])
        e3d = np.linalg.norm(errs, axis=1)
        print(f"3D error: first {e3d[0]:.2f} m, median {np.median(e3d):.2f} m, "
              f"mean-of-solutions { np.linalg.norm(errs.mean(axis=0)):.2f} m")
        s = sols[-1]
        print(f"last fix: lat {s.lat_deg:.6f} lon {s.lon_deg:.6f} h {s.height_m:.1f} "
              f"nsats {s.n_sats} pdop {s.dops['pdop']:.2f} "
              f"clk {s.rx_clock_bias_s*1e9:.1f} ns "
              f"vel {np.linalg.norm(s.rx_vel_ecef_ms):.2f} m/s")


if __name__ == "__main__":
    main()
